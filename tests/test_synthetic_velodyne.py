"""Geometry sanity for the synthetic Velodyne benchmark generator."""

import sys
import os

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks")
)

from synthetic_velodyne import World, figure8_trajectory, hdl64_dirs, scan_at


def test_rays_unit_and_pattern():
    d = hdl64_dirs(n_az=64, n_rings=8)
    assert d.shape == (64 * 8, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_scan_hits_world_surfaces():
    w = World()
    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.8]
    pts = scan_at(w, T, n_az=256, n_rings=16, seed=0)
    assert len(pts) > 1000
    r = np.linalg.norm(pts, axis=1)
    assert r.min() > 1.0 and r.max() < 80.0
    # sensor-frame ground points sit near z = -1.8 (sensor height)
    ground = pts[pts[:, 2] < -1.0]
    assert len(ground) > 100
    assert abs(np.median(ground[:, 2]) + 1.8) < 0.3
    # wall hits: horizontal rays reach ~wall radius
    far = r > 45.0
    assert far.sum() > 10


def test_scans_consistent_across_poses():
    """Two scans of the same world from nearby poses must overlap: points
    from scan B, mapped through the relative pose, land near scan A points."""
    w = World()
    poses = figure8_trajectory(2, speed=0.5)
    a = scan_at(w, poses[0], n_az=256, n_rings=16, seed=0)
    b = scan_at(w, poses[1], n_az=256, n_rings=16, seed=1)
    b_world = b @ poses[1][:3, :3].T + poses[1][:3, 3]
    a_world = a @ poses[0][:3, :3].T + poses[0][:3, 3]
    # subsample for the weak host CPU
    sel = np.random.default_rng(0).permutation(len(b_world))[:300]
    d = np.linalg.norm(b_world[sel][:, None, :] - a_world[None, :: 7, :], axis=2)
    nn = d.min(axis=1)
    assert np.median(nn) < 0.5
