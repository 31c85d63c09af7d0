"""Covariance ellipsoid visualization export.

ROS-less analog of the reference's rviz covariance MarkerArray publisher
(``ros2/covariance_marker_publisher.hpp:31`` in fateshelled/sycl_points):
converts per-point 3x3 covariances into ellipsoid triangle meshes (scaled
eigenbasis unit spheres) and writes a single PLY mesh any viewer can load.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils.eigh3 import eigh3


def _unit_sphere(n_lat: int = 6, n_lon: int = 8):
    """Small UV-sphere (vertices [V,3], faces [F,3])."""
    verts = [(0.0, 0.0, 1.0)]
    for i in range(1, n_lat):
        phi = np.pi * i / n_lat
        for j in range(n_lon):
            th = 2 * np.pi * j / n_lon
            verts.append(
                (np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th), np.cos(phi))
            )
    verts.append((0.0, 0.0, -1.0))
    v = np.asarray(verts, np.float32)

    faces = []
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    for i in range(n_lat - 2):
        a = 1 + i * n_lon
        b = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            faces.append((a + j, b + j, b + j2))
            faces.append((a + j, b + j2, a + j2))
    last = len(v) - 1
    a = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, a + (j + 1) % n_lon, a + j))
    return v, np.asarray(faces, np.int32)


def covariance_ellipsoid_mesh(
    cloud: PointCloud,
    scale: float = 2.0,
    max_markers: int = 500,
    min_radius: float = 1e-3,
):
    """(vertices [N*V,3], faces [N*F,3]) of per-point covariance ellipsoids
    (semi-axes = scale * sqrt(eigenvalue), oriented by the eigenbasis)."""
    if cloud.covs is None:
        raise ValueError("cloud has no covariances")
    data = cloud.to_numpy()
    pts = data["points"][:max_markers]
    covs = data["covs"][:max_markers]

    lam, V = eigh3(jnp.asarray(covs))
    lam = np.maximum(np.asarray(lam), 0.0)
    V = np.asarray(V)
    radii = np.maximum(scale * np.sqrt(lam), min_radius)  # [N, 3]

    sv, sf = _unit_sphere()
    # x_world = R @ diag(r) @ x_unit + p  per marker
    scaled = sv[None, :, :] * radii[:, None, :]  # [N, V, 3]
    rotated = np.einsum("nij,nvj->nvi", V, scaled)
    verts = (rotated + pts[:, None, :]).reshape(-1, 3).astype(np.float32)
    offs = (np.arange(len(pts)) * len(sv))[:, None, None]
    faces = (sf[None, :, :] + offs).reshape(-1, 3).astype(np.int32)
    return verts, faces


def write_ellipsoid_ply(path: str, cloud: PointCloud, scale: float = 2.0,
                        max_markers: int = 500):
    verts, faces = covariance_ellipsoid_mesh(cloud, scale, max_markers)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        rec = np.zeros(len(faces), dtype=np.dtype([("n", "u1"), ("v", "<i4", (3,))]))
        rec["n"] = 3
        rec["v"] = faces
        f.write(rec.tobytes())
