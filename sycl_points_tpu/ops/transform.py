"""SE(3) transforms of point-cloud attributes (vectorized; XLA-fused).

Replaces the reference transform kernels (``algorithms/common/transform.hpp``
in fateshelled/sycl_points): one fused elementwise pass over the cloud
instead of per-work-item kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sycl_points_tpu.points.point_cloud import PointCloud


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    """Apply ``T [4,4]`` to ``points [..., 3]`` (kernel::transform_point)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t


def rotate_vectors(vecs: jax.Array, T: jax.Array) -> jax.Array:
    """Rotate direction vectors (normals) by the rotation block of ``T``."""
    return vecs @ jnp.swapaxes(T[..., :3, :3], -1, -2)


def rotate_covs(covs: jax.Array, T: jax.Array) -> jax.Array:
    """``R C R^T`` for ``covs [..., 3, 3]`` (kernel::transform_covs)."""
    R = T[..., :3, :3]
    return jnp.einsum(
        "ij,...jk,lk->...il", R, covs, R, precision="highest"
    )


def transform_cloud(cloud: PointCloud, T: jax.Array) -> PointCloud:
    """Whole-cloud transform (async transform at transform.hpp:40-120)."""
    return cloud.replace(
        points=transform_points(cloud.points, T),
        normals=None if cloud.normals is None else rotate_vectors(cloud.normals, T),
        covs=None if cloud.covs is None else rotate_covs(cloud.covs, T),
    )
