"""Constant-velocity ("VICP") motion-distortion compensation.

Replaces ``algorithms/deskew/relative_pose_deskew.hpp`` of
fateshelled/sycl_points: body twist = log(prev_pose^-1 current_pose),
per point tau = clamp(t_offset / scan_duration, 0, 1), point moved by
se3_exp(tau * twist); normals/covariances rotated by the so3 part.  One
batched se3_exp over the whole cloud instead of a per-work-item kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.smallmat import matvec3, rotate_mat3


def deskew_constant_velocity(
    cloud: PointCloud,
    previous_pose: jax.Array,
    current_pose: jax.Array,
    scan_duration_seconds: jax.Array | float,
) -> PointCloud:
    """Deskew a timestamped cloud (relative_pose_deskew.hpp:37-182). Jittable.

    Points with non-finite timestamps are passed through unchanged.  Returns
    the input unchanged when it has no timestamps.
    """
    if cloud.timestamp_offsets is None:
        return cloud

    delta_twist = lie.se3_log(lie.transform_inverse(previous_pose) @ current_pose)
    t_sec = cloud.timestamp_offsets * 1e-3
    finite = jnp.isfinite(t_sec)
    tau = jnp.clip(jnp.where(finite, t_sec, 0.0) / scan_duration_seconds, 0.0, 1.0)
    tau = jnp.where(finite, tau, 0.0)  # identity motion for non-finite stamps

    motion = lie.se3_exp(tau[:, None] * delta_twist[None, :])  # [N, 4, 4]
    R = motion[:, :3, :3]
    new_points = matvec3(R, cloud.points) + motion[:, :3, 3]

    new_normals = None
    if cloud.normals is not None:
        new_normals = matvec3(R, cloud.normals)
    new_covs = None
    if cloud.covs is not None:
        new_covs = rotate_mat3(R, cloud.covs)

    return cloud.replace(points=new_points, normals=new_normals, covs=new_covs)
