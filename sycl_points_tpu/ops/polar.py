"""Polar-grid downsampling: (range, elevation, azimuth) binning.

Replaces ``algorithms/filter/polar_downsampling.hpp`` of
fateshelled/sycl_points (key computation at polar_downsampling.hpp:29-105,
coordinate systems at ``common/coordinate_system.hpp``): convert to polar
coordinates per the LIDAR (x-fwd, z-up, REP-103) or CAMERA (z-fwd, y-down)
convention, quantize each axis, then reuse the voxel sort/segment-reduce
aggregation — all on device.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp

from sycl_points_tpu.ops.voxel import COORD_MASK, COORD_OFFSET, _SENTINEL, downsample_by_coords
from sycl_points_tpu.points.point_cloud import PointCloud


class CoordinateSystem(enum.Enum):
    LIDAR = "lidar"
    CAMERA = "camera"

    @staticmethod
    def from_string(s: str) -> "CoordinateSystem":
        return CoordinateSystem[s.strip().upper()]


def polar_coords(
    points: jax.Array,
    valid: jax.Array,
    distance_size: float,
    elevation_size: float,
    azimuth_size: float,
    coord_system: CoordinateSystem = CoordinateSystem.LIDAR,
):
    """Integer (range, elevation, azimuth) bin coordinates with sentinel for
    invalid points (kernel::compute_polar_bit, polar_downsampling.hpp:29-105)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    finite = jnp.all(jnp.isfinite(points), axis=-1) & valid
    r = jnp.sqrt(x * x + y * y + z * z)

    if coord_system is CoordinateSystem.LIDAR:
        planar_sq = x * x + y * y
        azimuth = jnp.arctan2(y, x)
        elevation = jnp.arctan2(z, jnp.sqrt(jnp.maximum(planar_sq, 0.0)))
    elif coord_system is CoordinateSystem.CAMERA:
        planar_sq = x * x + z * z
        azimuth = jnp.arctan2(x, z)
        elevation = jnp.arctan2(-y, jnp.sqrt(jnp.maximum(planar_sq, 0.0)))
    else:
        raise ValueError(coord_system)

    ok = finite & (r > 0.0) & (planar_sq > 0.0)
    c0 = jnp.floor(r / distance_size).astype(jnp.int32) + COORD_OFFSET
    c1 = jnp.floor(elevation / elevation_size).astype(jnp.int32) + COORD_OFFSET
    c2 = jnp.floor(azimuth / azimuth_size).astype(jnp.int32) + COORD_OFFSET
    coords = jnp.stack([c0, c1, c2], axis=-1)
    in_range = jnp.all((coords >= 0) & (coords <= COORD_MASK), axis=-1)
    ok = ok & in_range
    coords = jnp.where(ok[:, None], coords, _SENTINEL)
    return coords, ok


def polar_downsample(
    cloud: PointCloud,
    distance_size: float,
    elevation_size: float,
    azimuth_size: float,
    coord_system: CoordinateSystem = CoordinateSystem.LIDAR,
    min_voxel_count: int = 1,
    out_capacity: Optional[int] = None,
) -> PointCloud:
    """Polar-grid downsampling (PolarGrid::downsampling). Jittable."""
    coords, ok = polar_coords(
        cloud.points, cloud.mask, distance_size, elevation_size, azimuth_size, coord_system
    )
    return downsample_by_coords(cloud, coords, ok, min_voxel_count, out_capacity)
