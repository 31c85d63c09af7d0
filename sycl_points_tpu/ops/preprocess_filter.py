"""PreprocessFilter facade: the reference's operator-owning filter class.

Replaces ``algorithms/filter/preprocess_filter.hpp:21-280`` of
fateshelled/sycl_points: one object exposing box_filter / random_sampling /
weighted_random_sampling / mixed_random_sampling / farthest_point_sampling /
angle_incidence_filter with a settable random seed.  The flag-buffer plumbing
of the reference is unnecessary here (filters mask in place); this class
exists for API parity and PRNG-key management.
"""

from __future__ import annotations

import jax

from sycl_points_tpu.ops import filters as _filters
from sycl_points_tpu.ops import sampling as _sampling
from sycl_points_tpu.points.point_cloud import PointCloud


class PreprocessFilter:
    def __init__(self, seed: int = 1234):
        self.set_random_seed(seed)

    def set_random_seed(self, seed: int):
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def box_filter(self, cloud: PointCloud, min_distance: float, max_distance: float) -> PointCloud:
        return _filters.box_filter(cloud, min_distance, max_distance)

    def angle_incidence_filter(self, cloud: PointCloud, min_angle: float, max_angle: float) -> PointCloud:
        return _filters.angle_incidence_filter(cloud, min_angle, max_angle)

    def random_sampling(self, cloud: PointCloud, num: int) -> PointCloud:
        return _sampling.random_sampling(cloud, num, self._next_key())

    def weighted_random_sampling(self, cloud: PointCloud, weights, num: int) -> PointCloud:
        return _sampling.weighted_sampling(cloud, num, weights, self._next_key())

    def mixed_random_sampling(
        self, cloud: PointCloud, weights, num: int, weighted_ratio: float = 0.8
    ) -> PointCloud:
        return _sampling.mixed_sampling(cloud, num, weights, self._next_key(), weighted_ratio)

    def farthest_point_sampling(self, cloud: PointCloud, num: int) -> PointCloud:
        return _sampling.farthest_point_sampling(cloud, num, self._next_key())
