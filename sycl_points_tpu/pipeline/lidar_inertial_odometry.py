"""Tightly-coupled LiDAR-inertial odometry pipeline (15-DOF IEKF-style).

Replaces ``pipeline/lidar_inertial_odometry.hpp:55-712`` and its params
(``lidar_inertial_odometry_params.hpp:15-59``) of fateshelled/sycl_points:
per-frame flow preprocess -> covariances -> refine -> IMU window
integration -> (IMU-only fallback for tiny clouds) -> 15-DOF LIO
registration -> bias clamps -> preintegration reset with P_post sigma
floors -> submapping.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.imu.factor import IDX_ROT, IDX_VEL, State
from sycl_points_tpu.imu.initial_alignment import InitialAlignmentEstimator
from sycl_points_tpu.imu.preintegration import (
    IMUMeasurement,
    IMUPreintegration,
    build_measurement_window,
)
from sycl_points_tpu.lio import lio_registration as lio
from sycl_points_tpu.pipeline.lidar_odometry import ResultType as _LOResultType
from sycl_points_tpu.pipeline.params import LidarInertialOdometryParams
from sycl_points_tpu.pipeline.pc_processor import PCProcessor
from sycl_points_tpu.pipeline.submap import Submap
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.ops.sampling import random_sampling
from sycl_points_tpu.registration.registration import compute_icp_robust_weights
from sycl_points_tpu.utils import lie


class ResultType(enum.Enum):
    success = "success"
    first_frame = "first_frame"
    waiting_initial_alignment = "waiting_initial_alignment"
    error = "error"
    old_timestamp = "old_timestamp"
    small_number_of_points = "small_number_of_points"
    imu_only = "imu_only"


class LidarInertialOdometry:
    def __init__(self, params: LidarInertialOdometryParams = LidarInertialOdometryParams()):
        self.params = params
        self.pc_processor = PCProcessor(params)
        self.submap = Submap(params)
        # Jitted ONCE (params bound as closure constants): calling lio.align
        # eagerly would retrace and recompile its solver loops every frame.
        self._lio_align_jit = jax.jit(
            lambda source, target, target_knn, pred, P_pred, P_prev, update_bias: lio.align(
                source, target, target_knn, pred, P_pred, P_prev,
                factor_params=params.registration.factor,
                params=params.lio,
                update_bias=update_bias,
            )
        )
        self._icp_weights_jit = jax.jit(
            lambda src, tgt, knn, pose: compute_icp_robust_weights(
                src, tgt, knn, pose, params.registration.factor
            )
        )
        # One fused post-registration readback (pose + inlier + count): each
        # device->host sync costs a full link round trip.
        self._frame_stats_jit = jax.jit(
            lambda T, inlier, reg_input: jnp.concatenate(
                [
                    T.ravel(),
                    jnp.stack(
                        [
                            inlier.astype(jnp.float32),
                            reg_input.count().astype(jnp.float32),
                        ]
                    ),
                ]
            )
        )

        self.x = State(
            position=jnp.asarray(params.pose.initial_matrix()[:3, 3]),
            rotation=jnp.asarray(params.pose.initial_matrix()[:3, :3]),
            velocity=jnp.zeros(3),
            accel_bias=jnp.asarray(params.imu.accel_bias, dtype=jnp.float32),
            gyro_bias=jnp.asarray(params.imu.gyro_bias, dtype=jnp.float32),
        )
        self.P_post = jnp.zeros((15, 15), jnp.float32)
        self.odom = params.pose.initial_matrix()
        self.prev_odom = self.odom.copy()
        self.dt = 0.1
        self.last_frame_time = -1.0
        self.last_imu_reset_timestamp = -1.0
        self.is_first_frame = True
        self.reg_result = None
        self.preprocessed: Optional[PointCloud] = None
        self.error_message = ""
        self.processing_times: Dict[str, float] = defaultdict(float)
        self._key = jax.random.key(99)

        self.imu_buffer: deque = deque()
        self._imu_batch: list = []
        self.imu_preintegration = IMUPreintegration(params.imu.preintegration)
        self.imu_R_world_at_reset = np.eye(3, dtype=np.float32)
        self.imu_v_world_at_reset = np.zeros(3, np.float32)
        self.alignment_estimator = (
            InitialAlignmentEstimator(
                params.imu.initial_alignment,
                np.asarray(params.imu.preintegration.gravity, np.float32),
                params.imu.T_imu_to_lidar_matrix(),
            )
            if params.imu.initial_alignment.enable
            else None
        )

    # ------------------------------------------------------------------
    def add_imu_measurement(self, meas: IMUMeasurement):
        self.imu_buffer.append(meas)
        horizon = meas.timestamp - self.params.imu.buffer_duration_sec
        while self.imu_buffer and self.imu_buffer[0].timestamp < horizon:
            self.imu_buffer.popleft()

    # ------------------------------------------------------------------
    def process(self, scan: PointCloud, timestamp: float, scan_duration_sec: float = 0.1) -> ResultType:
        self.error_message = ""
        p = self.params

        if (
            self.is_first_frame
            and self.alignment_estimator is not None
            and not self.alignment_estimator.is_done()
        ):
            ok, R_gl, gyro_bias, diag = self.alignment_estimator.try_align(
                timestamp, list(self.imu_buffer),
                np.asarray(self.x.gyro_bias), np.asarray(self.x.accel_bias),
            )
            if not ok:
                self.error_message = f"initial_alignment: {diag.error_message}"
                return ResultType.waiting_initial_alignment
            user_R = self.odom[:3, :3]
            yaw = float(np.arctan2(user_R[1, 0], user_R[0, 0]))
            cz, sz = np.cos(yaw), np.sin(yaw)
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
            self.odom[:3, :3] = Rz @ R_gl
            self.prev_odom = self.odom.copy()
            self.x = self.x._replace(
                rotation=jnp.asarray(self.odom[:3, :3]),
                gyro_bias=jnp.asarray(gyro_bias),
            )

        if self.last_frame_time > 0.0:
            dt = timestamp - self.last_frame_time
            if dt > 0.0:
                self.dt = float(dt)
            else:
                self.error_message = "old timestamp"
                return ResultType.old_timestamp
        self.processing_times.clear()

        # preprocess + covariances + refine (shared with the LO pipeline)
        t0 = time.perf_counter()
        cloud = scan
        if p.imu.deskew.enable:
            cloud, _ = self.pc_processor.deskew_with_imu(
                cloud, list(self.imu_buffer), self.odom, timestamp, scan_duration_sec,
                np.asarray(self.x.gyro_bias), np.asarray(self.x.accel_bias),
                v_world_body=self.imu_v_world_at_reset,
            )
        pre = self.pc_processor.prefilter(cloud)
        ctx = self.pc_processor.prepare_context(pre)
        pre = self.pc_processor.compute_covariances(pre, ctx)
        pre = self.pc_processor.refine_filter(pre, ctx)
        self.preprocessed = pre
        self.processing_times["1. preprocessing"] += time.perf_counter() - t0

        insufficient = int(pre.count()) <= p.registration.min_num_points
        if self.is_first_frame and insufficient:
            self.error_message = "point cloud size is too small"
            return ResultType.small_number_of_points

        self._integrate_imu_window(timestamp)

        if insufficient:
            return self._process_imu_only(timestamp)

        if self.is_first_frame:
            self.submap.add_first_frame(pre, timestamp, self.odom)
            self.is_first_frame = False
            self.last_frame_time = timestamp
            self.last_imu_reset_timestamp = timestamp
            self.x = self.x._replace(
                position=jnp.asarray(self.odom[:3, 3]),
                rotation=jnp.asarray(self.odom[:3, :3]),
                velocity=jnp.zeros(3),
            )
            self._reset_imu_preintegration()
            return ResultType.first_frame

        # LIO registration
        t0 = time.perf_counter()
        reg_result, reg_input = self._register_frame()
        self.reg_result = reg_result
        self.processing_times["3. registration"] += time.perf_counter() - t0
        self.last_frame_time = timestamp
        self.last_imu_reset_timestamp = timestamp

        # submapping (same flow as LO)
        t0 = time.perf_counter()
        stats = np.asarray(
            self._frame_stats_jit(reg_result.T, reg_result.inlier, reg_input)
        )
        T_np = stats[:16].reshape(4, 4).astype(np.float32)
        self._submapping(
            reg_result, T_np, float(stats[16]) / max(int(stats[17]), 1),
            int(stats[17]), reg_input, timestamp,
        )
        self.processing_times["4. build submap"] += time.perf_counter() - t0

        self.prev_odom = self.odom.copy()
        self.odom = T_np.copy()
        return ResultType.success

    # ------------------------------------------------------------------
    def _integrate_imu_window(self, timestamp: float):
        self._imu_batch = build_measurement_window(
            list(self.imu_buffer), self.last_imu_reset_timestamp, timestamp
        )
        self.imu_preintegration.integrate_batch(self._imu_batch)

    def _imu_bias_observable(self) -> bool:
        """lidar_inertial_odometry.hpp:371-393."""
        # freeze_on_low_excitation is not in the default param surface here;
        # reference default is False -> always observable.
        return True

    def _predict_state(self) -> State:
        """lidar_inertial_odometry.hpp:432-459."""
        T_il = self.params.imu.T_imu_to_lidar_matrix()
        gb, ab = np.asarray(self.x.gyro_bias), np.asarray(self.x.accel_bias)
        T_imu_rel = np.asarray(
            self.imu_preintegration.predict_relative_transform(
                self.imu_R_world_at_reset, self.imu_v_world_at_reset, gb, ab
            )
        )
        T_lidar_rel = T_il @ T_imu_rel @ np.linalg.inv(T_il)
        T_pred = np.asarray(self.x.pose()) @ T_lidar_rel

        c = self.imu_preintegration.get_corrected(gb, ab)
        R_world_imu = np.asarray(self.x.rotation) @ T_il[:3, :3]
        dt_f = float(c.dt_total)
        g = np.asarray(self.params.imu.preintegration.gravity, np.float32)
        v_pred = np.asarray(self.x.velocity) + g * dt_f + R_world_imu @ np.asarray(c.Delta_v)
        return State(
            position=jnp.asarray(T_pred[:3, 3].astype(np.float32)),
            rotation=jnp.asarray(T_pred[:3, :3].astype(np.float32)),
            velocity=jnp.asarray(v_pred.astype(np.float32)),
            accel_bias=self.x.accel_bias,
            gyro_bias=self.x.gyro_bias,
        )

    def _predicted_covariance(self, R_world_lidar) -> jax.Array:
        T_il = jnp.asarray(self.params.imu.T_imu_to_lidar_matrix())
        return lio.transform_covariance_imu_to_lidar(
            self.imu_preintegration.get_raw().covariance, T_il, R_world_lidar
        )

    def _reset_imu_preintegration(self):
        """lidar_inertial_odometry.hpp:402-430: sigma floors + frame transform."""
        p = self.params
        T_il = p.imu.T_imu_to_lidar_matrix()
        R_world_imu = np.asarray(self.x.rotation) @ T_il[:3, :3]

        P = self.P_post
        sv2 = p.fd_velocity_sigma**2
        sr2 = p.icp_rotation_sigma**2
        P = P.at[IDX_VEL : IDX_VEL + 3, IDX_VEL : IDX_VEL + 3].add(sv2 * jnp.eye(3))
        P = P.at[IDX_ROT : IDX_ROT + 3, IDX_ROT : IDX_ROT + 3].add(sr2 * jnp.eye(3))
        P_imu = lio.transform_covariance_lidar_to_imu(
            P, jnp.asarray(T_il), self.x.rotation
        )
        self.imu_preintegration.reset(
            np.asarray(self.x.gyro_bias), np.asarray(self.x.accel_bias),
            initial_covariance=np.asarray(P_imu), R_world_body=R_world_imu,
        )
        self.imu_R_world_at_reset = R_world_imu
        self.imu_v_world_at_reset = np.asarray(self.x.velocity)

    def _process_imu_only(self, timestamp: float) -> ResultType:
        """lidar_inertial_odometry.hpp:472-509."""
        pred = self._predict_state()
        P_pred = self._predicted_covariance(pred.rotation)
        finite = all(
            bool(jnp.all(jnp.isfinite(v)))
            for v in (pred.position, pred.rotation, pred.velocity, P_pred)
        )
        if not finite:
            self.error_message = "imu-only propagation produced non-finite state or covariance"
            return ResultType.error
        self.prev_odom = self.odom.copy()
        self.x = pred
        self.P_post = P_pred
        self.odom = np.asarray(pred.pose())
        self.reg_result = None
        self.last_frame_time = timestamp
        self.last_imu_reset_timestamp = timestamp
        self._reset_imu_preintegration()
        self.error_message = "point cloud size is too small; propagated with IMU only"
        return ResultType.imu_only

    def _register_frame(self):
        """lidar_inertial_odometry.hpp:513-537."""
        p = self.params
        pred = self._predict_state()
        P_pred = self._predicted_covariance(pred.rotation)

        sampling = p.registration_sampling
        source = self.preprocessed
        if sampling.enable and sampling.num < source.capacity:
            self._key, sub = jax.random.split(self._key)
            source = random_sampling(source, sampling.num, sub)

        result = self._lio_align_jit(
            source, self.submap.submap_cloud, self.submap.submap_knn,
            pred, P_pred, self.P_post,
            jnp.bool_(self._imu_bias_observable()),
        )
        self.P_post = result.posterior_covariance
        self.x = result.state
        if p.max_accel_bias_norm > 0.0:
            self.x = self.x._replace(accel_bias=_clamp_norm(self.x.accel_bias, p.max_accel_bias_norm))
        if p.max_gyro_bias_norm > 0.0:
            self.x = self.x._replace(gyro_bias=_clamp_norm(self.x.gyro_bias, p.max_gyro_bias_norm))
        self._reset_imu_preintegration()
        return result, source

    def _submapping(self, result, T_np, inlier_ratio, n_input, reg_input, timestamp):
        p = self.params
        weights = None
        if n_input > p.submap.point_random_sampling_num:
            weights = self._icp_weights_jit(
                reg_input, self.submap.submap_cloud, self.submap.submap_knn,
                result.T,
            )
        self.submap.add_frame(
            reg_input, T_np, result, inlier_ratio, timestamp, weights
        )

    def get_odometry(self) -> np.ndarray:
        return self.odom.copy()

    def get_state(self) -> State:
        return self.x


def _clamp_norm(v: jax.Array, max_norm: float) -> jax.Array:
    n = jnp.linalg.norm(v)
    return jnp.where(n > max_norm, v * (max_norm / jnp.maximum(n, 1e-30)), v)
