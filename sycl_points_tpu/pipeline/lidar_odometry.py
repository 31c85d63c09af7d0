"""LiDAR-only odometry pipeline.

Replaces ``pipeline/lidar_odometry.hpp:27-622`` of fateshelled/sycl_points:
per-frame state machine (initial-alignment handshake, preprocess,
covariances, refine, first-frame bootstrap, IMU window integration, motion
prediction, MAP-prior registration, submapping, velocity/odometry update),
per-stage wall-clock timing, and the frame ResultType codes.

Host orchestration around jitted device stages; all hot compute (prefilter,
covariances, the whole robust-annealed ICP loop, map insertion/extraction)
runs as cached XLA executables.
"""

from __future__ import annotations

import enum
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.deskew.constant_velocity import deskew_constant_velocity
from sycl_points_tpu.imu.initial_alignment import InitialAlignmentEstimator
from sycl_points_tpu.imu.preintegration import (
    IMUMeasurement,
    IMUPreintegration,
    build_measurement_window,
)
from sycl_points_tpu.imu.velocity_corrector import IMUVelocityCorrector
from sycl_points_tpu.pipeline.motion_predictor import MotionPredictor
from sycl_points_tpu.pipeline.params import LidarOdometryParams
from sycl_points_tpu.pipeline.pc_processor import PCProcessor
from sycl_points_tpu.pipeline.submap import Submap
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.map_prior import MapPriorParams, inactive_prior, update as map_prior_update
from sycl_points_tpu.registration.pipeline import align_pipeline, inlier_ratio
from sycl_points_tpu.registration.registration import compute_icp_robust_weights
from sycl_points_tpu.utils import lie_np


class ResultType(enum.Enum):
    success = "success"
    first_frame = "first_frame"
    waiting_initial_alignment = "waiting_initial_alignment"
    error = "error"
    old_timestamp = "old_timestamp"
    small_number_of_points = "small_number_of_points"


class LidarOdometry:
    def __init__(self, params: LidarOdometryParams = LidarOdometryParams(),
                 map_prior_params: MapPriorParams = MapPriorParams()):
        self.params = params
        self.map_prior_params = map_prior_params
        self.pc_processor = PCProcessor(params)
        self.submap = Submap(params)
        self.motion_predictor = MotionPredictor(params.motion_prediction)
        self.pipeline_params = params.make_registration_pipeline_params()
        # Jitted ONCE (params bound as a closure constant): calling
        # align_pipeline eagerly would retrace + recompile its align
        # while_loop every frame (~15 s/frame measured on the replay bench).
        self._align_pipeline_jit = jax.jit(
            lambda source, target, target_knn, **kw: align_pipeline(
                source, target, target_knn, self.pipeline_params, **kw
            )
        )
        self._icp_weights_jit = jax.jit(
            lambda src, tgt, knn, pose, scale: compute_icp_robust_weights(
                src, tgt, knn, pose, self.params.registration.factor, scale
            )
        )
        self._deskew_jit = jax.jit(deskew_constant_velocity)
        # One fused post-registration readback: every device->host sync costs
        # a full link round trip (~30 ms on the axon tunnel), so the pose,
        # inlier count and cloud counts travel in a single fetch.
        self._frame_stats_jit = jax.jit(
            lambda T, inlier, deskewed, reg_input: jnp.concatenate(
                [
                    T.ravel(),
                    jnp.stack(
                        [
                            inlier.astype(jnp.float32),
                            deskewed.count().astype(jnp.float32),
                            reg_input.count().astype(jnp.float32),
                        ]
                    ),
                ]
            )
        )

        self.odom = params.pose.initial_matrix()
        self.prev_odom = self.odom.copy()
        self.linear_velocity = np.zeros(3, np.float32)
        self.angular_velocity = np.zeros(3, np.float32)
        self.dt = 0.1
        self.last_frame_time = -1.0
        self.is_first_frame = True
        self.registrated = False
        self.reg_result = None
        self.preprocessed: Optional[PointCloud] = None
        self.error_message = ""
        self.processing_times: Dict[str, float] = defaultdict(float)
        self.frame_count = 0

        # IMU machinery
        self.imu_buffer: deque = deque()
        self.imu_bias_gyro = np.asarray(params.imu.gyro_bias, np.float32)
        self.imu_bias_accel = np.asarray(params.imu.accel_bias, np.float32)
        self.imu_preintegration = (
            IMUPreintegration(params.imu.preintegration) if params.imu.enable else None
        )
        self.imu_velocity_corrector = IMUVelocityCorrector()
        self.imu_R_world_at_reset = np.eye(3, dtype=np.float32)
        self.imu_v_world_at_reset = np.zeros(3, np.float32)
        self.last_imu_reset_timestamp = -1.0
        self.imu_window_complete = False
        self.alignment_estimator = (
            InitialAlignmentEstimator(
                params.imu.initial_alignment,
                np.asarray(params.imu.preintegration.gravity, np.float32),
                params.imu.T_imu_to_lidar_matrix(),
            )
            if params.imu.enable and params.imu.initial_alignment.enable
            else None
        )
        self._map_prior_state = inactive_prior()

        self._scan_start_time_sec = 0.0
        self._scan_duration_sec = 0.0

    # -- IMU input (lidar_odometry.hpp:85-113) -------------------------------
    def add_imu_measurement(self, meas: IMUMeasurement):
        self.imu_buffer.append(meas)
        horizon = meas.timestamp - self.params.imu.buffer_duration_sec
        while self.imu_buffer and self.imu_buffer[0].timestamp < horizon:
            self.imu_buffer.popleft()

    # -- frame processing ----------------------------------------------------
    def process(
        self,
        scan: PointCloud,
        timestamp: float,
        scan_duration_sec: float = 0.1,
    ) -> ResultType:
        self.error_message = ""
        p = self.params

        # initial alignment handshake (lidar_odometry.hpp:121-129)
        if (
            self.is_first_frame
            and self.alignment_estimator is not None
            and self.alignment_estimator.enabled()
            and not self.alignment_estimator.is_done()
        ):
            ok, R_gl, gyro_bias, diag = self.alignment_estimator.try_align(
                timestamp, list(self.imu_buffer), self.imu_bias_gyro, self.imu_bias_accel
            )
            if not ok:
                self.error_message = f"initial_alignment: {diag.error_message}"
                return ResultType.waiting_initial_alignment
            # apply: gravity-aligned rotation + gyro bias (hpp:480-494)
            user_R = self.odom[:3, :3]
            yaw = float(np.arctan2(user_R[1, 0], user_R[0, 0]))
            cz, sz = np.cos(yaw), np.sin(yaw)
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
            self.odom[:3, :3] = Rz @ R_gl
            self.prev_odom = self.odom.copy()
            self.imu_bias_gyro = gyro_bias

        if self.last_frame_time > 0.0:
            dt = timestamp - self.last_frame_time
            if dt > 0.0:
                self.dt = float(dt)
            else:
                self.error_message = "old timestamp"
                return ResultType.old_timestamp

        self._scan_start_time_sec = timestamp
        self._scan_duration_sec = scan_duration_sec
        self.processing_times.clear()

        # preprocess (hpp:496-502)
        t0 = time.perf_counter()
        cloud = scan
        if self._imu_deskew_enabled():
            cloud, _status = self.pc_processor.deskew_with_imu(
                cloud, list(self.imu_buffer), self.odom,
                self._scan_start_time_sec, self._scan_duration_sec,
                self.imu_bias_gyro, self.imu_bias_accel,
            )
        pre = self.pc_processor.prefilter(cloud)

        # covariances (hpp:508-522)
        ctx = None
        if self._needs_covariances():
            ctx = self.pc_processor.prepare_context(pre)
            pre = self.pc_processor.compute_covariances(pre, ctx)

        # refine filter
        if ctx is not None:
            pre = self.pc_processor.refine_filter(pre, ctx)
        self.preprocessed = pre
        self.processing_times["1. preprocessing"] += time.perf_counter() - t0

        if int(pre.count()) <= p.registration.min_num_points:
            self.error_message = "point cloud size is too small"
            return ResultType.small_number_of_points

        if self.is_first_frame:
            t0 = time.perf_counter()
            self.submap.add_first_frame(pre, timestamp, self.odom)
            self.processing_times["4. build submap"] += time.perf_counter() - t0
            self.is_first_frame = False
            self.last_frame_time = timestamp
            if self.imu_preintegration is not None:
                T_il = p.imu.T_imu_to_lidar_matrix()
                self.imu_R_world_at_reset = self.odom[:3, :3] @ T_il[:3, :3]
                self.imu_v_world_at_reset = np.zeros(3, np.float32)
                self.imu_preintegration.reset(
                    self.imu_bias_gyro, self.imu_bias_accel,
                    R_world_body=self.imu_R_world_at_reset,
                )
                self.last_imu_reset_timestamp = timestamp
            return ResultType.first_frame

        # IMU window integration (hpp:222-238)
        if self.imu_preintegration is not None:
            window = build_measurement_window(
                list(self.imu_buffer), self.last_imu_reset_timestamp, timestamp
            )
            tol = 1e-6
            self.imu_window_complete = (
                len(window) >= 2
                and abs(window[0].timestamp - self.last_imu_reset_timestamp) <= tol
                and abs(window[-1].timestamp - timestamp) <= tol
            )
            self.imu_preintegration.integrate_batch(window)

        # registration (hpp:544-597)
        t0 = time.perf_counter()
        result, reg_input, deskewed = self._registration()
        self.reg_result = result
        self.last_imu_reset_timestamp = timestamp
        self.processing_times["3. registration"] += time.perf_counter() - t0

        # submapping (hpp:599-621)
        t0 = time.perf_counter()
        stats = np.asarray(
            self._frame_stats_jit(result.T, result.inlier, deskewed, reg_input)
        )
        T_np = stats[:16].reshape(4, 4).astype(np.float32)
        n_inlier, n_deskewed, n_reg_input = stats[16], stats[17], stats[18]
        self._submapping(
            result, T_np, int(n_deskewed), float(n_inlier) / max(int(n_reg_input), 1),
            deskewed, timestamp,
        )
        self.processing_times["4. build submap"] += time.perf_counter() - t0

        # full-resolution CV deskew for publishing (hpp:272-277)
        if self.pipeline_params.velocity_update.enable and not self._imu_deskew_enabled():
            if self.preprocessed.timestamp_offsets is not None:
                self.preprocessed = self._deskew_jit(
                    self.preprocessed,
                    jnp.asarray(self.odom), jnp.asarray(result.T), jnp.float32(self.dt),
                )

        # velocity/odometry update (hpp:280-296)
        self.prev_odom = self.odom.copy()
        self.odom = T_np.copy()  # already fetched in the fused frame-stats sync
        self.last_frame_time = timestamp
        delta = np.linalg.inv(self.prev_odom) @ self.odom
        tw = lie_np.se3_log(delta)
        self.linear_velocity = (delta[:3, 3] / self.dt).astype(np.float32)
        self.angular_velocity = (tw[:3] / self.dt).astype(np.float32)

        if (
            self.imu_preintegration is not None
            and p.motion_prediction.mode.upper() == "IMU_SE3"
        ):
            T_il = p.imu.T_imu_to_lidar_matrix()
            R_world_imu_prev = self.prev_odom[:3, :3] @ T_il[:3, :3]
            self.imu_velocity_corrector.update(
                self.odom[:3, 3] - self.prev_odom[:3, 3],
                R_world_imu_prev,
                np.asarray(p.imu.preintegration.gravity, np.float32),
            )

        self.registrated = True
        self.frame_count += 1
        return ResultType.success

    # ------------------------------------------------------------------
    def _imu_deskew_enabled(self) -> bool:
        return self.params.imu.enable and self.params.imu.deskew.enable

    def _needs_covariances(self) -> bool:
        from sycl_points_tpu.registration.factors import RegType

        p = self.params
        return (
            p.registration.factor.reg_type is RegType.GICP
            or p.registration.factor.rotation_constraint.enable
            or p.scan.preprocess.angle_incidence_filter.enable
            or p.scan.intensity_gaussian.enable
            or p.scan.intensity_local_mean_norm.enable
        )

    def _imu_motion_prediction(self) -> np.ndarray:
        """hpp:525-542: absolute pose prediction from preintegration."""
        T_imu_rel = np.asarray(
            self.imu_preintegration.predict_relative_transform(
                self.imu_R_world_at_reset, self.imu_v_world_at_reset,
                self.imu_bias_gyro, self.imu_bias_accel,
            )
        )
        T_il = self.params.imu.T_imu_to_lidar_matrix()
        T_lidar_rel = T_il @ T_imu_rel @ np.linalg.inv(T_il)
        return (self.odom @ T_lidar_rel).astype(np.float32)

    def _registration(self):
        p = self.params
        mode = p.motion_prediction.mode.upper()
        has_imu_pred = (
            self.imu_preintegration is not None
            and self.imu_window_complete
            and self.imu_preintegration.get_dt_total() > 0.0
        )
        gyro_delta = None
        imu_pose = None
        if has_imu_pred:
            delta_R_imu = np.asarray(
                self.imu_preintegration.get_corrected(self.imu_bias_gyro, self.imu_bias_accel).Delta_R
            )
            R_il = p.imu.T_imu_to_lidar_matrix()[:3, :3]
            gyro_delta = R_il @ delta_R_imu @ R_il.T
            if mode == "IMU_SE3":
                imu_pose = self._imu_motion_prediction()

        H_raw = None if self.reg_result is None else np.asarray(self.reg_result.H_raw)
        inl = 0 if self.reg_result is None else int(self.reg_result.inlier)
        init_T = self.motion_predictor.predict(
            self.linear_velocity, self.angular_velocity, self.odom, self.dt,
            H_raw, inl, self.registrated, gyro_delta, imu_pose,
        )

        v_reset = np.zeros(3, np.float32)
        if self.imu_preintegration is not None and mode == "IMU_SE3":
            v_reset = self.imu_velocity_corrector.get_reset_velocity(
                self.imu_preintegration, self.imu_bias_gyro, self.imu_bias_accel,
                self.prev_odom[:3, :3] @ self.linear_velocity,
            )

        # MAP prior from the previous frame's raw Hessian (hpp:573-576)
        if self.registrated and self.map_prior_params.enabled:
            self._map_prior_state = map_prior_update(
                self.map_prior_params,
                jnp.asarray(self.reg_result.T), jnp.asarray(self.reg_result.H_raw),
                jnp.asarray(self.reg_result.error_raw), jnp.asarray(self.reg_result.inlier),
                jnp.asarray(init_T),
            )
        else:
            self._map_prior_state = inactive_prior()

        out = self._align_pipeline_jit(
            self.preprocessed,
            self.submap.submap_cloud,
            self.submap.submap_knn,
            initial_guess=jnp.asarray(init_T),
            prev_pose=jnp.asarray(self.odom),
            dt=jnp.float32(self.dt),
            map_prior=self._map_prior_state if self.map_prior_params.enabled else None,
        )
        result = out.result

        if self.imu_preintegration is not None:
            T_il = p.imu.T_imu_to_lidar_matrix()
            self.imu_R_world_at_reset = np.asarray(result.T)[:3, :3] @ T_il[:3, :3]
            self.imu_v_world_at_reset = v_reset
            self.imu_preintegration.reset(
                self.imu_bias_gyro, self.imu_bias_accel,
                R_world_body=self.imu_R_world_at_reset,
            )
        return result, out.registration_input, out.deskewed

    def _submapping(self, result, T_np, n_deskewed, inlier_ratio, deskewed, timestamp):
        """hpp:599-621: robust-weighted submap sampling + insertion.  All
        scalar decisions use the pre-fetched frame stats (one link sync)."""
        p = self.params
        weights = None
        if n_deskewed > p.submap.point_random_sampling_num:
            robust_scale = (
                self.pipeline_params.robust.min_scale
                if self.pipeline_params.robust.auto_scale
                else p.registration.factor.robust.default_scale
            )
            weights = self._icp_weights_jit(
                deskewed, self.submap.submap_cloud, self.submap.submap_knn,
                jnp.asarray(T_np), jnp.float32(robust_scale),
            )
        self.submap.add_frame(
            deskewed, T_np, result, inlier_ratio, timestamp, weights
        )

    # -- accessors -----------------------------------------------------------
    def get_odometry(self) -> np.ndarray:
        return self.odom.copy()

    def get_keyframe_poses(self):
        return list(self.submap.keyframe_poses)

    def get_processing_times(self) -> Dict[str, float]:
        return dict(self.processing_times)
