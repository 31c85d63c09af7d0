"""IMU-based motion-distortion compensation (SE(3) deskew).

Replaces ``algorithms/deskew/imu_deskew.hpp`` of fateshelled/sycl_points:
the buffered IMU window is integrated into a relative-pose trajectory
(gravity + initial-velocity compensated exactly like
``predict_relative_transform``), converted into the LiDAR frame via the
extrinsic similarity transform, and every point is corrected by the
slerp/lerp-interpolated pose at its timestamp (imu_deskew.hpp:330-411).

TPU-native split:
  * host: buffer filtering, coverage checks, scan-start boundary sample
    (imu_deskew.hpp:160-215);
  * device (jittable): one ``lax.scan`` trajectory integration
    (:mod:`..imu.preintegration`) + one batched searchsorted/slerp/apply
    pass over the cloud — no per-point binary-search kernel.
"""

from __future__ import annotations

import enum
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.imu import preintegration as pre
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.smallmat import matvec3, rotate_mat3


class IMUDeskewStatus(enum.Enum):
    success = "success"
    insufficient_imu_coverage = "insufficient_imu_coverage"
    no_timestamps = "no_timestamps"
    invalid_scan_duration = "invalid_scan_duration"
    empty_cloud = "empty_cloud"


_MARGIN_SEC = 0.05  # 50 ms window margin (imu_deskew.hpp:161)


def _quat_slerp(q0: jax.Array, q1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Batched slerp via so3 log/exp (imu_deskew.hpp:55-80)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    delta = lie.quat_mul(lie.quat_conj(q0), q1)
    omega = lie.so3_log(delta)
    return lie.quat_mul(q0, lie.so3_exp(omega * alpha[..., None]))


def apply_trajectory(
    cloud: PointCloud,
    traj_q: jax.Array,  # [K, 4] xyzw
    traj_t: jax.Array,  # [K, 3]
    traj_ts: jax.Array,  # [K] seconds from scan start (ascending, ts[0]=0)
) -> PointCloud:
    """Per-point pose interpolation + SE(3) correction (jittable device pass).

    Points with non-finite timestamps pass through unchanged.
    """
    t_sec = cloud.timestamp_offsets * 1e-3
    finite = jnp.isfinite(t_sec)
    t_q = jnp.where(finite, t_sec, 0.0)

    K = traj_ts.shape[0]
    hi = jnp.clip(jnp.searchsorted(traj_ts, t_q, side="right"), 1, K - 1)
    lo = hi - 1
    t_lo = traj_ts[lo]
    t_hi = traj_ts[hi]
    denom = jnp.maximum(t_hi - t_lo, 1e-12)
    alpha = jnp.clip((t_q - t_lo) / denom, 0.0, 1.0)

    q = _quat_slerp(traj_q[lo], traj_q[hi], alpha)
    t = traj_t[lo] + alpha[:, None] * (traj_t[hi] - traj_t[lo])
    R = lie.quat_to_matrix(q)

    new_pts = matvec3(R, cloud.points) + t
    new_pts = jnp.where(finite[:, None], new_pts, cloud.points)

    new_normals = None
    if cloud.normals is not None:
        rn = matvec3(R, cloud.normals)
        new_normals = jnp.where(finite[:, None], rn, cloud.normals)
    new_covs = None
    if cloud.covs is not None:
        rc = rotate_mat3(R, cloud.covs)
        new_covs = jnp.where(finite[:, None, None], rc, cloud.covs)
    return cloud.replace(points=new_pts, normals=new_normals, covs=new_covs)


def deskew_point_cloud_imu(
    cloud: PointCloud,
    imu_buffer: Sequence[pre.IMUMeasurement],
    scan_start_time_sec: float,
    scan_duration_sec: float,
    T_imu_to_lidar: np.ndarray,
    gyro_bias: np.ndarray,
    accel_bias: np.ndarray,
    preintegration_params: pre.IMUPreintegrationParams = pre.IMUPreintegrationParams(),
    R_world_body_i: Optional[np.ndarray] = None,
    v_world_body_i: Optional[np.ndarray] = None,
    gyro_only: bool = False,
):
    """Full IMU deskew (deskew_point_cloud_imu, imu_deskew.hpp:123-419).

    Returns ``(cloud, status)``; the cloud is unchanged unless status is
    ``success``.
    """
    if cloud.timestamp_offsets is None:
        return cloud, IMUDeskewStatus.no_timestamps
    if scan_duration_sec <= 0.0:
        return cloud, IMUDeskewStatus.invalid_scan_duration
    scan_end = scan_start_time_sec + scan_duration_sec

    filtered = [
        m
        for m in imu_buffer
        if scan_start_time_sec - _MARGIN_SEC <= m.timestamp <= scan_end + _MARGIN_SEC
    ]
    if len(filtered) < 2:
        return cloud, IMUDeskewStatus.insufficient_imu_coverage
    if (
        filtered[0].timestamp > scan_start_time_sec + _MARGIN_SEC
        or filtered[-1].timestamp < scan_end - _MARGIN_SEC
    ):
        return cloud, IMUDeskewStatus.insufficient_imu_coverage

    # Virtual boundary sample at exactly scan start (imu_deskew.hpp:182-215).
    ts = np.array([m.timestamp for m in filtered])
    nxt = int(np.searchsorted(ts, scan_start_time_sec, side="left"))
    if nxt == 0:
        m_start = pre.IMUMeasurement(scan_start_time_sec, filtered[0].gyro, filtered[0].accel)
    elif nxt >= len(filtered):
        m_start = pre.IMUMeasurement(scan_start_time_sec, filtered[-1].gyro, filtered[-1].accel)
        nxt = len(filtered)
    else:
        m_start = pre.interpolate_measurement(filtered[nxt - 1], filtered[nxt], scan_start_time_sec)

    window = [m_start] + [m for m in filtered[nxt:] if m.timestamp <= scan_end + _MARGIN_SEC]
    if len(window) < 2:
        return cloud, IMUDeskewStatus.insufficient_imu_coverage
    t_rel = np.array([m.timestamp - scan_start_time_sec for m in window[1:]], np.float32)
    if t_rel[-1] < scan_duration_sec - _MARGIN_SEC:
        return cloud, IMUDeskewStatus.insufficient_imu_coverage

    # Fixed-bucket padding so the device pass compiles once per
    # (params, bucket, cloud shape) — the eager per-frame version paid
    # compile/dispatch overhead EVERY frame on this runtime (measured
    # 1.6 s/frame in the distorted LIO replay).  Padded steps carry dt=0 /
    # valid=False, so the integrator holds state and the padded trajectory
    # tail repeats the final pose; t_rel pads with its last value, which
    # searchsorted resolves to the same pose (exact interpolation).
    dt, w0, w1, a0, a1, valid = pre.padded_steps_from_window(window)
    Sp = len(dt)
    t_rel_p = np.concatenate(
        [t_rel, np.full(Sp - len(t_rel), t_rel[-1], np.float32)]
    )
    R0 = np.eye(3, dtype=np.float32) if R_world_body_i is None else np.asarray(R_world_body_i, np.float32)
    v0 = np.zeros(3, np.float32) if v_world_body_i is None else np.asarray(v_world_body_i, np.float32)

    key = (preintegration_params, bool(gyro_only))
    fn = _DESKEW_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(_make_deskew_device_fn(preintegration_params, bool(gyro_only)))
        _DESKEW_JIT_CACHE[key] = fn
    out = fn(
        cloud, jnp.asarray(dt), jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(valid),
        jnp.asarray(t_rel_p),
        jnp.asarray(gyro_bias, dtype=jnp.float32),
        jnp.asarray(accel_bias, dtype=jnp.float32),
        jnp.asarray(R0), jnp.asarray(v0),
        jnp.asarray(T_imu_to_lidar, jnp.float32),
    )
    return out, IMUDeskewStatus.success


_DESKEW_JIT_CACHE: dict = {}


def _make_deskew_device_fn(params: pre.IMUPreintegrationParams, gyro_only: bool):
    """Device pass of the IMU deskew: trajectory integration + per-point
    correction as ONE jittable program (imu_deskew.hpp:123-419 device side)."""

    def run(cloud, dt, w0, w1, a0, a1, valid, t_rel,
            gyro_bias, accel_bias, R0, v0, T_il):
        _, (dR_seq, dp_seq, dt_seq) = pre.integrate_steps_with_outputs(
            params, pre.init_state(), dt, w0, w1, a0, a1, valid,
            gyro_bias, accel_bias, R0,
        )

        # Gravity + initial-velocity compensation per trajectory sample,
        # exactly as predict_relative_transform (imu_deskew.hpp:248-262).
        g = jnp.asarray(params.gravity, jnp.float32)
        Rt_g = R0.T @ g
        Rt_v = R0.T @ v0
        if gyro_only:
            dp_comp = jnp.zeros_like(dp_seq)
        else:
            dp_comp = (
                dp_seq
                + 0.5 * Rt_g[None, :] * dt_seq[:, None] ** 2
                + Rt_v[None, :] * dt_seq[:, None]
            )

        # IMU-frame relative pose -> LiDAR frame: T_l = T_il @ T_imu @ T_il^-1.
        R_il, t_il = T_il[:3, :3], T_il[:3, 3]
        R_lidar = rotate_mat3(R_il, dR_seq)
        t_lidar = matvec3(R_il, dp_comp) + t_il[None, :] - matvec3(R_lidar, t_il)

        traj_q = jnp.concatenate(
            [jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), lie.matrix_to_quat(R_lidar)]
        )
        traj_t = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), t_lidar])
        traj_ts = jnp.concatenate([jnp.zeros((1,), jnp.float32), t_rel])
        return apply_trajectory(cloud, traj_q, traj_t, traj_ts)

    return run
