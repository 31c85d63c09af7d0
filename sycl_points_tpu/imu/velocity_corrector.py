"""ICP-corrected end-of-window velocity for IMU window resets.

Replaces ``algorithms/imu/imu_velocity_corrector.hpp`` of
fateshelled/sycl_points: back-solve the window-start velocity from the ICP
displacement and propagate it to the window end via the preintegrated IMU
dynamics (snapshot/return protocol):

  v_start = (disp_icp - 0.5 g dt^2 - R dP) / dt
  v_end   = v_start + g dt + R dV
"""

from __future__ import annotations

import numpy as np


class IMUVelocityCorrector:
    def __init__(self):
        self._snap_dv = np.zeros(3, np.float32)
        self._snap_dp = np.zeros(3, np.float32)
        self._snap_dt = 0.0
        self._snap_valid = False
        self._corrected_v = np.zeros(3, np.float32)
        self._corrected_valid = False

    def get_reset_velocity(self, preintegration, gyro_bias, accel_bias, fallback_v_world):
        """Velocity for the next window reset; snapshots the current
        preintegration state (imu_velocity_corrector.hpp:42-59)."""
        v_reset = self._corrected_v if self._corrected_valid else np.asarray(fallback_v_world, np.float32)
        self._corrected_valid = False
        snap = preintegration.get_corrected(gyro_bias, accel_bias)
        self._snap_dv = np.asarray(snap.Delta_v)
        self._snap_dp = np.asarray(snap.Delta_p)
        self._snap_dt = float(snap.dt_total)
        self._snap_valid = True
        return v_reset

    def update(self, disp_icp, R_world_imu, gravity):
        """Store the ICP-corrected end-of-window velocity
        (imu_velocity_corrector.hpp:62-76)."""
        if not self._snap_valid or self._snap_dt <= 0.0:
            return
        dt = self._snap_dt
        g = np.asarray(gravity, np.float32)
        R = np.asarray(R_world_imu, np.float32)
        v_start = (np.asarray(disp_icp, np.float32) - 0.5 * g * dt * dt - R @ self._snap_dp) / dt
        self._corrected_v = v_start + g * dt + R @ self._snap_dv
        self._corrected_valid = True
        self._snap_valid = False
