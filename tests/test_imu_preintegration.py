"""IMU preintegration vs analytic ground truth (mirrors
tests/test_imu_preintegration.cpp: constant-rate closed forms, bias
correction, window extraction, covariance growth)."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from sycl_points_tpu.imu import preintegration as pre
from sycl_points_tpu.imu.preintegration import (
    IMUMeasurement,
    IMUPreintegration,
    IMUPreintegrationParams,
    build_measurement_window,
)


def make_stream(duration, rate, gyro_fn, accel_fn, t0=100.0):
    ts = np.arange(0.0, duration + 1e-9, 1.0 / rate)
    return [
        IMUMeasurement(
            timestamp=t0 + t,
            gyro=np.asarray(gyro_fn(t), np.float32),
            accel=np.asarray(accel_fn(t), np.float32),
        )
        for t in ts
    ]


def test_constant_rotation():
    w = np.array([0.3, -0.2, 0.5])
    stream = make_stream(1.0, 200, lambda t: w, lambda t: [0, 0, 0])
    p = IMUPreintegration()
    p.integrate_batch(stream)
    st = p.get_raw()
    R_ref = Rotation.from_rotvec(w * 1.0).as_matrix()
    np.testing.assert_allclose(np.asarray(st.Delta_R), R_ref, atol=1e-4)
    assert abs(p.get_dt_total() - 1.0) < 1e-5


def test_constant_acceleration_no_rotation():
    a = np.array([1.0, -0.5, 0.25])
    stream = make_stream(2.0, 200, lambda t: [0, 0, 0], lambda t: a)
    p = IMUPreintegration()
    p.integrate_batch(stream)
    st = p.get_raw()
    np.testing.assert_allclose(np.asarray(st.Delta_v), a * 2.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st.Delta_p), 0.5 * a * 4.0, rtol=1e-3)


def test_gravity_compensated_relative_transform_stationary():
    # stationary IMU measures -g in body frame (z-up world, level pose)
    g = 9.80665
    stream = make_stream(0.5, 200, lambda t: [0, 0, 0], lambda t: [0, 0, g])
    p = IMUPreintegration()
    p.integrate_batch(stream)
    T_rel = np.asarray(p.predict_relative_transform(np.eye(3), np.zeros(3)))
    np.testing.assert_allclose(T_rel[:3, 3], 0.0, atol=5e-3)
    np.testing.assert_allclose(T_rel[:3, :3], np.eye(3), atol=1e-5)


def test_initial_velocity_contribution():
    g = 9.80665
    stream = make_stream(1.0, 100, lambda t: [0, 0, 0], lambda t: [0, 0, g])
    p = IMUPreintegration()
    p.integrate_batch(stream)
    v0 = np.array([2.0, 0.0, 0.0], np.float32)
    T_rel = np.asarray(p.predict_relative_transform(np.eye(3), v0))
    np.testing.assert_allclose(T_rel[:3, 3], [2.0, 0, 0], atol=1e-2)


def test_bias_correction_first_order():
    w = np.array([0.4, 0.1, -0.3])
    a = np.array([0.5, 1.0, -0.2])
    stream = make_stream(1.0, 200, lambda t: w, lambda t: a)
    bias_g = np.array([0.01, -0.02, 0.005], np.float32)
    bias_a = np.array([0.05, 0.0, -0.03], np.float32)

    # integrate at zero linearization bias, then correct to (bias_g, bias_a)
    p = IMUPreintegration()
    p.integrate_batch(stream)
    corrected = p.get_corrected(bias_g, bias_a)

    # oracle: re-integrate with the bias subtracted
    p2 = IMUPreintegration()
    p2.reset(gyro_bias=bias_g, accel_bias=bias_a)
    p2.integrate_batch(stream)
    exact = p2.get_raw()

    np.testing.assert_allclose(
        np.asarray(corrected.Delta_R), np.asarray(exact.Delta_R), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(corrected.Delta_v), np.asarray(exact.Delta_v), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(corrected.Delta_p), np.asarray(exact.Delta_p), atol=5e-3
    )


def test_out_of_order_dropped():
    p = IMUPreintegration()
    m1 = IMUMeasurement(1.0, np.zeros(3), np.zeros(3))
    m2 = IMUMeasurement(1.1, np.zeros(3), np.zeros(3))
    p.integrate(m1)
    p.integrate(m2)
    p.integrate(IMUMeasurement(1.05, np.ones(3), np.ones(3)))  # dropped
    assert p.num_measurements == 2
    assert abs(p.get_dt_total() - 0.1) < 1e-6


def test_covariance_grows_with_noise():
    params = IMUPreintegrationParams(
        gyro_noise_density=1e-3, accel_noise_density=1e-2,
        gyro_bias_rw_density=1e-5, accel_bias_rw_density=1e-4,
    )
    stream = make_stream(1.0, 100, lambda t: [0.1, 0, 0], lambda t: [0, 0, 9.81])
    p = IMUPreintegration(params)
    p.integrate_batch(stream)
    cov = np.asarray(p.get_raw().covariance)
    assert np.all(np.isfinite(cov))
    assert np.trace(cov) > 0.0
    # symmetric
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    # velocity variance grows ~ sigma_a^2 * t
    assert cov[6, 6] > 0.5 * (1e-2) ** 2


def test_zero_noise_zero_cov():
    stream = make_stream(1.0, 100, lambda t: [0.1, 0, 0], lambda t: [0, 0, 9.81])
    p = IMUPreintegration()
    p.integrate_batch(stream)
    np.testing.assert_allclose(np.asarray(p.get_raw().covariance), 0.0)


def test_build_measurement_window_boundaries():
    stream = make_stream(1.0, 10, lambda t: [t, 0, 0], lambda t: [0, 0, t], t0=0.0)
    win = build_measurement_window(stream, 0.25, 0.75)
    assert abs(win[0].timestamp - 0.25) < 1e-9
    assert abs(win[-1].timestamp - 0.75) < 1e-9
    # interpolated gyro at boundaries
    np.testing.assert_allclose(win[0].gyro[0], 0.25, atol=1e-6)
    np.testing.assert_allclose(win[-1].gyro[0], 0.75, atol=1e-6)


def test_predict_absolute_transform():
    g = 9.80665
    a_true = np.array([1.0, 0, 0])
    # accel measures specific force: a_body = a_world - g_world (level pose)
    stream = make_stream(1.0, 200, lambda t: [0, 0, 0], lambda t: a_true + [0, 0, g])
    p = IMUPreintegration()
    p.integrate_batch(stream)
    T0 = np.eye(4, dtype=np.float32)
    Tj = np.asarray(p.predict_transform(T0, np.zeros(3)))
    np.testing.assert_allclose(Tj[:3, 3], 0.5 * a_true, atol=1e-2)


def test_parallel_prefix_matches_sequential_scan():
    """The associative-scan preintegration must reproduce the sequential
    midpoint recurrence (state, all bias Jacobians, covariance, and the
    per-step trajectory outputs) to fp tolerance."""
    import numpy as np
    from sycl_points_tpu.imu.preintegration import (
        IMUPreintegrationParams, init_state,
        integrate_steps_with_outputs,
    )

    rng = np.random.default_rng(11)
    S = 48
    dt = np.full(S, 1.0 / 200, np.float32)
    dt[40:] = 0.0  # padded tail
    valid = dt > 0
    w = rng.normal(scale=0.4, size=(S + 1, 3)).astype(np.float32)
    a = (rng.normal(scale=0.8, size=(S + 1, 3)) + [0, 0, 9.8]).astype(np.float32)
    gb = np.array([0.01, -0.02, 0.005], np.float32)
    ab = np.array([-0.03, 0.01, 0.02], np.float32)
    Rw = np.asarray(jnp.asarray(
        [[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]]))

    params = IMUPreintegrationParams(
        gyro_noise_density=1e-3, accel_noise_density=1e-2,
        gyro_bias_rw_density=1e-5, accel_bias_rw_density=1e-4,
    )
    P0 = rng.normal(scale=1e-3, size=(15, 15)).astype(np.float32)
    P0 = P0 @ P0.T
    args = (jnp.asarray(dt), jnp.asarray(w[:-1]), jnp.asarray(w[1:]),
            jnp.asarray(a[:-1]), jnp.asarray(a[1:]), jnp.asarray(valid),
            jnp.asarray(gb), jnp.asarray(ab), jnp.asarray(Rw, dtype=jnp.float32))

    seq, (R_seq, p_seq, t_seq) = integrate_steps_with_outputs(
        params, init_state(jnp.asarray(P0)), *args, parallel=False)
    par, (R_par, p_par, t_par) = integrate_steps_with_outputs(
        params, init_state(jnp.asarray(P0)), *args, parallel=True)

    for name in seq._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(par, name)), np.asarray(getattr(seq, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(R_par), np.asarray(R_seq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_par), np.asarray(p_seq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_par), np.asarray(t_seq), atol=1e-6)
