"""Multi-chip sharding dry run on the 8-device virtual CPU mesh."""

import numpy as np

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    T, err, inlier = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(T)))
    assert int(inlier) > 100
    # recovered the synthetic shift
    np.testing.assert_allclose(np.asarray(T)[:3, 3], [0.2, -0.1, 0.05], atol=0.02)


def test_sharded_matches_single_device():
    from sycl_points_tpu.ops.knn import BruteForceKNN
    from sycl_points_tpu.parallel.sharded import make_mesh, sharded_align
    from sycl_points_tpu.registration.registration import RegistrationParams, align
    import __graft_entry__ as ge

    source, target = ge._make_pair(n_src=512, n_tgt=768)
    params = RegistrationParams(max_iterations=5)
    ref = align(source, target, BruteForceKNN.build(target), params)
    mesh = make_mesh(8)
    got = sharded_align(mesh, source, target, params)
    np.testing.assert_allclose(np.asarray(got.T), np.asarray(ref.T), atol=1e-4)
    assert int(got.inlier) == int(ref.inlier)


def test_align_pairs_batched_matches_sequential():
    from sycl_points_tpu.parallel.sharded import (
        align_pairs_batched, make_mesh, stack_clouds,
    )
    from sycl_points_tpu.ops.knn import BruteForceKNN
    from sycl_points_tpu.points.point_cloud import PointCloud
    from sycl_points_tpu.registration.factors import RegType
    from sycl_points_tpu.registration.registration import RegistrationParams, align

    rng = np.random.default_rng(5)
    pairs = []
    for b in range(8):
        tgt_pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.08 + 0.01 * b, -0.05, 0.02]
        src_pts = (tgt_pts - T[:3, 3]).astype(np.float32)
        pairs.append((
            PointCloud.from_numpy(src_pts, capacity=256),
            PointCloud.from_numpy(tgt_pts, capacity=256),
        ))

    params = RegistrationParams(
        reg_type=RegType.POINT_TO_POINT,
        optimization_method="gauss_newton",
        max_iterations=15,
    )
    mesh = make_mesh(8)
    srcs = stack_clouds([p[0] for p in pairs])
    tgts = stack_clouds([p[1] for p in pairs])
    batched = align_pairs_batched(mesh, srcs, tgts, params)

    for b, (s, t) in enumerate(pairs):
        ref = align(s, t, BruteForceKNN.build(t), params)
        np.testing.assert_allclose(
            np.asarray(batched.T)[b], np.asarray(ref.T), atol=5e-3
        )
