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
