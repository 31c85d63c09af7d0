import sys, time, jax, jax.numpy as jnp, numpy as np
from bench import preprocess, REF_DATA
from sycl_points_tpu.ops.knn import BruteForceKNN
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.pipeline import align_pipeline, RegistrationPipelineParams, RandomSamplingParams, RobustScheduleParams
from sycl_points_tpu.registration.registration import RegistrationParams, RobustParams
src_np = io.read_file(f"{REF_DATA}/source.ply"); tgt_np = io.read_file(f"{REF_DATA}/target.ply")
rc = pad_capacity_for(max(len(src_np["points"]), len(tgt_np["points"])))
src = PointCloud.from_numpy(src_np["points"], capacity=rc)
tgt = PointCloud.from_numpy(tgt_np["points"], capacity=rc)

def marginal(name, pp, mode="full"):
    def make_rep(n):
        @jax.jit
        def f(a, b, key):
            def body(i, carry):
                jitter, acc = carry
                a2 = a.replace(points=a.points + jitter)
                s = preprocess(a2, 6144)
                g = preprocess(b, 6144)
                if mode == "pre_only":
                    val = s.points.sum() + g.points.sum()
                else:
                    val = align_pipeline(s, g, BruteForceKNN.build(g), pp, key=jax.random.fold_in(key, i)).result.error
                return (val * 0e-9, acc + val)
            return jax.lax.fori_loop(0, n, body, (jnp.float32(0), jnp.float32(0)))[1]
        return f
    def tsync(fn, *a, iters=5):
        jax.device_get(fn(*a))
        ts=[]
        for i in range(iters):
            t0=time.perf_counter(); jax.device_get(fn(*a)); ts.append(time.perf_counter()-t0)
        return float(np.median(ts))
    k = jax.random.key(0)
    t1 = tsync(make_rep(1), src, tgt, k)
    t9 = tsync(make_rep(9), src, tgt, k)
    print(f"{name}: marginal {(t9-t1)/8*1e3:.2f} ms", flush=True)

def mkpp(method, iters):
    return RegistrationPipelineParams(
        registration=RegistrationParams(reg_type=RegType.GICP, robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE), optimization_method=method, max_iterations=iters),
        random_sampling=RandomSamplingParams(enable=True, num=1000),
        robust=RobustScheduleParams(auto_scale=True, init_scale=10.0, min_scale=2.5, rotation_init_scale=5.0, rotation_min_scale=2.5, auto_scaling_iter=3))

which = sys.argv[1]
if which == "pre": marginal("pre only", None, mode="pre_only")
elif which == "gn": marginal("GN x10 3lv", mkpp("gauss_newton", 10))
elif which == "lm": marginal("LM x10 3lv", mkpp("levenberg_marquardt", 10))
