import time, jax, jax.numpy as jnp, numpy as np
from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, compact_device
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.pipeline import *
from sycl_points_tpu.registration.registration import RegistrationParams, RobustParams, align

REF="/root/reference/cpp/data"
src = PointCloud.from_numpy(io.read_file(f"{REF}/source.ply")["points"])
tgt = PointCloud.from_numpy(io.read_file(f"{REF}/target.ply")["points"])
CAP=6144

@jax.jit
def preprocess(c):
    c = box_filter(c, 0.5, 50.0)
    c = voxel_downsample(c, 0.25)
    c = compact_device(c, out_capacity=CAP)
    knn = brute_force_knn(c.points, c.mask, c.points, 10)
    covs = estimate_covariances(c.points, knn)
    return c.replace(covs=covs, normals=extract_normals(c.points, covs))

def t(name, fn, *a, n=20):
    jax.block_until_ready(fn(*a)); jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: med {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}", flush=True)

t("preprocess one cloud", preprocess, src)
s = jax.block_until_ready(preprocess(src)); g = jax.block_until_ready(preprocess(tgt))

params_gn = RegistrationParams(reg_type=RegType.GICP, robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=2.5), optimization_method="gauss_newton", max_iterations=10)
params_lm = RegistrationParams(reg_type=RegType.GICP, robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=2.5), optimization_method="levenberg_marquardt", max_iterations=10)

from sycl_points_tpu.ops.sampling import random_sampling
samp = jax.block_until_ready(random_sampling(s, 1000, jax.random.key(0)))
t("align GN x10 (1000 src)", jax.jit(lambda a,b: align(a,b,BruteForceKNN.build(b),params_gn).T), samp, g)
t("align LM x10 (1000 src)", jax.jit(lambda a,b: align(a,b,BruteForceKNN.build(b),params_lm).T), samp, g)
t("knn k=1 1000x6144", jax.jit(lambda a,b: brute_force_knn(b.points, b.mask, a.points, 1)), samp, g)
t("self-knn k=10 6144", jax.jit(lambda c: brute_force_knn(c.points, c.mask, c.points, 10)), s)
t("cov 6144", jax.jit(lambda c, k: estimate_covariances(c.points, k)), s, brute_force_knn(s.points, s.mask, s.points, 10))
t("normals 6144", jax.jit(lambda c, k: extract_normals(c.points, estimate_covariances(c.points, k))), s, brute_force_knn(s.points, s.mask, s.points, 10))
t("voxel+compact", jax.jit(lambda c: compact_device(voxel_downsample(box_filter(c, 0.5, 50.0), 0.25), out_capacity=CAP)), src)
