import time, jax, jax.numpy as jnp, numpy as np
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud

def t(name, fn, *a, n=20):
    jax.block_until_ready(fn(*a)); jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: med {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}", flush=True)

x = jnp.ones((70912, 3))
t("sum fresh ones", jax.jit(lambda a: a.sum()), x)

src = PointCloud.from_numpy(io.read_file("/root/reference/cpp/data/source.ply")["points"])
t("sum cloud.points", jax.jit(lambda a: a.sum()), src.points)
t("sum cloud pytree", jax.jit(lambda c: c.points.sum()), src)
y = jax.jit(lambda a: a*2.0)(x)
t("sum of jit output", jax.jit(lambda a: a.sum()), y)
t("two-op chain", jax.jit(lambda a: (a*2).sum()), x)
big = jnp.ones((1024, 1024))
t("matmul 1024", jax.jit(lambda a: a@a), big)
t("sort 70k", jax.jit(lambda a: jnp.sort(a[:,0])), x)
t("argsort 70k", jax.jit(lambda a: jnp.argsort(a[:,0])), x)
t("lexsort 3key int", jax.jit(lambda a: jnp.lexsort((a[:,2].astype(jnp.int32), a[:,1].astype(jnp.int32), a[:,0].astype(jnp.int32)))), x)
t("top_k 1000x4106 k10", jax.jit(lambda a: jax.lax.top_k(a, 10)), jnp.ones((1000, 4106)))
t("segment_sum", jax.jit(lambda a: jax.ops.segment_sum(a, jnp.zeros(70912, jnp.int32), num_segments=70912)), x)
t("while_loop 30 trivial", jax.jit(lambda a: jax.lax.while_loop(lambda s: s[0]<30, lambda s: (s[0]+1, s[1]*1.0001), (0, a))[1]), x)
