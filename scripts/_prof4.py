import time, jax, jax.numpy as jnp, numpy as np
def t(name, fn, *a, n=20):
    jax.block_until_ready(fn(*a)); jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: med {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}", flush=True)

big = jnp.ones((6144, 3))
t("closure-captured big const", jax.jit(lambda a: (a + big.sum())), jnp.ones((8,)))
t("arg instead", jax.jit(lambda a, b: a + b.sum()), jnp.ones((8,)), big)
t("closure-captured small const", jax.jit(lambda a: a + jnp.ones((8,)).sum()), jnp.ones((8,)))
np_big = np.ones((6144,3), np.float32)
t("closure numpy const", jax.jit(lambda a: a + jnp.asarray(np_big).sum()), jnp.ones((8,)))
# inf scalar where
m = jnp.ones((1000,6144),bool); d = jnp.ones((1000,6144))
t("where(m,d,inf) args", jax.jit(lambda mm,dd: jnp.where(mm,dd,jnp.inf).min(1)), m, d)
