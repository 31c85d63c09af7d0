import time, jax, jax.numpy as jnp, numpy as np
f = jax.jit(lambda a: (a*2).sum())
x = jnp.ones((1024,))
jax.block_until_ready(f(x))
series = []
for i in range(200):
    t0=time.perf_counter(); jax.block_until_ready(f(x)); series.append((time.perf_counter()-t0)*1e3)
s = np.array(series)
print("first 30:", np.round(s[:30],2))
print("fast count:", (s<1).sum(), "slow count:", (s>10).sum(), "median:", np.median(s))
# again after a pause
time.sleep(3)
series=[]
for i in range(50):
    t0=time.perf_counter(); jax.block_until_ready(f(x)); series.append((time.perf_counter()-t0)*1e3)
s = np.array(series)
print("after sleep first 20:", np.round(s[:20],2))
