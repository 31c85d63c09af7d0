import time, jax, jax.numpy as jnp, numpy as np
def t(name, fn, *a, n=20):
    jax.block_until_ready(fn(*a)); jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: med {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}", flush=True)

q = jnp.ones((1000,3)); tp = jnp.ones((6144,3)); tm = jnp.ones((6144,),bool)

def pairwise(q, t):
    qq = jnp.sum(q*q, -1, keepdims=True)
    tt = jnp.sum(t*t, -1)
    cross = jnp.dot(q, t.T, precision="highest", preferred_element_type=jnp.float32)
    return jnp.maximum(qq + tt[None,:] - 2*cross, 0.0)

t("pairwise 1000x6144 f32-highest", jax.jit(pairwise), q, tp)
t("pairwise default prec", jax.jit(lambda a,b: jnp.maximum(jnp.sum(a*a,-1,keepdims=True)+jnp.sum(b*b,-1)[None,:]-2*jnp.dot(a,b.T),0)), q, tp)
t("argmin over 6144", jax.jit(lambda a,b: jnp.argmin(pairwise(a,b), axis=1)), q, tp)

def knn1_scan(q, tp, tm):
    tch = tp.reshape(2, 3072, 3); mch = tm.reshape(2, 3072)
    def body(carry, inp):
        bd, bi = carry
        tc, mc, base = inp
        d2 = pairwise(q, tc)
        d2 = jnp.where(mc[None,:], d2, jnp.inf)
        cd = jnp.min(d2, axis=1); ci = jnp.argmin(d2, axis=1).astype(jnp.int32)+base
        take = cd < bd
        return (jnp.where(take, cd, bd), jnp.where(take, ci, bi)), None
    init = (jnp.full((1000,), jnp.inf), jnp.zeros((1000,), jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, (tch, mch, jnp.asarray([0, 3072], jnp.int32)))
    return bd, bi
t("knn1 via scan 2 chunks", jax.jit(knn1_scan), q, tp, tm)

def knn1_flat(q, tp, tm):
    d2 = pairwise(q, tp)
    d2 = jnp.where(tm[None,:], d2, jnp.inf)
    return jnp.min(d2,axis=1), jnp.argmin(d2,axis=1)
t("knn1 flat no scan", jax.jit(knn1_flat), q, tp, tm)

t("where inf mask", jax.jit(lambda a, m: jnp.where(m[None,:], pairwise(a, tp), jnp.inf).min(1)), q, tm)
