import time, numpy as np, jax, jax.numpy as jnp
from bcalm_tpu.utils.jaxcache import enable_cache
enable_cache()

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))

def timeit(f, *args, reps=3):
    out = f(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = f(*args); _sync(out); ts.append(time.time()-t0)
    return min(ts)

M = 4*1024*1024
rng = np.random.RandomState(0)
perm = jnp.asarray(rng.permutation(M).astype(np.int32))  # index table
idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))

def chain1d(n):
    def f(p, i):
        for _ in range(n):
            i = jnp.take(p, i, axis=0)
        return i
    return jax.jit(f)

t1 = timeit(chain1d(1), perm, idx)
t5 = timeit(chain1d(5), perm, idx)
per = (t5 - t1) / 4
print(f"1d chained: n=1 {t1*1e3:.1f}ms, n=5 {t5*1e3:.1f}ms -> {per*1e3:.1f}ms/gather ({M/per/1e6:.0f}M idx/s)", flush=True)

# transposed (4, M) row of 4 channels, chained via channel 0
t4T = jnp.stack([perm, perm, perm, perm], axis=0)
def chainT(n):
    def f(p, i):
        for _ in range(n):
            r = jnp.take(p, i, axis=1)  # (4, M)
            i = r[0]
        return i
    return jax.jit(f)
t1b = timeit(chainT(1), t4T, idx)
t5b = timeit(chainT(5), t4T, idx)
per = (t5b - t1b) / 4
print(f"(4,M) axis1 chained: n=1 {t1b*1e3:.1f}ms, n=5 {t5b*1e3:.1f}ms -> {per*1e3:.1f}ms/gather", flush=True)

# row-major (M,4) chained
t4 = jnp.stack([perm, perm, perm, perm], axis=1)
def chainR(n):
    def f(p, i):
        for _ in range(n):
            r = jnp.take(p, i, axis=0)  # (M, 4)
            i = r[:, 0]
        return i
    return jax.jit(f)
t1c = timeit(chainR(1), t4, idx)
t5c = timeit(chainR(5), t4, idx)
per = (t5c - t1c) / 4
print(f"(M,4) axis0 chained: n=1 {t1c*1e3:.1f}ms, n=5 {t5c*1e3:.1f}ms -> {per*1e3:.1f}ms/gather", flush=True)

# scatter chained
def chainS(n):
    def f(p, i):
        v = i
        for _ in range(n):
            v = jnp.zeros((M,), jnp.int32).at[p].set(v)
        return v
    return jax.jit(f)
t1d = timeit(chainS(1), perm, idx)
t5d = timeit(chainS(5), perm, idx)
print(f"scatter chained: -> {(t5d-t1d)/4*1e3:.1f}ms/scatter", flush=True)
