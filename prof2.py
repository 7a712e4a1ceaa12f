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
idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
t4 = jnp.asarray(rng.randint(0, 2**31, size=(M,4)).astype(np.int32))
tiny = jnp.ones((8,), jnp.float32)

f0 = jax.jit(lambda x: x + 1)
print("tiny add:", round(timeit(f0, tiny)*1e3, 2), "ms", flush=True)

def chain(n):
    def f(t, i):
        for j in range(n):
            t = jnp.take(t, (i + j) % M, axis=0)
        return t
    return jax.jit(f)

for n in [1, 4]:
    dt = timeit(chain(n), t4, idx)
    print(f"chained {n} gathers: {dt*1e3:.1f}ms -> per-gather {(dt)*1e3/n:.1f}ms", flush=True)
