"""Is the 65M idx/s gather rate real, or an artifact of process state?"""
import time

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), max(ts), out


M = 2 ** 21
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
rows4 = jnp.asarray(rng.randint(0, 2 ** 31, size=(M, 4)).astype(np.int32))
f4 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

tmin, tmax, out1 = timeit(f4, rows4, idx)
print(f"fresh process gather rows4: min {tmin*1e3:.2f}ms max {tmax*1e3:.2f}ms")
# sanity: verify values correct
chk = np.asarray(out1[:8])
expect = np.asarray(rows4)[np.asarray(idx)[:8]]
print("correct:", np.array_equal(chk, expect))

# big intermediate: run one sizable sort (like counting does)
big = jnp.asarray(rng.randint(0, 2 ** 31, size=(2, 2 ** 23)).astype(np.uint32))
s = jax.jit(lambda a: jax.lax.sort([a[0], a[1]], num_keys=2))
jax.block_until_ready(s(big))
tmin, tmax, _ = timeit(f4, rows4, idx)
print(f"after big sort gather rows4: min {tmin*1e3:.2f}ms max {tmax*1e3:.2f}ms")

# gather straight after creating new arrays
idx2 = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
rows4b = jnp.asarray(rng.randint(0, 2 ** 31, size=(M, 4)).astype(np.int32))
tmin, tmax, _ = timeit(f4, rows4b, idx2)
print(f"new arrays gather rows4: min {tmin*1e3:.2f}ms max {tmax*1e3:.2f}ms")

# chained gathers (dependency chain, like the loop): 21 sequential
def chain21(t, i):
    def body(c, _):
        cur = c
        nxt = jnp.take(t, cur[:, 0] % M, axis=0) + cur
        return nxt, ()
    out, _ = jax.lax.scan(body, t * 0 + jnp.take(t, i, axis=0), None, length=21)
    return out

tmin, tmax, _ = timeit(jax.jit(chain21), rows4, idx)
print(f"21 chained gathers: min {tmin*1e3:.2f}ms max {tmax*1e3:.2f}ms "
      f"-> {tmin/21*1e3:.2f}ms/gather")
