"""What poisons the gather rate? Bisect allocation/op effects."""
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
    return min(ts)


M = 2 ** 21
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
rows4 = jnp.asarray(rng.randint(0, 2 ** 31, size=(M, 4)).astype(np.int32))
f4 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

# 1. chained gathers FIRST in a fresh process — is 0.05ms real?
def chain21(t, i):
    def body(c, _):
        nxt = jnp.take(t, c[:, 0] % M, axis=0) + c
        return nxt, ()
    out, _ = jax.lax.scan(body, jnp.take(t, i, axis=0), None, length=21)
    return out

t = timeit(jax.jit(chain21), rows4, idx)
print(f"fresh 21 chained gathers: {t*1e3:.2f}ms -> {t/21*1e3:.2f}ms/gather")
t = timeit(f4, rows4, idx)
print(f"fresh single gather: {t*1e3:.2f}ms")

# 2. allocate big array, FREE it, re-time
big = jnp.asarray(rng.randint(0, 2 ** 31, size=(2, 2 ** 23)).astype(np.uint32))
jax.block_until_ready(big)
t = timeit(f4, rows4, idx)
print(f"after big ALLOC (alive): {t*1e3:.2f}ms")
del big
t = timeit(f4, rows4, idx)
print(f"after big FREED: {t*1e3:.2f}ms")

# 3. run the big sort, free everything, re-time
big = jnp.asarray(rng.randint(0, 2 ** 31, size=(2, 2 ** 23)).astype(np.uint32))
s = jax.jit(lambda a: jax.lax.sort([a[0], a[1]], num_keys=2))
out = s(big)
jax.block_until_ready(out)
t = timeit(f4, rows4, idx)
print(f"after big SORT (alive): {t*1e3:.2f}ms")
del big, out
t = timeit(f4, rows4, idx)
print(f"after big sort FREED: {t*1e3:.2f}ms")
t = timeit(jax.jit(chain21), rows4, idx)
print(f"chained after sort: {t*1e3:.2f}ms -> {t/21*1e3:.2f}ms/gather")

# 4. small sort — does size matter?
small = jnp.asarray(rng.randint(0, 2 ** 31, size=(2, 2 ** 16)).astype(np.uint32))
out = s2 = jax.jit(lambda a: jax.lax.sort([a[0], a[1]], num_keys=2))(small)
jax.block_until_ready(out)
del small, out
t = timeit(f4, rows4, idx)
print(f"after SMALL sort: {t*1e3:.2f}ms")
