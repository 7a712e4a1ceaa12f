"""Probe device<->host transfer bandwidth on the tunneled TPU backend.

Fresh device array per fetch (np.asarray caches _npy_value on the Array,
so repeated fetches of one array measure the cache, not the link).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)

key = jax.random.PRNGKey(0)
mk = jax.jit(lambda k, n: jax.random.bits(k, (n,), jnp.uint32),
             static_argnums=1)


def fresh(n):
    global key
    key, sub = jax.random.split(key)
    x = mk(sub, n)
    x.block_until_ready()
    return x


for mb in (1, 8, 64, 256):
    n = mb * 1024 * 1024 // 4
    ts = []
    for _ in range(3):
        x = fresh(n)
        t0 = time.time()
        np.asarray(x)
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"d2h np.asarray   {mb:4d} MB: {t*1e3:8.1f} ms = {mb/t:8.1f} MB/s")

    ts = []
    for _ in range(3):
        x = fresh(n)
        t0 = time.time()
        x.copy_to_host_async()
        np.asarray(x)
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"d2h async+fetch  {mb:4d} MB: {t*1e3:8.1f} ms = {mb/t:8.1f} MB/s")

    h = np.random.randint(0, 2**32, size=n, dtype=np.uint32)
    ts = []
    for _ in range(3):
        t0 = time.time()
        jnp.asarray(h).block_until_ready()
        ts.append(time.time() - t0)
        h = h + 1  # defeat any caching
    t = min(ts)
    print(f"h2d jnp.asarray  {mb:4d} MB: {t*1e3:8.1f} ms = {mb/t:8.1f} MB/s")

# overlap: start async d2h of A, run compute on B meanwhile
x = fresh(64 * 1024 * 1024 // 4)
b = fresh(32 * 1024 * 1024 // 4)
f = jax.jit(lambda v: jnp.sort(v))
f(b).block_until_ready()
t0 = time.time()
f(b).block_until_ready()
t_compute = time.time() - t0
t0 = time.time()
x.copy_to_host_async()
c2 = f(b)
ha = np.asarray(x)
c2.block_until_ready()
t_both = time.time() - t0
x2 = fresh(64 * 1024 * 1024 // 4)
t0 = time.time()
np.asarray(x2)
t_fetch = time.time() - t0
print(f"overlap: compute {t_compute*1e3:.1f} ms, fetch64MB "
      f"{t_fetch*1e3:.1f} ms, both {t_both*1e3:.1f} ms")
