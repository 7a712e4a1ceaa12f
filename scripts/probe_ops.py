"""Micro-probe: cost of the primitive ops the compact path is built on.

On the axon tunneled backend block_until_ready does not actually fence, so
every timed function must end in a host fetch of a scalar; loop counts are
chained inside one jit (fori_loop) to amortize the fetch round-trip.

Usage: python scripts/probe_ops.py
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()


def timeit(fn, *args, n=5):
    float(fn(*args))  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    print(f"devices={jax.devices()}")
    rng = np.random.RandomState(0)

    noop = jax.jit(lambda x: jnp.sum(x))
    d = jnp.zeros((8, 8), jnp.int32)
    t_disp = timeit(noop, d)
    print(f"fetch round-trip: {t_disp*1e3:.2f}ms")

    R = 10

    for lg in (17, 19, 21, 23):
        M = 1 << lg
        state = jnp.asarray(rng.randint(0, 2**30, size=(M, 4)), jnp.int32)
        idx = jnp.asarray(rng.randint(0, M, size=M), jnp.int32)

        @jax.jit
        def g10(s, i):
            def body(t, a):
                a = jnp.take(a, i, axis=0)
                return a + 1  # defeat loop-invariant hoisting
            return jnp.sum(jax.lax.fori_loop(0, R, body, s)[:1, :1])

        t10 = (timeit(g10, state, idx) - t_disp) / R

        @jax.jit
        def g10c(s, i):
            def body(t, c):
                c = jnp.take(s[:, 0] + c[0], i) # 1 column
                return c
            return jnp.sum(jax.lax.fori_loop(0, R, body, s[:, 0])[:1])

        t10c = (timeit(g10c, state, idx) - t_disp) / R

        @jax.jit
        def cs10(s):
            def body(t, c):
                return jnp.cumsum(c)
            return jnp.sum(jax.lax.fori_loop(0, R, body, s[:, 0])[:1])

        tc = (timeit(cs10, state) - t_disp) / R

        @jax.jit
        def sc10(s, i):
            def body(t, a):
                return jnp.zeros((M, 2), jnp.int32).at[i].set(a[:, :2] + t)[:, :2]
            return jnp.sum(jax.lax.fori_loop(0, R, body, s[:, :2])[:1, :1])

        tsc = (timeit(sc10, state, idx) - t_disp) / R

        @jax.jit
        def st10(i):
            def body(t, a):
                return jnp.sort(a ^ t)
            return jnp.sum(jax.lax.fori_loop(0, R, body, i)[:1])

        tst = (timeit(st10, idx) - t_disp) / R

        @jax.jit
        def ew10(s):
            def body(t, a):
                return jnp.where(a > t, a - 1, a)
            return jnp.sum(jax.lax.fori_loop(0, R, body, s)[:1, :1])

        tew = (timeit(ew10, state) - t_disp) / R

        print(f"M=2^{lg}: row-gather(M,4) {t10*1e3:7.2f}ms ({M/t10/1e6:5.0f}M/s)"
              f"  col-gather {t10c*1e3:6.2f}ms ({M/t10c/1e6:5.0f}M/s)"
              f"  cumsum {tc*1e3:6.2f}ms  row-scatter {tsc*1e3:6.2f}ms"
              f"  sort-i32 {tst*1e3:7.2f}ms  where(M,4) {tew*1e3:5.2f}ms")


if __name__ == "__main__":
    main()
