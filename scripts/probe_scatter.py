"""Probe scatter variants: col vs row, unique_indices, sorted indices,
and the sort-based inverse-permutation alternative.

Usage: python scripts/probe_scatter.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()


def timeit(fn, *args, n=5):
    float(fn(*args))
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
    t_disp = timeit(noop, jnp.zeros((8, 8), jnp.int32))
    print(f"fetch round-trip: {t_disp*1e3:.2f}ms")

    for lg in (21, 23):
        M = 1 << lg
        perm = jnp.asarray(rng.permutation(M).astype(np.int32))
        sperm = jnp.sort(perm)  # = arange; realistic sorted-unique case
        v1 = jnp.asarray(rng.randint(0, 2**30, size=M), jnp.int32)
        v2 = jnp.asarray(rng.randint(0, 2**30, size=(M, 2)), jnp.int32)

        def t(fn, *a):
            return (timeit(fn, *a) - t_disp) * 1e3

        col = jax.jit(lambda i, v: jnp.sum(
            jnp.zeros((M,), jnp.int32).at[i].set(v)[:1]))
        colu = jax.jit(lambda i, v: jnp.sum(
            jnp.zeros((M,), jnp.int32).at[i].set(v, unique_indices=True)[:1]))
        row = jax.jit(lambda i, v: jnp.sum(
            jnp.zeros((M, 2), jnp.int32).at[i].set(v)[:1, :1]))
        rowu = jax.jit(lambda i, v: jnp.sum(
            jnp.zeros((M, 2), jnp.int32).at[i].set(
                v, unique_indices=True)[:1, :1]))

        # sort-based inverse permutation: out[perm[j]] = v[j]
        #  == out = v[argsort(perm)]; argsort via sort_by_key(perm, arange)
        def inv_fn(i, v):
            _, pos = jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))
            return jnp.sum(jnp.take(v, pos)[:1])

        inv = jax.jit(inv_fn)

        print(f"M=2^{lg}:")
        print(f"  col set rand:          {t(col, perm, v1):8.2f}ms")
        print(f"  col set rand unique:   {t(colu, perm, v1):8.2f}ms")
        print(f"  col set sorted unique: {t(colu, sperm, v1):8.2f}ms")
        print(f"  row set rand:          {t(row, perm, v2):8.2f}ms")
        print(f"  row set rand unique:   {t(rowu, perm, v2):8.2f}ms")
        print(f"  sort+gather inverse:   {t(inv, perm, v1):8.2f}ms")


if __name__ == "__main__":
    main()
