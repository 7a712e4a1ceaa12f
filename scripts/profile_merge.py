"""Microbenchmark the split-time merge: weighted count_canonical over a
(8M cap + 4M cap) concat at 16M, exactly as force_merge_all does."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

from bcalm_tpu.ops import count as count_op

rng = np.random.RandomState(0)
L = 2


def mkrun(cap, n):
    lanes = np.full((L, cap), count_op.SENTINEL, np.uint32)
    vals = np.sort(rng.randint(0, 2**31, size=n, dtype=np.int64))
    lanes[0, :n] = (vals >> 16).astype(np.uint32)
    lanes[1, :n] = (vals & 0xFFFF).astype(np.uint32)
    counts = np.zeros(cap, np.int32)
    counts[:n] = 1 + rng.randint(0, 5, size=n)
    pos = np.full(cap, count_op.SENTINEL, np.uint32)
    pos[:n] = rng.randint(0, 2**31, size=n, dtype=np.int64).astype(np.uint32)
    return (jnp.asarray(lanes), jnp.asarray(counts), jnp.asarray(pos))


a = mkrun(8 << 20, 7400000)
b = mkrun(4 << 20, 3700000)
jax.block_until_ready(b[0])


def merge_two(a, b):
    lanes = jnp.concatenate([a[0], b[0]], axis=1)
    weights = jnp.concatenate([a[1], b[1]])
    mpos = jnp.concatenate([a[2], b[2]])
    cap = 16 << 20
    pad = cap - lanes.shape[1]
    if pad:
        lanes = jnp.concatenate(
            [lanes, jnp.full((L, pad), count_op.SENTINEL, jnp.uint32)],
            axis=1)
        weights = jnp.concatenate([weights, jnp.zeros((pad,), jnp.int32)])
        mpos = jnp.concatenate(
            [mpos, jnp.full((pad,), count_op.SENTINEL, jnp.uint32)])
    valid = ~jnp.all(lanes == count_op.SENTINEL, axis=0)
    unique, counts, n_unique, minpos = count_op.count_canonical(
        lanes, valid, weights=weights, weighted=True,
        pos=mpos, with_pos=True)
    return unique, counts, n_unique, minpos


for rep in range(4):
    t0 = time.time()
    u, c, n, mp = merge_two(a, b)
    n_host = int(n)
    print(f"merge_two + int(n): {(time.time()-t0)*1e3:.1f}ms (n={n_host})",
          file=sys.stderr)
