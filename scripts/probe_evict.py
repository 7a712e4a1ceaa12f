"""Probe: does running other big programs evict a loaded executable?
merge -> N other big sorts -> merge again; if the second merge is slow,
the axon runtime evicts executables (program-count or byte budget)."""
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
    counts[:n] = 1
    pos = np.full(cap, count_op.SENTINEL, np.uint32)
    pos[:n] = np.arange(n, dtype=np.uint32)
    return (jnp.asarray(lanes), jnp.asarray(counts), jnp.asarray(pos))


a = mkrun(8 << 20, 7400000)
b = mkrun(4 << 20, 3700000)


def merge_two(a, b):
    lanes = jnp.concatenate([a[0], b[0]], axis=1)
    weights = jnp.concatenate([a[1], b[1]])
    mpos = jnp.concatenate([a[2], b[2]])
    cap = 16 << 20
    pad = cap - lanes.shape[1]
    lanes = jnp.concatenate(
        [lanes, jnp.full((L, pad), count_op.SENTINEL, jnp.uint32)], axis=1)
    weights = jnp.concatenate([weights, jnp.zeros((pad,), jnp.int32)])
    mpos = jnp.concatenate(
        [mpos, jnp.full((pad,), count_op.SENTINEL, jnp.uint32)])
    valid = ~jnp.all(lanes == count_op.SENTINEL, axis=0)
    u, c, n, mp = count_op.count_canonical(
        lanes, valid, weights=weights, weighted=True, pos=mpos,
        with_pos=True)
    return int(n)


def other_programs(i):
    """Distinct big jitted sorts (unique shapes per i)."""
    N = (1 << 22) + i * 128
    x = jnp.asarray(rng.randint(0, 2**31, size=N, dtype=np.int64)
                    .astype(np.uint32))
    out = jax.lax.sort([x, x, x], num_keys=2)
    return float(jnp.sum(out[0][:8].astype(jnp.float32)))


t0 = time.time(); merge_two(a, b); print(f"merge cold: {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time(); merge_two(a, b); print(f"merge warm: {time.time()-t0:.1f}s", file=sys.stderr)
for i in range(8):
    t0 = time.time(); other_programs(i)
    print(f"other[{i}]: {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time(); merge_two(a, b); print(f"merge after others: {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time(); merge_two(a, b); print(f"merge again: {time.time()-t0:.1f}s", file=sys.stderr)
