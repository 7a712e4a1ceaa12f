"""Microbench: gather/scatter/sort primitive costs on the chip (feeds the
chain-loop optimization decisions)."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    # block_until_ready alone does not flush the tunneled axon queue; a
    # tiny D2H read of one element forces real completion
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def timeit(f, *args, reps=5):
    out = f(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    M = int(os.environ.get("PROF_M", 4 * 1024 * 1024))
    log(f"devices={jax.devices()}, M={M}")
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
    t4 = jnp.asarray(rng.randint(0, 2**31, size=(M, 4)).astype(np.int32))
    t2 = t4[:, :2]
    t1 = t4[:, 0]
    t1_64 = t1.astype(jnp.int64)

    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    for name, t in [("(M,4)i32 row", t4), ("(M,2)i32 row", t2),
                    ("(M,)i32", t1), ("(M,)i64", t1_64)]:
        dt = timeit(f, t, idx)
        log(f"gather {name}: {dt*1e3:.1f}ms ({M/dt/1e6:.0f}M rows/s)")

    # gather with SORTED (monotone) indices
    sidx = jnp.sort(idx)
    dt = timeit(f, t4, sidx)
    log(f"gather (M,4)i32 row SORTED idx: {dt*1e3:.1f}ms")

    # scatter set
    g = jax.jit(lambda t, i, v: t.at[i].set(v, mode="drop"))
    dt = timeit(g, t1, idx, t1)
    log(f"scatter (M,)i32 set: {dt*1e3:.1f}ms")
    g2 = jax.jit(lambda t, i, v: t.at[i].max(v, mode="drop"))
    dt = timeit(g2, t1, idx, t1)
    log(f"scatter (M,)i32 max: {dt*1e3:.1f}ms")

    # segment_max as used by finish
    smax = jax.jit(lambda v, s: jax.ops.segment_max(v, s, num_segments=M))
    dt = timeit(smax, t1, idx)
    log(f"segment_max M->M: {dt*1e3:.1f}ms")

    # sort costs (junctions + counting workhorse)
    u1 = t1.view(jnp.uint32) if hasattr(t1, "view") else t1
    k1 = jnp.asarray(rng.randint(0, 2**32, size=M, dtype=np.uint64).astype(np.uint32))
    k2 = jnp.asarray(rng.randint(0, 2**32, size=M, dtype=np.uint64).astype(np.uint32))
    pay = jnp.arange(M, dtype=jnp.uint32)
    s1 = jax.jit(lambda a, b: jax.lax.sort([a, b], num_keys=1))
    dt = timeit(s1, k1, pay)
    log(f"lax.sort 1key+1pay: {dt*1e3:.1f}ms ({M/dt/1e6:.0f}M elem/s)")
    s2 = jax.jit(lambda a, b, c: jax.lax.sort([a, b, c], num_keys=2))
    dt = timeit(s2, k1, k2, pay)
    log(f"lax.sort 2key+1pay: {dt*1e3:.1f}ms ({M/dt/1e6:.0f}M elem/s)")

    # argsort-free cumsum / elementwise baseline
    c = jax.jit(lambda v: jnp.cumsum(v))
    dt = timeit(c, t1)
    log(f"cumsum (M,)i32: {dt*1e3:.1f}ms")


if __name__ == "__main__":
    main()
