"""Profile compaction stages + raw gather shapes on the real chip.

Usage: python scripts/profile_compact.py [n_solid_log2=20]
"""
import sys
import time

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp

from bcalm_tpu import engine
from bcalm_tpu.ops import chains as chains_op
from bcalm_tpu.ops import junctions as junctions_op


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    M = 2 ** (lg + 1)  # oriented nodes
    print(f"devices: {jax.devices()}", flush=True)

    # --- raw gather shapes ---
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
    rows4 = jnp.asarray(rng.randint(0, 2**31, size=(M, 4)).astype(np.int32))
    rows2 = jnp.asarray(rng.randint(0, 2**31, size=(M, 2)).astype(np.int32))
    flat = jnp.asarray(rng.randint(0, 2**31, size=(M,)).astype(np.int32))
    f4 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t, _ = timeit(f4, rows4, idx)
    print(f"gather rows4  (M={M}): {t*1e3:.2f}ms = {M/t/1e6:.0f}M idx/s")
    t, _ = timeit(f4, rows2, idx)
    print(f"gather rows2  (M={M}): {t*1e3:.2f}ms = {M/t/1e6:.0f}M idx/s")
    f1 = jax.jit(lambda t, i: jnp.take(t, i))
    t, _ = timeit(f1, flat, idx)
    print(f"gather flat   (M={M}): {t*1e3:.2f}ms = {M/t/1e6:.0f}M idx/s")
    f1x4 = jax.jit(lambda a, b, c, d, i: (jnp.take(a, i), jnp.take(b, i),
                                          jnp.take(c, i), jnp.take(d, i)))
    t, _ = timeit(f1x4, flat, flat, flat, flat, idx)
    print(f"gather 4xflat (M={M}): {t*1e3:.2f}ms = {M/t/1e6:.0f}M idx/s")
    # sorted (coalesced-ish) indices for comparison
    sidx = jnp.sort(idx)
    t, _ = timeit(f4, rows4, sidx)
    print(f"gather rows4 sorted idx: {t*1e3:.2f}ms")
    # scatter
    fsc = jax.jit(lambda t, i, v: t.at[i].set(v))
    t, _ = timeit(fsc, flat, idx, flat)
    print(f"scatter flat  (M={M}): {t*1e3:.2f}ms = {M/t/1e6:.0f}M idx/s")

    # --- one doubling round ---
    state = jnp.asarray(
        np.stack([rng.randint(0, M, size=M),
                  rng.randint(0, 100, size=M),
                  rng.randint(0, M, size=M),
                  rng.randint(0, 100, size=M)], axis=1).astype(np.int32))

    @jax.jit
    def one_round(state):
        anc = jnp.take(state, state[:, 0], axis=0)
        return chains_op.round_update(state, anc)

    t, _ = timeit(one_round, state)
    print(f"one round_update (M={M}): {t*1e3:.2f}ms")

    # --- realistic single-chain workload (bench shape: 150bp reads) ---
    n_solid = 2 ** lg - 37
    cfg = engine.EngineConfig(k=31, abundance_min=1, block_reads=8192,
                              max_len=150)
    g = rng.randint(0, 4, size=n_solid + 31)
    genome = "".join("ACTG"[c] for c in g)
    reads = [genome[i:i + 150] for i in range(0, len(genome) - 149, 120)]
    reads.append(genome[-150:])
    from bcalm_tpu.io import packing
    blocks = packing.iter_blocks(reads, 31, block_reads=8192, max_len=150)
    solid_np, counts_np, histo, stats = engine.count_and_filter(blocks, cfg)
    ns = solid_np.shape[1]
    print(f"solid set: {ns}")
    cap = engine._round_capacity(ns)
    L = solid_np.shape[0]
    solid = jnp.asarray(np.concatenate(
        [solid_np, np.zeros((L, cap - ns), np.uint32)], axis=1))
    counts = jnp.asarray(np.concatenate(
        [counts_np, np.zeros((cap - ns,), np.int32)]))

    sa = jax.jit(junctions_op.successor_arrays, static_argnames=("k",))
    t, (succ, _) = timeit(sa, solid, jnp.asarray(ns, jnp.int32), 31)
    print(f"successor_arrays: {t*1e3:.2f}ms")

    oid = np.arange(2 * cap, dtype=np.int64)
    valid_oriented = jnp.asarray((oid % cap) < ns)

    bp = jax.jit(chains_op.build_pred)
    t, pred = timeit(bp, succ, valid_oriented)
    print(f"build_pred: {t*1e3:.2f}ms")

    jl = jax.jit(chains_op.jump_loop)
    t, state = timeit(jl, pred, valid_oriented)
    print(f"jump_loop: {t*1e3:.2f}ms")

    fin = jax.jit(chains_op.finish)
    t, info = timeit(fin, succ, pred, valid_oriented, state)
    print(f"finish: {t*1e3:.2f}ms  n_unitigs={int(info['n_unitigs'])}")

    cd = jax.jit(chains_op.chain_decompose)
    t, info = timeit(cd, succ, valid_oriented)
    print(f"chain_decompose total: {t*1e3:.2f}ms")
    total = timeit(sa, solid, jnp.asarray(ns, jnp.int32), 31)[0] + t
    print(f"compact total: {total*1e3:.2f}ms = {ns/total/1e6:.2f}M glued/s")


if __name__ == "__main__":
    main()
