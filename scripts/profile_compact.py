"""Profile the compaction stage breakdown on the real device.

Measures at a given solid-set scale: junctions sort-join, plain doubling,
hierarchical jumping, finish, and the raw row-gather rate that bounds the
jump loops.

Usage: python scripts/profile_compact.py [n_solid_log2=20]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

from bcalm_tpu import engine
from bcalm_tpu.ops import chains as C
from bcalm_tpu.ops import count as count_op
from bcalm_tpu.ops import junctions as J
from bcalm_tpu.io import packing
from bcalm_tpu.models import lanes as ln


def timeit(fn, *args, n=5):
    jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def build_solid(lg: int, k: int):
    """Solid set from a random genome: one giant chain (worst case for
    pointer jumping) with every k-mer distinct."""
    target = (1 << lg) - 7
    rng = np.random.RandomState(0)
    genome_codes = rng.randint(0, 4, size=target + k - 1).astype(np.uint8)
    lut = np.frombuffer(b"ACTG", np.uint8)
    genome = lut[genome_codes].tobytes().decode()
    # long overlapping reads keep all k-mers
    max_len = 1024
    reads = [genome[i:i + max_len]
             for i in range(0, len(genome) - k + 1, max_len - (k - 1))]
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=4096,
                              max_len=max_len, chunk_kmers=8 * 1024 * 1024)
    blocks = packing.iter_blocks(reads, k, block_reads=cfg.block_reads,
                                 max_len=max_len)
    unique, counts, minpos, n_unique, stats = engine.count_blocks(blocks, cfg)
    n_u = int(n_unique)
    cap = engine._round_capacity(max(1, n_u))
    solid, scounts, spos, n_solid = count_op.filter_abundance_pos(
        unique[:, :cap], counts[:cap], minpos[:cap],
        jnp.asarray(n_u, jnp.int32), 1, 2**31 - 1)
    ns = int(n_solid)
    cap2 = engine._round_capacity(ns)
    return solid[:, :cap2], scounts[:cap2], spos[:cap2], ns


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    k = 31
    t0 = time.time()
    solid, counts, spos, n_solid = build_solid(lg, k)
    cap = solid.shape[1]
    M = 2 * cap
    print(f"devices={jax.devices()}")
    print(f"n_solid={n_solid} cap={cap} M={M} (built in {time.time()-t0:.1f}s)")

    ns_dev = jnp.asarray(n_solid, jnp.int32)

    # --- stage 1: junctions sort-join ---
    succ_fn = jax.jit(lambda s, n: J.successor_arrays(s, n, k)[0])
    t = timeit(succ_fn, solid, ns_dev)
    print(f"junctions: {t*1e3:8.1f}ms  ({n_solid/t/1e6:.1f}M solid/s)")
    succ = succ_fn(solid, ns_dev)
    oid = jnp.arange(M, dtype=jnp.int32)
    valid = jnp.where(oid >= cap, oid - cap, oid) < ns_dev

    pred_fn = jax.jit(C.build_pred)
    t = timeit(pred_fn, succ, valid)
    print(f"build_pred: {t*1e3:7.1f}ms")
    pred = pred_fn(succ, valid)

    # --- raw gather rate: one (M,4) row gather ---
    state0 = jax.jit(C._init_Q)(pred, valid)
    ridx = jnp.asarray(np.random.RandomState(1).randint(0, M, size=M),
                       jnp.int32)
    g_fn = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    t = timeit(g_fn, state0, ridx)
    print(f"row gather (M,4): {t*1e3:7.1f}ms  ({M/t/1e6:.0f}M idx/s)")
    # sorted indices
    sidx = jnp.sort(ridx)
    t = timeit(g_fn, state0, sidx)
    print(f"row gather sorted: {t*1e3:6.1f}ms  ({M/t/1e6:.0f}M idx/s)")
    # 1-col gather
    g1_fn = jax.jit(lambda s, i: jnp.take(s[:, 0], i))
    t = timeit(g1_fn, state0, ridx)
    print(f"col gather (M,): {t*1e3:8.1f}ms  ({M/t/1e6:.0f}M idx/s)")

    # --- plain doubling ---
    plain_fn = jax.jit(C.plain_jumpF)
    t = timeit(plain_fn, pred, valid, n=3)
    print(f"plain_jumpF: {t*1e3:6.1f}ms  ({n_solid/t/1e6:.2f}M glued/s)")
    state_p = plain_fn(pred, valid)

    # --- hierarchical ---
    hier_fn = jax.jit(lambda p, v: C.hier_jump(p, v)[0])
    t = timeit(hier_fn, pred, valid, n=3)
    print(f"hier_jump: {t*1e3:8.1f}ms  ({n_solid/t/1e6:.2f}M glued/s)")

    # --- finish ---
    fin_fn = jax.jit(C.finish_fast)
    t = timeit(fin_fn, succ, pred, valid, state_p)
    print(f"finish_fast: {t*1e3:6.1f}ms")

    # --- full compact_solid (canonical-order fallback path) ---
    t = timeit(lambda: engine.compact_solid(solid, counts, n_solid, k)[2][
        "n_unitigs"].block_until_ready(), n=3)
    print(f"compact_solid: {t*1e3:4.1f}ms  ({n_solid/t/1e6:.2f}M glued/s)")

    # --- positioned path (reorder + run contraction + contracted jump) ---
    t = timeit(lambda: engine.compact_solid_pos(
        solid, counts, spos, n_solid, k)[3]["n_unitigs"], n=3)
    print(f"compact_solid_pos: {t*1e3:4.1f}ms  ({n_solid/t/1e6:.2f}M glued/s)")


if __name__ == "__main__":
    main()
