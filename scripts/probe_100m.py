"""Reproduce/diagnose the ~100M-distinct allocator wall (round-4:
opaque ResourceExhausted near pass-1 end on 100 Mbp k=31).

Counts a 100 Mbp genome at coverage COV (default 10) with the -max-memory
8000 model, then compacts.  Prints per-pass HBM + stage timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

from bcalm_tpu import engine
from bcalm_tpu.ops import count as count_op
import importlib
bench = importlib.import_module("bench")

GENOME = int(os.environ.get("PROBE_GENOME", 100_000_000))
COV = int(os.environ.get("PROBE_COV", 10))
K = int(os.environ.get("PROBE_K", 31))
MEM = int(os.environ.get("PROBE_MEM", 8000))

cfg = engine.EngineConfig(k=K, abundance_min=2, block_reads=8192,
                          max_len=150)
engine.configure_chunk(cfg, MEM)
print(f"genome={GENOME} cov={COV} k={K}: chunk={cfg.chunk_kmers} "
      f"resident={cfg.resident_kmers}", file=sys.stderr)

rng = np.random.RandomState(17)
genome = rng.randint(0, 4, size=GENOME).astype(np.uint8)
n_reads = GENOME * COV // 150
print(f"{n_reads} reads, {n_reads*(150-K+1)} occ", file=sys.stderr)


def block_iter():
    br = cfg.block_reads
    starts_all = rng.randint(0, GENOME - 150, size=n_reads)
    for i in range(0, n_reads, br):
        starts = starts_all[i:i + br]
        reads = genome[starts[:, None] + np.arange(150)[None, :]]
        words = bench.pack_uniform(reads)
        if words.shape[0] < br:
            words = np.concatenate(
                [words, np.zeros((br - words.shape[0], words.shape[1]),
                                 np.uint32)])
        lengths = np.full((br,), 150, np.int32)
        lengths[len(starts):] = 0
        from bcalm_tpu.io.packing import ReadBlock
        yield ReadBlock(words, lengths)


def reread():
    rng2 = np.random.RandomState(17)
    _ = rng2.randint(0, 4, size=GENOME)  # skip genome draw
    return block_iter()


cfg.est_total_occ = n_reads * (150 - K + 1)
t0 = time.time()
try:
    unique, counts, minpos, n_u, stats = engine.count_blocks(
        block_iter(), cfg, reread=block_iter)
    dt = time.time() - t0
    n = int(n_u) if not isinstance(unique, np.ndarray) else n_u
    print(f"COUNT OK {dt:.1f}s: {n} distinct, "
          f"{cfg.est_total_occ/dt/1e6:.1f}M occ/s", file=sys.stderr)
    print(f"timing: {stats.get('timing')}", file=sys.stderr)
    print(f"stats: {({k2: v for k2, v in stats.items() if k2 != 'timing'})}",
          file=sys.stderr)
except Exception as e:
    print(f"COUNT FAILED after {time.time()-t0:.1f}s: {e!r}"[:2000],
          file=sys.stderr)
    raise SystemExit(1)

# ---- compaction at 100M solid (hash junction keys for k>=49) ----
if isinstance(unique, np.ndarray):
    keep = counts >= cfg.abundance_min
    solid_np, counts_np, pos_np = unique[:, keep], counts[keep], minpos[keep]
    n_solid = int(keep.sum())
    cap = engine._round_capacity(max(1, n_solid))
    L = solid_np.shape[0]
    t0 = time.time()
    try:
        solid_d = jnp.asarray(np.concatenate(
            [solid_np, np.zeros((L, cap - n_solid), np.uint32)], axis=1))
        counts_d = jnp.asarray(np.concatenate(
            [counts_np, np.zeros((cap - n_solid,), np.int32)]))
        pos_d = jnp.asarray(np.concatenate(
            [pos_np, np.full((cap - n_solid,), count_op.SENTINEL,
                             np.uint32)]))
        del solid_np, counts_np, pos_np, unique, counts, minpos
        _, _, _, info = engine.compact_solid_pos(
            solid_d, counts_d, pos_d, n_solid, K)
        nu = int(info["n_unitigs"])
        print(f"COMPACT OK {time.time()-t0:.1f}s: {n_solid} solid -> "
              f"{nu} unitigs ({n_solid/(time.time()-t0)/1e6:.1f}M glued/s)",
              file=sys.stderr)
    except Exception as e:
        print(f"COMPACT FAILED after {time.time()-t0:.1f}s: {e!r}"[:2000],
              file=sys.stderr)
        raise SystemExit(2)
