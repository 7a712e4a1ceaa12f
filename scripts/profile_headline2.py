"""Time the EXACT bench count_device closure + its pieces (round-5)."""
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

k, genome_len, read_len, coverage = 31, 1_000_000, 150, 24
chunk = 8 * 1024 * 1024
cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=8192,
                          max_len=read_len, chunk_kmers=chunk)
reads = bench.gen_reads(genome_len, read_len, coverage, 0)
words = bench.pack_uniform(reads)
blocks = bench.make_blocks(words, read_len, cfg.block_reads)
n_occ = int(reads.shape[0] * (read_len - k + 1))
cfg.est_total_occ = n_occ


def count_device(blocks_iter):
    unique, counts, minpos, n_unique, stats = engine.count_blocks(
        blocks_iter, cfg, reread=lambda: iter(blocks))
    n_u = int(n_unique)
    cap = engine._round_capacity(max(1, n_u))
    solid, scounts, spos, n_solid = count_op.filter_abundance_pos(
        unique[:, :cap], counts[:cap], minpos[:cap],
        jnp.asarray(n_u, jnp.int32),
        cfg.abundance_min, cfg.abundance_max,
    )
    return solid, scounts, spos, int(n_solid), n_u, stats


# bench-style warmup: 1 block only (small shape class)
t0 = time.time()
count_device(iter(blocks[:1]))
print(f"warmup(1 block): {time.time()-t0:.1f}s", file=sys.stderr)

for run in range(6):
    t0 = time.time()
    r = count_device(iter(blocks))
    dt = time.time() - t0
    print(f"run{run}: {dt*1e3:.1f}ms = {n_occ/dt/1e6:.1f}M/s", file=sys.stderr)

# piecewise: count_blocks alone, then the filter+sync tail
t0 = time.time()
unique, counts, minpos, n_unique, stats = engine.count_blocks(
    iter(blocks), cfg, reread=lambda: iter(blocks))
t1 = time.time()
n_u = int(n_unique)
t2 = time.time()
cap = engine._round_capacity(max(1, n_u))
solid, scounts, spos, n_solid = count_op.filter_abundance_pos(
    unique[:, :cap], counts[:cap], minpos[:cap],
    jnp.asarray(n_u, jnp.int32), cfg.abundance_min, cfg.abundance_max)
ns = int(n_solid)
t3 = time.time()
print(f"count_blocks {1e3*(t1-t0):.1f}ms | int(n_unique) {1e3*(t2-t1):.1f}ms"
      f" | filter+sync {1e3*(t3-t2):.1f}ms", file=sys.stderr)
