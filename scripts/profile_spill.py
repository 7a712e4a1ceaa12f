"""spill31 shape, 3 consecutive timed runs with per-run timing dicts."""
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

k, genome_len, read_len, coverage = 31, 12_000_000, 15, 150
# (genome 12M, coverage 15, read_len 150 — spill31 shape)
cfg = engine.EngineConfig(k=31, abundance_min=2, block_reads=8192,
                          max_len=150, chunk_kmers=4 * 1024 * 1024)
cfg.resident_kmers = 1
reads = bench.gen_reads(12_000_000, 150, 15, 4)
words = bench.pack_uniform(reads)
blocks = bench.make_blocks(words, 150, cfg.block_reads)
n_occ = int(reads.shape[0] * (150 - 31 + 1))
cfg.est_total_occ = n_occ


def count_new(blocks_iter):
    unique, counts, minpos, n_unique, stats = engine.count_blocks(
        blocks_iter, cfg, reread=lambda: iter(blocks))
    return stats


for rep in range(3):
    t0 = time.time()
    stats = count_new(iter(blocks))
    dt = time.time() - t0
    print(f"run{rep}: {dt:.1f}s = {n_occ/dt/1e6:.1f}M/s  "
          f"timing={stats.get('timing')}", file=sys.stderr)
