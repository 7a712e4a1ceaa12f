"""Old (scatter filter, 2 syncs) vs new (fold filter, 1 sync) closures,
back to back in one process, interleaved to cancel tunnel drift."""
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


def count_old(blocks_iter):
    unique, counts, minpos, n_unique, stats = engine.count_blocks(
        blocks_iter, cfg, reread=lambda: iter(blocks))
    n_u = int(n_unique)
    cap = engine._round_capacity(max(1, n_u))
    solid, scounts, spos, n_solid = count_op.filter_abundance_pos(
        unique[:, :cap], counts[:cap], minpos[:cap],
        jnp.asarray(n_u, jnp.int32), cfg.abundance_min, cfg.abundance_max)
    return int(n_solid)


def count_new(blocks_iter):
    unique, counts, minpos, n_unique, stats = engine.count_blocks(
        blocks_iter, cfg, reread=lambda: iter(blocks))
    solidF, countsF, posF, nn_dev = count_op.filter_abundance_fold(
        unique, counts, minpos, n_unique,
        cfg.abundance_min, cfg.abundance_max)
    nn = np.asarray(nn_dev)
    return int(nn[1])


count_old(iter(blocks))
count_new(iter(blocks))
olds, news = [], []
for rep in range(6):
    t0 = time.time()
    count_old(iter(blocks))
    olds.append(time.time() - t0)
    t0 = time.time()
    count_new(iter(blocks))
    news.append(time.time() - t0)
print(f"old: min {min(olds)*1e3:.1f}ms  all "
      f"{[round(t*1e3) for t in olds]}", file=sys.stderr)
print(f"new: min {min(news)*1e3:.1f}ms  all "
      f"{[round(t*1e3) for t in news]}", file=sys.stderr)
print(f"new throughput: {n_occ/min(news)/1e6:.1f}M occ/s", file=sys.stderr)
