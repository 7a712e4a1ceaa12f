"""Headline count throughput vs block_reads (dispatch-count scaling)."""
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
reads = bench.gen_reads(genome_len, read_len, coverage, 0)
words = bench.pack_uniform(reads)
n_occ = int(reads.shape[0] * (read_len - k + 1))

for br in (8192, 16384, 32768, 65536):
    cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=br,
                              max_len=read_len, chunk_kmers=chunk)
    cfg.est_total_occ = n_occ
    blocks = bench.make_blocks(words, read_len, br)

    def count_new(blocks_iter):
        unique, counts, minpos, n_unique, stats = engine.count_blocks(
            blocks_iter, cfg, reread=lambda: iter(blocks))
        solidF, countsF, posF, nn_dev = count_op.filter_abundance_fold(
            unique, counts, minpos, n_unique,
            cfg.abundance_min, cfg.abundance_max)
        nn = np.asarray(nn_dev)
        return int(nn[1])

    t0 = time.time()
    count_new(iter(blocks))
    warm = time.time() - t0
    ts = []
    for _ in range(4):
        t0 = time.time()
        ns = count_new(iter(blocks))
        ts.append(time.time() - t0)
    print(f"block_reads={br}: {len(blocks)} blocks, warm {warm:.1f}s, "
          f"min {min(ts)*1e3:.1f}ms = {n_occ/min(ts)/1e6:.1f}M/s "
          f"(n_solid={ns})", file=sys.stderr)
