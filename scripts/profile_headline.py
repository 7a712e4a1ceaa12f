"""Profile the headline counting config piece by piece (round-5
regression hunt: 46.8M occ/s at r2 -> 26.0M at r4 on the identical
config).  Times each stage of count_blocks separately on the real chip.

Usage: python scripts/profile_headline.py
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import importlib
bench = importlib.import_module("bench")

k = 31
genome_len = 1_000_000
read_len = 150
coverage = 24
chunk = 8 * 1024 * 1024

cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=8192,
                          max_len=read_len, chunk_kmers=chunk)
reads = bench.gen_reads(genome_len, read_len, coverage, 0)
words = bench.pack_uniform(reads)
blocks = bench.make_blocks(words, read_len, cfg.block_reads)
n_occ = int(reads.shape[0] * (read_len - k + 1))
cfg.est_total_occ = n_occ
print(f"{len(blocks)} blocks, {n_occ} occ", file=sys.stderr)

dev_blocks = [(jnp.asarray(b.words), jnp.asarray(b.lengths)) for b in blocks]
jax.block_until_ready(dev_blocks[-1][0])

L = 2  # k=31 -> 2 lanes? check
from bcalm_tpu.models import lanes as ln
L = ln.num_lanes(k)
print(f"L={L}", file=sys.stderr)

F = engine.block_slots(blocks[0].words.shape, k)
chunk_cap = engine._round_capacity(max(cfg.chunk_kmers, F))
print(f"F={F} chunk_cap={chunk_cap}", file=sys.stderr)


def timeit(name, fn, n=5):
    fn()  # warm
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f}ms", file=sys.stderr)
    return min(ts)


# 1. extract_insert for all blocks into one chunk buffer (donation means
# we must rebuild the buffer each run; time the per-block cost)
buf0 = jnp.full((L + 1, chunk_cap + F), count_op.SENTINEL, jnp.uint32)
jax.block_until_ready(buf0)

def run_extract():
    buf = jnp.full((L + 1, chunk_cap + F), count_op.SENTINEL, jnp.uint32)
    fill = 0
    for w, lens in dev_blocks[:7]:
        buf = engine._extract_insert(buf, w, lens, k, np.uint32(0),
                                     jnp.asarray(fill, jnp.int32))
        fill += F
    return buf

t_ex = timeit("extract_insert x7 (1 chunk worth)", run_extract)

# 2. the ranged chunk count (full range = identity fold)
lo_d = jnp.asarray(np.zeros((L,), np.uint32))
hi_d = jnp.asarray(np.full((L,), count_op.SENTINEL, np.uint32))
buf = run_extract()
jax.block_until_ready(buf)
body = buf[:, :chunk_cap]

def run_count():
    u, c, nw, mp = engine._count_chunk_ranged(body, lo_d, hi_d)
    return nw

t_ct = timeit("_count_chunk_ranged (8M chunk)", run_count)

# 3. count WITHOUT the range fold (r2-style): plain count_canonical
@jax.jit
def _count_plain(b):
    Lk = b.shape[0] - 1
    valid = ~jnp.all(b[:Lk] == count_op.SENTINEL, axis=0)
    u, c, n, mp = count_op.count_canonical(b[:Lk], valid, pos=b[Lk],
                                           with_pos=True)
    return n

t_cp = timeit("count_canonical plain (8M chunk)", lambda: _count_plain(body))

# 4. full count_blocks (the timed bench path)
def count_device():
    unique, counts, minpos, n_unique, stats = engine.count_blocks(
        iter(blocks), cfg, reread=lambda: iter(blocks))
    return n_unique

count_device()
ts = []
for _ in range(5):
    t0 = time.time()
    n_u = count_device()
    jax.block_until_ready(n_u)
    ts.append(time.time() - t0)
print(f"count_blocks full: {min(ts)*1e3:.1f}ms  ({n_occ/min(ts)/1e6:.1f}M occ/s)",
      file=sys.stderr)

# 5. host-side per-block work: how much is numpy/transfer?
def host_only():
    for b in blocks:
        jnp.asarray(b.words)
        jnp.asarray(b.lengths)

timeit("host->device transfer all blocks", host_only)
