"""True per-piece timings with forced materialization (np.asarray of a
dependent scalar) — block_until_ready on the tunneled backend returns
before remote compute finishes, so earlier micro-timings were bogus."""
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
from bcalm_tpu.models import lanes as ln
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
L = ln.num_lanes(k)
F = engine.block_slots(blocks[0].words.shape, k)
chunk_cap = engine._round_capacity(max(cfg.chunk_kmers, F))
dev_blocks = [(jnp.asarray(b.words), jnp.asarray(b.lengths)) for b in blocks]

lo_d = jnp.asarray(np.zeros((L,), np.uint32))
hi_d = jnp.asarray(np.full((L,), count_op.SENTINEL, np.uint32))


def sync(x):
    """Force completion: fetch one dependent scalar."""
    np.asarray(jnp.sum(x[..., :1].astype(jnp.uint32)))


def timeit(name, fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f}ms", file=sys.stderr)
    return min(ts)


# build one full chunk buffer
def fill_chunk():
    buf = jnp.full((L + 1, chunk_cap + F), count_op.SENTINEL, jnp.uint32)
    fill = 0
    for w, lens in dev_blocks[:8]:
        buf = engine._extract_insert(buf, w, lens, k, np.uint32(fill),
                                     jnp.asarray(fill, jnp.int32))
        fill += F
    return buf

buf = fill_chunk()
sync(buf)

timeit("extract_insert x8 (sync)", lambda: sync(fill_chunk()))

body = buf[:, :chunk_cap]
u_keep, c_keep = None, None

def count_ranged():
    u, c, nw, mp = engine._count_chunk_ranged(body, lo_d, hi_d)
    np.asarray(nw)

timeit("_count_chunk_ranged 8M + nw fetch", count_ranged)

# pure 3-operand sort at 8M (the sort floor)
from bcalm_tpu.ops import sort_tpu

@jax.jit
def pure_sort(b):
    out = sort_tpu.sort_ops([b[0], b[1], b[2]], num_keys=3)
    return out[0]

timeit("pure 3-op sort 8M (sync)", lambda: sync(pure_sort(body)))

@jax.jit
def pure_sort2(b):
    out = sort_tpu.sort_ops([b[0], b[1]], num_keys=2)
    return out[0]

timeit("pure 2-op sort 8M (sync)", lambda: sync(pure_sort2(body)))

# count_canonical WITHOUT pos (r2-style: 2-key sort1, 4-op sort2)
@jax.jit
def count_nopos(b):
    valid = ~jnp.all(b[:L] == count_op.SENTINEL, axis=0)
    u, c, n = count_op.count_canonical(b[:L], valid)
    return n

timeit("count_canonical nopos 8M", lambda: np.asarray(count_nopos(body)))

@jax.jit
def count_withpos(b):
    valid = ~jnp.all(b[:L] == count_op.SENTINEL, axis=0)
    u, c, n, mp = count_op.count_canonical(b[:L], valid, pos=b[L],
                                           with_pos=True)
    return n

timeit("count_canonical withpos 8M", lambda: np.asarray(count_withpos(body)))
