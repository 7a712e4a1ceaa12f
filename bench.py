"""Benchmark: canonical k-mers counted/sec/chip (BASELINE.json primary metric).

Synthetic read set (random genome, 150 bp reads at given coverage), k=31,
processed through the PRODUCTION chunked pipeline (engine.count_blocks):
all device work happens at one fixed chunk shape, so the (slow, remote)
TPU compile is a one-time cost amortized by the persistent compile cache,
and the measured figure includes real host<->device streaming.

Prints ONE JSON line.  vs_baseline: ratio against 1e7 canonical
k-mers/s/node, a documented assumption for reference-class DSK counting
throughput on a commodity CPU node (the repository publishes no numbers —
BASELINE.md; the BCALM2 paper reports "hours for a human genome" on one
desktop, consistent with ~1e7/s).

Env knobs: BENCH_K, BENCH_GENOME, BENCH_COVERAGE, BENCH_READ_LEN,
BENCH_CHUNK (k-mer slots per device chunk).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 1.0e7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_reads(genome_len: int, read_len: int, coverage: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    genome = rng.randint(0, 4, size=genome_len).astype(np.uint8)
    n_reads = genome_len * coverage // read_len
    starts = rng.randint(0, genome_len - read_len, size=n_reads)
    return genome[starts[:, None] + np.arange(read_len)[None, :]]


def pack_uniform(reads: np.ndarray) -> np.ndarray:
    """(R, len) uint8 codes -> (R, W) uint32 big-endian packed."""
    R, n = reads.shape
    W = (n + 15) // 16
    padded = np.zeros((R, W * 16), dtype=np.uint32)
    padded[:, :n] = reads
    shifts = (2 * (15 - np.arange(16))).astype(np.uint32)
    return (padded.reshape(R, W, 16) << shifts[None, None, :]).sum(
        axis=2, dtype=np.uint32
    )


def make_blocks(words, read_len, block_reads):
    from bcalm_tpu.io.packing import ReadBlock

    R = words.shape[0]
    blocks = []
    for i in range(0, R, block_reads):
        chunk = words[i : i + block_reads]
        if chunk.shape[0] < block_reads:  # pad final block (empty reads)
            pad = np.zeros((block_reads - chunk.shape[0], words.shape[1]),
                           np.uint32)
            chunk = np.concatenate([chunk, pad])
        lengths = np.full((block_reads,), read_len, np.int32)
        lengths[min(R - i, block_reads):] = 0
        blocks.append(ReadBlock(chunk, lengths))
    return blocks


def main():
    import jax

    # the axon sitecustomize force-overrides JAX_PLATFORMS; BENCH_PLATFORM
    # re-forces a backend (e.g. cpu for local smoke tests)
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from bcalm_tpu import engine

    k = int(os.environ.get("BENCH_K", 31))
    genome_len = int(os.environ.get("BENCH_GENOME", 1_000_000))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    coverage = int(os.environ.get("BENCH_COVERAGE", 24))
    chunk = int(os.environ.get("BENCH_CHUNK", 8 * 1024 * 1024))

    cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=8192,
                              max_len=read_len, chunk_kmers=chunk)

    log(f"bench: devices={jax.devices()}")
    log(f"reads: {genome_len}bp genome, {read_len}bp x{coverage}, k={k}, "
        f"chunk={chunk}")
    reads = gen_reads(genome_len, read_len, coverage)
    words = pack_uniform(reads)
    blocks = make_blocks(words, read_len, cfg.block_reads)
    n_occ = int(reads.shape[0] * (read_len - k + 1))
    log(f"{reads.shape[0]} reads in {len(blocks)} blocks, {n_occ} k-mer occ")

    import jax.numpy as jnp

    from bcalm_tpu.ops import count as count_op

    def count_device(blocks_iter):
        """Full chunked counting + solidity, device-resident: returns
        (solid, counts, minpos device arrays at trimmed cap, n_solid) —
        the production build path (engine.build_from_blocks); forcing
        n_solid materializes every queued device op."""
        unique, counts, minpos, n_unique, stats = engine.count_blocks(
            blocks_iter, cfg)
        n_u = int(n_unique)
        cap = engine._round_capacity(max(1, n_u))
        solid, scounts, spos, n_solid = count_op.filter_abundance_pos(
            unique[:, :cap], counts[:cap], minpos[:cap],
            jnp.asarray(n_u, jnp.int32),
            cfg.abundance_min, cfg.abundance_max,
        )
        return solid, scounts, spos, int(n_solid), n_u, stats

    # warmup/compile with a one-block prefix (same shapes as the real run)
    t0 = time.time()
    count_device(iter(blocks[:1]))
    log(f"warmup (compile) took {time.time()-t0:.1f}s")

    # timed runs: full chunked counting incl. solidity (device-resident,
    # as in the production build path; the checkpoint D2H copy is
    # storage I/O, not counting, and is excluded from the metric)
    times = []
    result = None
    for _ in range(3):
        t0 = time.time()
        result = count_device(iter(blocks))
        times.append(time.time() - t0)
    t_count = min(times)
    solid_d_full, counts_d_full, pos_d_full, n_solid, n_distinct, stats = result
    log(f"count: {t_count*1e3:.1f}ms for {n_occ} occurrences "
        f"({n_distinct} distinct, {n_solid} solid)")
    kmers_per_sec = n_occ / t_count

    # compaction timing (reorder + junctions + run contraction + chains)
    cap = engine._round_capacity(max(1, n_solid))
    solid_d = solid_d_full[:, :cap]
    counts_d = counts_d_full[:cap]
    pos_d = pos_d_full[:cap]
    t0 = time.time()
    _, _, _, info = engine.compact_solid_pos(
        solid_d, counts_d, pos_d, n_solid, k)
    nu = int(info["n_unitigs"])
    log(f"compact warmup {time.time()-t0:.1f}s -> {nu} unitigs")
    times = []
    for _ in range(3):
        t0 = time.time()
        _, _, _, info = engine.compact_solid_pos(
            solid_d, counts_d, pos_d, n_solid, k)
        nu = int(info["n_unitigs"])
        times.append(time.time() - t0)
    t_compact = min(times)
    log(f"compact: {t_compact*1e3:.1f}ms "
        f"({n_solid/max(t_compact,1e-9):.3g} solid k-mers glued/s)")

    print(json.dumps({
        "metric": "canonical_kmers_counted_per_sec_per_chip",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
