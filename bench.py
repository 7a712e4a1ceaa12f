"""Benchmark: canonical k-mers counted/sec/chip (BASELINE.json primary metric).

Synthetic human-like read set (random 1 Mbp genome, 150 bp reads, 24x
coverage), k=31.  Times the jitted device pipeline (extraction + counting +
solidity) and, separately, the compaction kernels; prints ONE JSON line.

vs_baseline: ratio against 1e7 canonical k-mers/s/node, a documented
assumption for reference-class DSK counting throughput on a commodity CPU
node (the repository publishes no numbers — BASELINE.md; the BCALM2 paper
reports "hours for a human genome" on one desktop, consistent with
~1e7/s).  See BASELINE.md for details.
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
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
    return reads


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


def main():
    import jax
    import jax.numpy as jnp

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from bcalm_tpu import engine
    from bcalm_tpu.ops import chains as chains_op
    from bcalm_tpu.ops import count as count_op
    from bcalm_tpu.ops import extract as extract_op
    from bcalm_tpu.ops import junctions as junctions_op

    k = int(os.environ.get("BENCH_K", 31))
    genome_len = int(os.environ.get("BENCH_GENOME", 1_000_000))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    coverage = int(os.environ.get("BENCH_COVERAGE", 24))

    log(f"bench: devices={jax.devices()}")
    log(f"generating reads: {genome_len}bp genome, {read_len}bp x{coverage}")
    reads = gen_reads(genome_len, read_len, coverage)
    t0 = time.time()
    words = pack_uniform(reads)
    lengths = np.full((reads.shape[0],), read_len, dtype=np.int32)
    log(f"packed {reads.shape[0]} reads in {time.time()-t0:.2f}s")
    n_kmer_occ = int(reads.shape[0] * (read_len - k + 1))

    words_d = jnp.asarray(words)
    lengths_d = jnp.asarray(lengths)

    # stage jits kept separate: the remote TPU compiler struggles with one
    # big fused module, and the production engine path is staged anyway
    @jax.jit
    def extract_step(w, ln_):
        canon, valid = extract_op.extract_canonical(w, ln_, k)
        L = canon.shape[0]
        return count_op.fold_sentinel(
            canon.reshape(L, -1), valid.reshape(-1)
        ), valid.reshape(-1)

    def count_step(w, ln_):
        folded, valid = extract_step(w, ln_)
        unique, counts, n_unique = count_op.count_canonical(folded, valid)
        solid, scounts, n_solid = count_op.filter_abundance(
            unique, counts, n_unique, 2, 2**31 - 1
        )
        return unique, counts, n_unique, solid, scounts, n_solid

    def timed(fn, args, sync, reps=4):
        """Honest amortized timing: `reps` back-to-back dispatches with ONE
        data-dependent scalar readback at the end; subtracts the single
        dispatch+readback baseline.  (block_until_ready is unreliable over
        the tunneled backend; a lone readback would add ~25ms tunnel
        latency to every measurement.)"""
        out = fn(*args)
        sync(out)
        t0 = time.time()
        out = fn(*args)
        sync(out)
        t1 = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        tn = time.time() - t0
        est = (tn - t1) / (reps - 1) if reps > 1 else t1
        return max(min(t1, est), 1e-9), out

    log("compiling count step ...")
    t0 = time.time()
    out = count_step(words_d, lengths_d)
    _ = int(out[2])
    log(f"first run (compile+exec): {time.time()-t0:.1f}s")

    t_count, out = timed(count_step, (words_d, lengths_d),
                         lambda o: int(o[2]) + int(o[5]))
    unique, counts, n_unique, solid, scounts, n_solid = out
    n_solid_i = int(n_solid)
    log(f"count: {t_count*1e3:.1f}ms for {n_kmer_occ} k-mer occurrences "
        f"({int(n_unique)} distinct, {n_solid_i} solid)")
    kmers_per_sec = n_kmer_occ / t_count

    # compaction timing (junctions + chains) on padded solid capacity
    cap = engine._round_capacity(n_solid_i)
    solid_c = solid[:, :cap]

    @jax.jit
    def compact_step(sol, ns):
        succ, out_deg = junctions_op.successor_arrays(sol, ns, k)
        C = sol.shape[1]
        oid = jnp.arange(2 * C, dtype=jnp.int32)
        valid_oriented = jnp.where(oid >= C, oid - C, oid) < ns
        info = chains_op.chain_decompose(succ, valid_oriented)
        return info["n_unitigs"], info["uid"], info["rank"]

    t0 = time.time()
    cout = compact_step(solid_c, n_solid)
    _ = int(cout[0])
    log(f"compact first run: {time.time()-t0:.1f}s")
    t_compact, cout = timed(compact_step, (solid_c, n_solid),
                            lambda o: int(o[0]))
    log(f"compact: {t_compact*1e3:.1f}ms -> {int(cout[0])} unitigs "
        f"({n_solid_i/t_compact:.3g} solid k-mers glued/s)")

    print(json.dumps({
        "metric": "canonical_kmers_counted_per_sec_per_chip",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
