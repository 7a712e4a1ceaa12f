"""Out-of-core counting: adaptive multi-pass key-range partitioning must
reproduce in-HBM counting exactly.

The reference sizes (pass x partition) disk staging so any dataset fits
RAM (gatb ConfigurationAlgorithm, SURVEY.md §3.2; legacy -dsk-memory /
-dsk-disk at /root/reference/src/bcalm_1.cpp:22-23); here HBM plays the
role of RAM, passes re-read the input (or a packed-block cache, memmap
under -max-disk staging), and each pass's key range is chosen by
saturation-model quantile splits when device residency overflows.
"""

import random

import numpy as np

from bcalm_tpu import engine
from bcalm_tpu.io import packing
from bcalm_tpu.models import lanes as ln
from bcalm_tpu.oracle import brute


def _reads(seed, genome_len, read_len, step, copies=2):
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(genome_len))
    return [genome[i: i + read_len]
            for i in range(0, genome_len - read_len, step)] * copies


def _oracle_counts(reads, k):
    counts = brute.count_kmers(reads, k)
    keys = sorted(counts)
    return keys, [counts[x] for x in keys]


def _tiny_ooc_cfg(k, chunk=512, resident=1024):
    # chunk + residency budgets far below the dataset's distinct count so
    # the spill path and multi-range merge actually run
    return engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                               max_len=64, chunk_kmers=chunk,
                               resident_kmers=resident)


def test_spill_path_counts_match_oracle():
    reads = _reads(11, 4000, 60, 3)
    k = 21
    cfg = _tiny_ooc_cfg(k)
    blocks = packing.iter_blocks(reads, k, block_reads=16, max_len=64)
    unique, counts, minpos, n_u, stats = engine.count_blocks(blocks, cfg)
    # the multi-pass path must actually trigger, and must return host arrays
    assert stats.get("ooc_passes", 0) > 1
    assert stats.get("ooc_ranges", 0) > 1
    assert isinstance(unique, np.ndarray)
    keys, expect = _oracle_counts(reads, k)
    got = ln.lanes_to_ints(unique)
    assert n_u == len(keys)
    assert list(got) == keys                 # globally sorted, exact set
    assert list(np.asarray(counts)) == expect


def test_spill_and_resident_results_identical():
    reads = _reads(5, 1500, 50, 2)
    k = 13
    results = []
    for resident in (512, 1 << 30):
        cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=8,
                                  max_len=64, chunk_kmers=256,
                                  resident_kmers=resident)
        blocks = packing.iter_blocks(reads, k, block_reads=8, max_len=64)
        solid, counts, minpos, histo, stats = engine.count_and_filter(blocks, cfg)
        results.append((solid.tolist(), counts.tolist(), histo.tolist()))
    assert results[0] == results[1]


def test_ooc_end_to_end_build_matches_in_memory():
    # ~3.5k distinct k-mers vs the 2048-slot budget floor (2 x chunk_cap):
    # genuinely beyond-budget so multi-pass engages even after transient
    # duplicate inflation is collapsed by the pre-split merge
    reads = _reads(7, 3500, 55, 3)
    k = 17
    us_ooc = engine.build_from_seqs(reads, _tiny_ooc_cfg(k))
    us_mem = engine.build_from_seqs(
        reads, engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                                   max_len=64))
    assert us_ooc.stats.get("ooc_passes", 0) > 1
    assert (brute.canonical_unitig_set(us_ooc.seqs)
            == brute.canonical_unitig_set(us_mem.seqs))
    km_o = {brute.unitig_key(s): int(us_ooc.kc[i])
            for i, s in enumerate(us_ooc.seqs)}
    km_m = {brute.unitig_key(s): int(us_mem.kc[i])
            for i, s in enumerate(us_mem.seqs)}
    assert km_o == km_m
    assert us_ooc.histogram.tolist() == us_mem.histogram.tolist()


def test_merge_host_runs_duplicates_and_shared_prefixes():
    """Direct merge test: duplicate keys across runs sum their counts, and
    keys sharing a long prefix (same top lanes) split correctly."""
    k = 33  # L=3: exercises multi-lane structured keys
    L = ln.num_lanes(k)
    rng = np.random.RandomState(3)
    # 3 overlapping sets of k-mer values, incl. a shared-prefix cluster
    base = rng.randint(0, 4, size=(40, k))
    cluster = np.tile(base[0], (12, 1))
    cluster[:, -1] = np.arange(12) % 4
    cluster[:, -2] = np.arange(12) // 4
    all_vals = sorted({int(brute.str2num("".join("ACTG"[c] for c in row)))
                       for row in np.concatenate([base, cluster])})
    runs = []
    expect = {}
    for s in range(3):
        pick = sorted(rng.choice(len(all_vals),
                                 size=len(all_vals) // 2, replace=False))
        vals = [all_vals[i] for i in pick]
        cnts = rng.randint(1, 5, size=len(vals)).astype(np.int32)
        runs.append((ln.ints_to_lanes(vals, k), cnts))
        for v, c in zip(vals, cnts):
            expect[v] = expect.get(v, 0) + int(c)
    lanes, counts, _mp, n_ranges = engine.merge_host_runs(runs, merge_cap=1)
    got = {int(v): int(c)
           for v, c in zip(ln.lanes_to_ints(lanes), counts)}
    assert got == expect
    vals_sorted = list(ln.lanes_to_ints(lanes))
    assert vals_sorted == sorted(vals_sorted)


def test_merge_host_runs_multi_range():
    k = 15
    rng = np.random.RandomState(9)
    vals = sorted({int(x) for x in rng.randint(0, 4 ** k, size=9000)})
    runs = []
    expect = {}
    for s in range(4):
        pick = sorted(rng.choice(len(vals), size=6000, replace=True))
        pv = sorted({vals[i] for i in pick})
        cnts = np.ones(len(pv), np.int32)
        runs.append((ln.ints_to_lanes(pv, k), cnts))
        for v in pv:
            expect[v] = expect.get(v, 0) + 1
    lanes, counts, _mp, n_ranges = engine.merge_host_runs(runs, merge_cap=1024)
    assert n_ranges > 4
    got = {int(v): int(c) for v, c in zip(ln.lanes_to_ints(lanes), counts)}
    assert got == expect


def test_multipass_reread_no_cache():
    """reread callable: later passes re-read the input instead of caching
    packed blocks (the CLI wires bank re-opening here, matching the
    reference's P full input reads per DSK run — SURVEY.md §4.2)."""
    reads = _reads(11, 4000, 60, 3)
    k = 21
    cfg = _tiny_ooc_cfg(k)

    def mk():
        return packing.iter_blocks(reads, k, block_reads=16, max_len=64)

    unique, counts, minpos, n_u, stats = engine.count_blocks(
        mk(), cfg, reread=mk)
    assert stats.get("ooc_passes", 0) > 1
    keys, expect = _oracle_counts(reads, k)
    assert list(ln.lanes_to_ints(unique)) == keys
    assert list(np.asarray(counts)) == expect


def test_multipass_disk_staging(tmp_path):
    """spill_dir: the packed-block cache stages through a memmap file
    (the `-max-disk` disk-staging analog, /root/reference/README.md:103),
    and the staging file is removed afterwards."""
    import os

    reads = _reads(13, 3000, 60, 3)
    k = 21
    cfg = _tiny_ooc_cfg(k)
    cfg.spill_dir = str(tmp_path)
    blocks = packing.iter_blocks(reads, k, block_reads=16, max_len=64)
    unique, counts, minpos, n_u, stats = engine.count_blocks(blocks, cfg)
    assert stats.get("ooc_passes", 0) > 1
    keys, expect = _oracle_counts(reads, k)
    assert list(ln.lanes_to_ints(unique)) == keys
    assert list(np.asarray(counts)) == expect
    assert os.listdir(tmp_path) == []   # staging cleaned up


def test_max_disk_exceeded_raises(tmp_path):
    reads = _reads(17, 3000, 60, 3)
    k = 21
    cfg = _tiny_ooc_cfg(k)
    cfg.spill_dir = str(tmp_path)
    cfg.max_disk_mb = 1
    # force a cache far beyond 1 MB by repeating the reads
    big = reads * 40
    blocks = packing.iter_blocks(big, k, block_reads=16, max_len=64)
    try:
        engine.count_blocks(blocks, cfg)
    except RuntimeError as e:
        assert "max-disk" in str(e)
    else:
        raise AssertionError("expected -max-disk overflow to raise")


def test_pass_count_near_optimal():
    """The saturation-model splitter must choose ~ceil(distinct/budget)
    passes, not cascade reactive splits (the 12-passes-where-2-suffice
    bug: transient duplicate inflation + min-2 forced splits)."""
    reads = _reads(23, 6000, 60, 2, copies=3)   # ~6k distinct, cov ~6
    k = 21
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                              max_len=64, chunk_kmers=512,
                              resident_kmers=2048)
    # budget floor = max(2048, 2*chunk_cap); block geometry gives
    # chunk_cap 1024 -> budget 2048; distinct ~6k -> optimal ~3 ranges
    blocks = packing.iter_blocks(reads, k, block_reads=16, max_len=64)
    unique, counts, minpos, n_u, stats = engine.count_blocks(blocks, cfg)
    assert isinstance(unique, np.ndarray)
    n_distinct = int(n_u)
    budget = 2048
    optimal = -(-n_distinct // budget)
    assert stats["ooc_passes"] <= optimal + 2, (
        f"{stats['ooc_passes']} passes for {n_distinct} distinct at "
        f"budget {budget} (optimal ~{optimal})")
    keys, expect = _oracle_counts(reads, k)
    assert list(ln.lanes_to_ints(unique)) == keys
    assert list(np.asarray(counts)) == expect
