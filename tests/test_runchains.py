"""Positioned (locality-ordered) compaction vs the canonical-order path.

Positions are a performance hint only: ANY uint32 position array must give
byte-identical unitig content (up to orientation), including adversarial
ones — shuffled, constant, wrapped.  These tests pin that invariant.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from bcalm_tpu import engine
from bcalm_tpu.io import packing
from bcalm_tpu.oracle import brute


def _counted(reads, k, amin=1):
    cfg = engine.EngineConfig(k=k, abundance_min=amin, block_reads=16,
                              max_len=128)
    blocks = packing.iter_blocks(reads, k, block_reads=16, max_len=128)
    solid, counts, minpos, histo, stats = engine.count_and_filter(blocks, cfg)
    return solid, counts, minpos, cfg


def _unitig_content(us):
    km = {
        brute.content_key(s, us.k, bool(us.circular[i])):
            (int(us.kc[i]), sorted(int(a) for a in us.abundances[i]))
        for i, s in enumerate(us.seqs)
    }
    return brute.content_unitig_set(us.seqs, us.circular, us.k), km, sorted(
        map(bool, us.circular))


def _genome_reads(seed, glen, rlen, cov):
    rng = random.Random(seed)
    g = "".join(rng.choice("ACGT") for _ in range(glen))
    reads = []
    for _ in range(glen * cov // rlen):
        i = rng.randrange(0, glen - rlen)
        reads.append(g[i:i + rlen])
    return reads


@pytest.mark.parametrize("seed,glen,k", [(0, 800, 21), (1, 1500, 13),
                                         (2, 600, 31)])
def test_positioned_matches_plain(seed, glen, k):
    reads = _genome_reads(seed, glen, 100, 4)
    solid, counts, minpos, cfg = _counted(reads, k)
    if solid.shape[1] == 0:
        pytest.skip("no solid kmers")
    plain = engine.compact_from_counts(solid, counts, cfg)
    pos = engine.compact_from_counts(solid, counts, cfg, minpos_np=minpos)
    assert _unitig_content(pos) == _unitig_content(plain)


@pytest.mark.parametrize("kind", ["shuffled", "constant", "reversed",
                                  "wrapped"])
def test_positions_are_performance_hint_only(kind):
    reads = _genome_reads(3, 1000, 90, 3)
    k = 17
    solid, counts, minpos, cfg = _counted(reads, k)
    n = solid.shape[1]
    rng = np.random.RandomState(5)
    if kind == "shuffled":
        adversarial = rng.permutation(n).astype(np.uint32) * 2
    elif kind == "constant":
        adversarial = np.zeros(n, np.uint32)
    elif kind == "reversed":
        adversarial = (np.arange(n, 0, -1).astype(np.uint32)) * 2 + 1
    else:  # wrapped: duplicates + strand noise
        adversarial = (rng.randint(0, 7, size=n).astype(np.uint32) * 2
                       | rng.randint(0, 2, size=n).astype(np.uint32))
    plain = engine.compact_from_counts(solid, counts, cfg)
    pos = engine.compact_from_counts(solid, counts, cfg,
                                     minpos_np=adversarial)
    assert _unitig_content(pos) == _unitig_content(plain)


def test_positioned_circular_unitig():
    # example/circular_unitigs_unittests/test1: one circular contig
    reads = ["ACTTAGCGGACTTAGC"]
    k = 7
    solid, counts, minpos, cfg = _counted(reads, k)
    us = engine.compact_from_counts(solid, counts, cfg, minpos_np=minpos)
    assert len(us.seqs) == 1 and bool(us.circular[0])
    plain = engine.compact_from_counts(solid, counts, cfg)
    assert _unitig_content(us) == _unitig_content(plain)


def test_positioned_full_build_oracle():
    reads = _genome_reads(7, 1200, 80, 5) + ["ACGT" * 10] * 3
    k = 15
    cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=16,
                              max_len=128)
    got = engine.build_from_seqs(reads, cfg)
    expect = brute.build(reads, k, abundance_min=2)
    assert brute.canonical_unitig_set(got.seqs) == \
        brute.canonical_unitig_set([u.seq for u in expect.unitigs])


def test_positioned_ooc_spill_build():
    reads = _genome_reads(9, 1500, 60, 3)
    k = 19
    # small blocks keep the 2-chunk budget floor (2 * chunk_cap) below
    # the ~1.3k distinct k-mers so multi-pass genuinely engages
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=8,
                              max_len=48, chunk_kmers=256,
                              resident_kmers=256)
    got = engine.build_from_seqs(reads, cfg)
    assert got.stats.get("ooc_passes", 0) > 1
    cfg2 = engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                               max_len=64)
    expect = engine.build_from_seqs(reads, cfg2)
    assert _unitig_content(got) == _unitig_content(expect)
