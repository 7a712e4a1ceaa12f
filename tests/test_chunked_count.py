"""Chunked streaming counting must match single-shot counting exactly."""

import random

import numpy as np

from bcalm_tpu import engine
from bcalm_tpu.oracle import brute


def test_multi_chunk_counting_matches_oracle():
    rng = random.Random(42)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    reads = [genome[i: i + 60] for i in range(0, 540, 3)] * 2
    k = 21
    # tiny chunks force many flushes + a hierarchical merge
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=16,
                              max_len=64, chunk_kmers=512)
    us = engine.build_from_seqs(reads, cfg)
    expect = brute.build(reads, k, abundance_min=1)
    assert brute.canonical_unitig_set(us.seqs) == \
        brute.canonical_unitig_set([u.seq for u in expect.unitigs])
    km = {brute.unitig_key(s): int(us.kc[i]) for i, s in enumerate(us.seqs)}
    ekm = {brute.unitig_key(u.seq): u.kc for u in expect.unitigs}
    assert km == ekm


def test_chunk_boundary_exact():
    """Counts identical across chunk sizes (boundary occurrences merge)."""
    rng = random.Random(7)
    reads = ["".join(rng.choice("ACGT") for _ in range(50)) for _ in range(40)]
    k = 13
    results = []
    for chunk in (256, 1024, 1 << 20):
        cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=8,
                                  max_len=64, chunk_kmers=chunk)
        from bcalm_tpu.io import packing

        blocks = packing.iter_blocks(reads, k, block_reads=8, max_len=64)
        solid, counts, minpos, histo, stats = engine.count_and_filter(blocks, cfg)
        results.append((solid.tolist(), counts.tolist()))
    assert results[0] == results[1] == results[2]
