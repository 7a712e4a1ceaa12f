"""End-to-end engine vs brute-force oracle on fixtures + random genomes.

The content-equality oracle follows the reference's own test semantics
(/root/reference/test/simple_test.sh: k-mer content equality; BASELINE:
unitig sets equal up to orientation/ID permutation).
"""

import random

import numpy as np
import pytest

from bcalm_tpu import engine
from bcalm_tpu.oracle import brute
from tests.test_oracle import TINY, MINITIP_SEQS, CIRC1, CIRC2, CIRC3, PUFFERIZE


def to_brute_graph(us: engine.UnitigSet) -> brute.CompactedGraph:
    unitigs = [
        brute.Unitig(seq=s, kc=int(us.kc[i]), abundances=list(us.abundances[i]),
                     is_circular=bool(us.circular[i]))
        for i, s in enumerate(us.seqs)
    ]
    return brute.CompactedGraph(k=us.k, unitigs=unitigs, links=list(us.links))


def compare(seqs, k, amin=1, amax=2**31 - 1):
    cfg = engine.EngineConfig(k=k, abundance_min=amin, abundance_max=amax,
                              block_reads=32, max_len=128)
    got = engine.build_from_seqs(seqs, cfg)
    expect = brute.build(seqs, k, abundance_min=amin, abundance_max=amax)

    got_set = brute.content_unitig_set(got.seqs, got.circular, k)
    exp_set = brute.content_unitig_set(
        [u.seq for u in expect.unitigs],
        [u.is_circular for u in expect.unitigs], k)
    assert got_set == exp_set

    # KC / km / abundance vectors match per unitig (keyed by canonical seq;
    # circular unitigs keyed rotation-invariantly — their break point is
    # algorithm-dependent)
    def kc_map(unitigs):
        return {brute.content_key(u.seq, k, u.is_circular):
                (u.kc, sorted(u.abundances)) for u in unitigs}

    assert kc_map(to_brute_graph(got).unitigs) == kc_map(expect.unitigs)

    # link sets match modulo orientation/ID permutation
    assert (brute.canonical_link_set(to_brute_graph(got))
            == brute.canonical_link_set(expect))

    # circular flags (keyed)
    got_circ = {brute.content_key(s, k, True)
                for i, s in enumerate(got.seqs) if got.circular[i]}
    exp_circ = {brute.content_key(u.seq, k, True)
                for u in expect.unitigs if u.is_circular}
    assert got_circ == exp_circ
    return got


def test_tiny_read():
    got = compare([TINY], 13, amin=1)
    assert len(got.seqs) == 1


def test_minitip():
    got = compare(MINITIP_SEQS, 21, amin=2)
    assert len(got.seqs) == 1 and len(got.seqs[0]) == 40
    compare(MINITIP_SEQS, 21, amin=1)


def test_circular():
    got = compare([CIRC1], 7, amin=1)
    assert bool(got.circular[0])


def test_polyA():
    compare([CIRC2], 7, amin=1)


def test_circular_decoy():
    compare(CIRC3, 7, amin=1)


def test_pufferize():
    compare(PUFFERIZE, 9, amin=1)


def test_spec_example():
    compare(["GTATAC"], 3, amin=1)


@pytest.mark.parametrize("seed,k,amin", [
    (0, 5, 1), (1, 7, 1), (2, 11, 2), (3, 21, 1), (4, 21, 2), (5, 31, 1),
    (6, 33, 1),
])
def test_random_genomes(seed, k, amin):
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reads = []
    for _ in range(150):
        i = rng.randrange(0, len(genome) - k - 10)
        reads.append(genome[i: i + rng.randint(k + 2, k + 40)])
    compare(reads, k, amin=amin)


def test_repeat_heavy():
    """Short tandem repeats stress self-loops and tiny cycles."""
    seqs = ["ATATATATATATATAT", "ACGACGACGACGACG", "AAAAAAAAAA",
            "ACGTACGTACGTACGT"]
    for k in (5, 7):
        compare(seqs, k, amin=1)


def test_abundance_max():
    seqs = ["ACGTTGCATGCAAGGT"] * 5 + ["TTGCATGCA"]
    compare(seqs, 7, amin=1, amax=5)


def test_combine_sample_counts_kinds():
    """Solidity-kind combination semantics (gatb CountProcessorSolidity over
    multiple banks): sum/min/max with absence-as-zero for min."""
    import numpy as np
    from bcalm_tpu import engine

    # lanes encode 3 distinct k-mers: a, b, c (1-lane keys for simplicity)
    a, b, c = 10, 20, 30
    run1 = (np.array([[a, b]], np.uint32), np.array([3, 5], np.int32))
    run2 = (np.array([[b, c]], np.uint32), np.array([2, 7], np.int32))

    lanes, agg = engine.combine_sample_counts([run1, run2], "sum")
    assert lanes[0].tolist() == [a, b, c]
    assert agg.tolist() == [3, 7, 7]

    _, agg = engine.combine_sample_counts([run1, run2], "min")
    assert agg.tolist() == [0, 2, 0]  # a, c absent from one sample

    _, agg = engine.combine_sample_counts([run1, run2], "max")
    assert agg.tolist() == [3, 5, 7]


def test_auto_abundance_min():
    import numpy as np
    from bcalm_tpu import engine

    # classic bimodal histogram: error peak at 1, valley at 3, peak at 8
    h = np.array([0, 1000, 300, 20, 35, 80, 200, 400, 500, 300, 100])
    assert engine.auto_abundance_min(h) == 3
    assert engine.auto_abundance_min(h, cap=2) == 2
    # monotone histogram: falls back to 2
    assert engine.auto_abundance_min(np.array([0, 9, 8, 7, 6, 5, 4])) == 2


@pytest.mark.parametrize("k", [33, 51, 63])
def test_large_k_end_to_end(k):
    """Multi-lane k-mer spans (k > 32: 3-4 uint32 lanes) through the full
    pipeline vs the oracle — the BASELINE configs go to k=63 (the analog
    of the reference's KSIZE_LIST 64-span instantiation, README.md:93-99)."""
    rng = random.Random(k)
    genome = "".join(rng.choice("ACTG") for _ in range(400))
    reads = [genome[i:i + 90] for i in range(0, 310, 7)]
    compare(reads, k, amin=1)
    # abundance filtering at large k: duplicate half the reads, amin=2
    compare(reads + reads[::2], k, amin=2)


@pytest.mark.slow
def test_k127_end_to_end():
    """k=127 (8 uint32 lanes — beyond the 2-lane-pair regime) end-to-end vs
    the oracle: the KSIZE_LIST "128-span" analog, README.md:93-99.  Lanes
    are unit-tested to k=320; this proves the full build path at >4 lanes."""
    rng = random.Random(127)
    genome = "".join(rng.choice("ACTG") for _ in range(500))
    reads = [genome[i:i + 160] for i in range(0, 330, 11)]
    cfg = engine.EngineConfig(k=127, abundance_min=1, block_reads=16,
                              max_len=160)
    got = engine.build_from_seqs(reads, cfg)
    expect = brute.build(reads, 127, abundance_min=1)
    assert (brute.canonical_unitig_set(got.seqs)
            == brute.canonical_unitig_set([u.seq for u in expect.unitigs]))
    assert (brute.canonical_link_set(to_brute_graph(got))
            == brute.canonical_link_set(expect))
