"""Counting op vs python Counter oracle."""

import random
from collections import Counter

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.io import packing
from bcalm_tpu.models import lanes as ln
from bcalm_tpu.oracle import brute
from bcalm_tpu.ops import count as cnt
from bcalm_tpu.ops import extract


def device_counts(seqs, k, max_len=128):
    all_lanes, all_valid = [], []
    for block in packing.iter_blocks(seqs, k, block_reads=64, max_len=max_len):
        canon, valid = extract.extract_canonical(
            jnp.asarray(block.words), jnp.asarray(block.lengths), k
        )
        L = canon.shape[0]
        all_lanes.append(canon.reshape(L, -1))
        all_valid.append(valid.reshape(-1))
    lanes = jnp.concatenate(all_lanes, axis=1)
    valid = jnp.concatenate(all_valid)
    unique, counts, n = cnt.count_canonical(lanes, valid)
    n = int(n)
    out = {}
    u = np.asarray(unique)[:, :n]
    c = np.asarray(counts)[:n]
    for i in range(n):
        out[ln.lanes_to_int(u[:, i])] = int(c[i])
    return unique, counts, n, out


@pytest.mark.parametrize("k", [5, 13, 21, 31, 33])
def test_counts_match_oracle(k):
    rng = random.Random(k)
    genome = "".join(rng.choice("ACGT") for _ in range(300))
    reads = [
        genome[i : i + rng.randint(k + 3, k + 50)]
        for i in [rng.randrange(0, 250) for _ in range(80)]
    ]
    _, _, _, got = device_counts(reads, k)
    expect = brute.count_kmers(reads, k)
    assert got == expect


def test_sorted_unique_output():
    k = 13
    rng = random.Random(7)
    reads = ["".join(rng.choice("ACGT") for _ in range(40)) for _ in range(30)]
    unique, counts, n, got = device_counts(reads, k)
    u = np.asarray(unique)[:, :n]
    vals = [ln.lanes_to_int(u[:, i]) for i in range(n)]
    assert vals == sorted(vals)
    assert len(set(vals)) == len(vals)


def test_abundance_filter_and_histogram():
    k = 13
    rng = random.Random(9)
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    reads = [genome] * 3 + [
        "".join(rng.choice("ACGT") for _ in range(30)) for _ in range(5)
    ]
    unique, counts, n, got = device_counts(reads, k)
    solid, scounts, ns = cnt.filter_abundance(unique, counts, n, 2, 2**31 - 1)
    ns = int(ns)
    expect_solid = brute.solid_kmers(got, 2)
    su = np.asarray(solid)[:, :ns]
    sc = np.asarray(scounts)[:ns]
    got_solid = {ln.lanes_to_int(su[:, i]): int(sc[i]) for i in range(ns)}
    assert got_solid == expect_solid

    histo = np.asarray(cnt.abundance_histogram(counts, jnp.asarray(n), histo_max=100))
    expect_histo = Counter(got.values())
    for c, num in expect_histo.items():
        assert histo[min(c, 100)] >= num
    assert histo.sum() == len(got)
