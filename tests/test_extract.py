"""Extraction kernel vs a straightforward python reference."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.io import packing
from bcalm_tpu.models import lanes as ln
from bcalm_tpu.ops import extract


def py_canonical_kmers(seq: str, k: int):
    """All canonical k-mers of a read as python ints (invalid chars split).

    Canonical = min in the ENCODED order A<C<T<G (gatb convention, same as
    the reference oracle /root/reference/scripts/unitigEvaluator.cpp:64-82),
    not ASCII order.
    """
    out = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for i in range(len(seq) - k + 1):
        sub = seq[i : i + k]
        if any(c not in "ACGT" for c in sub):
            continue
        rc = "".join(comp[c] for c in reversed(sub))
        out.append(min(ln.string_to_int(sub), ln.string_to_int(rc)))
    return out


def run_extract(seqs, k, max_len=64):
    got = []
    for block in packing.iter_blocks(seqs, k, block_reads=8, max_len=max_len):
        canon, valid = extract.extract_canonical(
            jnp.asarray(block.words), jnp.asarray(block.lengths), k
        )
        canon = np.asarray(canon)
        valid = np.asarray(valid)
        for b in range(block.capacity):
            for p in range(valid.shape[1]):
                if valid[b, p]:
                    got.append(ln.lanes_to_int(canon[:, b, p]))
    return got


@pytest.mark.parametrize("k", [5, 13, 16, 21, 31, 33])
def test_random_reads(k):
    rng = random.Random(k)
    seqs = [
        "".join(rng.choice("ACGT") for _ in range(rng.randint(k, 60)))
        for _ in range(20)
    ]
    expect = []
    for s in seqs:
        expect.extend(py_canonical_kmers(s, k))
    got = run_extract(seqs, k)
    assert sorted(got) == sorted(expect)


def test_n_handling():
    k = 5
    seqs = ["ACGTANACGTACGTA", "NNNNN", "ACGNT"]
    expect = []
    for s in seqs:
        expect.extend(py_canonical_kmers(s, k))
    got = run_extract(seqs, k)
    assert sorted(got) == sorted(expect)


def test_long_read_chunking():
    k = 21
    rng = random.Random(99)
    s = "".join(rng.choice("ACGT") for _ in range(1000))
    expect = py_canonical_kmers(s, k)
    got = run_extract([s], k, max_len=128)
    assert sorted(got) == sorted(expect)
    assert len(got) == len(expect)  # chunk overlap must not duplicate k-mers


def test_tiny_read_fixture():
    """The reference smoke fixture (/root/reference/example/tiny_read.fa,
    run-tiny.sh uses k=13): 25bp read -> 13 k-mers."""
    seq = "ACTGCTGACTGAGTCATGTGTGGGT"
    got = run_extract([seq], 13)
    assert len(got) == 13
    assert got == py_canonical_kmers(seq, 13)
