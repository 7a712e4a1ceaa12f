"""Unit tests for multi-lane k-mer arithmetic against a big-int reference."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.models import lanes as ln


def py_revcomp_int(x: int, k: int) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | ((x & 3) ^ 2)
        x >>= 2
    return out


def py_revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def rand_kmer_int(rng, k):
    return rng.getrandbits(2 * k)


KS = [1, 7, 13, 16, 17, 31, 32, 33, 63, 65, 128, 320]


@pytest.mark.parametrize("k", KS)
def test_int_roundtrip(k):
    rng = random.Random(k)
    for _ in range(20):
        x = rand_kmer_int(rng, k)
        assert ln.lanes_to_int(ln.int_to_lanes(x, k)) == x


@pytest.mark.parametrize("k", [5, 13, 21, 31, 33, 63])
def test_string_roundtrip(k):
    rng = random.Random(k + 1)
    s = "".join(rng.choice("ACGT") for _ in range(k))
    assert ln.int_to_string(ln.string_to_int(s), k) == s
    # complement convention: A=0 C=1 T=2 G=3, comp = xor 2
    assert ln.int_to_string(py_revcomp_int(ln.string_to_int(s), k), k) == py_revcomp_str(s)


@pytest.mark.parametrize("k", KS)
def test_revcomp_batch(k):
    rng = random.Random(2 * k)
    xs = [rand_kmer_int(rng, k) for _ in range(32)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    rc = np.asarray(ln.revcomp(arr, k))
    for i, x in enumerate(xs):
        assert ln.lanes_to_int(rc[:, i]) == py_revcomp_int(x, k), (k, i)


@pytest.mark.parametrize("k", KS)
def test_canonical_and_compare(k):
    rng = random.Random(3 * k)
    xs = [rand_kmer_int(rng, k) for _ in range(32)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    canon, was_rc = ln.canonical(arr, k)
    canon = np.asarray(canon)
    was_rc = np.asarray(was_rc)
    for i, x in enumerate(xs):
        r = py_revcomp_int(x, k)
        assert ln.lanes_to_int(canon[:, i]) == min(x, r)
        assert bool(was_rc[i]) == (r < x)


@pytest.mark.parametrize("k", [2, 13, 21, 31, 33, 63, 65])
def test_affixes(k):
    rng = random.Random(5 * k)
    xs = [rand_kmer_int(rng, k) for _ in range(32)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    suf = np.asarray(ln.suffix_kminus1(arr, k))
    pre = np.asarray(ln.prefix_kminus1(arr, k))
    fb = np.asarray(ln.first_base(arr, k))
    lb = np.asarray(ln.last_base(arr, k))
    mask = (1 << (2 * (k - 1))) - 1
    for i, x in enumerate(xs):
        assert ln.lanes_to_int(suf[:, i]) == (x & mask)
        assert ln.lanes_to_int(pre[:, i]) == (x >> 2)
        assert int(fb[i]) == (x >> (2 * (k - 1))) & 3
        assert int(lb[i]) == x & 3


@pytest.mark.parametrize("k", [13, 31, 33, 63])
def test_append_base(k):
    rng = random.Random(7 * k)
    xs = [rand_kmer_int(rng, k) for _ in range(16)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    for b in range(4):
        out = np.asarray(ln.append_base(arr, b, k))
        for i, x in enumerate(xs):
            expect = ((x << 2) | b) & ((1 << (2 * k)) - 1)
            assert ln.lanes_to_int(out[:, i]) == expect


def test_palindrome():
    # AT is its own rc under any encoding; ACGT: rc(ACGT) = ACGT
    for s in ["AT", "ACGT", "AATT", "GATC"]:
        k = len(s)
        arr = jnp.asarray(ln.int_to_lanes(ln.string_to_int(s), k))[:, None]
        assert bool(np.asarray(ln.is_palindrome(arr, k))[0]) == (
            py_revcomp_str(s) == s
        )
    arr = jnp.asarray(ln.int_to_lanes(ln.string_to_int("ACT"), 3))[:, None]
    assert not bool(np.asarray(ln.is_palindrome(arr, 3))[0])
