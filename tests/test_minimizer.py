"""Minimizer model + repartition tests vs python reference."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.models import lanes as ln
from bcalm_tpu.models import minimizer as mz


def py_mmers(x: int, k: int, m: int):
    return [(x >> (2 * (k - (j + m)))) & ((1 << (2 * m)) - 1)
            for j in range(k - m + 1)]


@pytest.mark.parametrize("k,m", [(13, 5), (21, 8), (31, 10), (33, 10), (63, 10)])
def test_extract_mmers(k, m):
    rng = random.Random(k * m)
    xs = [rng.getrandbits(2 * k) for _ in range(24)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    got = np.asarray(mz.extract_mmers(arr, k, m))
    for i, x in enumerate(xs):
        assert list(got[:, i]) == py_mmers(x, k, m)


def test_lexicographic_minimizer():
    k, m = 21, 5
    rng = random.Random(3)
    xs = [rng.getrandbits(2 * k) for _ in range(50)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    got = np.asarray(mz.minimizers(arr, k, m))
    for i, x in enumerate(xs):
        assert got[i] == min(py_mmers(x, k, m))


def test_frequency_minimizer():
    k, m = 13, 3
    rng = random.Random(5)
    xs = [rng.getrandbits(2 * k) for _ in range(200)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    valid = jnp.ones((len(xs),), bool)
    histo = np.asarray(mz.mmer_histogram(arr, valid, k, m))
    # histogram matches python
    from collections import Counter
    expect = Counter()
    for x in xs:
        expect.update(py_mmers(x, k, m))
    for v in range(4 ** m):
        assert histo[v] == expect.get(v, 0)
    rank = mz.frequency_rank(histo)
    got = np.asarray(mz.minimizers(arr, k, m, jnp.asarray(rank)))
    for i, x in enumerate(xs):
        mm = py_mmers(x, k, m)
        best = min(mm, key=lambda v: (histo[v], v))
        assert got[i] == best, i


@pytest.mark.parametrize("rtype", [0, 1])
def test_repartition_balance(rtype):
    rng = np.random.RandomState(0)
    load = rng.zipf(1.5, size=4 ** 5).astype(np.int64)
    table = mz.build_repartition(load, 8, repartition_type=rtype)
    assert table.shape == (4 ** 5,)
    assert table.min() >= 0 and table.max() < 8
    if rtype == 1:
        per = np.bincount(table, weights=load, minlength=8)
        assert per.max() <= per.min() + load.max()


def test_partition_of_deterministic():
    k, m = 21, 5
    rng = random.Random(11)
    xs = [rng.getrandbits(2 * k) for _ in range(64)]
    arr = jnp.asarray(ln.ints_to_lanes(xs, k))
    table = jnp.asarray(np.arange(4 ** m, dtype=np.int32) % 8)
    p1 = np.asarray(mz.partition_of(arr, k, m, table))
    p2 = np.asarray(mz.partition_of(arr, k, m, table))
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 8
