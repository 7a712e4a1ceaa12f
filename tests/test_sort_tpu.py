"""Pallas bitonic sort kernels, validated in interpreter mode on CPU
(the UF-test analog for the sort workhorse: correctness of keys AND
payload-tuple integrity under heavy key duplication)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.ops import sort_tpu


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(sort_tpu, "_INTERPRET", True)


@pytest.mark.parametrize("dup_range", [50, 2**32])
def test_sort_matches_lexsort(dup_range):
    N = 1 << 18  # 4 tiles
    rng = np.random.RandomState(0)
    k0 = rng.randint(0, dup_range, size=N, dtype=np.uint64).astype(np.uint32)
    k1 = rng.randint(0, 3, size=N).astype(np.uint32)
    pay = np.arange(N, dtype=np.uint32)
    out = sort_tpu.sort_ops(
        [jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(pay)], num_keys=2
    )
    o0, o1, op_ = [np.asarray(x) for x in out]
    ref = np.lexsort((k1, k0))
    assert np.array_equal(o0, k0[ref])
    assert np.array_equal(o1, k1[ref])
    # payload stays welded to its key tuple and remains a permutation
    assert np.array_equal(np.sort(op_), pay)
    assert np.array_equal(k0[op_], o0)
    assert np.array_equal(k1[op_], o1)


def test_small_input_falls_back():
    N = 1 << 10
    rng = np.random.RandomState(1)
    k = rng.randint(0, 100, size=N, dtype=np.uint64).astype(np.uint32)
    out = sort_tpu.sort_ops([jnp.asarray(k)], num_keys=1)
    assert np.array_equal(np.asarray(out[0]), np.sort(k))
