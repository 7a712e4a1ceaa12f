"""Distributed junction/edge construction vs single-device engine."""

import random

import numpy as np
import pytest

import jax

from bcalm_tpu import engine
from bcalm_tpu.oracle import brute
from bcalm_tpu.parallel import distcompact, pipeline


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return pipeline.make_mesh(8)


def split_solid(solid, counts, n_dev):
    """Partition a solid set across devices by the routing hash."""
    import jax.numpy as jnp
    from bcalm_tpu.ops import hashing

    owner = np.asarray(hashing.hash_lanes(jnp.asarray(solid))) % n_dev
    per_s, per_c = [], []
    for d in range(n_dev):
        m = owner == d
        per_s.append(solid[:, m])
        per_c.append(counts[m])
    return per_s, per_c


@pytest.mark.parametrize("seed,k,amin", [(0, 13, 1), (1, 21, 2), (3, 33, 1)])
def test_distributed_compact_matches(mesh, seed, k, amin):
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(500))
    reads = [genome[i : i + rng.randint(k + 2, k + 40)]
             for i in [rng.randrange(0, 450) for _ in range(150)]]
    cfg = engine.EngineConfig(k=k, abundance_min=amin, block_reads=64,
                              max_len=128)
    from bcalm_tpu.io import packing

    blocks = packing.iter_blocks(reads, k, block_reads=64, max_len=128)
    solid, counts, _, _, _ = engine.count_and_filter(blocks, cfg)
    if solid.shape[1] == 0:
        pytest.skip("no solid kmers")

    per_s, per_c = split_solid(solid, counts, 8)
    got = distcompact.distributed_compact(mesh, per_s, per_c, k)
    expect = engine.compact_from_counts(solid, counts, cfg)

    assert brute.canonical_unitig_set(got.seqs) == \
        brute.canonical_unitig_set(expect.seqs)
    km = lambda us: {
        brute.unitig_key(s): (int(us.kc[i]), sorted(us.abundances[i]))
        for i, s in enumerate(us.seqs)
    }
    assert km(got) == km(expect)
    assert len(got.links) == len(expect.links)


def test_circular_distributed(mesh):
    k = 7
    reads = ["ACTTAGCGGACTTAGC"]
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=8, max_len=32)
    from bcalm_tpu.io import packing

    blocks = packing.iter_blocks(reads, k, block_reads=8, max_len=32)
    solid, counts, _, _, _ = engine.count_and_filter(blocks, cfg)
    per_s, per_c = split_solid(solid, counts, 8)
    got = distcompact.distributed_compact(mesh, per_s, per_c, k)
    assert len(got.seqs) == 1 and bool(got.circular[0])
