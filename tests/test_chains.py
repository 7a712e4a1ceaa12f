"""Unit tests for chain decomposition on hand-built successor graphs.

The analog of the reference's dedicated concurrency test for its racy
glue component (example/uf/testUF.cpp: concurrent union-find vs serial
control).  Our 'union-find' is deterministic pointer jumping; these tests
check it directly against a python walker on random mirror-symmetric
functional graphs.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bcalm_tpu.ops import chains


def mirror(v, N):
    return v - N if v >= N else v + N

def decompose(succ, valid):
    info = chains.chain_decompose(jnp.asarray(succ, jnp.int32),
                                  jnp.asarray(valid))
    n = int(info["n_unitigs"])
    out = {
        "n": n,
        "uid": np.asarray(info["uid"]),
        "rank": np.asarray(info["rank"]),
        "start": np.asarray(info["start_oid"])[:n],
        "len": np.asarray(info["length"])[:n],
        "circ": np.asarray(info["circular"])[:n],
    }
    return out


def py_chains(succ, valid, N):
    """Reference walker mirroring the device contract exactly: oriented
    chains (paths from no-pred starts; cycles broken at their min node),
    mirror-deduplicated by the keep rule 'start < mirror chain start'.

    Returns sorted [(oriented node tuple, circular)]."""
    M = 2 * N
    pred = {}
    for u in range(M):
        if valid[u] and succ[u] >= 0:
            assert succ[u] not in pred
            pred[succ[u]] = u
    out = []
    visited = set()
    # path chains
    for v in range(M):
        if not valid[v] or v in pred or v in visited:
            continue
        chain = [v]
        cur = v
        while succ[cur] >= 0:
            cur = succ[cur]
            chain.append(cur)
        visited.update(chain)
        mirror_start = mirror(chain[-1], N)
        if v < mirror_start:
            out.append((tuple(chain), False))
    # cycles: remaining oriented nodes
    for v in range(M):
        if not valid[v] or v in visited:
            continue
        # collect this cycle
        cyc = [v]
        cur = succ[v]
        while cur != v:
            cyc.append(cur)
            cur = succ[cur]
        visited.update(cyc)
        mn = min(cyc)
        i = cyc.index(mn)
        chain = cyc[i:] + cyc[:i]
        mirror_min = min(mirror(c, N) for c in cyc)
        if mn < mirror_min:
            out.append((tuple(chain), True))
    return sorted(out)


def build_succ(N, edges):
    """edges: list of (u, v) oriented pairs; mirrors added automatically."""
    M = 2 * N
    succ = np.full(M, -1, np.int32)
    for (u, v) in edges:
        succ[u] = v
        succ[mirror(v, N)] = mirror(u, N)
    return succ


def test_single_path():
    N = 4  # chain 0->1->2->3
    succ = build_succ(N, [(0, 1), (1, 2), (2, 3)])
    out = decompose(succ, np.ones(2 * N, bool))
    assert out["n"] == 1
    assert out["len"][0] == 4 and not out["circ"][0]
    assert out["start"][0] == 0
    assert list(out["rank"][:4]) == [0, 1, 2, 3]


def test_cycle_breaks_at_min():
    N = 4  # cycle 2->0->3->1->2
    succ = build_succ(N, [(2, 0), (0, 3), (3, 1), (1, 2)])
    out = decompose(succ, np.ones(2 * N, bool))
    assert out["n"] == 1
    assert out["circ"][0]
    assert out["len"][0] == 4
    assert out["start"][0] == 0  # broken at minimal oriented id


def test_singletons_and_invalid():
    N = 5
    succ = np.full(2 * N, -1, np.int32)
    valid = np.ones(2 * N, bool)
    valid[3] = valid[3 + N] = False  # invalid vertex
    out = decompose(succ, valid)
    assert out["n"] == 4  # 4 singleton unitigs (one per valid vertex)
    assert all(l == 1 for l in out["len"])


def test_mirror_dedupe_exact():
    N = 6
    succ = build_succ(N, [(0, 1), (1, 2), (4, 3)])
    out = decompose(succ, np.ones(2 * N, bool))
    # chains: {0,1,2}, {4,3}, {5} => 3 unitigs
    assert out["n"] == 3
    sets = []
    for u in range(out["n"]):
        members = [i % N for i in range(2 * N) if out["uid"][i] == u]
        sets.append(frozenset(members))
    assert frozenset({0, 1, 2}) in sets
    assert frozenset({3, 4}) in sets
    assert frozenset({5}) in sets


@pytest.mark.parametrize("seed", range(6))
def test_random_mirror_graphs(seed):
    """Random mirror-symmetric functional graphs: device decomposition
    vertex-partitions must equal the python walker's."""
    rng = random.Random(seed)
    N = 40
    M = 2 * N
    succ = np.full(M, -1, np.int32)
    used_src = set()
    used_dst = set()
    for _ in range(60):
        u = rng.randrange(M)
        v = rng.randrange(M)
        mu, mv = mirror(u, N), mirror(v, N)
        if u % N == v % N:
            continue
        if u in used_src or mv in used_src or v in used_dst or mu in used_dst:
            continue
        succ[u] = v
        succ[mv] = mu
        used_src |= {u, mv}
        used_dst |= {v, mu}
    valid = np.ones(M, bool)
    out = decompose(succ, valid)
    # device oriented chains ordered by rank
    got = {}
    for i in range(M):
        u = out["uid"][i]
        if u >= 0:
            got.setdefault(int(u), []).append((out["rank"][i], i))
    got_chains = sorted(
        (tuple(i for _, i in sorted(members)),
         bool(out["circ"][np.where(out["start"] ==
                                   sorted(members)[0][1])[0][0]]))
        for members in got.values()
    )
    assert got_chains == py_chains(succ, valid, N)
