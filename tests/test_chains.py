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


def _build_big_mirror_graph(seed, N, run_lens, n_cycles):
    """Vectorized construction of a mirror-symmetric functional graph:
    vertices are shuffled, cut into runs of the given lengths (the first
    n_cycles runs closed into cycles), each vertex gets a random
    orientation.  Returns (succ, run_lens_used, n_cycles)."""
    rng = np.random.RandomState(seed)
    M = 2 * N
    perm = rng.permutation(N)
    orient = rng.randint(0, 2, size=N)
    o = perm + orient[perm] * N  # oriented node per chain position

    succ = np.full(M, -1, np.int32)
    pos = 0
    used = []
    for ri, ln in enumerate(run_lens):
        if pos + ln > N:
            break
        run = o[pos:pos + ln]
        pos += ln
        used.append(ln)
        src, dst = run[:-1], run[1:]
        if ri < n_cycles and ln >= 2:
            src = np.concatenate([src, run[-1:]])
            dst = np.concatenate([dst, run[:1]])
        succ[src] = dst
        msrc = np.where(dst >= N, dst - N, dst + N)
        mdst = np.where(src >= N, src - N, src + N)
        succ[msrc] = mdst
    # leftovers become singletons (no edges)
    used += [1] * (N - pos)
    return succ, used


def test_deep_level_long_cycle(monkeypatch):
    """Cycles that survive >= 4 contraction levels: dist doubles every
    round across levels and must SATURATE at _DMASK instead of wrapping
    into the flag bits (ADVICE r02 high: a wrap set _F_SETTLED spuriously,
    dropping/corrupting the circular unitig).  Levels are forced by
    shrinking _HIER_MIN/_FINAL_CAP; the long cycle plus paths are checked
    against the plain-loop reference decomposition."""
    monkeypatch.setattr(chains, "_HIER_MIN", 1 << 10)
    monkeypatch.setattr(chains, "_FINAL_CAP", 1 << 8)
    N = 1 << 15
    M = 2 * N
    # sizes: 65536 -> 16384 -> 4096 -> 1024 -> 256 (4 contraction levels).
    # A short cycle with NO sampled fixpoint doubles freely 7 rounds per
    # level; by level 3's contraction dist reaches 2^28 and (unfixed)
    # wraps into the flag bits at a NON-final level, dropping the cycle
    # from contraction.  30 independent 3-cycles make a 4-level evader
    # near-certain (p~0.2 each) while keeping the surviving cycle rows
    # within the deepest level's capacity (the ok-overflow guard would
    # otherwise fall back to the plain loop and mask the bug).
    run_lens = [3] * 30 + [5000, 97, 2000, 800] + [7] * 100
    succ, used = _build_big_mirror_graph(3, N, run_lens, n_cycles=31)
    valid = np.ones(M, bool)
    succ_j = jnp.asarray(succ)
    valid_j = jnp.asarray(valid)

    pred = chains.build_pred(succ_j, valid_j)
    state_h, ok = chains.hier_jump(pred, valid_j)
    assert bool(ok)
    info_h = chains.finish_fast(succ_j, pred, valid_j, state_h)

    state = chains.jump_loop(pred, valid_j)
    info_p = chains.finish(succ_j, pred, valid_j, state)

    n_h, n_p = int(info_h["n_unitigs"]), int(info_p["n_unitigs"])
    assert n_h == n_p == len(used)
    for key in ("uid", "rank", "start_oid", "length", "circular"):
        assert np.array_equal(np.asarray(info_h[key]),
                              np.asarray(info_p[key])), key
    assert int(np.asarray(info_h["circular"])[:n_h].sum()) == 31


@pytest.mark.parametrize("N", [140_000, 600_000])
def test_hierarchical_matches_plain_large(N):
    """The hierarchical sampled-contraction jump (active above _HIER_MIN)
    must produce the identical decomposition to the plain doubling loop on
    a large graph mixing one giant chain, mid chains, cycles, singletons,
    and invalid rows.  N=600k exercises multiple contraction levels (and
    the salted per-level sampling); N=140k a single level."""
    M = 2 * N
    assert M >= chains._HIER_MIN
    run_lens = ([7, 3, 12, 2] +          # first 4 are cycles
                [100_000, 20_000] +       # giant + mid chains
                [int(x) for x in np.random.RandomState(1).randint(
                    1, 50, size=2000)])
    succ, used = _build_big_mirror_graph(0, N, run_lens, n_cycles=4)
    valid = np.ones(M, bool)
    # invalidate 100 isolated vertices (they are singleton leftovers:
    # no edges touch them, so dropping them removes 100 unitigs)
    iso = [v for v in range(N)
           if succ[v] == -1 and succ[v + N] == -1][:100]
    assert len(iso) >= 20
    for v in iso:
        valid[v] = valid[v + N] = False
        used.remove(1)
    succ_j = jnp.asarray(succ)
    valid_j = jnp.asarray(valid)

    info_h = chains.chain_decompose(succ_j, valid_j)
    # plain reference: old jump_loop + finish (kept for the sharded path)
    pred = chains.build_pred(succ_j, valid_j)
    state = chains.jump_loop(pred, valid_j)
    info_p = chains.finish(succ_j, pred, valid_j, state)

    n_h, n_p = int(info_h["n_unitigs"]), int(info_p["n_unitigs"])
    assert n_h == n_p == len(used)
    for key in ("uid", "rank", "start_oid", "length", "circular"):
        assert np.array_equal(np.asarray(info_h[key]),
                              np.asarray(info_p[key])), key
    lens = sorted(np.asarray(info_h["length"])[:n_h].tolist())
    assert lens == sorted(used)
    assert int(np.asarray(info_h["circular"])[:n_h].sum()) == 4
