"""Chain extraction: pointer-jumping unitig assembly over successor arrays.

TPU-native replacement for the reference's glue phase (gatb
bcalm2/bglue_algo.cpp: MPHF + concurrent union-find + per-class chain
walking — reconstructed, SURVEY.md §4.4) and for its sequential bucket
chain-walking.  The successor array from ops.junctions defines a
mirror-symmetric functional graph of paths and cycles over the 2N oriented
nodes; unitigs are recovered with ONE fused pointer-doubling loop.

Fused state per oriented node v (all propagated along predecessor jumps):

  ptr  — current ancestor (doubles every round; fixes at the chain start)
  dist — #pred-steps from v to ptr (saturates at the path rank)
  mn   — minimal oriented id among {v} ∪ visited ancestors
  dmn  — #pred-steps from v back to mn
  mmn  — minimal MIRROR id among the same set

After convergence:
  * path nodes:  ptr = chain start, dist = rank.
  * cycle nodes: ancestors cover the whole cycle, so mn = the cycle's
    minimal node b (the deterministic break point — circular unitigs come
    out as one contig, the behavior example/circular_unitigs_unittests
    asks for), and because pred is the inverse of succ, dmn (backward
    steps to b) equals the FORWARD rank from b.  No separate cycle-break
    or re-ranking pass is needed.

Mirror deduplication: every unitig appears as a chain and its mirror
chain (bidirected-graphs-in-bcalm2.md:79); keep the one whose start has
the smaller oriented id (deterministic, unlike the reference —
README.md:87 documents its orientation instability).

Performance: each round gathers the packed (M, 8) int32 state with ONE
row gather (32-byte aligned rows) instead of six scalar gathers — TPU
gathers are index-latency-bound, so packing the state is ~5x cheaper
than separate gathers, and the single fused loop replaces the previous
three (cycle detect / min propagate / rank) loops.  Rounds run under
lax.while_loop with a convergence test, so the count adapts to the
longest chain rather than log2(N) when there are no cycles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.ops.count import compact

# packed state columns
_PTR, _DIST, _MN, _DMN, _MMN = 0, 1, 2, 3, 4
_COLS = 8  # padded to 32-byte rows for aligned row gathers


def _mirror(x: jnp.ndarray, N: int) -> jnp.ndarray:
    return jnp.where(x >= N, x - N, x + N)


def _max_rounds(M: int) -> int:
    """Doubling rounds that cover any chain/cycle length (window 2^t >= M).

    The iteration CAP is load-bearing: on a cycle, ptr never reaches a
    fixpoint, so convergence alone would spin forever."""
    return max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)


@jax.jit
def chain_decompose(succ: jnp.ndarray, valid: jnp.ndarray):
    """Decompose the successor graph into deduplicated unitig chains.

    Args:
      succ:  (2N,) int32 oriented successor ids (-1 = none); mirror-symmetric
      valid: (2N,) bool — oriented node is backed by a real solid k-mer

    Returns dict with:
      uid:      (2N,) int32 unitig id per oriented node (-1 if node's chain
                was dropped as a mirror duplicate or node invalid)
      rank:     (2N,) int32 position of the node within its unitig
      n_unitigs: () int32
      start_oid:(2N,) int32 per-unitig start oriented node (compacted)
      length:   (2N,) int32 per-unitig k-mer count (compacted)
      circular: (2N,) bool per-unitig circular flag (compacted)
    """
    M = succ.shape[0]
    N = M // 2
    idx = jnp.arange(M, dtype=jnp.int32)

    succ = jnp.where(valid, succ, -1)

    # predecessors (unique by construction: succ targets have in-degree 1)
    pred = jnp.full((M,), -1, dtype=jnp.int32)
    pred = pred.at[jnp.where(succ >= 0, succ, M)].set(
        jnp.where(succ >= 0, idx, -1), mode="drop"
    )

    has_pred = pred >= 0
    state0 = jnp.zeros((M, _COLS), dtype=jnp.int32)
    state0 = state0.at[:, _PTR].set(jnp.where(has_pred, pred, idx))
    state0 = state0.at[:, _DIST].set(has_pred.astype(jnp.int32))
    state0 = state0.at[:, _MN].set(jnp.where(valid, idx, M))
    # dmn starts at 0 (mn = self)
    state0 = state0.at[:, _MMN].set(jnp.where(valid, _mirror(idx, N), M))

    R = _max_rounds(M)

    def cond(carry):
        state, changed, t = carry
        return changed & (t < R)

    def body(carry):
        state, _, t = carry
        anc = jnp.take(state, state[:, _PTR], axis=0)  # one row gather
        dist = state[:, _DIST]
        mn = state[:, _MN]
        better = anc[:, _MN] < mn
        new = jnp.stack(
            [
                anc[:, _PTR],
                dist + anc[:, _DIST],
                jnp.minimum(mn, anc[:, _MN]),
                jnp.where(better, dist + anc[:, _DMN], state[:, _DMN]),
                jnp.minimum(state[:, _MMN], anc[:, _MMN]),
            ],
            axis=1,
        )
        # convergence on (ptr, mn, dmn, mmn): for paths all four settle at
        # coverage; cycles run to the cap R (ptr keeps orbiting)
        changed = jnp.any(new != state[:, :_MMN + 1])
        state = state.at[:, :_MMN + 1].set(new)
        return state, changed, t + 1

    state, _, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.asarray(True), jnp.asarray(0))
    )
    ptr = state[:, _PTR]
    dist = state[:, _DIST]
    mn = state[:, _MN]
    dmn = state[:, _DMN]
    mmn = state[:, _MMN]

    # a path node's ptr settles at a start (pred = -1); cycle nodes never do
    in_cycle = valid & (pred[ptr] >= 0)
    break_node = in_cycle & (mn == idx)

    start = jnp.where(in_cycle, mn, ptr)
    rank = jnp.where(in_cycle, dmn, dist)

    is_start = valid & (~has_pred | break_node)
    # chain terminal: no successor, or (broken cycle) the node feeding the
    # break node
    is_end = valid & ((succ < 0) | (in_cycle & (succ == mn)))
    end_of = jnp.full((M,), -1, dtype=jnp.int32)
    end_of = end_of.at[jnp.where(is_end, start, M)].set(
        jnp.where(is_end, idx, -1), mode="drop"
    )

    # mirror dedupe: keep the chain whose start id < mirror chain's start id.
    # For a path chain the mirror chain starts at mirror(end); for a broken
    # cycle it starts at the mirror cycle's own minimal node (mmn).
    mirror_start = jnp.where(
        break_node, mmn, _mirror(jnp.where(end_of >= 0, end_of, idx), N)
    )
    keep = is_start & (end_of >= 0) & (idx < mirror_start)

    # dense unitig ids in start-id order
    uid_at_start = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_unitigs = jnp.sum(keep.astype(jnp.int32))

    kept_start = keep[start]
    uid = jnp.where(valid & kept_start, uid_at_start[start], -1)
    length_at_start = jax.ops.segment_max(
        jnp.where(valid, rank, -1) + 1,
        jnp.where(valid, start, M - 1),
        num_segments=M,
    )
    circular_at_start = break_node  # a kept broken node starts a circular chain

    (start_oid, length, circular), _ = compact(
        keep, (idx, length_at_start, circular_at_start)
    )
    return {
        "uid": uid,
        "rank": jnp.where(uid >= 0, rank, 0),
        "n_unitigs": n_unitigs,
        "start_oid": start_oid,
        "length": length,
        "circular": circular,
    }
