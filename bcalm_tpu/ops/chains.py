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

The mirror chain's start (needed for mirror dedup) is NOT propagated:
for a broken cycle it is the mirror cycle's minimum, which after
convergence is simply mn[mirror(v)] — the mirror node sits in the
mirror cycle.

Performance: each round gathers the packed (M, 4) int32 state with ONE
16-byte-aligned row gather instead of six scalar gathers — TPU gathers
are index-rate-bound, so packing the state is ~4x cheaper than separate
gathers, and the single fused loop replaces the previous three (cycle
detect / min propagate / rank) loops.  Rounds run under lax.while_loop
with a convergence test, so the count adapts to the longest chain
rather than log2(N) when there are no cycles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.ops.count import compact

# packed state columns (16-byte rows -> aligned row gathers)
_PTR, _DIST, _MN, _DMN = 0, 1, 2, 3
_COLS = 4


def _mirror(x: jnp.ndarray, N: int) -> jnp.ndarray:
    return jnp.where(x >= N, x - N, x + N)


def _max_rounds(M: int) -> int:
    """Doubling rounds that cover any chain/cycle length (window 2^t >= M).

    The iteration CAP is load-bearing: on a cycle, ptr never reaches a
    fixpoint, so convergence alone would spin forever."""
    return max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)


def init_state(pred: jnp.ndarray, valid: jnp.ndarray,
               gidx: jnp.ndarray, big: int) -> jnp.ndarray:
    """Initial (n, 4) pointer-jumping state rows for nodes with global ids
    `gidx` (pred values are global ids too; `big` pads invalid mn)."""
    has_pred = pred >= 0
    return jnp.stack(
        [
            jnp.where(has_pred, pred, gidx),
            has_pred.astype(jnp.int32),
            jnp.where(valid, gidx, big),
            jnp.zeros(pred.shape, jnp.int32),  # dmn starts at 0 (mn = self)
        ],
        axis=1,
    )


def round_update(state: jnp.ndarray, anc: jnp.ndarray) -> jnp.ndarray:
    """One doubling round given each node's current-ancestor rows `anc`
    (anc = state-table rows at state[:, _PTR]; the lookup is the caller's —
    a local row gather, or an all_gather + gather when the table is
    sharded over a mesh)."""
    dist = state[:, _DIST]
    mn = state[:, _MN]
    better = anc[:, _MN] < mn
    return jnp.stack(
        [
            anc[:, _PTR],
            dist + anc[:, _DIST],
            jnp.minimum(mn, anc[:, _MN]),
            jnp.where(better, dist + anc[:, _DMN], state[:, _DMN]),
        ],
        axis=1,
    )


def build_pred(succ: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Predecessor array (unique by construction: in-degree <= 1)."""
    M = succ.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    succ = jnp.where(valid, succ, -1)
    pred = jnp.full((M,), -1, dtype=jnp.int32)
    return pred.at[jnp.where(succ >= 0, succ, M)].set(
        jnp.where(succ >= 0, idx, -1), mode="drop"
    )


def finish(succ: jnp.ndarray, pred: jnp.ndarray, valid: jnp.ndarray,
           state: jnp.ndarray):
    """Chain bookkeeping after the doubling loop converged (global layout:
    oriented ids [0, N) = + strand, [N, 2N) = - strand)."""
    M = succ.shape[0]
    N = M // 2
    idx = jnp.arange(M, dtype=jnp.int32)
    succ = jnp.where(valid, succ, -1)
    has_pred = pred >= 0

    ptr = state[:, _PTR]
    dist = state[:, _DIST]
    mn = state[:, _MN]
    dmn = state[:, _DMN]
    # mirror cycle's minimum, read off the converged mn of the mirror node
    # (the mirror node sits in the mirror cycle) — no propagated column
    mmn = mn[_mirror(idx, N)]

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


def jump_loop(pred: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Run the doubling loop to convergence on one device."""
    M = pred.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    state0 = init_state(pred, valid, idx, M)
    R = _max_rounds(M)

    def cond(carry):
        state, changed, t = carry
        return changed & (t < R)

    def body(carry):
        state, _, t = carry
        anc = jnp.take(state, state[:, _PTR], axis=0)  # one row gather
        new = round_update(state, anc)
        # convergence: for paths everything settles at coverage; cycles run
        # to the cap R (ptr keeps orbiting)
        return new, jnp.any(new != state), t + 1

    state, _, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.asarray(True), jnp.asarray(0))
    )
    return state


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
    pred = build_pred(succ, valid)
    state = jump_loop(pred, valid)
    return finish(succ, pred, valid, state)
