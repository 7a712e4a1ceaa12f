"""Chain extraction: pointer-jumping unitig assembly over successor arrays.

TPU-native replacement for the reference's glue phase (gatb
bcalm2/bglue_algo.cpp: MPHF + concurrent union-find + per-class chain
walking — reconstructed, SURVEY.md §4.4) and for its sequential bucket
chain-walking.  The successor array from ops.junctions defines a
mirror-symmetric functional graph of paths and cycles over the 2N oriented
nodes; unitigs are recovered with pointer doubling:

1. build predecessor pointers,
2. cycle detection + min-id propagation to break each cycle at its minimal
   oriented node (this is what makes circular unitigs come out as a single
   contig — the reference's example/circular_unitigs_unittests behavior),
3. jump/rank doubling to give every oriented node its chain start + rank,
4. mirror deduplication: every unitig appears as a chain and its mirror
   chain (bidirected-graphs-in-bcalm2.md:79); keep the one whose start has
   the smaller oriented id (deterministic, unlike the reference —
   README.md:87 documents its orientation instability).

Doubling loops run under lax.while_loop with convergence tests, so the
round count adapts to the LONGEST CHAIN (typically tens of k-mers), not to
log2(N) — chains stay jittable while avoiding wasted doubling rounds.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.ops.count import compact


def _mirror(x: jnp.ndarray, N: int) -> jnp.ndarray:
    return jnp.where(x >= N, x - N, x + N)


def _max_rounds(M: int) -> int:
    """Doubling rounds that cover any chain/cycle length (window 2^t >= M).

    The iteration CAP is load-bearing: on a cycle, jump[jump] never reaches
    a fixpoint, so convergence alone would spin forever."""
    return max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)


def _converge_jump(jump):
    """jump[v] <- jump[jump[v]] until fixpoint or round cap."""
    R = _max_rounds(jump.shape[0])

    def cond(state):
        jump, changed, t = state
        return changed & (t < R)

    def body(state):
        jump, _, t = state
        jump2 = jump[jump]
        return jump2, jnp.any(jump2 != jump), t + 1

    jump, _, _ = jax.lax.while_loop(
        cond, body, (jump, jnp.asarray(True), jnp.asarray(0))
    )
    return jump


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

    # --- cycle detection: follow pred to a start; cycles never reach one
    jump0 = jnp.where(pred >= 0, pred, idx)
    jump = _converge_jump(jump0)
    in_cycle = valid & (pred[jump] >= 0)

    # --- break each cycle at its minimal oriented node; propagate the
    # mirror cycle's min as well (the mirror chain's future start)
    R = _max_rounds(M)

    def min_cond(state):
        mn, mmn, ptr, changed, t = state
        return changed & (t < R)

    def min_body(state):
        mn, mmn, ptr, _, t = state
        mn2 = jnp.minimum(mn, mn[ptr])
        mmn2 = jnp.minimum(mmn, mmn[ptr])
        ptr2 = ptr[ptr]
        changed = jnp.any(mn2 != mn) | jnp.any(mmn2 != mmn)
        return mn2, mmn2, ptr2, changed, t + 1

    mn0 = jnp.where(in_cycle, idx, jnp.int32(M))
    mmn0 = jnp.where(in_cycle, _mirror(idx, N), jnp.int32(M))
    ptr0 = jnp.where(pred >= 0, pred, idx)
    mn, mmn, _, _, _ = jax.lax.while_loop(
        min_cond, min_body, (mn0, mmn0, ptr0, jnp.asarray(True), jnp.asarray(0))
    )
    break_node = in_cycle & (mn == idx)  # chain start of its cycle
    cut_from = jnp.where(break_node, pred, -1)
    succ2 = succ.at[jnp.where(break_node, cut_from, M)].set(-1, mode="drop")
    pred2 = jnp.where(break_node, -1, pred)

    # --- start/rank doubling on the acyclic pred graph
    def rank_cond(state):
        jump, rank, changed, t = state
        return changed & (t < R)

    def rank_body(state):
        jump, rank, _, t = state
        rank2 = rank + rank[jump]
        jump2 = jump[jump]
        return jump2, rank2, jnp.any(jump2 != jump), t + 1

    jump0 = jnp.where(pred2 >= 0, pred2, idx)
    rank0 = jnp.where(pred2 >= 0, 1, 0).astype(jnp.int32)
    start, rank, _, _ = jax.lax.while_loop(
        rank_cond, rank_body, (jump0, rank0, jnp.asarray(True), jnp.asarray(0))
    )

    is_start = valid & (pred2 == -1)

    # chain terminal (succ2 == -1) per start; unique per chain
    is_end = valid & (succ2 == -1)
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
