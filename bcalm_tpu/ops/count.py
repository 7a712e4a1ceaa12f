"""K-mer counting: sort + segment-reduce (TPU-native DSK replacement).

The reference counts k-mers out-of-core (gatb kmer/impl/SortingCountAlgorithm,
"DSK": disk-staged (pass x partition) radix sort + run-length count,
reconstructed — SURVEY.md §3.2/§4.2).  On TPU the disk is replaced by HBM
and the per-partition sort becomes a single dense multi-operand `lax.sort`
over the uint32 lane tuple followed by vectorized run-length reduction.
All shapes are static: "number of unique k-mers" is carried as a scalar
alongside fixed-capacity arrays, the standard XLA idiom for data-dependent
sizes.

Layout + performance notes (measured on v5e):
- k-mer sets are LANE-MAJOR (L, N) uint32 (see models.lanes): each lane is
  a contiguous (N,) vector, which sorts/scatters at memory speed; a
  lane-minor (N, L) layout tile-pads L up to 128 and ran ~200x slower,
- validity is FOLDED into the key: invalid slots become the all-ones
  sentinel, which is never a canonical k-mer (rc(G^k) = C^k < G^k), so the
  sort carries exactly L key operands,
- group ids double as compaction destinations (segment_sum output is
  already compacted), so counting costs one sort + one cumsum + one
  segment-sum + L scatters,
- callers should re-slice capacity to the (much smaller) distinct count
  before running the solidity filter (engine.count_and_filter does).

Solidity filtering (-abundance-min / -abundance-max, README.md:23-25 and
hidden options at /root/reference/src/bcalm_1.cpp:34-37) and the abundance
histogram (gatb CountProcessorHistogram) are applied on-device.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_U32 = jnp.uint32
SENTINEL = np.uint32(0xFFFFFFFF)


def fold_sentinel(lanes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Set invalid columns of a lane-major (L, N) set to the all-ones
    sentinel (sorts after every canonical k-mer; all-ones = G^k whose
    canonical form is C^k)."""
    return jnp.where(valid[None], lanes, SENTINEL)


def row_starts(sorted_lanes: jnp.ndarray, sorted_valid: jnp.ndarray) -> jnp.ndarray:
    """First-occurrence mask among valid sorted columns of (L, N)."""
    diff = jnp.any(sorted_lanes[:, 1:] != sorted_lanes[:, :-1], axis=0)
    first = jnp.concatenate([jnp.ones((1,), bool), diff])
    return sorted_valid & first


def compact(mask: jnp.ndarray, arrays, fill=0):
    """Stable-compact entries where mask is True to the front of each array
    (1-D arrays or lane-major (L, N) arrays, compacting along the last axis).

    Returns (compacted_arrays, count).  Entries past `count` are `fill`.
    """
    N = mask.shape[0]
    dest = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, dest, N)  # out-of-range drops in scatter
    outs = []
    for arr in arrays:
        out = jnp.full(arr.shape, fill, dtype=arr.dtype)
        if arr.ndim == 1:
            outs.append(out.at[dest].set(arr, mode="drop"))
        else:  # lane-major: scatter each lane vector
            for j in range(arr.shape[0]):
                out = out.at[j, dest].set(arr[j], mode="drop")
            outs.append(out)
    return tuple(outs), jnp.sum(mask.astype(jnp.int32))


@partial(jax.jit, static_argnames=("weighted",))
def count_canonical(lanes: jnp.ndarray, valid: jnp.ndarray, weights=None,
                    weighted=False):
    """Count occurrences of canonical k-mers.

    Args:
      lanes: lane-major (L, N) uint32 canonical k-mers (unsorted, may
        contain invalid/sentinel slots)
      valid: (N,) bool
      weights: optional (N,) int32 per-occurrence weights (used when merging
        partial (kmer, count) runs: weighted=True)

    Returns:
      unique: (L, N) unique k-mers compacted to the front, sorted ascending
      counts: (N,) int32 occurrence counts aligned with `unique`
      n_unique: () int32

    Implementation note (TPU scatters are index-rate-bound, ~50M idx/s):
    per-group counts come from prefix-sum arithmetic — a scatter-MAX of
    the inclusive weight cumsum with MONOTONE destinations lands each
    group's end-cumsum at its compacted slot, and adjacent differences
    recover the group sums; no segment_sum.  The compaction scatters also
    use monotone destinations (duplicate destinations write identical
    values), preserving the sorted-indices fast path.  Total cost: one
    L-key sort + 1 cumsum + (L+1) sorted scatters.
    """
    L, N = lanes.shape
    folded = fold_sentinel(lanes, valid)
    ops = [folded[j] for j in range(L)]
    if weighted:
        ops.append(weights.astype(jnp.int32))
    out = jax.lax.sort(ops, num_keys=L)
    s_lanes = jnp.stack(out[:L], axis=0)
    s_valid = ~jnp.all(s_lanes == SENTINEL, axis=0)
    starts = row_starts(s_lanes, s_valid)
    gid = jnp.cumsum(starts.astype(jnp.int32)) - 1

    w = out[L] if weighted else s_valid.astype(jnp.int32)
    w = jnp.where(s_valid, w, 0)
    cumw = jnp.cumsum(w)

    # compaction: dest is non-decreasing (gid, with the sentinel tail
    # dropped past the end); every position of a run writes the same value
    dest = jnp.where(s_valid, gid, N)
    unique = jnp.zeros_like(s_lanes)
    for j in range(L):
        unique = unique.at[j, dest].set(
            s_lanes[j], mode="drop", indices_are_sorted=True
        )
    # group sum = cumw at group end - cumw at previous group end; the
    # scatter-max deposits each group's end-cumsum at its compacted slot
    ends_cum = jnp.zeros((N,), jnp.int32).at[dest].max(
        cumw, mode="drop", indices_are_sorted=True
    )
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends_cum[:-1]])
    counts = jnp.maximum(ends_cum - prev, 0)
    n_unique = jnp.sum(starts.astype(jnp.int32))
    return unique, counts, n_unique


@jax.jit
def filter_abundance(unique, counts, n_unique, abundance_min, abundance_max):
    """Solidity filter (gatb CountProcessorSolidity, 'sum' solidity kind):
    keep abundance_min <= count <= abundance_max."""
    N = unique.shape[1]
    idx = jnp.arange(N, dtype=jnp.int32)
    keep = (
        (idx < n_unique)
        & (counts >= abundance_min)
        & (counts <= abundance_max)
    )
    (solid, solid_counts), n_solid = compact(keep, (unique, counts))
    return solid, solid_counts, n_solid


@partial(jax.jit, static_argnames=("histo_max",))
def abundance_histogram(counts, n_unique, histo_max: int = 10000):
    """Histogram of k-mer abundances (gatb CountProcessorHistogram;
    STR_HISTOGRAM_MAX hidden option, /root/reference/src/bcalm_1.cpp:35).

    Returns (histo_max+1,) int32; bin i = #distinct k-mers with count i
    (counts > histo_max accumulate into the last bin).
    """
    N = counts.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n_unique
    binned = jnp.clip(counts, 0, histo_max)
    return jnp.bincount(
        jnp.where(valid, binned, 0),
        weights=valid.astype(jnp.int32),
        length=histo_max + 1,
    ).astype(jnp.int32)


def sort_by_lanes(lanes: jnp.ndarray, valid: jnp.ndarray, payloads=()):
    """Sort lane-major (L, N) k-mers lexicographically, invalid entries
    last (sentinel folding).  Returns (sorted_lanes, sorted_valid,
    sorted_payloads)."""
    L, N = lanes.shape
    folded = fold_sentinel(lanes, valid)
    operands = [folded[j] for j in range(L)] + list(payloads)
    out = jax.lax.sort(operands, num_keys=L)
    sorted_lanes = jnp.stack(out[:L], axis=0)
    sorted_valid = ~jnp.all(sorted_lanes == SENTINEL, axis=0)
    return sorted_lanes, sorted_valid, tuple(out[L:])
