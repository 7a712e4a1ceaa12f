"""K-mer counting: sort + segment-reduce (TPU-native DSK replacement).

The reference counts k-mers out-of-core (gatb kmer/impl/SortingCountAlgorithm,
"DSK": disk-staged (pass x partition) radix sort + run-length count,
reconstructed — SURVEY.md §3.2/§4.2).  On TPU the disk is replaced by HBM
and the per-partition sort becomes a single dense multi-operand `lax.sort`
over the uint32 lane tuple followed by vectorized run-length reduction.
All shapes are static: "number of unique k-mers" is carried as a scalar
alongside fixed-capacity arrays, the standard XLA idiom for data-dependent
sizes.

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


def sort_by_lanes(lanes: jnp.ndarray, valid: jnp.ndarray, payloads=()):
    """Sort (N, L) k-mers lexicographically, invalid entries last.

    Returns (sorted_lanes, sorted_valid, sorted_payloads).
    """
    N, L = lanes.shape
    invalid_key = jnp.where(valid, np.uint32(0), np.uint32(1))
    operands = [invalid_key] + [lanes[:, j] for j in range(L)] + [
        valid.astype(jnp.int32)
    ] + list(payloads)
    out = jax.lax.sort(operands, num_keys=L + 1)
    sorted_lanes = jnp.stack(out[1 : L + 1], axis=-1)
    sorted_valid = out[L + 1].astype(bool)
    return sorted_lanes, sorted_valid, tuple(out[L + 2 :])


def run_starts(sorted_lanes: jnp.ndarray, sorted_valid: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of first-occurrence positions among valid sorted entries."""
    diff = jnp.any(sorted_lanes != jnp.roll(sorted_lanes, 1, axis=0), axis=-1)
    diff = diff.at[0].set(True)
    return sorted_valid & diff


def compact(mask: jnp.ndarray, arrays, fill=0):
    """Stable-compact rows where mask is True to the front of each array.

    Returns (compacted_arrays, count).  Rows past `count` are `fill`.
    """
    N = mask.shape[0]
    dest = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, dest, N)  # out-of-range drops in scatter
    outs = []
    for arr in arrays:
        out = jnp.full(arr.shape, fill, dtype=arr.dtype)
        outs.append(out.at[dest].set(arr, mode="drop"))
    return tuple(outs), jnp.sum(mask.astype(jnp.int32))


@partial(jax.jit, static_argnames=("weighted",))
def count_canonical(lanes: jnp.ndarray, valid: jnp.ndarray, weights=None, weighted=False):
    """Count occurrences of canonical k-mers.

    Args:
      lanes: (N, L) uint32 canonical k-mers (unsorted, with invalid slots)
      valid: (N,) bool
      weights: optional (N,) int32 per-occurrence weights (used when merging
        partial (kmer, count) runs: weighted=True)

    Returns:
      unique: (N, L) unique k-mers compacted to the front, sorted ascending
      counts: (N,) int32 occurrence counts aligned with `unique`
      n_unique: () int32
    """
    if weighted:
        payloads = (weights.astype(jnp.int32),)
    else:
        payloads = ()
    s_lanes, s_valid, s_pay = sort_by_lanes(lanes, valid, payloads)
    starts = run_starts(s_lanes, s_valid)
    group = jnp.cumsum(starts.astype(jnp.int32)) - 1
    group = jnp.where(s_valid, group, lanes.shape[0] - 1)
    w = s_pay[0] if weighted else s_valid.astype(jnp.int32)
    w = jnp.where(s_valid, w, 0)
    sums = jax.ops.segment_sum(
        w, group, num_segments=lanes.shape[0], indices_are_sorted=True
    )
    (unique,), n_unique = compact(starts, (s_lanes,))
    counts = sums.astype(jnp.int32)
    return unique, counts, n_unique


@jax.jit
def filter_abundance(unique, counts, n_unique, abundance_min, abundance_max):
    """Solidity filter (gatb CountProcessorSolidity, 'sum' solidity kind):
    keep abundance_min <= count <= abundance_max."""
    N = unique.shape[0]
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
