"""Sort backend for the counting/junction engines.

A fused-VMEM Pallas bitonic sort lived here through round 2; measured on
v5e it lost to XLA's native sort (228ms vs 93ms for 16.8M x 2 u32 — the
dynamic-shift rolls and per-substage conds dominate, while `lax.sort` is
already near the bitonic HBM/VPU bound at ~180M elem/s, and a
scatter-based radix pass can't beat it either: TPU scatters run at only
~25-160M idx/s, below the sort's whole-problem rate).  Per round-2
VERDICT item 7 the dead path is removed; `sort_ops` is the single sort
entry point so a future faster backend can slot in behind one call site.

Replaces the reference's per-partition k-mer radix sort (gatb
SortingCountAlgorithm's PartitionsByVectorCommand, reconstructed —
SURVEY.md §4.2) as the counting engine's workhorse.
"""

from __future__ import annotations

import jax


def sort_ops(operands, num_keys: int):
    """Sort uint32 operand tuples lexicographically by the first num_keys
    operands (drop-in for jax.lax.sort on flat uint32 arrays)."""
    return jax.lax.sort(operands, num_keys=num_keys)
