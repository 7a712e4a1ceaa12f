"""Pallas TPU bitonic sort over multi-operand uint32 vectors.

XLA's TPU `lax.sort` executes every compare-exchange substage as its own
HBM pass (~300 passes for 16M elements, measured ~96ms for 2 operands —
HBM-bound).  This implementation fuses all substages with exchange
distance < TILE into VMEM-resident Pallas kernels, so HBM sees only:

  1 pass   tile-local full bitonic sort (phases 1..s fused)
  (p-s)(p-s+1)/2 passes   cross-tile stages (XLA elementwise, j >= s)
  (p-s) passes   per-phase tile-local merges (substages j < s fused)

for N = 2^p and TILE = 2^s — ~30 passes instead of ~300.

Layout: each operand is a flat (N,) uint32 viewed as (N/128, 128); an
element's global index i lives at (row i>>7, lane i&127).  Exchanges at
distance d < 128 are lane-axis XOR shuffles (two rolls + select); at
d >= 128 they are row-axis shuffles.  Equal keys are tie-broken by global
index so operand tuples (keys + payloads) move as units — without the
tie-break, both positions of an equal-key pair would keep the same tuple
and payloads would duplicate.

Requirements: N a power of two (bitonic networks on virtual padding are
unsafe in descending sub-blocks), N % TILE == 0, operands all uint32.
`sort_ops` transparently falls back to `lax.sort` when the requirements
do not hold or the backend is not a TPU.

Replaces the reference's per-partition k-mer radix sort (gatb
SortingCountAlgorithm's PartitionsByVectorCommand, reconstructed —
SURVEY.md §4.2) as the counting engine's workhorse.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128
TILE_LOG2 = 16          # elements per tile (2^16 = 65536 -> 512 rows)
TILE = 1 << TILE_LOG2
TILE_ROWS = TILE // LANES

_U32 = jnp.uint32

# test hook: run kernels in interpreter mode (CPU)
_INTERPRET = False


def _lex_less(a, b, num_keys):
    """Lexicographic a < b over the first num_keys operands."""
    lt = a[num_keys - 1] < b[num_keys - 1]
    for j in range(num_keys - 2, -1, -1):
        lt = (a[j] < b[j]) | ((a[j] == b[j]) & lt)
    return lt


def _lex_eq(a, b, num_keys):
    eq = a[0] == b[0]
    for j in range(1, num_keys):
        eq = eq & (a[j] == b[j])
    return eq


def _substage(vals, idx, j, k, num_keys, roll):
    """One compare-exchange substage: distance 2^j, direction bit k.

    vals: list of arrays (any 2D shape with the lane axis last)
    idx:  global element index array (same shape)
    roll: roll(x, shift, axis) implementation (jnp.roll or pltpu.roll)
    """
    d = 1 << j
    if d < LANES:
        axis, dist = 1, d
    else:
        axis, dist = 0, d // LANES

    def partner_of(x):
        fwd = roll(x, dist, axis)    # [i] <- x[i - d]
        bwd = roll(x, -dist, axis)   # [i] <- x[i + d]
        return jnp.where(upper, fwd, bwd)

    upper = ((idx >> j) & 1) == 1
    p_vals = [partner_of(x) for x in vals]

    desc = ((idx >> k) & 1) == 1
    want_min = upper == desc  # lower keeps min when ascending
    # consistent pair decision: tie-break equal keys by index
    p_idx = jnp.where(upper, idx - d, idx + d)
    self_first = _lex_less(vals, p_vals, num_keys) | (
        _lex_eq(vals, p_vals, num_keys) & (idx < p_idx)
    )
    keep_self = want_min == self_first
    return [jnp.where(keep_self, s, p) for s, p in zip(vals, p_vals)]


def _tile_idx(t_ref_or_pid, rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + l


def _local_sort_kernel(num_keys, n_ops, *refs):
    """Fused bitonic phases 1..TILE_LOG2 of one tile."""
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    import jax.experimental.pallas as pl

    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    t = pl.program_id(0)
    idx = _tile_idx(t, TILE_ROWS) + t * TILE
    vals = [r[:] for r in in_refs]
    roll = _pltpu_roll()
    for k in range(1, TILE_LOG2 + 1):
        for j in range(k - 1, -1, -1):
            vals = _substage(vals, idx, j, k, num_keys, roll)
    for r, v in zip(out_refs, vals):
        r[:] = v


def _tile_merge_kernel(num_keys, n_ops, k, *refs):
    """Fused substages j = TILE_LOG2-1 .. 0 of merge phase k."""
    import jax.experimental.pallas as pl

    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    t = pl.program_id(0)
    idx = _tile_idx(t, TILE_ROWS) + t * TILE
    vals = [r[:] for r in in_refs]
    roll = _pltpu_roll()
    for j in range(TILE_LOG2 - 1, -1, -1):
        vals = _substage(vals, idx, j, k, num_keys, roll)
    for r, v in zip(out_refs, vals):
        r[:] = v


def _pltpu_roll():
    """Roll implementation for kernel bodies (lane/sublane circular shift)."""
    if _INTERPRET:
        return lambda x, s, a: jnp.roll(x, s, axis=a)
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, s, a):
        return pltpu.roll(x, s % x.shape[a], axis=a)

    return roll


def _pallas_tile_pass(ops2d, num_keys, kernel_body, name):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ops = len(ops2d)
    rows = ops2d[0].shape[0]
    grid = (rows // TILE_ROWS,)
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_body,
        grid=grid,
        in_specs=[spec] * n_ops,
        out_specs=[spec] * n_ops,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ops2d],
        interpret=_INTERPRET,
        name=name,
    )(*ops2d)


def _cross_stage(ops, idx, j, k, num_keys):
    """One cross-tile substage (j >= TILE_LOG2) as XLA elementwise ops.

    2d divides N here (d >= TILE, N % TILE == 0 and N a power of two), so
    the pair (i, i^d) view is a pure reshape: (N/2d, 2, d)."""
    N = ops[0].shape[0]
    d = 1 << j
    v = [x.reshape(N // (2 * d), 2, d) for x in ops]
    a = [x[:, 0] for x in v]
    b = [x[:, 1] for x in v]
    g = jax.lax.broadcasted_iota(jnp.int32, (N // (2 * d), 1), 0)
    desc = ((g >> (k - j - 1)) & 1) == 1  # dir bit k of i = g*2d + ...
    a_first = _lex_less(a, b, num_keys) | _lex_eq(a, b, num_keys)
    keep = desc != a_first  # ascending & a<=b -> keep layout
    keep = ~keep
    out = []
    for xa, xb in zip(a, b):
        na = jnp.where(keep, xa, xb)
        nb = jnp.where(keep, xb, xa)
        out.append(jnp.stack([na, nb], axis=1).reshape(N))
    return out


def sort_ops(operands, num_keys: int):
    """Sort uint32 operand tuples lexicographically by the first num_keys.

    Drop-in replacement for jax.lax.sort(operands, num_keys=...) on flat
    uint32 arrays; falls back to lax.sort off-TPU or for unsupported
    shapes."""
    N = operands[0].shape[0]
    ok_shape = N >= 2 * TILE and (N & (N - 1)) == 0 and N % TILE == 0
    backend = jax.default_backend()
    if not ok_shape or (backend != "tpu" and not _INTERPRET):
        return jax.lax.sort(operands, num_keys=num_keys)
    if any(x.dtype != jnp.uint32 for x in operands):
        return jax.lax.sort(operands, num_keys=num_keys)

    p = int(np.log2(N))
    n_ops = len(operands)
    ops2d = [x.reshape(N // LANES, LANES) for x in operands]

    local = partial(_local_sort_kernel, num_keys, n_ops)
    ops2d = _pallas_tile_pass(ops2d, num_keys, local, "bitonic_local")

    idx = None
    for k in range(TILE_LOG2 + 1, p + 1):
        flat = [x.reshape(N) for x in ops2d]
        for j in range(k - 1, TILE_LOG2 - 1, -1):
            flat = _cross_stage(flat, idx, j, k, num_keys)
        ops2d = [x.reshape(N // LANES, LANES) for x in flat]
        merge = partial(_tile_merge_kernel, num_keys, n_ops, k)
        ops2d = _pallas_tile_pass(ops2d, num_keys, merge, f"bitonic_merge_{k}")
    return [x.reshape(N) for x in ops2d]
