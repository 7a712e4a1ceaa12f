"""Pallas TPU bitonic sort over multi-operand uint32 vectors.

XLA's TPU `lax.sort` executes every compare-exchange substage as its own
HBM pass (~300 passes for 16M elements, measured ~96ms for 2 operands —
HBM-bound).  This implementation fuses all substages with exchange
distance < TILE into VMEM-resident Pallas kernels, so HBM sees only:

  1 pass   tile-local full bitonic sort (phases 1..s fused)
  (p-s)(p-s+1)/2 passes   cross-tile stages (XLA elementwise, j >= s)
  (p-s) passes   per-phase tile-local merges (substages j < s fused)

for N = 2^p and TILE = 2^s — ~30 passes instead of ~300.

The kernels are TABLE-DRIVEN: one tiny substage body runs under
`lax.fori_loop` with the (phase k, substage j) schedule in registers and
`pltpu.roll` dynamic shifts, so Mosaic compiles one body instead of
inlining ~136 stages (which took the remote compile service >10min).

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

# The Pallas path measured 228ms vs lax.sort's 93ms for 16.8M x 2 operands
# on v5e: the dynamic-shift rolls + per-substage cond dominate (XLA's sort
# is already near the bitonic HBM/VPU bound at ~180M elem/s).  Kept for
# further kernel work; enable with BTPU_PALLAS_SORT=1.
import os as _os

_USE_PALLAS = _os.environ.get("BTPU_PALLAS_SORT", "0") == "1"


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


def _roll_dyn(x, shift, axis):
    """Circular roll by a traced shift (kernel path uses pltpu.roll)."""
    if _INTERPRET:
        return jnp.roll(x, shift, axis=axis)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift, axis=axis)


def _substage_dyn(vals, idx, j, k, num_keys):
    """One compare-exchange substage with TRACED j (distance 2^j) and k
    (direction bit).  vals are (rows, 128) arrays; idx global indices."""
    d = (jnp.int32(1) << j)
    upper = ((idx >> j) & 1) == 1

    def lane_partner(x):
        fwd = _roll_dyn(x, d, 1)
        bwd = _roll_dyn(x, LANES - d, 1)
        return jnp.where(upper, fwd, bwd)

    def row_partner(x):
        rows = x.shape[0]
        dr = d // LANES
        fwd = _roll_dyn(x, dr, 0)
        bwd = _roll_dyn(x, rows - dr, 0)
        return jnp.where(upper, fwd, bwd)

    p_vals = jax.lax.cond(
        d < LANES,
        lambda vs: [lane_partner(x) for x in vs],
        lambda vs: [row_partner(x) for x in vs],
        vals,
    )

    desc = ((idx >> k) & 1) == 1
    want_min = upper == desc  # lower keeps min when ascending
    p_idx = jnp.where(upper, idx - d, idx + d)
    self_first = _lex_less(vals, p_vals, num_keys) | (
        _lex_eq(vals, p_vals, num_keys) & (idx < p_idx)
    )
    keep_self = want_min == self_first
    return [jnp.where(keep_self, s, p) for s, p in zip(vals, p_vals)]


def _local_sort_kernel(num_keys, n_ops, *refs):
    """Fused bitonic phases 1..TILE_LOG2 of one tile (nested fori loops —
    one compiled substage body instead of ~136 inlined stages)."""
    import jax.experimental.pallas as pl

    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    t = pl.program_id(0)
    r = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
    idx = r * LANES + l + t * TILE

    def phase(k, vals):
        def body(i, vals):
            return _substage_dyn(list(vals), idx, k - 1 - i, k, num_keys)

        return jax.lax.fori_loop(0, k, body, vals)

    vals = jax.lax.fori_loop(1, TILE_LOG2 + 1, phase,
                             [r_[:] for r_ in in_refs])
    for r_, v in zip(out_refs, vals):
        r_[:] = v


def _tile_merge_kernel(num_keys, n_ops, *refs):
    """Fused substages j = TILE_LOG2-1 .. 0 of merge phase k (k passed as
    a scalar input so one compiled kernel serves every phase)."""
    import jax.experimental.pallas as pl

    k_ref = refs[0]
    in_refs = refs[1:1 + n_ops]
    out_refs = refs[1 + n_ops:]
    t = pl.program_id(0)
    r = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
    idx = r * LANES + l + t * TILE
    k = k_ref[0]

    def body(m, vals):
        j = TILE_LOG2 - 1 - m
        return _substage_dyn(list(vals), idx, j, k, num_keys)

    vals = jax.lax.fori_loop(0, TILE_LOG2, body, [r_[:] for r_ in in_refs])
    for r_, v in zip(out_refs, vals):
        r_[:] = v


def _pallas_local(ops2d, num_keys):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ops = len(ops2d)
    rows = ops2d[0].shape[0]
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_local_sort_kernel, num_keys, n_ops),
        grid=(rows // TILE_ROWS,),
        in_specs=[spec] * n_ops,
        out_specs=[spec] * n_ops,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ops2d],
        interpret=_INTERPRET,
        name="bitonic_local",
    )(*ops2d)


def _pallas_merge(ops2d, num_keys, k):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ops = len(ops2d)
    rows = ops2d[0].shape[0]
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_tile_merge_kernel, num_keys, n_ops),
        grid=(rows // TILE_ROWS,),
        in_specs=[k_spec] + [spec] * n_ops,
        out_specs=[spec] * n_ops,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ops2d],
        interpret=_INTERPRET,
        name="bitonic_merge",
    )(jnp.asarray([k], jnp.int32), *ops2d)


def _cross_stage(ops, j, k, num_keys):
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
    keep = a_first != desc  # ascending & a<=b -> keep layout; desc flips
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
    if not (_USE_PALLAS or _INTERPRET):
        return jax.lax.sort(operands, num_keys=num_keys)
    if not ok_shape or (backend != "tpu" and not _INTERPRET):
        return jax.lax.sort(operands, num_keys=num_keys)
    if any(x.dtype != jnp.uint32 for x in operands):
        return jax.lax.sort(operands, num_keys=num_keys)

    p = int(np.log2(N))
    ops2d = [x.reshape(N // LANES, LANES) for x in operands]
    ops2d = _pallas_local(ops2d, num_keys)

    for k in range(TILE_LOG2 + 1, p + 1):
        flat = [x.reshape(N) for x in ops2d]
        for j in range(k - 1, TILE_LOG2 - 1, -1):
            flat = _cross_stage(flat, j, k, num_keys)
        ops2d = [x.reshape(N // LANES, LANES) for x in flat]
        ops2d = _pallas_merge(ops2d, num_keys, k)
    return [x.reshape(N) for x in ops2d]
