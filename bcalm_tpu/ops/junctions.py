"""Junction classification: vectorized (k-1)-overlap matching.

TPU-native replacement for the reference's bucket compaction + glue
machinery (gatb bcalm2/ograph.cpp hash-chaining, bcalm2/bglue_algo.cpp +
unionFind.hpp — reconstructed, SURVEY.md §3.2/§4.3-4.4).  Instead of
pointer-chasing hash tables and a concurrent union-find, the bi-directed
degree conditions of the unitig definition
(/root/reference/bidirected-graphs-in-bcalm2/bidirected-graphs-in-bcalm2.md:83-88)
are evaluated for ALL nodes at once with one sort over (k-1)-mer junction
keys plus segment reductions.

Model
-----
Node i = canonical solid k-mer, oriented nodes (i,+)=i and (i,-)=i+N.
Each oriented node (i,o) has an out-end (its suffix (k-1)-mer) and an
in-end (its prefix).  Two oriented nodes are linked by an edge iff the
out-end string of one equals the in-end string of the other
(bidirected-graphs-in-bcalm2.md:39-46).  Each physical side of a k-mer
(suffix / prefix) therefore yields TWO entries, one OUT and one IN, for
the two orientations:

    suffix s_i -> (key=canon(s_i), strand=sigma, OUT, oid=i)
                  (key=canon(s_i), strand=1-sigma, IN, oid=i+N)
    prefix p_i -> (key=canon(p_i), strand=tau,   IN,  oid=i)
                  (key=canon(p_i), strand=1-tau, OUT, oid=i+N)

where strand says which orientation of the canonical (k-1)-mer appears.
Palindromic (k-1)-mers (k odd => k-1 even: these are exactly the
self-mirror edges, bidirected-graphs-in-bcalm2.md:30,57) match BOTH
strands; they are handled by forcing their strand to 0 so all their
entries share one group.

A unitig edge (i,o)->(j,q) exists iff the (key,strand) group holds exactly
one IN and one OUT entry and i != j (vertex repetition breaks a path; this
also breaks self-loops and self-mirror hairpins).  The successor array over
oriented nodes is then a mirror-symmetric functional graph of paths and
cycles, consumed by ops.chains.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.models import lanes as ln
from bcalm_tpu.ops.count import run_starts

ROLE_OUT = 0
ROLE_IN = 1


def build_entries(solid: jnp.ndarray, n_solid: jnp.ndarray, k: int):
    """Entry table of shape (4N, ...): keys (+strand lane), role, oid, valid."""
    N = solid.shape[0]
    suf = ln.suffix_kminus1(solid, k)
    pre = ln.prefix_kminus1(solid, k)
    suf_c, sig = ln.canonical(suf, k - 1)
    pre_c, tau = ln.canonical(pre, k - 1)
    suf_pal = ln.is_palindrome(suf, k - 1)
    pre_pal = ln.is_palindrome(pre, k - 1)

    sig = jnp.where(suf_pal, False, sig)
    pre_sig = jnp.where(pre_pal, False, tau)
    sig_i = sig.astype(jnp.uint32)
    tau_i = pre_sig.astype(jnp.uint32)
    inv_sig = jnp.where(suf_pal, jnp.uint32(0), jnp.uint32(1) - sig_i)
    inv_tau = jnp.where(pre_pal, jnp.uint32(0), jnp.uint32(1) - tau_i)

    ids = jnp.arange(N, dtype=jnp.int32)
    valid1 = ids < n_solid

    # entry order: [suffix-OUT(i), suffix-IN(i+N), prefix-IN(i), prefix-OUT(i+N)]
    keys = jnp.concatenate([suf_c, suf_c, pre_c, pre_c], axis=0)
    strand = jnp.concatenate([sig_i, inv_sig, tau_i, inv_tau], axis=0)
    role = jnp.concatenate(
        [
            jnp.full((N,), ROLE_OUT, jnp.int32),
            jnp.full((N,), ROLE_IN, jnp.int32),
            jnp.full((N,), ROLE_IN, jnp.int32),
            jnp.full((N,), ROLE_OUT, jnp.int32),
        ]
    )
    oid = jnp.concatenate([ids, ids + N, ids, ids + N])
    valid = jnp.concatenate([valid1] * 4)
    # append strand as an extra least-significant key lane
    keyed = jnp.concatenate([keys, strand[:, None]], axis=-1)
    return keyed, role, oid, valid


@partial(jax.jit, static_argnames=("k",))
def successor_arrays(solid: jnp.ndarray, n_solid: jnp.ndarray, k: int):
    """Successor/out-degree arrays over the 2N oriented nodes.

    Returns:
      succ:    (2N,) int32 — unitig-successor oriented id, -1 if none
      out_deg: (2N,) int32 — bi-directed out-degree of each oriented node
    """
    N = solid.shape[0]
    E = 4 * N
    keyed, role, oid, valid = build_entries(solid, n_solid, k)

    # sort entries by (key, strand), invalid last
    Lk = keyed.shape[-1]
    invalid_key = jnp.where(valid, np.uint32(0), np.uint32(1))
    operands = [invalid_key] + [keyed[:, j] for j in range(Lk)] + [
        valid.astype(jnp.int32),
        role,
        oid,
    ]
    out = jax.lax.sort(operands, num_keys=Lk + 1)
    s_keys = jnp.stack(out[1 : Lk + 1], axis=-1)
    s_valid = out[Lk + 1].astype(bool)
    s_role = out[Lk + 2]
    s_oid = out[Lk + 3]

    starts = run_starts(s_keys, s_valid)
    gid = jnp.cumsum(starts.astype(jnp.int32)) - 1
    gid = jnp.where(s_valid, gid, E - 1)

    is_out = s_valid & (s_role == ROLE_OUT)
    is_in = s_valid & (s_role == ROLE_IN)
    c_out = jax.ops.segment_sum(
        is_out.astype(jnp.int32), gid, num_segments=E, indices_are_sorted=True
    )
    c_in = jax.ops.segment_sum(
        is_in.astype(jnp.int32), gid, num_segments=E, indices_are_sorted=True
    )
    id_in = jax.ops.segment_max(
        jnp.where(is_in, s_oid, -1), gid, num_segments=E, indices_are_sorted=True
    )

    # per-OUT-entry unitig edge decision
    g_cin = c_in[gid]
    g_cout = c_out[gid]
    partner = id_in[gid]
    vert_self = jnp.where(s_oid >= N, s_oid - N, s_oid)
    vert_partner = jnp.where(partner >= N, partner - N, partner)
    edge_ok = (
        is_out
        & (g_cin == 1)
        & (g_cout == 1)
        & (partner >= 0)
        & (vert_partner != vert_self)
    )

    succ = jnp.full((2 * N,), -1, dtype=jnp.int32)
    succ = succ.at[jnp.where(edge_ok, s_oid, 2 * N)].set(
        jnp.where(edge_ok, partner, -1), mode="drop"
    )
    out_deg = jnp.zeros((2 * N,), dtype=jnp.int32)
    out_deg = out_deg.at[jnp.where(is_out, s_oid, 2 * N)].set(
        jnp.where(is_out, g_cin, 0), mode="drop"
    )
    return succ, out_deg
