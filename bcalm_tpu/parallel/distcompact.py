"""Distributed compaction: sharded junction matching + pointer jumping.

Replaces the reference's shared-memory glue (bglue concurrent union-find,
SURVEY.md §4.4) with mesh collectives, completing the story started by
parallel.pipeline (sharded counting):

1. each device owns a shard of the solid k-mer set (global slot ids
   assigned per device: device d owns [d*cap, (d+1)*cap)),
2. junction entries (suffix/prefix ends) are routed to the device owning
   hash(junction key) via the fixed-capacity all_to_all bucket exchange,
3. each device classifies its key groups (ops.junctions pair rule) and
   emits unitig edges (src_oid -> dst_oid),
4. edges route back to the device owning src's slot, building a sharded
   successor array,
5. chain extraction = distributed pointer jumping: each doubling round
   resolves remote jump targets with a request/response all_to_all pair
   (log(longest chain) rounds over ICI — the collective analog of the
   reference's log-free but lock-contended union-find).

All exchanges are fixed-capacity with psum'd overflow detection (never
silent).  This module provides the building blocks + a host-driven
`distributed_compact`; the CLI routes through it via `-devices N`
(pipeline.distributed_build).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from bcalm_tpu.models import lanes as ln
from bcalm_tpu.ops import hashing
from bcalm_tpu.ops import junctions as junc
from bcalm_tpu.parallel.pipeline import AXIS, _route_to_buckets

_U32 = jnp.uint32
SENTINEL = np.uint32(0xFFFFFFFF)


def _exchange(bl, bv):
    """all_to_all channel-major buckets: bl (C, n_dev, cap), bv (n_dev, cap)."""
    recv_l = jax.lax.all_to_all(bl, AXIS, split_axis=1, concat_axis=1)
    recv_v = jax.lax.all_to_all(bv, AXIS, split_axis=0, concat_axis=0)
    return recv_l, recv_v


def _local_succ_shard(solid, n_local, k: int, n_dev: int, cap_entries: int,
                      slot_cap: int):
    """Per-device body: build entries, exchange by key owner, classify,
    route edges back to src owners.  Returns local succ shard (2*slot_cap,)
    plus dropped counts."""
    me = jax.lax.axis_index(AXIS)
    N = solid.shape[1]  # == slot_cap

    suf = ln.suffix_kminus1(solid, k)
    pre = ln.prefix_kminus1(solid, k)
    suf_c, sig = ln.canonical(suf, k - 1)
    pre_c, tau = ln.canonical(pre, k - 1)
    suf_pal = ln.is_palindrome(suf, k - 1)
    pre_pal = ln.is_palindrome(pre, k - 1)
    one = np.uint32(1)
    sig = jnp.where(suf_pal, False, sig).astype(_U32)
    tau = jnp.where(pre_pal, False, tau).astype(_U32)
    inv_sig = jnp.where(suf_pal, np.uint32(0), one - sig)
    inv_tau = jnp.where(pre_pal, np.uint32(0), one - tau)

    ids = jnp.arange(N, dtype=jnp.int32)
    valid1 = ids < n_local
    # GLOBAL oriented ids: + strand = global slot, - strand = slot + n_dev*cap
    gslot = me.astype(jnp.int32) * slot_cap + ids
    tot = n_dev * slot_cap
    keys = jnp.concatenate([
        junc._make_keys(suf_c, sig, valid1, k),
        junc._make_keys(suf_c, inv_sig, valid1, k),
        junc._make_keys(pre_c, tau, valid1, k),
        junc._make_keys(pre_c, inv_tau, valid1, k),
    ], axis=1)
    oid = jnp.concatenate([gslot, gslot + tot, gslot, gslot + tot]).astype(_U32)
    role = jnp.concatenate([
        jnp.zeros((N,), _U32), jnp.ones((N,), _U32),
        jnp.ones((N,), _U32), jnp.zeros((N,), _U32),
    ])
    payload = oid | (role << junc._ROLE_SHIFT)
    valid = jnp.concatenate([valid1] * 4)

    owner = (hashing.hash_lanes(keys) % np.uint32(n_dev)).astype(jnp.int32)
    stacked = jnp.concatenate([keys, payload[None]], axis=0)
    bl, bv, drop1 = _route_to_buckets(stacked, valid, owner, n_dev, cap_entries)
    recv, recv_v = _exchange(bl, bv)
    K = keys.shape[0]
    ent = recv.reshape(K + 1, -1)
    ent_valid = recv_v.reshape(-1)

    e_keys = jnp.where(ent_valid[None], ent[:K], SENTINEL)
    e_pay = jnp.where(ent_valid, ent[K], 0)

    out = jax.lax.sort(
        [e_keys[j] for j in range(K)] + [e_pay], num_keys=K
    )
    s_keys = jnp.stack(out[:K], axis=0)
    s_pay = out[K]
    s_valid = s_keys[0] != SENTINEL

    eq_prev = jnp.concatenate([
        jnp.zeros((1,), bool), jnp.all(s_keys[:, 1:] == s_keys[:, :-1], axis=0)
    ])
    eq_next = jnp.concatenate([eq_prev[1:], jnp.zeros((1,), bool)])
    pair_head = s_valid & ~eq_prev & eq_next & ~jnp.concatenate(
        [eq_next[1:], jnp.zeros((1,), bool)]
    )
    nxt_pay = jnp.concatenate([s_pay[1:], jnp.zeros((1,), _U32)])
    role_a = (s_pay >> junc._ROLE_SHIFT).astype(jnp.int32)
    role_b = (nxt_pay >> junc._ROLE_SHIFT).astype(jnp.int32)
    oid_a = (s_pay & junc._OID_MASK).astype(jnp.int32)
    oid_b = (nxt_pay & junc._OID_MASK).astype(jnp.int32)
    vert_a = jnp.where(oid_a >= tot, oid_a - tot, oid_a)
    vert_b = jnp.where(oid_b >= tot, oid_b - tot, oid_b)
    ok = pair_head & (role_a != role_b) & (vert_a != vert_b)
    src = jnp.where(role_a == junc.ROLE_OUT, oid_a, oid_b)
    dst = jnp.where(role_a == junc.ROLE_OUT, oid_b, oid_a)

    def scatter_edges(a, b, mask):
        """Route (a -> b) pairs to the owner of a's slot and scatter b into
        a local table indexed by a's local oriented id."""
        a_slot = jnp.where(a >= tot, a - tot, a)
        a_owner = a_slot // slot_cap
        edge = jnp.stack([a.astype(_U32), b.astype(_U32)], axis=0)
        bl, bv, drop = _route_to_buckets(edge, mask, a_owner, n_dev,
                                         cap_entries)
        recv, recv_v = _exchange(bl, bv)
        edges = recv.reshape(2, -1)
        ev = recv_v.reshape(-1)
        ea = edges[0].astype(jnp.int32)
        eb = edges[1].astype(jnp.int32)
        eslot = jnp.where(ea >= tot, ea - tot, ea) - me * slot_cap
        lidx = jnp.where(ea >= tot, eslot + slot_cap, eslot)
        table = jnp.full((2 * slot_cap,), -1, dtype=jnp.int32)
        table = table.at[jnp.where(ev, lidx, 2 * slot_cap)].set(
            jnp.where(ev, eb, -1), mode="drop"
        )
        return table, drop

    # successor shard (edges routed to src owners) and predecessor shard
    # (same edges routed to dst owners) — pred is succ's inverse and feeds
    # the sharded pointer-jumping loop directly
    succ, drop2 = scatter_edges(src, dst, ok)
    pred, drop3 = scatter_edges(dst, src, ok)
    dropped = jax.lax.psum(drop1 + drop2 + drop3, AXIS)
    return succ, pred, dropped


def succ_shard_fn(mesh, k: int, n_dev: int, cap_entries: int, slot_cap: int):
    fn = shard_map(
        partial(_local_succ_shard, k=k, n_dev=n_dev, cap_entries=cap_entries,
                slot_cap=slot_cap),
        mesh=mesh,
        in_specs=(P(None, AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_succ(mesh, solid_sharded, n_local, k, cap_entries, slot_cap):
    """Compute the sharded successor + predecessor arrays on the mesh."""
    fn = succ_shard_fn(mesh, k, mesh.devices.size, cap_entries, slot_cap)
    succ, pred, dropped = fn(solid_sharded, n_local)
    return succ, pred, int(dropped)


def _chain_loop_shard(succ_l, pred_l, n_loc, n_dev: int, slot_cap: int):
    """Per-device pointer-jumping shard: the state table is sharded; each
    doubling round all_gathers the (4-int-per-node) table over the mesh and
    resolves ancestor rows locally — the log-round collective replacement
    for the reference's CAS-contended shared-memory union-find
    (example/uf/testUF.cpp), with psum'd convergence."""
    from bcalm_tpu.ops import chains as chains_op

    me = jax.lax.axis_index(AXIS)
    tot = n_dev * slot_cap
    two_cap = 2 * slot_cap
    lidx = jnp.arange(two_cap, dtype=jnp.int32)
    slot = me.astype(jnp.int32) * slot_cap + (lidx % slot_cap)
    gidx = jnp.where(lidx >= slot_cap, tot + slot, slot)
    valid_l = (lidx % slot_cap) < n_loc[0]
    pred_l = jnp.where(valid_l, pred_l, -1)
    state = chains_op.init_state(pred_l, valid_l, gidx, 2 * tot)

    def g2row(g):
        """Global oriented id -> row in the device-block-gathered table."""
        s = jnp.where(g >= tot, g - tot, g)
        loc = s % slot_cap + jnp.where(g >= tot, slot_cap, 0)
        return (s // slot_cap) * two_cap + loc

    R = chains_op._max_rounds(2 * tot)

    def cond(carry):
        state, changed, t = carry
        return changed & (t < R)

    def body(carry):
        state, _, t = carry
        full = jax.lax.all_gather(state, AXIS, tiled=True)
        anc = jnp.take(full, g2row(state[:, chains_op._PTR]), axis=0)
        new = chains_op.round_update(state, anc)
        changed = jax.lax.psum(
            jnp.any(new != state).astype(jnp.int32), AXIS) > 0
        return new, changed, t + 1

    state, _, _ = jax.lax.while_loop(
        cond, body, (state, jnp.asarray(True), jnp.asarray(0))
    )
    return state


def chain_loop_fn(mesh, n_dev: int, slot_cap: int):
    fn = shard_map(
        partial(_chain_loop_shard, n_dev=n_dev, slot_cap=slot_cap),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return jax.jit(fn)


def _to_global_layout(sharded, n_dev: int, slot_cap: int):
    """Device-block-major (n_dev, 2*slot_cap, ...) shards -> global
    strand-major layout ([+ ids 0..tot) then [- ids tot..2tot))."""
    tot = n_dev * slot_cap
    sh = np.asarray(sharded).reshape(n_dev, 2 * slot_cap, -1)
    return np.concatenate([
        sh[:, :slot_cap].reshape(tot, -1),
        sh[:, slot_cap:].reshape(tot, -1),
    ]).squeeze(-1)


def distributed_compact_pos(mesh, solid_per_dev, counts_per_dev,
                            pos_per_dev, k: int):
    """Position-ordered distributed compaction — the scalable glue.

    Round 2's doubling loop all_gathered the full 16-byte-per-node state
    table to every device every round (per-device memory O(total)); this
    replaces it with the locality-ordered run contraction of
    ops.runchains, distributed:

    1. host: order the merged solid set by first-occurrence key, flip to
       as-read orientation, re-shard into POSITION-CONTIGUOUS device
       slots (gid = d*slot_cap + i preserves stream adjacency),
    2. mesh: sharded junction matching (entry exchange by key hash, edges
       routed back to slot owners) — per-device memory O(N/n_dev),
    3. host: consecutive-run detection over the succ shards (numpy scans;
       runs break at shard boundaries, adding only O(n_dev) extra runs),
    4. device: ONE weighted pointer jump over the contracted run graph
       (ops.runchains.contracted_jump) — typically 20-60x smaller than
       the node set, so the full-size doubling state never exists
       anywhere.  Degenerate position quality only grows the contracted
       graph (worst case = the node count, matching the old behavior);
       output is correct for ANY positions,
    5. host: broadcast run results with np.repeat + assembly (host memory
       O(N), as assembly always was).

    Args:
      solid_per_dev / counts_per_dev / pos_per_dev: per-device host arrays
        ((L, n_d) uint32 / (n_d,) int32 / (n_d,) uint32 first-occurrence
        keys, disjoint k-mer sets)
    Returns engine.UnitigSet.
    """
    from bcalm_tpu import engine as eng
    from bcalm_tpu.ops import runchains

    n_dev = mesh.devices.size
    L = solid_per_dev[0].shape[0]
    lanes = np.concatenate(solid_per_dev, axis=1)
    counts = np.concatenate(counts_per_dev)
    pos = np.concatenate(pos_per_dev)
    order = np.argsort(pos, kind="stable")
    lanes = lanes[:, order]
    counts = counts[order]
    pos = pos[order]
    N = lanes.shape[1]
    if N == 0:
        return eng.UnitigSet(
            k=k, seqs=[], kc=np.zeros(0, np.int64), abundances=[],
            circular=np.zeros(0, bool), links=[],
            stats={"devices": n_dev, "solid_kmers": 0})
    # flip to as-read orientation (strand bit = key LSB)
    strand = (pos & 1).astype(bool)
    lanes = np.asarray(jnp.where(
        jnp.asarray(strand)[None], ln.revcomp(jnp.asarray(lanes), k),
        jnp.asarray(lanes)))

    slot_cap = eng._round_capacity(max(1, -(-N // n_dev)))
    tot = n_dev * slot_cap
    solid_global = np.zeros((L, tot), np.uint32)
    counts_global = np.zeros((tot,), np.int32)
    n_local = np.zeros((n_dev,), np.int32)
    off = 0
    for d in range(n_dev):
        n_d = min(slot_cap, N - off) if off < N else 0
        solid_global[:, d * slot_cap: d * slot_cap + n_d] = \
            lanes[:, off: off + n_d]
        counts_global[d * slot_cap: d * slot_cap + n_d] = \
            counts[off: off + n_d]
        n_local[d] = n_d
        off += n_d

    cap_entries = 4 * slot_cap
    succ_sh, pred_sh, dropped = distributed_succ(
        mesh, jnp.asarray(solid_global), jnp.asarray(n_local), k,
        cap_entries, slot_cap)
    if dropped:
        raise RuntimeError(f"junction exchange overflow: {dropped} entries")

    succ_g = _to_global_layout(succ_sh, n_dev, slot_cap).astype(np.int64)

    # ---- host run detection (numpy scans over the + half) ----
    idx = np.arange(tot)
    vplus = (idx % slot_cap) < n_local[idx // slot_cap]
    succ_p = succ_g[:tot]
    nxt = vplus & (succ_p == idx + 1)
    is_head = vplus & ~np.concatenate([[False], nxt[:-1]])
    is_tail = vplus & ~nxt
    heads = np.nonzero(is_head)[0]
    tails = np.nonzero(is_tail)[0]
    R = heads.shape[0]
    rlen = (tails - heads + 1).astype(np.int32)
    R_cap = eng._round_capacity(max(1, R))

    # ---- contracted successor graph (host build, numpy searchsorted) ----
    def xlate(w):
        wv = np.where(w >= tot, w - tot, w)
        r_t = np.searchsorted(heads, np.clip(wv, 0, tot), side="right") - 1
        c = np.where(w >= tot, r_t + R_cap, r_t)
        return np.where(w >= 0, c, -1).astype(np.int32)

    w_plus = succ_g[tails]                 # + run tails' successors
    w_minus = succ_g[tot + heads]          # - run tails' successors
    csucc = np.full((2 * R_cap,), -1, np.int32)
    csucc[:R] = xlate(w_plus)
    csucc[R_cap: R_cap + R] = xlate(w_minus)
    cvalid = np.zeros((2 * R_cap,), bool)
    cvalid[:R] = True
    cvalid[R_cap: R_cap + R] = True
    wlen2 = np.zeros((2 * R_cap,), np.int32)
    wlen2[:R] = rlen
    wlen2[R_cap: R_cap + R] = rlen

    from bcalm_tpu.ops import chains as chains_op

    cinfo = runchains.contracted_jump(
        jnp.asarray(csucc), jnp.asarray(cvalid), jnp.asarray(wlen2))
    if (2 * R_cap >= chains_op._HIER_MIN
            and int(cinfo["n_unitigs"]) < 0):
        cinfo = runchains.contracted_jump(
            jnp.asarray(csucc), jnp.asarray(cvalid), jnp.asarray(wlen2),
            variant="plain")
    cuid = np.asarray(cinfo["uid"])
    crank = np.asarray(cinfo["rank"])
    n_unitigs = int(cinfo["n_unitigs"])
    cstart = np.asarray(cinfo["start_oid"])[:max(1, n_unitigs)]

    # ---- per-unitig start translated to original oriented ids ----
    csv = np.clip(np.where(cstart >= R_cap, cstart - R_cap, cstart),
                  0, max(0, R - 1))
    orig_start = np.where(cstart >= R_cap, tot + tails[csv], heads[csv])

    # ---- broadcast over run members (np.repeat; runs tile the valid
    # region of each half exactly) ----
    val_idx = np.nonzero(vplus)[0]
    uid = np.full((2 * tot,), -1, np.int32)
    rank = np.zeros((2 * tot,), np.int32)
    uid[val_idx] = np.repeat(cuid[:R_cap][:R], rlen)
    rank[val_idx] = (np.repeat(crank[:R_cap][:R], rlen)
                     + (val_idx - np.repeat(heads, rlen)))
    uid[tot + val_idx] = np.repeat(cuid[R_cap:][:R], rlen)
    rank[tot + val_idx] = (np.repeat(crank[R_cap:][:R], rlen)
                           + (np.repeat(tails, rlen) - val_idx))
    rank = np.where(uid >= 0, rank, 0)

    info = {
        "uid": uid,
        "rank": rank,
        "n_unitigs": n_unitigs,
        "start_oid": orig_start,
        "length": np.asarray(cinfo["length"])[:max(1, n_unitigs)],
        "circular": np.asarray(cinfo["circular"])[:max(1, n_unitigs)],
    }
    seqs, kc, abund, circular = eng.assemble_unitigs(
        solid_global, counts_global, info, k)
    links = eng.link_join(seqs, k)
    return eng.UnitigSet(
        k=k, seqs=seqs, kc=kc, abundances=abund, circular=circular,
        links=links, stats={
            "devices": n_dev,
            "solid_kmers": int(n_local.sum()),
            "glue_runs": int(R),
            "glue_contraction": float(n_local.sum()) / max(1, R),
        },
    )


def distributed_compact(mesh, solid_per_dev, counts_per_dev, k: int):
    """Host-driven distributed compaction from per-device solid shards.

    Junction matching, edge construction AND the pointer-jumping doubling
    loop all run sharded on the mesh; only the final chain bookkeeping
    (16 bytes per oriented node, ~100x smaller than the input stream) is
    gathered for host assembly.

    Args:
      solid_per_dev: list of lane-major (L, n_d) uint32 arrays (disjoint sets)
      counts_per_dev: list of (n_d,) int32
    Returns engine.UnitigSet.
    """
    from bcalm_tpu import engine as eng
    from bcalm_tpu.ops import chains as chains_op

    n_dev = mesh.devices.size
    L = solid_per_dev[0].shape[0]
    slot_cap = eng._round_capacity(max(1, max(s.shape[1] for s in solid_per_dev)))

    solid_global = np.zeros((L, n_dev * slot_cap), np.uint32)
    counts_global = np.zeros((n_dev * slot_cap,), np.int32)
    n_local = np.zeros((n_dev,), np.int32)
    for d in range(n_dev):
        n_d = solid_per_dev[d].shape[1]
        solid_global[:, d * slot_cap : d * slot_cap + n_d] = solid_per_dev[d]
        counts_global[d * slot_cap : d * slot_cap + n_d] = counts_per_dev[d]
        n_local[d] = n_d

    # a device emits at most 4*slot_cap entries total, so this capacity can
    # never overflow regardless of key-hash skew (production tuning can
    # shrink it with an overflow-retry loop)
    cap_entries = 4 * slot_cap
    succ_sh, pred_sh, dropped = distributed_succ(
        mesh, jnp.asarray(solid_global), jnp.asarray(n_local), k,
        cap_entries, slot_cap,
    )
    if dropped:
        raise RuntimeError(f"junction exchange overflow: {dropped} entries")

    # sharded pointer jumping over the mesh (state stays device-resident;
    # rounds exchange the 16-byte-per-node table via all_gather)
    state_sh = chain_loop_fn(mesh, n_dev, slot_cap)(
        succ_sh, pred_sh, jnp.asarray(n_local)
    )

    # reassemble global (strand-major) layout from device-block shards
    tot = n_dev * slot_cap

    def to_global(sharded):
        sh = np.asarray(sharded).reshape(n_dev, 2 * slot_cap, -1)
        return np.concatenate([
            sh[:, :slot_cap].reshape(tot, -1),
            sh[:, slot_cap:].reshape(tot, -1),
        ]).squeeze()

    succ_global = to_global(succ_sh)
    pred_global = to_global(pred_sh)
    state_global = np.asarray(state_sh).reshape(n_dev, 2 * slot_cap, 4)
    state_global = np.concatenate([
        state_global[:, :slot_cap].reshape(tot, 4),
        state_global[:, slot_cap:].reshape(tot, 4),
    ])
    oid = np.arange(2 * tot)
    slot = np.where(oid >= tot, oid - tot, oid)
    valid = (slot % slot_cap) < n_local[slot // slot_cap]

    info = jax.jit(chains_op.finish)(
        jnp.asarray(succ_global), jnp.asarray(pred_global),
        jnp.asarray(valid), jnp.asarray(state_global),
    )
    seqs, kc, abund, circular = eng.assemble_unitigs(
        jnp.asarray(solid_global), jnp.asarray(counts_global), info, k
    )
    links = eng.link_join(seqs, k)
    return eng.UnitigSet(
        k=k, seqs=seqs, kc=kc, abundances=abund, circular=circular,
        links=links, stats={"devices": n_dev,
                            "solid_kmers": int(n_local.sum())},
    )
