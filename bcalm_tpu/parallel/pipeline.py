"""Sharded multi-chip pipeline: distributed k-mer counting over a Mesh.

TPU-native replacement for the reference's (pass x partition) disk staging
(gatb SortingCountAlgorithm — SURVEY.md §3.3/§4.2): the minimizer/hash
partition space maps onto mesh devices, and superkmer routing to disk
partitions becomes an `all_to_all` over ICI.  Each device:

1. extracts canonical k-mers from its read shard (ops.extract),
2. routes each k-mer to its owner device (hash-partitioned) via a
   fixed-capacity bucket exchange (static shapes; overflow is *detected*
   and reported, never silently dropped),
3. counts its owned k-mers locally (ops.count) — k-mer space is disjoint
   across devices, so no further reduction is needed,
4. abundance histogram is psum-reduced across the mesh.

Compaction (junctions + chains) currently runs replicated on the gathered
solid set — the solid set is typically ~50-100x smaller than the input
occurrence stream, so counting dominates wall-clock (the reference's own
hot-loop ranking, SURVEY.md §4.5).  Distributed junction matching and
log-round distributed pointer jumping are the planned next step and slot
into the same entry/owner routing below.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bcalm_tpu.models import lanes as ln
from bcalm_tpu.ops import count as count_op
from bcalm_tpu.ops import extract as extract_op
from bcalm_tpu.ops import hashing

AXIS = "kspace"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _route_to_buckets(stacked, valid, owner, n_dev: int, cap: int):
    """Scatter entries into per-destination fixed buckets by owner id.

    stacked: channel-major (C, N) uint32 (lane rows + packed payload rows).
    Returns (buckets (C, n_dev, cap), bucket_valid (n_dev, cap),
    n_dropped scalar).  Overflow within a destination bucket is counted,
    never silent.
    """
    C, N = stacked.shape
    owner = jnp.where(valid, owner, n_dev)
    # stable sort by owner keeps determinism
    order = jnp.argsort(owner, stable=True)
    s_owner = owner[order]
    s_stack = stacked[:, order]
    s_valid = valid[order]
    # position within each owner run
    idx = jnp.arange(N, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s_owner[1:] != s_owner[:-1]]
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0)
    )
    within = idx - run_start
    ok = s_valid & (within < cap) & (s_owner < n_dev)
    dest = jnp.where(ok, s_owner * cap + within, n_dev * cap)
    bl = jnp.zeros((C, n_dev * cap), dtype=stacked.dtype)
    for c in range(C):
        bl = bl.at[c, dest].set(jnp.where(ok, s_stack[c], 0), mode="drop")
    bv = jnp.zeros((n_dev * cap,), dtype=bool)
    bv = bv.at[dest].set(ok, mode="drop")
    n_dropped = jnp.sum((s_valid & ~ok).astype(jnp.int32))
    return bl.reshape(C, n_dev, cap), bv.reshape(n_dev, cap), n_dropped


def _local_shard_count(words, lengths, k: int, n_dev: int, cap: int):
    """Per-device body: extract, route, exchange, count. Runs under shard_map."""
    canon, valid = extract_op.extract_canonical(words, lengths, k)
    L = canon.shape[0]
    lanes = canon.reshape(L, -1)
    flat_valid = valid.reshape(-1)
    owner = (hashing.hash_lanes(lanes) % np.uint32(n_dev)).astype(jnp.int32)
    bl, bv, dropped = _route_to_buckets(lanes, flat_valid, owner, n_dev, cap)
    # exchange: bucket i goes to device i; we receive one from every device
    recv_l = jax.lax.all_to_all(bl, AXIS, split_axis=1, concat_axis=1)
    recv_v = jax.lax.all_to_all(bv, AXIS, split_axis=0, concat_axis=0)
    mine_l = recv_l.reshape(L, -1)
    mine_v = recv_v.reshape(-1)
    unique, counts, n_unique = count_op.count_canonical(mine_l, mine_v)
    total_dropped = jax.lax.psum(dropped, AXIS)
    return unique, counts, n_unique[None], total_dropped


def distributed_count_fn(mesh: Mesh, k: int, cap_per_dest: int):
    """Build the jitted sharded counting step for a mesh.

    Input:  words (B, W) uint32, lengths (B,) — B sharded over the mesh.
    Output: per-device unique/counts/n_unique (sharded), dropped (replicated).
    """
    n_dev = mesh.devices.size

    fn = shard_map(
        partial(_local_shard_count, k=k, n_dev=n_dev, cap=cap_per_dest),
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(None, AXIS), P(AXIS), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@dataclass
class DistributedCountResult:
    unique: jax.Array     # (L, n_dev * cap_total) axis-1-sharded, per-device sorted
    counts: jax.Array
    n_unique: np.ndarray  # (n_dev,) per-device unique counts
    dropped: int


def distributed_count(mesh, words, lengths, k, cap_per_dest):
    fn = distributed_count_fn(mesh, k, cap_per_dest)
    unique, counts, n_unique, dropped = fn(words, lengths)
    return DistributedCountResult(
        unique=unique,
        counts=counts,
        n_unique=np.asarray(n_unique),
        dropped=int(dropped),
    )


def solid_per_device(result: DistributedCountResult, abundance_min: int,
                     abundance_max: int):
    """Host-side: per-device solid (kmer, count) shards after solidity."""
    n_dev = result.n_unique.shape[0]
    uniq = np.asarray(result.unique)
    cnts = np.asarray(result.counts)
    per = uniq.shape[1] // n_dev
    parts_k, parts_c = [], []
    for d in range(n_dev):
        n = int(result.n_unique[d])
        u = uniq[:, d * per : d * per + n]
        c = cnts[d * per : d * per + n]
        keep = (c >= abundance_min) & (c <= abundance_max)
        parts_k.append(u[:, keep])
        parts_c.append(c[keep])
    return parts_k, parts_c


def gather_solid(result: DistributedCountResult, abundance_min: int,
                 abundance_max: int):
    """Host-side: gather per-device solid sets into one global sorted array.

    K-mer spaces are disjoint across devices; the global solid set is the
    concatenation, re-sorted for the downstream junction stage.
    """
    parts_k, parts_c = solid_per_device(result, abundance_min, abundance_max)
    uniq = np.asarray(result.unique)
    solid = (np.concatenate(parts_k, axis=1) if parts_k
             else np.zeros((uniq.shape[0], 0), np.uint32))
    counts = np.concatenate(parts_c) if parts_c else np.zeros((0,), np.int32)
    # global sort (lexicographic over lanes, most-significant first)
    order = np.lexsort(tuple(solid[j] for j in range(solid.shape[0] - 1, -1, -1)))
    return solid[:, order], counts[order]


def pack_global_blocks(seqs: Iterable[str], k: int, n_dev: int,
                       block_reads: int = 1024, max_len: int = 512):
    """Pack all reads into one global (B, W) array with B % n_dev == 0."""
    from bcalm_tpu.io import packing

    blocks = list(packing.iter_blocks(seqs, k, block_reads=block_reads,
                                      max_len=max_len))
    if not blocks:
        W = max(1, (max(max_len, k, 16) + 15) // 16)
        return (np.zeros((n_dev, W), np.uint32), np.zeros((n_dev,), np.int32))
    words = np.concatenate([b.words for b in blocks])
    lengths = np.concatenate([b.lengths for b in blocks])
    B = words.shape[0]
    pad = (-B) % n_dev
    if pad:
        words = np.concatenate([words, np.zeros((pad, words.shape[1]), np.uint32)])
        lengths = np.concatenate([lengths, np.zeros((pad,), np.int32)])
    return words, lengths


def distributed_build(seqs, cfg, mesh: Mesh):
    """Host-driven multi-chip build: sharded counting + gathered compaction.

    Produces the same UnitigSet as engine.build_from_seqs (validated by
    tests/test_parallel.py).
    """
    from bcalm_tpu import engine as eng

    n_dev = mesh.devices.size
    words, lengths = pack_global_blocks(
        seqs, cfg.k, n_dev, block_reads=cfg.block_reads, max_len=cfg.max_len
    )
    B, W = words.shape
    n_loc = (B // n_dev) * W * 16
    cap = max(64, (2 * n_loc) // n_dev)
    res = distributed_count(mesh, jnp.asarray(words), jnp.asarray(lengths),
                            cfg.k, cap)
    if res.dropped:
        raise RuntimeError(
            f"bucket overflow: {res.dropped} k-mers dropped; "
            f"raise cap_per_dest (got {cap})"
        )
    per_s, per_c = solid_per_device(res, cfg.abundance_min, cfg.abundance_max)
    n_solid = int(sum(s.shape[1] for s in per_s))
    if n_solid == 0:
        return eng.UnitigSet(
            k=cfg.k, seqs=[], kc=np.zeros(0, np.int64), abundances=[],
            circular=np.zeros(0, bool), links=[],
            stats={"solid_kmers": 0},
        )
    from bcalm_tpu.parallel import distcompact

    us = distcompact.distributed_compact(mesh, per_s, per_c, cfg.k)
    us.stats["unitigs"] = len(us.seqs)
    return us
