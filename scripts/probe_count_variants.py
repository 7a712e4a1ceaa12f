"""Probe: where does headline counting time go, and can the minpos
column ride cheaper?

Variants at chunk scale (2^23 occ, k=31, L=2):
  extract     _extract_fold alone (per block x blocks/chunk)
  nopos       count_canonical with_pos=False (round-1 baseline)
  poskey      count_canonical with_pos=True (current: pos as last sort key)
  pospayload  pos as sort-1 PAYLOAD + log-doubling segmented suffix-min
              (same outputs as poskey)
Plus raw lax.sort operand-cost scaling (keys vs payloads).
"""
import time
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bcalm_tpu.ops import count as count_op       # noqa: E402
from bcalm_tpu.ops import sort_tpu                # noqa: E402

N = 1 << 23
print("devices:", jax.devices(), file=sys.stderr)
rng = np.random.RandomState(0)
# ~1M distinct k-mers appearing ~8x (headline-like dup structure)
distinct = rng.randint(0, 2**62, size=(1 << 20,), dtype=np.uint64)
occ = distinct[rng.randint(0, distinct.size, size=N)]
l0 = (occ >> np.uint64(32)).astype(np.uint32)
l1 = (occ & np.uint64(0xFFFFFFFF)).astype(np.uint32)
lanes = jnp.asarray(np.stack([l0, l1]))
valid = jnp.ones((N,), bool)
pos = jnp.asarray(((np.arange(N, dtype=np.uint32)) << 1)
                  | rng.randint(0, 2, size=N).astype(np.uint32))


def _leaves(r):
    return [x for x in jax.tree_util.tree_leaves(r)
            if hasattr(x, "block_until_ready") and getattr(x, "ndim", 0)]


def timeit(fn, *args, n=3, reps=10):
    """Queue `reps` back-to-back executions, then force a host fetch of
    one element of every output (np.asarray round-trips the tunnel, which
    block_until_ready alone does not reliably do on this backend)."""
    import numpy as _np
    r = fn(*args)
    for x in _leaves(r):
        _np.asarray(x[..., :1])
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        for x in _leaves(outs[-1]):
            _np.asarray(x[..., :1])
        for r2 in outs:
            for x in _leaves(r2):
                _np.asarray(x[..., :1])
        best = min(best, (time.time() - t0) / reps)
    return best


# ---- raw sort operand scaling ----
cols = [jnp.asarray(rng.randint(0, 2**32, size=N, dtype=np.uint64)
                    .astype(np.uint32)) for _ in range(6)]
for nk, npay, label in ((2, 0, "2k+0p"), (3, 0, "3k+0p"), (2, 1, "2k+1p"),
                        (2, 2, "2k+2p"), (2, 4, "2k+4p"), (1, 5, "1k+5p")):
    f = jax.jit(partial(sort_tpu.sort_ops, num_keys=nk))
    t = timeit(f, cols[: nk + npay])
    print(f"sort {label}: {t*1e3:7.1f} ms")


# ---- count variants ----
@jax.jit
def count_nopos(lanes, valid):
    return count_op.count_canonical(lanes, valid)


@jax.jit
def count_poskey(lanes, valid, pos):
    return count_op.count_canonical(lanes, valid, pos=pos, with_pos=True)


@jax.jit
def count_pospayload(lanes, valid, pos):
    """pos rides sort-1 as payload; group-min via segmented suffix-min."""
    L, n = lanes.shape
    folded = count_op.fold_sentinel(lanes, valid)
    out = sort_tpu.sort_ops([folded[j] for j in range(L)] + [pos],
                            num_keys=L)
    s_lanes = jnp.stack(out[:L], axis=0)
    s_pos = out[L]
    s_valid = ~jnp.all(s_lanes == count_op.SENTINEL, axis=0)
    starts = count_op.row_starts(s_lanes, s_valid)
    gid = jnp.cumsum(starts.astype(jnp.int32)) - 1
    # segmented suffix min of s_pos within gid groups (log-doubling)
    m = s_pos
    g = gid
    d = 1
    while d < n:
        m_s = jnp.concatenate([m[d:], jnp.full((d,), count_op.SENTINEL,
                                               jnp.uint32)])
        g_s = jnp.concatenate([g[d:], jnp.full((d,), -1, jnp.int32)])
        m = jnp.where(g_s == g, jnp.minimum(m, m_s), m)
        d *= 2
    w = s_valid.astype(jnp.int32)
    cumw = jnp.cumsum(w)
    excl = (cumw - w).astype(jnp.uint32)
    key2 = jnp.where(starts, gid.astype(jnp.uint32), count_op.SENTINEL)
    ops2 = [key2] + [s_lanes[j] for j in range(L)] + [excl, m]
    out2 = sort_tpu.sort_ops(ops2, num_keys=1)
    n_unique = jnp.sum(starts.astype(jnp.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    valid_g = idx < n_unique
    unique = jnp.where(valid_g[None], jnp.stack(out2[1:L + 1], axis=0), 0)
    ex = out2[L + 1].astype(jnp.int32)
    nxt = jnp.concatenate([ex[1:], jnp.zeros((1,), jnp.int32)])
    total = cumw[n - 1]
    cnt = jnp.where(idx == n_unique - 1, total - ex, nxt - ex)
    counts = jnp.where(valid_g, cnt, 0)
    minpos = jnp.where(valid_g, out2[L + 2], count_op.SENTINEL)
    return unique, counts, n_unique, minpos


# 1-operand sort cost (the head-position compaction sort)
one = cols[0]
f1 = jax.jit(partial(sort_tpu.sort_ops, num_keys=1))
t = timeit(f1, [one])
print(f"sort 1k+0p: {t*1e3:7.1f} ms")


@jax.jit
def count_rowgather(lanes, valid, pos):
    """sort1 (pos as last key) + head-position 1-op sort + ONE packed
    row-gather compaction instead of the 5-operand compaction sort."""
    L, n = lanes.shape
    folded = count_op.fold_sentinel(lanes, valid)
    out = sort_tpu.sort_ops([folded[j] for j in range(L)] + [pos],
                            num_keys=L + 1)
    s_lanes = jnp.stack(out[:L], axis=0)
    s_pos = out[L]
    s_valid = ~jnp.all(s_lanes == count_op.SENTINEL, axis=0)
    starts = count_op.row_starts(s_lanes, s_valid)
    w = s_valid.astype(jnp.int32)
    cumw = jnp.cumsum(w)
    excl = (cumw - w).astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    # compaction: sort head positions (1 operand), then one row-gather
    hsel = jnp.sort(jnp.where(starts, idx.astype(jnp.uint32),
                              count_op.SENTINEL))
    hidx = jnp.minimum(hsel, np.uint32(n - 1)).astype(jnp.int32)
    rows = jnp.stack([s_lanes[j] for j in range(L)] + [excl, s_pos],
                     axis=1)                          # (n, L+2)
    g = jnp.take(rows, hidx, axis=0)                  # ONE row gather
    n_unique = jnp.sum(starts.astype(jnp.int32))
    valid_g = idx < n_unique
    unique = jnp.where(valid_g[None], jnp.transpose(g[:, :L]), 0)
    ex = g[:, L].astype(jnp.int32)
    nxt = jnp.concatenate([ex[1:], jnp.zeros((1,), jnp.int32)])
    total = cumw[n - 1]
    cnt = jnp.where(idx == n_unique - 1, total - ex, nxt - ex)
    counts = jnp.where(valid_g, cnt, 0)
    minpos = jnp.where(valid_g, g[:, L + 1], count_op.SENTINEL)
    return unique, counts, n_unique, minpos


t = timeit(count_nopos, lanes, valid)
print(f"count nopos:      {t*1e3:7.1f} ms  ({N/t/1e6:.1f}M occ/s)")
t = timeit(count_poskey, lanes, valid, pos)
print(f"count poskey:     {t*1e3:7.1f} ms  ({N/t/1e6:.1f}M occ/s)")
t = timeit(count_pospayload, lanes, valid, pos)
print(f"count pospayload: {t*1e3:7.1f} ms  ({N/t/1e6:.1f}M occ/s)")
t = timeit(count_rowgather, lanes, valid, pos)
print(f"count rowgather:  {t*1e3:7.1f} ms  ({N/t/1e6:.1f}M occ/s)")

# equivalence check
ua, ca, na, pa = count_poskey(lanes, valid, pos)
for variant in (count_pospayload, count_rowgather):
    ub, cb, nb, pb = variant(lanes, valid, pos)
    na2, nb2 = int(na), int(nb)
    assert na2 == nb2
    assert np.array_equal(np.asarray(ua)[:, :na2], np.asarray(ub)[:, :nb2])
    assert np.array_equal(np.asarray(ca)[:na2], np.asarray(cb)[:nb2])
    assert np.array_equal(np.asarray(pa)[:na2], np.asarray(pb)[:nb2])
print("all variants == poskey outputs OK")
import sys; sys.exit(0)
ub, cb, nb, pb = count_pospayload(lanes, valid, pos)
na, nb = int(na), int(nb)
assert na == nb
assert np.array_equal(np.asarray(ua)[:, :na], np.asarray(ub)[:, :nb])
assert np.array_equal(np.asarray(ca)[:na], np.asarray(cb)[:nb])
assert np.array_equal(np.asarray(pa)[:na], np.asarray(pb)[:nb])
print("pospayload == poskey outputs OK")

# ---- extract cost ----
from bcalm_tpu import engine  # noqa: E402

B, rl = 8192, 150
words = jnp.asarray(rng.randint(0, 2**32, size=(B, 10), dtype=np.uint64)
                    .astype(np.uint32))
lengths = jnp.full((B,), rl, jnp.int32)
t = timeit(lambda: engine._extract_fold(words, lengths, 31, np.uint32(0)))
F = B * (10 * 16 - 30)
print(f"extract_fold: {t*1e3:7.1f} ms per block ({F} slots) = "
      f"{F/t/1e6:.1f}M slots/s")
