"""Bisect the anomalous costs: drop-scatters, column slices, while_loop."""
import time

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


M = 2 ** 21
rng = np.random.RandomState(0)
idx_in = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
flat = jnp.asarray(rng.randint(0, 2 ** 31, size=(M,)).astype(np.int32))
rows4 = jnp.asarray(rng.randint(0, 2 ** 31, size=(M, 4)).astype(np.int32))

# 1. scatter with many dropped (== M) indices
half_drop = np.where(rng.rand(M) < 0.5, rng.randint(0, M, size=M), M)
idx_drop = jnp.asarray(half_drop.astype(np.int32))
fsc = jax.jit(lambda t, i, v: t.at[i].set(v, mode="drop"))
print(f"scatter 50% dropped: {timeit(fsc, flat, idx_drop, flat)*1e3:.2f}ms")
all_in = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
print(f"scatter all in-range drop-mode: {timeit(fsc, flat, all_in, flat)*1e3:.2f}ms")

# 2. scatter into fresh full() target inside jit (like build_pred)
def bp(succ):
    idx = jnp.arange(M, dtype=jnp.int32)
    pred = jnp.full((M,), -1, dtype=jnp.int32)
    return pred.at[jnp.where(succ >= 0, succ, M)].set(
        jnp.where(succ >= 0, idx, -1), mode="drop")
succ_real = np.arange(1, M + 1).astype(np.int32)  # one long chain
succ_real[M - 1] = -1
succ_d = jnp.asarray(succ_real)
print(f"build_pred-like (chain succ): {timeit(jax.jit(bp), succ_d)*1e3:.2f}ms")
succ_rand = jnp.asarray(rng.permutation(M).astype(np.int32))
print(f"build_pred-like (random succ): {timeit(jax.jit(bp), succ_rand)*1e3:.2f}ms")

# 3. column slice + gather from (M, 4)
fcol = jax.jit(lambda s: jnp.take(s, s[:, 0], axis=0))
print(f"gather rows4 by own col0: {timeit(fcol, rows4)*1e3:.2f}ms")
fcol2 = jax.jit(lambda s, i: (s[:, 0], jnp.take(s, i, axis=0)))
print(f"col slice + gather sep idx: {timeit(fcol2, rows4, idx_in)*1e3:.2f}ms")

# 4. while_loop of 21 fixed rounds, AoS vs SoA
from bcalm_tpu.ops import chains as chains_op

def loop_aos(state):
    def body(c):
        s, t = c
        anc = jnp.take(s, s[:, 0], axis=0)
        return chains_op.round_update(s, anc), t + 1
    return jax.lax.while_loop(lambda c: c[1] < 21, body, (state, 0))[0]

state0 = jnp.asarray(np.stack(
    [np.where(succ_real >= 0, succ_real, np.arange(M)),
     (succ_real >= 0).astype(np.int32),
     np.arange(M), np.zeros(M)], axis=1).astype(np.int32))
print(f"while_loop 21 rounds AoS: {timeit(jax.jit(loop_aos), state0)*1e3:.2f}ms")

def loop_soa(ptr, dist, mn, dmn):
    def body(c):
        ptr, dist, mn, dmn, t = c
        a_ptr = jnp.take(ptr, ptr)
        a_dist = jnp.take(dist, ptr)
        a_mn = jnp.take(mn, ptr)
        a_dmn = jnp.take(dmn, ptr)
        better = a_mn < mn
        return (a_ptr, dist + a_dist, jnp.minimum(mn, a_mn),
                jnp.where(better, dist + a_dmn, dmn), t + 1)
    out = jax.lax.while_loop(lambda c: c[4] < 21, body,
                             (ptr, dist, mn, dmn, 0))
    return out[:4]

p0 = jnp.asarray(np.where(succ_real >= 0, succ_real, np.arange(M)).astype(np.int32))
d0 = jnp.asarray((succ_real >= 0).astype(np.int32))
m0 = jnp.asarray(np.arange(M).astype(np.int32))
dm0 = jnp.zeros((M,), jnp.int32)
print(f"while_loop 21 rounds SoA: {timeit(jax.jit(loop_soa), p0, d0, m0, dm0)*1e3:.2f}ms")

# 5. with convergence check (psum-free, like jump_loop)
def loop_soa_conv(ptr, dist, mn, dmn):
    def cond(c):
        return c[4] & (c[5] < 25)
    def body(c):
        ptr, dist, mn, dmn, _, t = c
        a_ptr = jnp.take(ptr, ptr)
        a_dist = jnp.take(dist, ptr)
        a_mn = jnp.take(mn, ptr)
        a_dmn = jnp.take(dmn, ptr)
        better = a_mn < mn
        n_ptr = a_ptr
        n_dist = dist + a_dist
        n_mn = jnp.minimum(mn, a_mn)
        n_dmn = jnp.where(better, dist + a_dmn, dmn)
        changed = jnp.any(n_ptr != ptr) | jnp.any(n_dist != dist)
        return (n_ptr, n_dist, n_mn, n_dmn, changed, t + 1)
    out = jax.lax.while_loop(cond, body,
                             (ptr, dist, mn, dmn, jnp.asarray(True), 0))
    return out[:4]

print(f"while_loop SoA + conv check: {timeit(jax.jit(loop_soa_conv), p0, d0, m0, dm0)*1e3:.2f}ms")

# 6. finish pieces
valid = jnp.ones((M,), bool)
pred_d = jax.jit(bp)(succ_d)
state_fin = jax.jit(loop_aos)(state0)

def fin_gathers(succ, pred, state):
    ptr = state[:, 0]
    return jnp.take(pred, ptr) >= 0

print(f"finish: pred[ptr]: {timeit(jax.jit(fin_gathers), succ_d, pred_d, state_fin)*1e3:.2f}ms")

def fin_segmax(state, valid):
    rank = state[:, 1]
    start = state[:, 0]
    return jax.ops.segment_max(jnp.where(valid, rank, -1) + 1,
                               jnp.where(valid, start, M - 1),
                               num_segments=M)

print(f"finish: segment_max: {timeit(jax.jit(fin_segmax), state_fin, valid)*1e3:.2f}ms")

from bcalm_tpu.ops.count import compact

def fin_compact(keep):
    idx = jnp.arange(M, dtype=jnp.int32)
    return compact(keep, (idx, idx, keep))

keep = jnp.asarray(rng.rand(M) < 0.001)
print(f"finish: compact: {timeit(jax.jit(fin_compact), keep)*1e3:.2f}ms")
