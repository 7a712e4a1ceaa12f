"""Time jump_loop on the REAL workload data vs synthetic, same shapes."""
import time

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp

from bcalm_tpu import engine
from bcalm_tpu.ops import chains as chains_op
from bcalm_tpu.ops import junctions as junctions_op
from bcalm_tpu.io import packing


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


rng = np.random.RandomState(0)
n_target = 2 ** 20 - 40000  # keep cap at 2^20, M = 2^21
g = rng.randint(0, 4, size=n_target + 31)
genome = "".join("ACTG"[c] for c in g)
reads = [genome[i:i + 150] for i in range(0, len(genome) - 149, 120)]
reads.append(genome[-150:])
cfg = engine.EngineConfig(k=31, abundance_min=1, block_reads=8192,
                          max_len=150)
blocks = packing.iter_blocks(reads, 31, block_reads=8192, max_len=150)
solid_np, counts_np, histo, stats = engine.count_and_filter(blocks, cfg)
ns = solid_np.shape[1]
cap = engine._round_capacity(ns)
M = 2 * cap
print(f"n_solid={ns} cap={cap} M={M}")
L = solid_np.shape[0]
solid = jnp.asarray(np.concatenate(
    [solid_np, np.zeros((L, cap - ns), np.uint32)], axis=1))

sa = jax.jit(junctions_op.successor_arrays, static_argnames=("k",))
t, (succ, _) = timeit(sa, solid, jnp.asarray(ns, jnp.int32), 31)
print(f"successor_arrays: {t*1e3:.2f}ms")
oid = np.arange(M)
valid = jnp.asarray((oid % cap) < ns)
bp = jax.jit(chains_op.build_pred)
t, pred = timeit(bp, succ, valid)
print(f"build_pred: {t*1e3:.2f}ms")

# library loop
jl = jax.jit(chains_op.jump_loop)
t, state = timeit(jl, pred, valid)
print(f"jump_loop (real pred): {t*1e3:.2f}ms")

# fixed-round loop on the same real pred
def loop_fixed(pred, valid, rounds):
    idx = jnp.arange(M, dtype=jnp.int32)
    s = chains_op.init_state(pred, valid, idx, M)
    def body(c):
        s, t = c
        anc = jnp.take(s, s[:, 0], axis=0)
        return chains_op.round_update(s, anc), t + 1
    return jax.lax.while_loop(lambda c: c[1] < rounds, body, (s, 0))[0]

for rounds in (1, 5, 22):
    f = jax.jit(lambda p, v, r=rounds: loop_fixed(p, v, r))
    t, _ = timeit(f, pred, valid)
    print(f"fixed {rounds} rounds (real pred): {t*1e3:.2f}ms")

# same loop on a random-permutation pred (all valid)
perm = rng.permutation(M).astype(np.int32)
pred_rand = jnp.asarray(perm)
valid_all = jnp.ones((M,), bool)
for rounds in (1, 22):
    f = jax.jit(lambda p, v, r=rounds: loop_fixed(p, v, r))
    t, _ = timeit(f, pred_rand, valid_all)
    print(f"fixed {rounds} rounds (random perm): {t*1e3:.2f}ms")

# raw random gather at this M for calibration
state_r = jnp.asarray(rng.randint(0, 2**31, size=(M, 4)).astype(np.int32))
idxr = jnp.asarray(rng.randint(0, M, size=M).astype(np.int32))
f4 = jax.jit(lambda t_, i: jnp.take(t_, i, axis=0))
t, _ = timeit(f4, state_r, idxr)
print(f"raw gather rows4 (M={M}): {t*1e3:.2f}ms")

# convergence round count of the library loop
def count_rounds(pred, valid):
    idx = jnp.arange(M, dtype=jnp.int32)
    s = chains_op.init_state(pred, valid, idx, M)
    R = chains_op._max_rounds(M)
    def cond(c):
        return c[1] & (c[2] < R)
    def body(c):
        s, _, t = c
        anc = jnp.take(s, s[:, 0], axis=0)
        new = chains_op.round_update(s, anc)
        return new, jnp.any(new != s), t + 1
    out = jax.lax.while_loop(cond, body, (s, jnp.asarray(True), 0))
    return out[2]

print(f"rounds taken: {int(jax.jit(count_rounds)(pred, valid))} "
      f"(cap {chains_op._max_rounds(M)})")
