import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from bcalm_tpu.utils.jaxcache import enable_cache
enable_cache()
from bcalm_tpu.ops import chains as C

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))

def timeit(f, *args, reps=3):
    out = f(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = f(*args); _sync(out); ts.append(time.time()-t0)
    return min(ts), out

N = 2_000_000
M = 2 * N
succ = np.full(M, -1, np.int32)
succ[:N-1] = np.arange(1, N, dtype=np.int32)
succ[N+1:2*N] = np.arange(N, 2*N-1, dtype=np.int32)
valid = jnp.asarray(np.ones(M, bool))
pred = C.build_pred(jnp.asarray(succ), valid)

idx = jnp.arange(M, dtype=jnp.int32)
Q0 = jax.jit(C._init_Q)(pred, valid)
fix = jax.jit(lambda g, v: C._sampled(g, 0x85EBCA6B) & v)(idx, valid)

ph = jax.jit(partial(C._phase, rounds=C._R_A))
dt, Qp = timeit(ph, Q0, fix, idx)
print(f"_phase level0 (R_A={C._R_A}): {dt*1e3:.0f}ms", flush=True)

# fixed-round comparison: 7 rounds of the OLD loop body at full M
def old7(state):
    def body(i, s):
        anc = jnp.take(s, s[:, 0], axis=0)
        return C.round_update(s, anc)
    return jax.lax.fori_loop(0, 7, body, state)
st0 = jax.jit(C.init_state)(pred, valid, idx, M)
dt, _ = timeit(jax.jit(old7), st0)
print(f"old-style 7 rounds: {dt*1e3:.0f}ms", flush=True)

# contraction-only step (everything after phase, one level)
def contract(Q, fixm, gid, lvl_valid, S, S1):
    flg = Q[:, C._DSF]
    settled = (flg & C._F_SETTLED) != 0
    rooted = (flg & C._F_ROOTED) != 0
    unres = lvl_valid & ~settled & ~rooted
    tmask = jnp.zeros((S,), bool).at[jnp.where(unres, Q[:, C._PTR], S)].set(True, mode="drop")
    cmask = (fixm | tmask) & lvl_valid
    did = jnp.cumsum(cmask.astype(jnp.int32)) - 1
    n_c = jnp.sum(cmask.astype(jnp.int32))
    did = jnp.where(cmask, did, S1)
    rows = jnp.concatenate([Q, gid[:, None]], axis=1)
    base = jnp.concatenate([C._absorbing_filler(S1, M), jnp.full((S1, 1), M, jnp.int32)], axis=1)
    built = base.at[did].set(rows, mode="drop")
    return built, did, n_c
dt, _ = timeit(jax.jit(partial(contract, S=M, S1=M//4)), Qp, fix, idx, valid)
print(f"contract level0: {dt*1e3:.0f}ms", flush=True)

hier_f = jax.jit(C.hier_jump)
dt, (st, ok) = timeit(hier_f, pred, valid)
print(f"hier total: {dt*1e3:.0f}ms ok={bool(ok)}", flush=True)
