import time, os, sys
import numpy as np, jax, jax.numpy as jnp
from bcalm_tpu.utils.jaxcache import enable_cache
enable_cache()
from bcalm_tpu.ops import chains

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))

def timeit(f, *args, reps=3):
    out = f(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = f(*args); _sync(out); ts.append(time.time()-t0)
    return min(ts), out

# giant chain mirror graph, N=2.1M (M=4.2M) like the bench
N = 2_000_000
M = 2 * N
# chain 0->1->...->N-1 on + strand; mirror on - strand
succ = np.full(M, -1, np.int32)
succ[:N-1] = np.arange(1, N, dtype=np.int32)
succ[N+1:] = np.arange(N, M-1, dtype=np.int32)  # mirror: v+N+1 -> v+N? build properly:
succ[N+1:2*N] = np.arange(N, 2*N-1, dtype=np.int32)
valid = np.ones(M, bool)
succ_j = jnp.asarray(succ); valid_j = jnp.asarray(valid)

pred_f = jax.jit(chains.build_pred)
dt, pred = timeit(pred_f, succ_j, valid_j)
print(f"build_pred: {dt*1e3:.0f}ms", flush=True)

plain_f = jax.jit(chains.plain_jumpF)
dt, _ = timeit(plain_f, pred, valid_j)
print(f"plain_jumpF: {dt*1e3:.0f}ms", flush=True)

hier_f = jax.jit(chains.hier_jump)
dt, (st, ok) = timeit(hier_f, pred, valid_j)
print(f"hier_jump: {dt*1e3:.0f}ms ok={bool(ok)}", flush=True)

old_f = jax.jit(chains.jump_loop)
dt, _ = timeit(old_f, pred, valid_j)
print(f"old jump_loop: {dt*1e3:.0f}ms", flush=True)

ff = jax.jit(chains.finish_fast)
dt, _ = timeit(ff, succ_j, pred, valid_j, st)
print(f"finish_fast: {dt*1e3:.0f}ms", flush=True)
