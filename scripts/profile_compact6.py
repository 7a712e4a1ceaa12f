"""True per-op costs: N chained reps inside one jit + scalar fetch.

The axon tunnel's block_until_ready admits work asynchronously until the
queue saturates, so single-op timings lie.  Chained in-jit repetition with
a final fetched reduction forces real sequential execution.
"""
import time

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp

from bcalm_tpu.ops import chains as chains_op


def bench(name, make_fn, reps_list=(2, 22)):
    ts = {}
    for reps in reps_list:
        fn = jax.jit(make_fn(reps))
        out = fn()          # compile + run
        float(out)          # fetch
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(out)      # forces completion
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    r0, r1 = reps_list
    per = (ts[r1] - ts[r0]) / (r1 - r0)
    print(f"{name}: {per*1e3:.3f}ms/op  (fixed overhead "
          f"{(ts[r0]-per*r0)*1e3:.2f}ms)", flush=True)
    return per


M = 2 ** 21
rng = np.random.RandomState(0)
idx_np = rng.randint(0, M, size=M).astype(np.int32)
rows4_np = rng.randint(0, 2 ** 31, size=(M, 4)).astype(np.int32)

rows4 = jnp.asarray(rows4_np)
idx = jnp.asarray(idx_np)
flat = jnp.asarray(rows4_np[:, 0])


def mk_gather_rows4(reps):
    def f():
        def body(c, _):
            nxt = jnp.take(rows4, (c[:, 0] ^ c[:, 1]) % M, axis=0)
            return nxt, ()
        out, _ = jax.lax.scan(body, rows4, None, length=reps)
        return jnp.sum(out[:, 0])
    return f


def mk_gather_flat(reps):
    def f():
        def body(c, _):
            return jnp.take(flat, (c ^ idx) % M), ()
        out, _ = jax.lax.scan(body, idx, None, length=reps)
        return jnp.sum(out)
    return f


def mk_gather_sorted(reps):
    sidx = jnp.sort(idx)
    def f():
        def body(c, _):
            return jnp.take(flat, (c + sidx) % M) , ()
        # (c + sorted) stays near-sorted modulo wrap
        out, _ = jax.lax.scan(body, jnp.zeros_like(idx), None, length=reps)
        return jnp.sum(out)
    return f


def mk_scatter(reps):
    def f():
        def body(c, _):
            return c.at[(c ^ idx) % M].set(c, mode="drop"), ()
        out, _ = jax.lax.scan(body, flat, None, length=reps)
        return jnp.sum(out)
    return f


def mk_round(reps):
    state0 = jnp.asarray(np.stack(
        [idx_np, rng.randint(0, 100, M), rng.randint(0, M, M),
         rng.randint(0, 100, M)], axis=1).astype(np.int32))
    def f():
        def body(c, _):
            anc = jnp.take(c, c[:, 0] % M, axis=0)
            return chains_op.round_update(c, anc), ()
        out, _ = jax.lax.scan(body, state0, None, length=reps)
        return jnp.sum(out[:, 2])
    return f


def mk_sort2(reps, n):
    a = jnp.asarray(rng.randint(0, 2 ** 31, size=(2, n)).astype(np.uint32))
    def f():
        def body(c, _):
            out = jax.lax.sort([c[0] ^ np.uint32(1), c[1]], num_keys=2)
            return jnp.stack(out), ()
        out, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(out[0][:8].astype(jnp.int64))
    return f


bench("gather rows4 2M rand", mk_gather_rows4)
bench("gather flat 2M rand", mk_gather_flat)
bench("gather flat 2M sorted-ish", mk_gather_sorted)
bench("scatter flat 2M rand", mk_scatter)
bench("full doubling round 2M", mk_round)
bench("sort 2-op 2^21", lambda r: mk_sort2(r, 2 ** 21), reps_list=(2, 10))
bench("sort 2-op 2^23", lambda r: mk_sort2(r, 2 ** 23), reps_list=(2, 10))
