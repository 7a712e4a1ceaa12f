"""Does Mosaic lower a dynamic VMEM gather, and how fast is it?"""
import time
import sys

import numpy as np

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(tag, fn, *args, reps_inner=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        v = np.asarray(out).ravel()[0]  # force fetch
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.2f}ms", flush=True)
    return best


N = 2 ** 20
rng = np.random.RandomState(0)
tbl_np = rng.randint(0, 2 ** 31, size=(N,)).astype(np.int32)
idx_np = rng.randint(0, N, size=(N,)).astype(np.int32)
tbl = jnp.asarray(tbl_np)
idx = jnp.asarray(idx_np)


# --- 1. single gather kernel: out = tbl[idx] ---
def gather_kernel(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)


@jax.jit
def pallas_gather(tbl, idx):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)


try:
    out = pallas_gather(tbl, idx)
    ok = np.array_equal(np.asarray(out), tbl_np[idx_np])
    print("pallas flat gather compiles, correct:", ok, flush=True)
    timed("pallas flat gather 1M", pallas_gather, tbl, idx)
except Exception as e:
    print("pallas flat gather FAILED:", repr(e)[:500], flush=True)

# --- 2. chained gathers inside one kernel (the doubling-loop shape) ---
R = 20


def chain_kernel(ptr_ref, out_ref):
    def body(t, p):
        return jnp.take(p, p, axis=0)
    out_ref[:] = jax.lax.fori_loop(0, R, body, ptr_ref[:])


@jax.jit
def pallas_chain(ptr):
    return pl.pallas_call(
        chain_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ptr)


try:
    p0 = jnp.asarray(idx_np)
    out = pallas_chain(p0)
    # oracle
    p = idx_np.copy()
    for _ in range(R):
        p = p[p]
    ok = np.array_equal(np.asarray(out), p)
    print("pallas chained gather compiles, correct:", ok, flush=True)
    t = timed(f"pallas {R} chained gathers 1M", pallas_chain, p0)
    print(f"  -> {t/R*1e3:.3f}ms/gather = {N*R/t/1e6:.0f}M idx/s", flush=True)
except Exception as e:
    print("pallas chained gather FAILED:", repr(e)[:500], flush=True)

# --- 3. XLA reference at same size ---
def xla_chain(p):
    def body(t, p):
        return jnp.take(p, p, axis=0)
    return jax.lax.fori_loop(0, R, body, p)

t = timed(f"XLA {R} chained gathers 1M", jax.jit(xla_chain), jnp.asarray(idx_np))
print(f"  -> {t/R*1e3:.3f}ms/gather", flush=True)
