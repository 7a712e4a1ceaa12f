"""Profile compaction stages on the real chip: junctions vs chain loop.

Synthetic solid set from a random genome at 1M+ scale; times
successor_arrays and chain_decompose separately to find where the 2.6M/s
glued figure goes (VERDICT round-1 next-step 4)."""

import os
import sys
import time

import numpy as np

plat = os.environ.get("BENCH_PLATFORM")
if plat:
    import jax
    jax.config.update("jax_platforms", plat)

import jax
import jax.numpy as jnp

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

from bcalm_tpu import engine
from bcalm_tpu.ops import chains as chains_op
from bcalm_tpu.ops import count as count_op
from bcalm_tpu.ops import junctions as junctions_op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    k = int(os.environ.get("PROF_K", 31))
    genome_len = int(os.environ.get("PROF_GENOME", 2_000_000))
    log(f"devices={jax.devices()}")

    # solid set = all distinct canonical k-mers of one random genome
    rng = np.random.RandomState(0)
    genome = rng.randint(0, 4, size=genome_len).astype(np.uint8)
    reads = [genome[i:i + 10000] for i in range(0, genome_len - 10000, 9969)]
    from bcalm_tpu.io import packing

    def seqs():
        for r in reads:
            yield "".join("ACTG"[c] for c in r)

    blocks = packing.iter_blocks(seqs(), k, block_reads=64, max_len=10000)
    cfg = engine.EngineConfig(k=k, abundance_min=1, block_reads=64,
                              max_len=10000)
    t0 = time.time()
    unique, counts, n_unique, stats = engine.count_blocks(blocks, cfg)
    n_u = int(n_unique)
    log(f"count: {time.time()-t0:.1f}s, {n_u} distinct")
    cap = engine._round_capacity(n_u)
    solid = unique[:, :cap]
    scounts = counts[:cap]
    n_solid = n_u

    # stage 1: junctions
    f_j = jax.jit(lambda s, n: junctions_op.successor_arrays(s, n, k)[0],
                  static_argnums=())
    n_d = jnp.asarray(n_solid, jnp.int32)
    succ = f_j(solid, n_d)
    succ.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        succ = f_j(solid, n_d)
        succ.block_until_ready()
        times.append(time.time() - t0)
    t_j = min(times)
    log(f"junctions: {t_j*1e3:.1f}ms ({n_solid/t_j/1e6:.1f}M kmers/s)")

    # stage 2: chains
    C = solid.shape[1]
    oid = np.arange(2 * C, dtype=np.int64)
    valid = jnp.asarray((oid % C) < n_solid)
    info = chains_op.chain_decompose(succ, valid)
    info["n_unitigs"].block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        info = chains_op.chain_decompose(succ, valid)
        info["n_unitigs"].block_until_ready()
        times.append(time.time() - t0)
    t_c = min(times)
    nu = int(info["n_unitigs"])
    log(f"chains: {t_c*1e3:.1f}ms ({n_solid/t_c/1e6:.1f}M kmers/s), "
        f"{nu} unitigs")

    # breakdown of the chain loop: pred build / jump loop / finish
    pred = jax.jit(chains_op.build_pred)(succ, valid)
    pred.block_until_ready()
    t0 = time.time()
    pred = jax.jit(chains_op.build_pred)(succ, valid)
    pred.block_until_ready()
    log(f"  build_pred: {(time.time()-t0)*1e3:.1f}ms")

    jl = jax.jit(chains_op.jump_loop)
    st = jl(pred, valid)
    st.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        st = jl(pred, valid)
        st.block_until_ready()
        times.append(time.time() - t0)
    log(f"  jump_loop: {min(times)*1e3:.1f}ms "
        f"(M={2*C}, rounds<={chains_op._max_rounds(2*C)})")

    fin = jax.jit(chains_op.finish)
    out = fin(succ, pred, valid, st)
    out["n_unitigs"].block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fin(succ, pred, valid, st)
        out["n_unitigs"].block_until_ready()
        times.append(time.time() - t0)
    log(f"  finish: {min(times)*1e3:.1f}ms")

    log(f"total compact: {(t_j+t_c)*1e3:.1f}ms "
        f"({n_solid/(t_j+t_c)/1e6:.2f}M glued/s)")


if __name__ == "__main__":
    main()
