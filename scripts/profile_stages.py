"""Stage-level TPU timing: where does a counting+compaction run spend time?

Times each device stage separately (block extract+fold, chunk insert,
chunk sort/count, solidity, junction sort, chain decomposition) with the
same shapes bench.py uses.  Run on the real chip:

    python scripts/profile_stages.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t(fn, *args, n=3, **kw):
    """Timing helper.  NOTE: on the tunneled axon backend
    jax.block_until_ready does not reliably block, so each timed call
    fetches one element of every output buffer to the host instead."""
    import jax

    def force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "shape"):
                np.asarray(jax.device_get(leaf[..., :1]))

    out = fn(*args, **kw)
    force(out)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args, **kw)
        force(out)
        times.append(time.time() - t0)
    return min(times), out


def main():
    import jax
    import jax.numpy as jnp

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from bcalm_tpu import engine
    from bcalm_tpu.ops import count as count_op
    from bench import gen_reads, pack_uniform, make_blocks

    k = 31
    cfg = engine.EngineConfig(k=k, abundance_min=2, block_reads=8192,
                              max_len=150, chunk_kmers=8 * 1024 * 1024)
    reads = gen_reads(1_000_000, 150, 24)
    words = pack_uniform(reads)
    blocks = make_blocks(words, 150, cfg.block_reads)
    print(f"{len(blocks)} blocks", flush=True)

    block = blocks[0]
    w = jnp.asarray(block.words)
    ln_ = jnp.asarray(block.lengths)

    dt, (folded, nv) = t(engine._extract_fold, w, ln_, k)
    F = folded.shape[1]
    print(f"extract_fold: {dt*1e3:.2f} ms/block ({F} slots, "
          f"{F/dt/1e6:.1f}M slots/s)", flush=True)

    # host->device transfer cost
    t0 = time.time()
    for _ in range(5):
        jax.block_until_ready(jnp.asarray(block.words))
    dt_x = (time.time() - t0) / 5
    print(f"h2d transfer: {dt_x*1e3:.2f} ms/block "
          f"({block.words.nbytes/1e6:.1f} MB)", flush=True)

    L = folded.shape[0]
    chunk_cap = max(1, -(-cfg.chunk_kmers // F)) * F
    buf = jnp.full((L, chunk_cap), count_op.SENTINEL, jnp.uint32)
    # non-donating insert for repeated timing (engine._chunk_insert donates
    # its buffer, so re-timing it with the same argument would fail)
    ins = jax.jit(lambda b, p, o: jax.lax.dynamic_update_slice(b, p, (0, o)))
    dt, buf = t(ins, buf, folded, jnp.asarray(0, jnp.int32))
    print(f"chunk_insert: {dt*1e3:.2f} ms ({buf.nbytes/1e6:.0f} MB buffer)",
          flush=True)

    # fill buffer with real data for a representative sort
    fill = 0
    for b in blocks:
        fo, _ = engine._extract_fold(jnp.asarray(b.words),
                                     jnp.asarray(b.lengths), k)
        if fill + F > chunk_cap:
            break
        buf = ins(buf, fo, jnp.asarray(fill, jnp.int32))
        fill += F
    valid = ~jnp.all(buf == count_op.SENTINEL, axis=0)
    jax.block_until_ready(valid)

    dt, out = t(count_op.count_canonical, buf, valid)
    unique, counts, n_unique = out
    print(f"count_canonical: {dt*1e3:.1f} ms for {chunk_cap} slots "
          f"({chunk_cap/dt/1e6:.1f}M slots/s), n_unique={int(n_unique)}",
          flush=True)

    # raw sort alone
    @jax.jit
    def just_sort(lanes):
        return jax.lax.sort([lanes[j] for j in range(lanes.shape[0])],
                            num_keys=lanes.shape[0])

    dt, _ = t(just_sort, buf)
    print(f"lax.sort (2 ops): {dt*1e3:.1f} ms ({chunk_cap/dt/1e6:.1f}M slots/s)",
          flush=True)

    n_u = int(n_unique)
    cap = engine._round_capacity(n_u)
    uu = unique[:, :cap]
    cc = counts[:cap]
    dt, out = t(count_op.filter_abundance, uu, cc, jnp.asarray(n_u),
                2, 2**31 - 1)
    solid, scounts, n_solid = out
    print(f"filter_abundance: {dt*1e3:.1f} ms", flush=True)

    n_s = int(n_solid)
    cap2 = engine._round_capacity(n_s)
    from bcalm_tpu.ops import chains as chains_op
    from bcalm_tpu.ops import junctions as junctions_op

    sd = solid[:, :cap2]
    dt, out = t(junctions_op.successor_arrays, sd, jnp.asarray(n_s), k)
    succ, _ = out
    print(f"junctions: {dt*1e3:.1f} ms for {n_s} solid "
          f"({n_s/dt/1e6:.2f}M/s)", flush=True)

    C = cap2
    oid = np.arange(2 * C, dtype=np.int64)
    vo = jnp.asarray((oid % C) < n_s)
    dt, info = t(chains_op.chain_decompose, succ, vo)
    print(f"chains: {dt*1e3:.1f} ms ({int(info['n_unitigs'])} unitigs, "
          f"{n_s/dt/1e6:.2f}M kmers/s)", flush=True)


if __name__ == "__main__":
    main()
