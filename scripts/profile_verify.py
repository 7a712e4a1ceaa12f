"""Verify device timings with forced scalar materialization (tunnel-safe)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
                              max_len=150, chunk_kmers=16 * 1024 * 1024)
    reads = gen_reads(1_000_000, 150, 24)
    words = pack_uniform(reads)
    blocks = make_blocks(words, 150, cfg.block_reads)

    # build a filled chunk buffer
    folded0, _ = engine._extract_fold(jnp.asarray(blocks[0].words),
                                      jnp.asarray(blocks[0].lengths), k)
    F = folded0.shape[1]
    L = folded0.shape[0]
    chunk_cap = max(1, -(-cfg.chunk_kmers // F)) * F
    buf = jnp.full((L, chunk_cap), count_op.SENTINEL, jnp.uint32)
    fill = 0
    for b in blocks:
        if fill + F > chunk_cap:
            break
        fo, _ = engine._extract_fold(jnp.asarray(b.words),
                                     jnp.asarray(b.lengths), k)
        buf = engine._chunk_insert(buf, fo, jnp.asarray(fill, jnp.int32))
        fill += F
    valid = ~jnp.all(buf == count_op.SENTINEL, axis=0)
    _ = int(jnp.sum(valid.astype(jnp.int32)))  # drain the queue
    print(f"chunk filled: {fill} slots of {chunk_cap}", flush=True)

    def timed(label, fn, n=3):
        # warmup + drain
        out = fn()
        del out
        times = []
        for _ in range(n):
            t0 = time.time()
            v = fn()          # fn must return a python scalar (forced fetch)
            times.append(time.time() - t0)
        print(f"{label}: {min(times)*1e3:.1f} ms (forced={v})", flush=True)

    @jax.jit
    def _count(buf, valid):
        unique, counts, n_unique = count_op.count_canonical(buf, valid)
        return n_unique + counts[0] + unique[0, 0].astype(jnp.int32)

    timed("count_canonical(17M) forced", lambda: int(_count(buf, valid)))

    @jax.jit
    def _sortonly(buf):
        out = jax.lax.sort([buf[0], buf[1]], num_keys=2)
        return out[0][0].astype(jnp.int32) + out[1][-1].astype(jnp.int32)

    timed("lax.sort 2ops(17M) forced", lambda: int(_sortonly(buf)))

    @jax.jit
    def _sort3(buf):
        pay = jnp.arange(buf.shape[1], dtype=jnp.uint32)
        out = jax.lax.sort([buf[0], buf[1], pay], num_keys=2)
        return out[2][0].astype(jnp.int32)

    timed("lax.sort 2keys+1payload(17M) forced", lambda: int(_sort3(buf)))

    # gather cost
    rng = np.random.RandomState(0)
    idxs = jnp.asarray(rng.randint(0, 2_000_000, size=2_000_000).astype(np.int32))
    tbl = jnp.asarray(rng.randint(0, 2**31, size=2_000_000).astype(np.int32))

    @jax.jit
    def _gather(tbl, idxs):
        x = tbl
        for _ in range(10):
            x = x[idxs]
        return x[0]

    timed("10x gather 2M forced", lambda: int(_gather(tbl, idxs)))

    # scatter cost
    @jax.jit
    def _scatter(tbl, idxs):
        out = jnp.zeros_like(tbl)
        out = out.at[idxs].set(tbl)
        return out[0]

    timed("1x scatter 2M forced", lambda: int(_scatter(tbl, idxs)))

    # D2H of the distinct run
    unique, counts, n_unique = count_op.count_canonical(buf, valid)
    n_u = int(n_unique)
    cap = engine._round_capacity(n_u)
    uu = jax.block_until_ready(unique[:, :cap])
    t0 = time.time()
    _ = np.asarray(uu)
    print(f"D2H {uu.nbytes/1e6:.1f} MB: {(time.time()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
