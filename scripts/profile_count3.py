"""Forced timings of count v3 internals at the production chunk shape."""

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

    def timed(label, fn, n=3):
        v = fn()
        ts = []
        for _ in range(n):
            t0 = time.time()
            v = fn()
            ts.append(time.time() - t0)
        print(f"{label}: {min(ts)*1e3:.1f} ms ({v})", flush=True)

    # build one full 2^24 chunk buffer exactly as count_blocks does
    folded0, _ = engine._extract_fold(jnp.asarray(blocks[0].words),
                                      jnp.asarray(blocks[0].lengths), k)
    F = folded0.shape[1]
    L = folded0.shape[0]
    cap = 1 << 24
    buf = jnp.full((L, cap + F), count_op.SENTINEL, jnp.uint32)
    fill = 0
    for b in blocks:
        fo, _ = engine._extract_fold(jnp.asarray(b.words),
                                     jnp.asarray(b.lengths), k)
        buf = engine._chunk_insert(buf, fo, jnp.asarray(fill, jnp.int32))
        fill += F
        if fill >= cap:
            break
    body = buf[:, :cap]
    valid = ~jnp.all(body == count_op.SENTINEL, axis=0)
    jax.block_until_ready(valid)
    print(f"chunk: fill={fill} cap={cap}", flush=True)

    @jax.jit
    def _count(body, valid):
        u, c, n = count_op.count_canonical(body, valid)
        return n + c[0] + u[0, 0].astype(jnp.int32)

    timed("count_canonical(2^24)", lambda: int(_count(body, valid)))

    from bcalm_tpu.ops import sort_tpu

    @jax.jit
    def _s1(body, valid):
        folded = count_op.fold_sentinel(body, valid)
        out = sort_tpu.sort_ops([folded[0], folded[1]], num_keys=2)
        return out[0][0].astype(jnp.int32)

    timed("  sort1 2keys", lambda: int(_s1(body, valid)))

    @jax.jit
    def _s2(body):
        key2 = body[0]
        ops = [key2, body[0], body[1], body[1]]
        out = sort_tpu.sort_ops(ops, num_keys=1)
        return out[3][0].astype(jnp.int32)

    timed("  sort2 1key+3pay", lambda: int(_s2(body)))

    @jax.jit
    def _cs(body):
        return jnp.cumsum((body[0] & 1).astype(jnp.int32))[-1]

    timed("  cumsum", lambda: int(_cs(body)))

    # full streaming count incl. host loop (the bench's timed section)
    def run():
        unique, counts, n_unique, stats = engine.count_blocks(iter(blocks), cfg)
        n_u = int(n_unique)
        capu = engine._round_capacity(max(1, n_u))
        solid, scounts, n_solid = count_op.filter_abundance(
            unique[:, :capu], counts[:capu], jnp.asarray(n_u, jnp.int32), 2,
            2**31 - 1)
        return int(n_solid)

    timed("count_blocks+filter E2E", run, n=2)


if __name__ == "__main__":
    main()
