"""Isolate count_canonical internals on the TPU (forced timings)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from bcalm_tpu.ops import count as count_op

    N = 17039360
    rng = np.random.RandomState(0)
    lanes = jnp.asarray(
        np.stack([
            rng.randint(0, 2**31, size=N).astype(np.uint32),
            rng.randint(0, 2**32, size=N, dtype=np.uint64).astype(np.uint32),
        ])
    )
    valid = jnp.asarray(np.ones(N, bool))

    def timed(label, fn, n=3):
        v = fn()
        times = []
        for _ in range(n):
            t0 = time.time()
            v = fn()
            times.append(time.time() - t0)
        print(f"{label}: {min(times)*1e3:.1f} ms (forced={v})", flush=True)

    @jax.jit
    def _count(lanes, valid):
        u, c, n = count_op.count_canonical(lanes, valid)
        return n + c[0] + u[0, 0].astype(jnp.int32)

    timed("count_canonical(17M)", lambda: int(_count(lanes, valid)))

    # sorted-scatter alone: monotone destinations
    dest = jnp.asarray(np.sort(rng.randint(0, N, size=N)).astype(np.int32))
    vals = lanes[0]

    @jax.jit
    def _sscatter(vals, dest):
        out = jnp.zeros((N,), jnp.uint32).at[dest].set(
            vals, mode="drop", indices_are_sorted=True)
        return out[0].astype(jnp.int32)

    timed("sorted scatter set(17M)", lambda: int(_sscatter(vals, dest)))

    @jax.jit
    def _uscatter(vals, dest):
        out = jnp.zeros((N,), jnp.uint32).at[dest].set(vals, mode="drop")
        return out[0].astype(jnp.int32)

    timed("unsorted-flag scatter set(17M)", lambda: int(_uscatter(vals, dest)))

    @jax.jit
    def _smax(vals, dest):
        out = jnp.zeros((N,), jnp.uint32).at[dest].max(
            vals, mode="drop", indices_are_sorted=True)
        return out[0].astype(jnp.int32)

    timed("sorted scatter max(17M)", lambda: int(_smax(vals, dest)))

    @jax.jit
    def _cumsum(v):
        return jnp.cumsum(v.astype(jnp.int32))[-1]

    timed("cumsum(17M)", lambda: int(_cumsum(vals)))

    @jax.jit
    def _sort2(lanes):
        out = jax.lax.sort([lanes[0], lanes[1]], num_keys=2)
        return out[0][0].astype(jnp.int32)

    timed("lax.sort 2 keys(17M)", lambda: int(_sort2(lanes)))


if __name__ == "__main__":
    main()
