"""Microbenchmark: lax.sort / gather / scatter rates on the real chip.

Grounds the counting-pipeline design choices: chunk size (bitonic sort is
super-linear, so smaller chunks + weighted merges can beat one big sort),
sort operand width (keys vs payloads both pay data movement), and the
gather/scatter index rates that rule out occurrence-scale scatters.

NOTE: on the tunneled axon backend `jax.block_until_ready` does not
reliably block, so each timed call fetches one element of every output
buffer to the host — a buffer's first byte is only available once the
whole computation wrote it.

    python scripts/profile_sort.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t(fn, *args, n=5):
    import jax

    def force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(jax.device_get(leaf[..., :1]))

    force(fn(*args))  # warm / compile
    times = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from bcalm_tpu.utils.jaxcache import enable_cache

    enable_cache()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    for logn in (22, 23, 24, 25):
        N = 1 << logn
        arrs = [jnp.asarray(rng.randint(0, 2**32, N, np.uint64).astype(np.uint32))
                for _ in range(5)]

        for ops, keys in ((2, 2), (3, 2), (4, 1), (2, 1)):
            f = jax.jit(lambda *xs, nk=keys: jax.lax.sort(list(xs), num_keys=nk))
            dt = t(f, *arrs[:ops])
            print(f"sort 2^{logn} ops={ops} keys={keys}: {dt*1e3:7.1f} ms "
                  f"({N/dt/1e6:7.1f}M/s)", flush=True)

        # row gather (M,4) like chains, and 1-D gather
        M = N
        state = jnp.asarray(rng.randint(0, M, (M, 4)).astype(np.int32))
        idx = jnp.asarray(rng.randint(0, M, M).astype(np.int32))
        g_row = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        dt = t(g_row, state, idx)
        print(f"row-gather(4) 2^{logn}: {dt*1e3:7.1f} ms ({M/dt/1e6:7.1f}M idx/s)",
              flush=True)
        g1 = jax.jit(lambda s, i: jnp.take(s, i))
        dt = t(g1, arrs[0], idx)
        print(f"1d-gather     2^{logn}: {dt*1e3:7.1f} ms ({M/dt/1e6:7.1f}M idx/s)",
              flush=True)
        sc = jax.jit(lambda v, i: jnp.zeros((M,), jnp.uint32).at[i].set(
            v, mode="drop"))
        dt = t(sc, arrs[0], idx)
        print(f"1d-scatter    2^{logn}: {dt*1e3:7.1f} ms ({M/dt/1e6:7.1f}M idx/s)",
              flush=True)


if __name__ == "__main__":
    main()
