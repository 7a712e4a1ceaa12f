"""lax.sort scaling on this chip: N x n_ops, is 16M super-linear?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bcalm_tpu.utils.jaxcache import enable_cache

enable_cache()

rng = np.random.RandomState(0)


def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


for logn in (22, 23, 24):
    N = 1 << logn
    arrs = [jnp.asarray(rng.randint(0, 2**31, size=N, dtype=np.int64)
                        .astype(np.uint32)) for _ in range(5)]

    for n_ops, n_keys in ((3, 3), (5, 1), (6, 1)):
        @jax.jit
        def srt(*ops, nk=n_keys):
            out = jax.lax.sort(list(ops), num_keys=nk)
            return out[0]

        ops = arrs[:n_ops]
        t = timeit(lambda: np.asarray(srt(*ops)[:1]))
        print(f"N=2^{logn} ops={n_ops} keys={n_keys}: {t*1e3:.1f}ms "
              f"({N/t/1e6:.0f}M elem/s)", file=sys.stderr)
