import time, numpy as np, jax, jax.numpy as jnp
from bcalm_tpu.utils.jaxcache import enable_cache
enable_cache()
M = 4*1024*1024
h0 = np.random.randint(0, 2**30, size=M, dtype=np.int32)
base = jax.device_put(h0)
f = jax.jit(lambda x, s: (x * 1103515245 + s) & 0x7fffffff)
for rep in range(3):
    arr = f(base, rep)
    np.asarray(arr[:1])
    t0 = time.time(); h = np.asarray(arr); dt = time.time()-t0
    print(f"D2H 16MB rep{rep}: {dt*1e3:.1f}ms ({16/dt/1e3:.2f} GB/s)", flush=True)
for rep in range(3):
    h0[0] = rep
    t0 = time.time(); d = jax.device_put(h0); np.asarray(d[:1]); dt = time.time()-t0
    print(f"H2D 16MB rep{rep}: {dt*1e3:.1f}ms ({16/dt/1e3:.2f} GB/s)", flush=True)
