import time, sys, numpy as np
t=time.perf_counter
t0=t()
import jax, jax.numpy as jnp
print(f"import jax: {t()-t0:.1f}s", flush=True)
t1=t(); devs=jax.devices(); print(f"devices(): {t()-t1:.1f}s {devs}", flush=True)
s = jnp.zeros((8,), jnp.int32)
t3=t(); _=np.asarray(s); print(f"small fetch: {(t()-t3)*1e3:.1f} ms", flush=True)
x = np.zeros((8*1024*1024,), dtype=np.uint8)
t0=t(); d = jnp.asarray(x); print(f"upload 8MB: {(t()-t0)*1e3:.1f} ms", flush=True)
t1=t(); y = np.asarray(d); print(f"download 8MB: {(t()-t1)*1e3:.1f} ms", flush=True)
