import time, sys, numpy as np
t=time.perf_counter
from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.engine import M_TRIM, _host_fetch

cfg = PipelineConfig(penalties=Penalties(4,6,2), options=Options(global_alignment=True),
                     adaptive=AdaptiveReductionOption(10,50,1), batch_size=2048)
pipe = AlignmentPipeline(cfg)
pairs = generate_pairs(2048, 1000, 0.05, seed=7)
k_win, s_cap, w_win, b_cap, engine, serial = pipe._tier_caps(1000, 1000, 0)
print(f"tier0: k_win={k_win} s_cap={s_cap} engine={engine}", flush=True)
eng = pipe._engine(k_win, s_cap, w_win, engine)
# warm
h = eng.submit_batch(pairs); r = eng.finish_batch(h)
assert all(x is not None for x in r)
# profile one batch
t0=t(); h = eng.submit_batch(pairs); t1=t()
pairs_, dev, spec = h
for k, a in dev.items():
    print(f"  out[{k}]: {a.shape} {a.dtype} = {np.prod(a.shape)*a.dtype.itemsize/1e3:.1f} KB")
if spec is not None:
    print(f"  spec prefetch: {spec.shape} {spec.dtype} = {np.prod(spec.shape)*spec.dtype.itemsize/1e3:.1f} KB")
h2 = eng.finish_small(h); t2=t()
pairs_, dev, out, big, spec, trim = h2
ntok = out["meta"][:, M_TRIM].astype(np.int64)
print(f"  ntok per pair: mean={ntok.mean():.0f} max={ntok.max()} min={ntok.min()} sum={ntok.sum()}")
res = eng.finish_tokens(h2); t3=t()
print(f"submit={1e3*(t1-t0):.1f}ms small_fetch={1e3*(t2-t1):.1f}ms tokens+decode={1e3*(t3-t2):.1f}ms", flush=True)
# raw download bandwidth probe
import jax.numpy as jnp
d = jnp.zeros((4*1024*1024,), jnp.uint8); np.asarray(d)
t4=t(); np.asarray(d); t5=t()
print(f"download 4MB: {1e3*(t5-t4):.1f} ms -> {4/ (t5-t4):.1f} MB/s")
