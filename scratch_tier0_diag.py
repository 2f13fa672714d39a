"""Diagnose l=50k tier-0 (auto:kw256) escapes on hardware: how many pairs
overflow at tier 0 and why (score cap vs rebased-aux window outrun)."""
import time, sys, numpy as np
t=time.perf_counter
from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.engine import M_TRIM, META_COLS

cfg = PipelineConfig(penalties=Penalties(4,6,2), options=Options(global_alignment=True),
                     adaptive=AdaptiveReductionOption(10,50,1), batch_size=2048)
pipe = AlignmentPipeline(cfg)
pairs = generate_pairs(64, 50000, 0.05, seed=11)
k_win, s_cap, w_win, b_cap, engine, serial = pipe._tier_caps(50000, 50000, 0)
print(f"tier0: k_win={k_win} s_cap={s_cap} engine={engine} b_cap={b_cap}", flush=True)
eng = pipe._engine(k_win, s_cap, w_win, engine)
t0=t(); h = eng.submit_batch(pairs); h2 = eng.finish_small(h); t1=t()
pairs_, dev, out, big, spec, trim = h2
meta = out["meta"]
cols = {name: meta[:, i] for i, name in enumerate(META_COLS)}
ov = np.asarray(cols["overflow"]).astype(bool)
sc = np.asarray(cols["score"])
print(f"tier0 pass: {t1-t0:.1f}s  overflows={ov.sum()}/64  scores: done max={sc[~ov].max() if (~ov).any() else -1}", flush=True)
print(f"overflow scores at stop: {sc[ov][:20]}", flush=True)
res = eng.finish_tokens(h2, fallback=False)
ok = sum(r is not None for r in res)
print(f"finished: {ok}/64 without fallback", flush=True)
# timing of a clean tier-0-only rep
t0=t(); h = eng.submit_batch(pairs); res = eng.finish_batch(h, fallback=False); t1=t()
print(f"tier0-only rep: {t1-t0:.2f}s -> {64/(t1-t0):.1f} aln/s (incl. escapees unfinished)", flush=True)
