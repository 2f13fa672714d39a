import time, sys, os, numpy as np
t=time.perf_counter
from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig
from wfa_tpu.datagen import generate_pairs

cfg = PipelineConfig(penalties=Penalties(4,6,2), options=Options(global_alignment=True),
                     adaptive=AdaptiveReductionOption(10,50,1), batch_size=2048)
pipe = AlignmentPipeline(cfg)
# --- l=50k e=0.05 row (kw256 routing) ---
print("tier0 caps l=50k:", pipe._tier_caps(50000, 50000, 0), flush=True)
pairs = generate_pairs(64, 50000, 0.05, seed=11)
t0=t(); res = pipe.align_all(pairs); t1=t()
print(f"l=50k e=0.05 warm(compile) pass: {t1-t0:.1f}s", flush=True)
for rep in range(2):
    t0=t(); res = pipe.align_all(pairs); t1=t()
    print(f"l=50k e=0.05 n=64: {64/(t1-t0):.1f} aln/s ({t1-t0:.2f}s)", flush=True)
# --- semi-global l=1000 with kernel prefix (pallas_prefix compile time) ---
os.environ["WFA_SEMI2_KERNEL_PREFIX"] = "1"
scfg = PipelineConfig(penalties=Penalties(4,6,2), options=Options(global_alignment=False),
                      adaptive=AdaptiveReductionOption(10,50,1), batch_size=2048)
spipe = AlignmentPipeline(scfg)
spairs = generate_pairs(2048, 1000, 0.05, seed=13)
t0=t(); sres = spipe.align_all(spairs); t1=t()
print(f"semi l=1000 kernel-prefix warm(compile) pass: {t1-t0:.1f}s", flush=True)
for rep in range(2):
    t0=t(); sres = spipe.align_all(spairs); t1=t()
    print(f"semi l=1000 e=0.05 n=2048 (kernel prefix): {2048/(t1-t0):.1f} aln/s ({t1-t0:.2f}s)", flush=True)
print("done", flush=True)
