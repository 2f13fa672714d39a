"""Scratch: phase-level timing of the two-phase semi-global path."""
import time

import numpy as np

import wfa_tpu.engine as eng
import wfa_tpu.semi2 as semi2
from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

T = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        T[name] = T.get(name, 0.0) + time.perf_counter() - t0
        return r
    return wrap


semi2_prefix = semi2.prefix_export2
semi2_phase2 = semi2.phase2
host_fetch = eng._host_fetch


def prefix_timed(*a, **k):
    t0 = time.perf_counter()
    r = semi2_prefix(*a, **k)
    T["p1_dispatch"] = T.get("p1_dispatch", 0.0) + time.perf_counter() - t0
    # force phase-1 execution to finish: fetch one tiny column
    _ = np.asarray(r["meta1"][:1, :1])
    T["p1_exec"] = T.get("p1_exec", 0.0) + time.perf_counter() - t0
    return r


def phase2_timed(*a, **k):
    t0 = time.perf_counter()
    r = semi2_phase2(*a, **k)
    T["p2_dispatch"] = T.get("p2_dispatch", 0.0) + time.perf_counter() - t0
    _ = np.asarray(r["meta"][:1, :1])
    T["p2_exec"] = T.get("p2_exec", 0.0) + time.perf_counter() - t0
    return r


semi2.prefix_export2 = prefix_timed
semi2.phase2 = phase2_timed


def fetch_timed(a):
    t0 = time.perf_counter()
    r = host_fetch(a)
    nb = getattr(r, "nbytes", 0)
    key = f"fetch_{nb // 1024}KB"
    T[key] = T.get(key, 0.0) + time.perf_counter() - t0
    return r


eng._host_fetch = fetch_timed

cfg = PipelineConfig(
    penalties=Penalties(4, 6, 2), options=Options(global_alignment=False),
    adaptive=AdaptiveReductionOption(10, 50, 1), batch_size=2048)
pipe = AlignmentPipeline(cfg)
pairs = generate_pairs(2048, 1000, 0.05, seed=42)
t0 = time.perf_counter()
r = pipe.align_all(pairs)
print(f"warm: {time.perf_counter() - t0:.1f}s")
for rep in range(2):
    T.clear()
    t0 = time.perf_counter()
    r = pipe.align_all(pairs)
    el = time.perf_counter() - t0
    print(f"rep: {el:.3f}s = {2048 / el:.1f} aln/s  phases: "
          + " ".join(f"{k}={v * 1e3:.0f}ms" for k, v in sorted(T.items())))
print("sample", r[0].score, r[0].cigar(False)[:30])
