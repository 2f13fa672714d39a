"""Scratch: isolated phase-1 / phase-2 timing for the semi2 path."""
import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.engine import BatchAligner, EngineConfig, _pad_len
from wfa_tpu import native
from wfa_tpu.semi2 import M1_K02, phase2, prefix_export2

B = int(os.environ.get("B", "1024"))
S0 = int(os.environ.get("S0", "48"))
K2 = int(os.environ.get("K2", "256"))
pairs = generate_pairs(B, 1000, 0.05, seed=42)

cfg = EngineConfig(
    penalties=Penalties(4, 6, 2),
    global_alignment=False,
    adaptive=AdaptiveReductionOption(10, 50, 1),
    s_cap=576, k_win=K2)
ba = BatchAligner(cfg, engine=f"semi2:{S0}")
qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = ba._pack_all(pairs)
packed = tp is not None
seq = np.concatenate([qp if packed else qb, tp if packed else tbuf], axis=1)
lens = np.stack([qlen, tlen, toff], axis=1).astype(np.int32)
full_span = int((qlen + tlen).max()) + 1
Kf = ((full_span + 127) // 128) * 128
use_kernel = os.environ.get("WFA_SEMI2_KERNEL_PREFIX") == "1"
pcfg = dataclasses.replace(cfg, k_win=Kf, w_win=None,
                           v_win=None if use_kernel else Lq)

seq_d, lens_d = jnp.asarray(seq), jnp.asarray(lens)


def run_p1():
    return prefix_export2(seq_d, lens_d, cfg=pcfg, B=B, Lq=Lq, Ltb=Ltb,
                          S0=S0, K2=K2, packed=packed, use_kernel=use_kernel)


ex = run_p1()
_ = np.asarray(ex["meta1"][:1, :1])
for _ in range(3):
    t0 = time.perf_counter()
    ex = run_p1()
    _ = np.asarray(ex["meta1"][:1, :1])
    t1 = time.perf_counter()
    print(f"p1: {(t1 - t0) * 1e3:.1f} ms ({(t1 - t0) / B * 1e6:.1f} us/pair)"
          f" use_kernel={use_kernel} Kf={Kf}")

# phase 2 setup (mirror engine._submit_semi2)
m1 = np.asarray(ex["meta1"])
k02 = m1[:, M1_K02].astype(np.int32)
toff2 = -k02
t_eff = [t[int(k):] if int(k) > 0 else t
         for (q, t), k in zip(pairs, k02)]
tlen2 = np.fromiter((len(t) for t in t_eff), np.int32, B)
off_eff = np.maximum(toff2, 0).astype(np.int32)
Ltb2 = _pad_len(max(int((off_eff + tlen2).max()), 1))
t2raw, t2p = native.build_and_pack(t_eff, tlen2, off_eff, Ltb2)
packed2 = packed and t2p is not None
seq2 = np.concatenate([qp if packed2 else qb, t2p if packed2 else t2raw],
                      axis=1)
lens2 = np.stack([qlen, tlen, toff2], axis=1).astype(np.int32)
seq2_d, lens2_d = jnp.asarray(seq2), jnp.asarray(lens2)
p2_args = (seq2_d, lens2_d, ex["win_m"], ex["win_i"], ex["win_d"],
           ex["ainit"], ex["b_m"], ex["b_ie"], ex["meta1"], ex["aux_old"])


def run_p2():
    return phase2(*p2_args, cfg=cfg, B=B, Lq=Lq, Ltb_full=Ltb, Ltb2=Ltb2,
                  S0=S0, packed=packed2, old_lanes=use_kernel)


out = run_p2()
meta = np.asarray(out["meta"])
print("p2 overflow:", int((meta[:, 1] != 0).sum()), "/", B,
      "score[:4]:", meta[:4, 0].tolist())
for _ in range(3):
    t0 = time.perf_counter()
    out = run_p2()
    _ = np.asarray(out["meta"][:1, :1])
    t1 = time.perf_counter()
    print(f"p2: {(t1 - t0) * 1e3:.1f} ms ({(t1 - t0) / B * 1e6:.1f} us/pair)")

# decompose phase 2: resume kernel alone
from functools import partial

from wfa_tpu.engine import _unpack2
from wfa_tpu.pallas_engine import pallas_run_resume


@partial(jax.jit, static_argnames=())
def run_resume_only(seq2_d, lens2_d, win_m, win_i, win_d, ainit, b_m,
                    b_ie, meta1):
    qw = Lq // 4 if packed2 else Lq
    qb_ = jax.lax.slice(seq2_d, (0, 0), (B, qw))
    tb2 = jax.lax.slice(seq2_d, (0, qw), (B, seq2_d.shape[1]))
    ql = lens2_d[:, 0]
    tl = lens2_d[:, 1]
    to2 = lens2_d[:, 2]
    if packed2:
        zero = jnp.zeros_like(ql)
        qb_ = _unpack2(qb_, Lq, zero, ql)
        tb2 = _unpack2(tb2, Ltb2, jnp.maximum(to2, 0), to2 + tl)
    final_s, done, overflow, start, aux2, Bp = pallas_run_resume(
        qb_, tb2, ql, tl, to2, win_m, win_i, win_d, ainit, b_m, b_ie,
        meta1, cfg=cfg, B=B, Lq=Lq, Ltb2=Ltb2, Ltb_full=Ltb, S0=S0,
        interpret=False)
    return final_s, done, overflow


r = run_resume_only(seq2_d, lens2_d, ex["win_m"], ex["win_i"], ex["win_d"],
                    ex["ainit"], ex["b_m"], ex["b_ie"], ex["meta1"])
_ = np.asarray(r[0])
for _ in range(3):
    t0 = time.perf_counter()
    r = run_resume_only(seq2_d, lens2_d, ex["win_m"], ex["win_i"],
                        ex["win_d"], ex["ainit"], ex["b_m"], ex["b_ie"],
                        ex["meta1"])
    _ = np.asarray(r[0])
    t1 = time.perf_counter()
    print(f"p2 resume-kernel only: {(t1 - t0) * 1e3:.1f} ms "
          f"({(t1 - t0) / B * 1e6:.1f} us/pair)")
fs = np.asarray(r[0])
ov = np.asarray(r[2])
print("final_s max", fs.max(), "overflow", int(ov.sum()), "done",
      int(np.asarray(r[1]).sum()))
print("done")
