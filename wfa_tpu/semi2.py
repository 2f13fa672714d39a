"""Two-phase semi-global alignment: full-span prefix + narrow resume.

The reference seeds semi-global wavefronts across EVERY diagonal
(wfa.go:163-183), and wf-adaptive reduce (wfa.go:461-546) cannot trim
the band until the best path pulls ``max_dist_diff`` ahead of the field
— so the first scores genuinely span ~lq+lt diagonals (measured: wide
rows persist to s≈22 at l=1000/e=0.05, s≈96 at e=0.20), after which the
live band collapses to tens of diagonals for the rest of the run.  A
fixed full-span window for the whole run (the previous design) pays the
wide width for every score; this module splits the run at the collapse:

* **Phase 1 (here)**: the XLA lockstep engine runs scores ``0..S0-1`` at
  full span — exactly the reference's wide phase — in ``prefix`` mode
  (engine.EngineConfig.prefix), keeping the full-span aux history for
  the backtrace.
* **Export**: per pair, the union of the last ``max(x,o+e)+1`` live
  bands (everything ``next`` can still read) plus the terminal diagonal
  picks a narrow window; the live wavefront rows are re-based into it
  with per-pair binary masked shifts (no gathers — 12 static-shift
  selects), arranged in the Pallas kernel's circular-slot order.
* **Phase 2**: the fused kernel resumes at score ``S0`` inside the
  narrow window (pallas_engine RESUME mode) at full kernel speed.
* The device backtrace chases through BOTH aux tensors (score >= S0:
  narrow pairs-on-lanes layout; below: full-span phase-1 layout).

Bit-exactness: phase 1 is the exact engine; the export hands phase 2
every row ``next``/``reduce``/the end finder can still observe, in the
reference's own coordinates (diagonals are absolute — only the window
origin moves).  Pairs whose band union exceeds the narrow window — or
whose band later grows past it — flag overflow and retry on the wider
tiers, ending at the exact full-span engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .engine import EngineConfig, _BIG, _run_batch_impl

# meta1 columns exported by the prefix (phase-1) run
META1_COLS = ("done", "final_s", "term_cell", "end_found", "end_s",
              "end_k", "end_cell", "overflow2", "k02")
M1_DONE, M1_FS, M1_TERM, M1_EFOUND, M1_ES, M1_EK, M1_ECELL, M1_OVF, \
    M1_K02 = range(9)


def prefix_plan(cfg: EngineConfig, full_span: int, Ltb: int):
    """THE phase-1 plan: (use_kernel, Kf) for a two-phase semi-global
    batch.  Single source of truth consumed by BOTH
    engine._submit_semi2 (the actual submission) and the pipeline's
    footprint model (pipeline._semi2_kernel_prefix, which passes a
    pessimistic Ltb upper bound — the gates are monotone in Ltb, so
    the model can only choose the bigger-footprint path, never the
    smaller; tests/test_semi2.py asserts the agreement)."""
    Kf = ((full_span + 127) // 128) * 128
    use = kernel_prefix_enabled(cfg, Kf, Ltb)
    if use:
        Kf = prefix_kf(cfg, full_span, Ltb)
    return use, Kf


def kernel_prefix_enabled(cfg: EngineConfig, Kf: int, Ltb: int) -> bool:
    """Whether the two-phase submit runs phase 1 on the Pallas prefix
    kernel (callers go through :func:`prefix_plan`).

    Default: on whenever the fast-compiling CHUNKED kernel applies (its
    penalty gate) and the span fits VMEM.  WFA_SEMI2_KERNEL_PREFIX=0
    forces the XLA prefix; =1 additionally opts degenerate-penalty
    configs into the whole-K EXPORT kernel, whose Mosaic compile takes
    tens of minutes per shape (long-lived servers only).
    """
    import os

    from .pallas_engine import prefix_kernel_fits, supports_prefix
    from .pallas_prefix import supports_prefix_chunked

    env = os.environ.get("WFA_SEMI2_KERNEL_PREFIX")
    if env == "0":
        return False
    if not (supports_prefix(cfg) and prefix_kernel_fits(cfg, Kf, Ltb)):
        return False
    return env == "1" or supports_prefix_chunked(cfg)


def prefix_kf(cfg: EngineConfig, full_span: int, Ltb: int) -> int:
    """Diagonal-axis padding of the kernel-prefix window.

    The chunked prefix kernel (pallas_prefix) picks the largest chunk
    KC <= 512 that divides Kf; a bare 128-multiple like 2176 = 128*17
    forces KC=128 — 17 tiny chunk passes per wide step instead of 5
    [512, 128]-tile passes.  Pad Kf to a 512-multiple whenever the
    chunked kernel will run and the padded span still fits VMEM; the
    extra diagonals sit outside every live band, so the dynamic chunk
    bounds skip them once the band collapses.
    """
    from .pallas_engine import prefix_kernel_fits
    from .pallas_prefix import supports_prefix_chunked

    kf = ((full_span + 127) // 128) * 128
    if supports_prefix_chunked(cfg) and kf % 512:
        kf512 = ((full_span + 511) // 512) * 512
        if prefix_kernel_fits(cfg, kf512, Ltb):
            return kf512
    return kf


def _rebase_rows(rows: jnp.ndarray, d: jnp.ndarray, K2: int) -> jnp.ndarray:
    """Per-pair left shift: out[b, j] = rows[b, j + d[b]], 0 <= d < Kf.

    Binary decomposition of the shift into log2(Kf) static-shift selects
    — the TPU-friendly substitute for a per-row gather (~14 ns/element)
    or a one-hot matmul (whose [B, Kf, K2] operand would not fit HBM).
    """
    B, Kf = rows.shape
    x = rows
    b = 0
    while (1 << b) < Kf:
        amt = 1 << b
        shifted = jnp.concatenate(
            [x[:, amt:], jnp.zeros((B, amt), x.dtype)], axis=1)
        x = jnp.where((((d >> b) & 1) == 1)[:, None], shifted, x)
        b += 1
    return x[:, :K2]


def _gather_cell(hist: jnp.ndarray, s: jnp.ndarray, j: jnp.ndarray,
                 S: int, B: int, K: int) -> jnp.ndarray:
    """GetRaw at per-pair (s, j) from a [S, B, K] history (one gather)."""
    bidx = jnp.arange(B, dtype=jnp.int32)
    ok = (s >= 0) & (s < S) & (j >= 0) & (j < K)
    flat = hist.reshape(S * B * K)
    idx = (jnp.clip(s, 0, S - 1) * B + bidx) * K + jnp.clip(j, 0, K - 1)
    return jnp.where(ok, jnp.take(flat, idx), 0)


def prefix_export_impl(
    qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig, B: int, Lq: int,
    Ltb: int, S0: int, K2: int,
):
    """Run the full-span prefix (scores 0..S0-1) and export the handoff.

    ``cfg`` is the phase-2 engine config shape-wise EXCEPT ``k_win``,
    which here must be the full span; ``cfg.s_cap`` is the TOTAL score
    cap (phase 1 + phase 2).  Returns a dict of device tensors (see
    body) — 'meta1' is the small per-pair summary the host fetches to
    place the phase-2 target buffers.
    """
    from .device_backtrace import end_finder

    p = cfg.penalties
    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    assert S0 >= WM and S0 % 8 == 0
    Kf = cfg.k_win
    pcfg = dataclasses.replace(cfg, s_cap=S0 + 1, prefix=True)
    st = _run_batch_impl(
        qb, tbuf, qlen, tlen, toff, cfg=pcfg, B=B, Lq=Lq, Ltb=Ltb)

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff = toff.astype(jnp.int32)
    k0 = -toff
    Ak = tlen - qlen

    # ---- end scan over the final prefix rows (wfa.go:270-375): rows
    # 0..S0-1 are final (extended + reduced); done pairs' rows beyond
    # final_s are zero, so the S0-1 limit is exact for them too
    lim = jnp.full((B,), S0 - 1, jnp.int32)
    end_s, end_k, end_found = end_finder(
        st.hist_m, k0, lim, qlen, tlen, S0 + 1, Kf)
    end_cell = _gather_cell(st.hist_m, end_s, end_k - k0, S0 + 1, B, Kf)
    term_cell = _gather_cell(st.hist_m, st.final_s, Ak - k0, S0 + 1, B, Kf)

    # ---- narrow-window choice: union of every band phase 2 can still
    # read (the last WM M rows / WE I,D rows) plus the terminal diagonal
    lo_u = jnp.full((B,), _BIG, jnp.int32)
    hi_u = jnp.full((B,), -_BIG, jnp.int32)

    def fold(lo_c, hi_c, ex_c, srow):
        nonlocal lo_u, hi_u
        exs = ex_c[srow]
        lo_u = jnp.where(exs, jnp.minimum(lo_u, lo_c[srow]), lo_u)
        hi_u = jnp.where(exs, jnp.maximum(hi_u, hi_c[srow]), hi_u)

    for s in range(S0 - WM + 1, S0 + 1):
        fold(st.lo_m, st.hi_m, st.ex_m, s)
    for s in range(S0 - WE + 1, S0 + 1):
        fold(st.lo_i, st.hi_i, st.ex_i, s)
        fold(st.lo_d, st.hi_d, st.ex_d, s)
    win_lo = jnp.minimum(lo_u, Ak)
    win_hi = jnp.maximum(hi_u, Ak)
    width = win_hi - win_lo + 1
    k02 = win_lo - (K2 - width) // 2
    k02 = jnp.clip(k02, -(qlen - 1),
                   jnp.maximum(tlen - K2, -(qlen - 1)))
    # pairs still holding a wide band escape to the wider tiers; done
    # pairs skip phase 2's loop entirely, so any window placement works
    overflow2 = st.overflow | ((width > K2) & ~st.done)
    d = (k02 - k0).astype(jnp.int32)

    def reb(row):
        return _rebase_rows(row, d, K2)

    # slot-ordered exports: row for circular slot r is the unique score
    # in (S0-W, S0] congruent to r mod W — the kernel copies them in as
    # its VMEM window verbatim
    def slot_rows(hist, lo_c, hi_c, ex_c, W):
        rows, los, his, exs = [], [], [], []
        for slot in range(W):
            srow = S0 - ((S0 - slot) % W)
            rows.append(reb(hist[srow]))
            los.append(lo_c[srow])
            his.append(hi_c[srow])
            exs.append(ex_c[srow].astype(jnp.int32))
        return (jnp.stack(rows), jnp.stack(los), jnp.stack(his),
                jnp.stack(exs))

    win_m, mlo, mhi, mex = slot_rows(st.hist_m, st.lo_m, st.hi_m,
                                     st.ex_m, WM)
    win_i, ilo, ihi, iex = slot_rows(st.hist_i, st.lo_i, st.hi_i,
                                     st.ex_i, WE)
    win_d, dlo, dhi, dex = slot_rows(st.hist_d, st.lo_d, st.hi_d,
                                     st.ex_d, WE)
    ainit = jnp.stack([reb(st.aux_m[S0]), reb(st.aux_i[S0]),
                       reb(st.aux_d[S0])])

    meta1 = jnp.stack(
        [st.done.astype(jnp.int32), st.final_s, term_cell,
         end_found.astype(jnp.int32), end_s, end_k, end_cell,
         overflow2.astype(jnp.int32), k02], axis=1)

    # full-span aux history for the backtrace (rows 0..S0-1; row S0's
    # masked version is streamed by phase 2).  offset0 <= tlen+1, so
    # int16 whenever the target buffer says offsets fit 12 bits.
    aux_old = jnp.stack([st.aux_m[:S0], st.aux_i[:S0], st.aux_d[:S0]])
    if Ltb + 2 <= 4095:
        aux_old = aux_old.astype(jnp.int16)

    return {
        "win_m": win_m, "win_i": win_i, "win_d": win_d, "ainit": ainit,
        "b_m": jnp.concatenate([mlo, mhi, mex], axis=0),
        "b_ie": jnp.concatenate([ilo, ihi, iex, dlo, dhi, dex], axis=0),
        "meta1": meta1, "aux_old": aux_old,
    }


prefix_export = functools.partial(
    jax.jit, static_argnames=("cfg", "B", "Lq", "Ltb", "S0", "K2")
)(prefix_export_impl)


def _rebase_rows_lanes(rows: jnp.ndarray, d: jnp.ndarray,
                       K2: int) -> jnp.ndarray:
    """Pairs-on-lanes variant of :func:`_rebase_rows`:
    out[j, b] = rows[j + d[b], b] — static sublane shifts + lane masks."""
    Kf, Bp = rows.shape
    x = rows
    b = 0
    while (1 << b) < Kf:
        amt = 1 << b
        shifted = jnp.concatenate(
            [x[amt:], jnp.zeros((amt, Bp), x.dtype)], axis=0)
        x = jnp.where((((d >> b) & 1) == 1)[None, :], shifted, x)
        b += 1
    return x[:K2]


def prefix_export_kernel_impl(
    qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig, B: int, Lq: int,
    Ltb: int, S0: int, K2: int,
):
    """Kernel-backed phase 1: the wide Pallas kernel runs the full-span
    prefix (EXPORT mode, v-space stop tables) ~10x faster than the XLA
    engine, with its fused end finder replacing the post-hoc scan.

    Same export dict as :func:`prefix_export_impl`, except ``aux_old``
    is pairs-on-lanes ([3, Sa, Kf, Bp] — phase 2 must pass
    ``old_lanes=True``).

    Dispatch: the chunked kernel (pallas_prefix, [KC, 128] tiles — fast
    Mosaic compile, main-kernel tile efficiency) whenever its penalty
    gate holds; the whole-K EXPORT kernel otherwise."""
    from .pallas_engine import pallas_run_prefix
    from .pallas_prefix import (
        pallas_run_prefix_chunked,
        supports_prefix_chunked,
    )

    p = cfg.penalties
    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    assert S0 >= WM
    Kf = cfg.k_win
    kcfg = dataclasses.replace(cfg, s_cap=S0 + 1)
    VW = max(128, min(1024, Lq))
    run = (pallas_run_prefix_chunked if supports_prefix_chunked(kcfg)
           else pallas_run_prefix)
    out, aux_old, state, Bp = run(
        qb, tbuf, qlen, tlen, toff, cfg=kcfg, B=B, Lq=Lq, Ltb=Ltb, VW=VW,
        interpret=jax.default_backend() == "cpu")

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff = toff.astype(jnp.int32)
    k0 = -toff
    Ak = tlen - qlen
    final_s, done_i, ovf_i = out[0, :B], out[1, :B], out[2, :B]
    end_found, term_cell = out[3, :B], out[4, :B]
    end_s, end_k, end_cell = out[5, :B], out[6, :B], out[7, :B]
    done = done_i > 0

    # parse the state dump (kernel VMEM windows + band slots)
    o = 0
    m_rows = state[o:o + WM * Kf]
    o += WM * Kf
    i_rows = state[o:o + WE * Kf]
    o += WE * Kf
    d_rows = state[o:o + WE * Kf]
    o += WE * Kf
    a_rows = state[o:o + 3 * Kf]
    o += 3 * Kf
    mlo = state[o:o + WM]
    mhi = state[o + WM:o + 2 * WM]
    mex = state[o + 2 * WM:o + 3 * WM]
    o += 3 * WM
    ilo = state[o:o + WE]
    ihi = state[o + WE:o + 2 * WE]
    iex = state[o + 2 * WE:o + 3 * WE]
    o += 3 * WE
    dlo = state[o:o + WE]
    dhi = state[o + WE:o + 2 * WE]
    dex = state[o + 2 * WE:o + 3 * WE]

    # narrow-window choice (same math as the XLA exporter)
    lo_u = jnp.full((Bp,), _BIG, jnp.int32)
    hi_u = jnp.full((Bp,), -_BIG, jnp.int32)
    for lo_r, hi_r, ex_r, W in ((mlo, mhi, mex, WM), (ilo, ihi, iex, WE),
                                (dlo, dhi, dex, WE)):
        for r in range(W):
            exs = ex_r[r] > 0
            lo_u = jnp.where(exs, jnp.minimum(lo_u, lo_r[r]), lo_u)
            hi_u = jnp.where(exs, jnp.maximum(hi_u, hi_r[r]), hi_u)
    lo_u = lo_u[:B]
    hi_u = hi_u[:B]
    win_lo = jnp.minimum(lo_u, Ak)
    win_hi = jnp.maximum(hi_u, Ak)
    width = win_hi - win_lo + 1
    k02 = win_lo - (K2 - width) // 2
    k02 = jnp.clip(k02, -(qlen - 1),
                   jnp.maximum(tlen - K2, -(qlen - 1)))
    overflow2 = (ovf_i > 0) | ((width > K2) & ~done)
    d = k02 - k0
    dp = jnp.concatenate(
        [d, jnp.zeros((Bp - B,), jnp.int32)]) if Bp != B else d

    def reb(rows):  # [Kf, Bp] -> [B, K2]
        return _rebase_rows_lanes(rows, dp, K2)[:, :B].T

    win_m = jnp.stack([reb(m_rows[r * Kf:(r + 1) * Kf])
                       for r in range(WM)])
    win_i = jnp.stack([reb(i_rows[r * Kf:(r + 1) * Kf])
                       for r in range(WE)])
    win_d = jnp.stack([reb(d_rows[r * Kf:(r + 1) * Kf])
                       for r in range(WE)])
    ainit = jnp.stack([reb(a_rows[r * Kf:(r + 1) * Kf])
                       for r in range(3)])

    meta1 = jnp.stack(
        [done.astype(jnp.int32), final_s, term_cell, end_found,
         end_s, end_k, end_cell, overflow2.astype(jnp.int32), k02],
        axis=1)
    bB = lambda r: r[:, :B]
    return {
        "win_m": win_m, "win_i": win_i, "win_d": win_d, "ainit": ainit,
        "b_m": jnp.concatenate([bB(mlo), bB(mhi), bB(mex)], axis=0),
        "b_ie": jnp.concatenate(
            [bB(ilo), bB(ihi), bB(iex), bB(dlo), bB(dhi), bB(dex)],
            axis=0),
        "meta1": meta1, "aux_old": aux_old,
    }


def _prefix_export2_impl(
    seq, lens, *, cfg: EngineConfig, B: int, Lq: int, Ltb: int, S0: int,
    K2: int, packed: bool, use_kernel: bool = False,
):
    """Combined-upload wrapper (seq = query|target bytes or 2-bit packs,
    lens = [qlen, tlen, toff]) around the phase-1 exporters — the wide
    kernel (use_kernel, ~10x faster) or the XLA engine."""
    from .engine import _unpack2

    qw = Lq // 4 if packed else Lq
    qb = lax.slice(seq, (0, 0), (B, qw))
    tbuf = lax.slice(seq, (0, qw), (B, seq.shape[1]))
    qlen = lens[:, 0]
    tlen = lens[:, 1]
    toff = lens[:, 2]
    if packed:
        zero = jnp.zeros_like(qlen)
        qb = _unpack2(qb, Lq, zero, qlen)
        tbuf = _unpack2(tbuf, Ltb, toff, toff + tlen)
    impl = prefix_export_kernel_impl if use_kernel else prefix_export_impl
    return impl(
        qb, tbuf, qlen, tlen, toff, cfg=cfg, B=B, Lq=Lq, Ltb=Ltb, S0=S0,
        K2=K2)


prefix_export2 = functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "Lq", "Ltb", "S0", "K2", "packed",
                     "use_kernel"),
)(_prefix_export2_impl)


def _phase2_impl(
    seq2, lens2, win_m, win_i, win_d, ainit, b_m, b_ie, meta1, aux_old,
    *, cfg: EngineConfig, B: int, Lq: int, Ltb_full: int, Ltb2: int,
    S0: int, packed: bool, old_lanes: bool = False, flat: bool = False,
):
    """Narrow-window resume + dual-aux backtrace + output packing.

    ``cfg`` is the phase-2 engine config (k_win = the narrow window,
    s_cap = the TOTAL score cap).  ``seq2`` holds the query and the
    RE-PLACED target (column c = target position c - toff2; toff2 < 0
    means the buffer starts at target position -toff2).  ``Ltb_full``
    (the phase-1 buffer length >= tlen) bounds offsets for the token
    plan; Ltb2 only bounds buffer columns.
    """
    from .engine import _finish_outputs, _unpack2
    from .pallas_engine import pallas_run_resume

    qw = Lq // 4 if packed else Lq
    qb = lax.slice(seq2, (0, 0), (B, qw))
    tb2 = lax.slice(seq2, (0, qw), (B, seq2.shape[1]))
    qlen = lens2[:, 0]
    tlen = lens2[:, 1]
    toff2 = lens2[:, 2]
    if packed:
        zero = jnp.zeros_like(qlen)
        qb = _unpack2(qb, Lq, zero, qlen)
        tb2 = _unpack2(tb2, Ltb2, jnp.maximum(toff2, 0), toff2 + tlen)

    final_s, done, overflow, start, aux2, Bp = pallas_run_resume(
        qb, tb2, qlen, tlen, toff2, win_m, win_i, win_d, ainit, b_m, b_ie,
        meta1, cfg=cfg, B=B, Lq=Lq, Ltb2=Ltb2, Ltb_full=Ltb_full, S0=S0,
        interpret=jax.default_backend() == "cpu",
    )
    start_s, start_k, start_cell = start
    k02 = -toff2.astype(jnp.int32)
    k0_old = -(qlen.astype(jnp.int32) - 1)  # phase-1 full-span origin
    return _finish_outputs(
        aux2, start_cell, k02, start_s, start_k,
        qlen.astype(jnp.int32), tlen.astype(jnp.int32), done, overflow,
        cfg=cfg, Lq=Lq, Ltb=Ltb_full, b_stride=Bp, pairs_on_lanes=True,
        aux_old=aux_old, k0_old=k0_old, s_split=S0,
        old_pairs_on_lanes=old_lanes, flat=flat,
    )


phase2 = functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "Lq", "Ltb_full", "Ltb2", "S0",
                     "packed", "old_lanes", "flat"),
)(_phase2_impl)
