"""Two-phase semi-global path (wfa_tpu.semi2): bit-exactness through the
full-span prefix -> narrow kernel resume -> dual-aux backtrace chain,
plus the pipeline's escape ladder and the tier probe."""

import numpy as np
import pytest

from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.oracle import Aligner as OracleAligner

PEN = Penalties(4, 6, 2)
SEMI = Options(global_alignment=False)
ADA = AdaptiveReductionOption(10, 50, 1)


def _check(pairs, results, oracle, allow_none=False):
    n_ok = 0
    for (q, t), r in zip(pairs, results):
        if r is None:
            assert allow_none, "unexpected overflow"
            continue
        o = oracle.align(q, t)
        assert r.score == o.score, (q, t, r.score, o.score)
        assert r.cigar(False) == o.cigar(False), (q, t)
        assert (r.q_begin, r.q_end, r.t_begin, r.t_end) == (
            o.q_begin, o.q_end, o.t_begin, o.t_end)
        assert (r.align_len, r.matches, r.gaps, r.gap_regions) == (
            o.align_len, o.matches, o.gaps, o.gap_regions)
        n_ok += 1
    return n_ok


def test_semi2_engine_bitexact():
    """BatchAligner semi2: prefix + kernel resume, vs the oracle."""
    from wfa_tpu.engine import BatchAligner

    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    oracle = OracleAligner(PEN, SEMI, ADA)
    pairs = generate_pairs(8, 200, 0.05, seed=5)
    results = eng.align_batch(pairs, fallback=False)
    assert _check(pairs, results, oracle, allow_none=True) >= 6


def test_semi2_engine_tiny_s0_overflows_cleanly():
    """A prefix shorter than the band collapse must escape (None), never
    return a wrong result."""
    from wfa_tpu.engine import BatchAligner

    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:16")
    oracle = OracleAligner(PEN, SEMI, ADA)
    pairs = generate_pairs(6, 200, 0.05, seed=5)
    results = eng.align_batch(pairs, fallback=False)
    _check(pairs, results, oracle, allow_none=True)


def test_semi2_pipeline_bitexact():
    """Pipeline routes full_span>512 semi-global through semi2 tiers."""
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

    # n_devices=1: the semi2 router requires a mesh-less pipeline (the
    # conftest exposes 8 virtual devices)
    cfg = PipelineConfig(penalties=PEN, options=SEMI, adaptive=ADA,
                         batch_size=6, n_devices=1)
    pipe = AlignmentPipeline(cfg)
    assert pipe._tier_caps(320, 322, 0)[4] == "semi2:64"
    pairs = generate_pairs(6, 320, 0.05, seed=9)
    results = pipe.align_all(pairs)
    oracle = OracleAligner(PEN, SEMI, ADA)
    assert _check(pairs, results, oracle) == 6


def test_semi2_pipeline_uses_semi2_engine():
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

    cfg = PipelineConfig(penalties=PEN, options=SEMI, adaptive=ADA,
                         n_devices=1)
    pipe = AlignmentPipeline(cfg)
    k_win, s_cap, w_win, b_cap, engine, serial, _bb = pipe._tier_caps(
        1000, 1010, 0)
    assert engine == "semi2:64" and k_win == 256
    k_win, s_cap, w_win, b_cap, engine, serial, _bb = pipe._tier_caps(
        1000, 1010, 1)
    assert engine == "semi2:112" and k_win == 512
    k_win, s_cap, w_win, b_cap, engine, serial, _bb = pipe._tier_caps(
        1000, 1010, 2)
    assert engine == "semi2:200" and k_win == 512
    # final tier stays the exact full-span engine
    k_win, s_cap, w_win, b_cap, engine, serial, _bb = pipe._tier_caps(
        1000, 1010, 3)
    assert not engine.startswith("semi2") and k_win >= 2010
    # no-adaptive runs keep the full span (bands never collapse)
    cfg_a = PipelineConfig(penalties=PEN, options=SEMI, adaptive=None,
                           n_devices=1)
    pipe_a = AlignmentPipeline(cfg_a)
    _, _, _, _, engine, _, _bb = pipe_a._tier_caps(1000, 1010, 0)
    assert not engine.startswith("semi2")


def test_pipeline_probe_skips_doomed_tier():
    """When >90% of the probe chunk overflows tier 0, the remaining
    chunks skip straight to the next tier (pipeline.skip_rest) — and the
    results are still exact (VERDICT r2 item 7)."""
    from wfa_tpu.engine import BatchAligner
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

    cfg = PipelineConfig(penalties=PEN, options=Options(True),
                         adaptive=ADA, batch_size=16)
    pipe = AlignmentPipeline(cfg)
    # e=0.45 at l=150: scores ~550 blow tier 0's 256 cap for every pair
    pairs = generate_pairs(96, 150, 0.45, seed=3)

    calls = []
    orig = BatchAligner.submit_batch

    def counting(self, batch, *a, **k):
        calls.append(len(batch))
        return orig(self, batch, *a, **k)

    BatchAligner.submit_batch = counting
    try:
        results = pipe.align_all(pairs)
    finally:
        BatchAligner.submit_batch = orig
    oracle = OracleAligner(PEN, Options(True), ADA)
    assert _check(pairs, results, oracle) == 96
    # tier 0: 6 chunks exist, but the probe (chunk 0, drained after
    # chunk probe_at=3 submits) reports >=90% overflow -> chunks 4,5
    # never submit.  Without the skip there would be >= 12 submits.
    assert len(calls) <= 10, calls


def test_prefix_kernel_matches_xla_exporter():
    """The wide kernel's EXPORT-mode phase 1 (v-space tables, fused end
    finder) must export byte-identical handoff state to the XLA prefix
    exporter (interpret mode; the env-gated fast path's correctness)."""
    import dataclasses

    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner
    from wfa_tpu.semi2 import prefix_export_impl, prefix_export_kernel_impl

    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    pairs = generate_pairs(4, 200, 0.08, seed=7)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = eng._pack_all(pairs)
    Kf = ((int((qlen + tlen).max()) + 1 + 127) // 128) * 128
    args = tuple(jnp.asarray(a) for a in (qb, tbuf, qlen, tlen, toff))
    cfg_x = dataclasses.replace(eng.cfg, k_win=Kf, w_win=None, v_win=Lq)
    ex_x = prefix_export_impl(*args, cfg=cfg_x, B=4, Lq=Lq, Ltb=Ltb,
                              S0=40, K2=256)
    cfg_k = dataclasses.replace(eng.cfg, k_win=Kf, w_win=None)
    ex_k = prefix_export_kernel_impl(*args, cfg=cfg_k, B=4, Lq=Lq,
                                     Ltb=Ltb, S0=40, K2=256)
    mx = np.asarray(ex_x["meta1"])
    mk = np.asarray(ex_k["meta1"])
    # pairs done inside the prefix skip phase 2 entirely: their band
    # slots/windows/k02 are don't-cares (the kernel freezes stale slots,
    # the XLA engine empty rows).  end_* only matter when end_found.
    live = (mx[:, 0] == 0) & (mx[:, 7] == 0)
    assert live.sum() >= 2, "test workload too easy"

    def canon_meta(m):
        m = m.copy()
        nf = m[:, 3] == 0
        m[nf, 4:7] = 0
        m[m[:, 0] == 0, 2] = 0  # term_cell defined only when done
        m[~live, 8] = 0
        return m

    np.testing.assert_array_equal(canon_meta(mx), canon_meta(mk),
                                  err_msg="meta1")
    for key in ("b_m", "b_ie", "win_m", "win_i", "win_d", "ainit"):
        ax, ak_ = np.asarray(ex_x[key]), np.asarray(ex_k[key])
        # axis 1 is the pair axis in every export tensor
        np.testing.assert_array_equal(ax[:, live], ak_[:, live],
                                      err_msg=key)


def test_semi2_kernel_prefix_end_to_end(monkeypatch):
    """Full two-phase path with the kernel prefix enabled
    (WFA_SEMI2_KERNEL_PREFIX=1): bit-exact vs the oracle."""
    from wfa_tpu.engine import BatchAligner

    monkeypatch.setenv("WFA_SEMI2_KERNEL_PREFIX", "1")
    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    oracle = OracleAligner(PEN, SEMI, ADA)
    pairs = generate_pairs(6, 200, 0.05, seed=5)
    results = eng.align_batch(pairs, fallback=False)
    assert _check(pairs, results, oracle, allow_none=True) >= 5


def test_prefix_kernel_vmem_gate():
    """Both wide prefix kernels' VMEM scratch scales with the full span
    Kf (~27 KB/diagonal at 4/6/2): l=1000 spans fit, l>=2000 spans must
    be rejected so the dispatch falls back to the XLA prefix instead of
    failing Mosaic's 100 MB scoped-VMEM cap on hardware."""
    import dataclasses

    from wfa_tpu.engine import BatchAligner
    from wfa_tpu.pallas_engine import prefix_kernel_fits

    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:48")
    assert prefix_kernel_fits(eng.cfg, 2176, 1100)       # l=1000
    assert not prefix_kernel_fits(eng.cfg, 4224, 2200)   # l=2000
    # int32 aux cells (offsets past the int16 bound) cost more
    assert not prefix_kernel_fits(eng.cfg, 3456, 5000)
    # wider penalties widen the circular windows
    wide = dataclasses.replace(
        eng.cfg, penalties=Penalties(40, 20, 20))
    assert not prefix_kernel_fits(wide, 2176, 1100)


def test_semi2_kernel_prefix_oversize_falls_back(monkeypatch):
    """WFA_SEMI2_KERNEL_PREFIX=1 with a span the kernel cannot fit in
    VMEM must transparently run the XLA prefix (same results), not
    attempt the kernel."""
    from wfa_tpu import semi2
    from wfa_tpu.engine import BatchAligner

    monkeypatch.setenv("WFA_SEMI2_KERNEL_PREFIX", "1")
    calls = []
    real = semi2.prefix_export_kernel_impl
    monkeypatch.setattr(semi2, "prefix_export_kernel_impl",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    # force the size gate shut: the dispatch must choose the XLA prefix
    import wfa_tpu.pallas_engine as pe
    monkeypatch.setattr(pe, "prefix_kernel_fits", lambda *a: False)
    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    oracle = OracleAligner(PEN, SEMI, ADA)
    pairs = generate_pairs(6, 200, 0.05, seed=5)
    results = eng.align_batch(pairs, fallback=False)
    assert not calls, "kernel prefix ran despite failing the VMEM gate"
    assert _check(pairs, results, oracle, allow_none=True) >= 5


@pytest.mark.parametrize("l,e,B,KC", [(60, 0.05, 6, 128),
                                      (200, 0.20, 8, 256),
                                      (600, 0.08, 4, 128)])
def test_prefix_chunked_matches_whole_k(l, e, B, KC):
    """pallas_prefix's chunked kernel must export byte-identical
    (out, aux, state) to the whole-K EXPORT kernel — covering done
    pairs + fused end finder (l=60), heavy wf-adaptive trims (e=0.2),
    and the streamed v-table window (l=600 > the 8-group VMEM window)."""
    import dataclasses

    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner
    from wfa_tpu.pallas_engine import pallas_run_prefix
    from wfa_tpu.pallas_prefix import pallas_run_prefix_chunked

    eng = BatchAligner(PEN, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    pairs = generate_pairs(B, l, e, seed=7)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = eng._pack_all(pairs)
    Kf = ((int((qlen + tlen).max()) + 1 + 127) // 128) * 128
    args = tuple(jnp.asarray(a) for a in (qb, tbuf, qlen, tlen, toff))
    S0 = 40
    kcfg = dataclasses.replace(eng.cfg, k_win=Kf, w_win=None, s_cap=S0 + 1)
    VW = max(128, min(1024, Lq))
    out_w, aux_w, state_w, Bp_w = pallas_run_prefix(
        *args, cfg=kcfg, B=B, Lq=Lq, Ltb=Ltb, VW=VW, interpret=True)
    out_c, aux_c, state_c, Bp_c = pallas_run_prefix_chunked(
        *args, cfg=kcfg, B=B, Lq=Lq, Ltb=Ltb, VW=VW, KC=KC,
        interpret=True)
    assert Bp_w == Bp_c
    out_w, aux_w, state_w = map(np.asarray, (out_w, aux_w, state_w))
    out_c, aux_c, state_c = map(np.asarray, (out_c, aux_c, state_c))
    np.testing.assert_array_equal(out_w[:, :B], out_c[:, :B],
                                  err_msg="out")
    done = out_w[1, :B] > 0
    ovf = out_w[2, :B] > 0
    fs = out_w[0, :B]
    for b in range(B):
        # aux rows are defined up to each pair's exit score; exported
        # state is a don't-care for pairs that finished in the prefix
        # (skip phase 2) or overflowed (retry a wider tier)
        smax = int(fs[b]) + 1 if done[b] and not ovf[b] else S0
        np.testing.assert_array_equal(
            aux_w[:, :smax, :, b], aux_c[:, :smax, :, b],
            err_msg=f"aux pair {b}")
        if not done[b] and not ovf[b]:
            np.testing.assert_array_equal(state_w[:, b], state_c[:, b],
                                          err_msg=f"state pair {b}")


def test_engine_vwin_matches_cspace():
    """The sheared v-space stop tables are an exact drop-in for the
    c-space tables (full-table reads, semi-global full span)."""
    import dataclasses

    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner, _run_batch_impl

    eng = BatchAligner(PEN, SEMI, ADA, k_win=128, s_cap=128)
    pairs = generate_pairs(4, 60, 0.15, seed=13)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = eng._pack_all(pairs)
    args = tuple(jnp.asarray(a) for a in (qb, tbuf, qlen, tlen, toff))
    cfg_c = dataclasses.replace(eng.cfg, w_win=None)
    cfg_v = dataclasses.replace(eng.cfg, w_win=None, v_win=Lq)
    st_c = _run_batch_impl(*args, cfg=cfg_c, B=4, Lq=Lq, Ltb=Ltb)
    st_v = _run_batch_impl(*args, cfg=cfg_v, B=4, Lq=Lq, Ltb=Ltb)
    np.testing.assert_array_equal(np.asarray(st_c.final_s),
                                  np.asarray(st_v.final_s))
    np.testing.assert_array_equal(np.asarray(st_c.hist_m),
                                  np.asarray(st_v.hist_m))
    np.testing.assert_array_equal(np.asarray(st_c.aux_m),
                                  np.asarray(st_v.aux_m))


def test_engine_vwin_qlen_at_buffer_edge():
    """qlen == Lq pairs must run the v-space prefix without escaping:
    the table's extra 64-position group makes the v == qlen stop
    representable (it used to be out of table, flagging overflow)."""
    import dataclasses

    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner, _run_batch_impl

    eng = BatchAligner(PEN, SEMI, ADA, k_win=512, s_cap=192)
    # identical 128-base pairs: qlen == tlen == 128 == _pad_len(128),
    # plus one mutated pair so the batch is not all-trivial
    pairs = generate_pairs(2, 128, 0.0, seed=3) + \
        generate_pairs(1, 128, 0.1, seed=4)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = eng._pack_all(pairs)
    assert int(qlen.max()) == Lq  # the edge case under test
    args = tuple(jnp.asarray(a) for a in (qb, tbuf, qlen, tlen, toff))
    cfg_c = dataclasses.replace(eng.cfg, w_win=None)
    cfg_v = dataclasses.replace(eng.cfg, w_win=None, v_win=Lq)
    st_c = _run_batch_impl(*args, cfg=cfg_c, B=3, Lq=Lq, Ltb=Ltb)
    st_v = _run_batch_impl(*args, cfg=cfg_v, B=3, Lq=Lq, Ltb=Ltb)
    assert not np.asarray(st_v.overflow).any()
    np.testing.assert_array_equal(np.asarray(st_c.final_s),
                                  np.asarray(st_v.final_s))
    np.testing.assert_array_equal(np.asarray(st_c.hist_m),
                                  np.asarray(st_v.hist_m))
    np.testing.assert_array_equal(np.asarray(st_c.aux_m),
                                  np.asarray(st_v.aux_m))


@pytest.mark.parametrize("pen", [Penalties(2, 0, 2), Penalties(3, 5, 2),
                                 Penalties(6, 2, 3)])
def test_prefix_chunked_penalty_variants(pen):
    """Chunked-vs-whole-K parity across penalty shapes (different WM/WE
    window depths, gap-ext ties, and o=0 open==ext aliasing)."""
    import dataclasses

    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner
    from wfa_tpu.pallas_engine import pallas_run_prefix
    from wfa_tpu.pallas_prefix import (pallas_run_prefix_chunked,
                                       supports_prefix_chunked)

    eng = BatchAligner(pen, SEMI, ADA, k_win=256, s_cap=256,
                       engine="semi2:40")
    pairs = generate_pairs(4, 150, 0.10, seed=3)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb, qp, tp = eng._pack_all(pairs)
    Kf = ((int((qlen + tlen).max()) + 1 + 127) // 128) * 128
    args = tuple(jnp.asarray(a) for a in (qb, tbuf, qlen, tlen, toff))
    S0 = 40
    kcfg = dataclasses.replace(eng.cfg, k_win=Kf, w_win=None, s_cap=S0 + 1)
    assert supports_prefix_chunked(kcfg)
    VW = max(128, min(1024, Lq))
    out_w, aux_w, state_w, _ = pallas_run_prefix(
        *args, cfg=kcfg, B=4, Lq=Lq, Ltb=Ltb, VW=VW, interpret=True)
    out_c, aux_c, state_c, _ = pallas_run_prefix_chunked(
        *args, cfg=kcfg, B=4, Lq=Lq, Ltb=Ltb, VW=VW, KC=128,
        interpret=True)
    out_w, aux_w, state_w = map(np.asarray, (out_w, aux_w, state_w))
    out_c, aux_c, state_c = map(np.asarray, (out_c, aux_c, state_c))
    np.testing.assert_array_equal(out_w[:, :4], out_c[:, :4])
    done = out_w[1, :4] > 0
    ovf = out_w[2, :4] > 0
    fs = out_w[0, :4]
    for b in range(4):
        smax = int(fs[b]) + 1 if done[b] and not ovf[b] else S0
        np.testing.assert_array_equal(aux_w[:, :smax, :, b],
                                      aux_c[:, :smax, :, b])
        if not done[b] and not ovf[b]:
            np.testing.assert_array_equal(state_w[:, b], state_c[:, b])


def test_prefix_plan_single_source():
    """semi2.prefix_plan is THE kernel-prefix decision (VERDICT r4 #8):
    the pipeline's pessimistic-Ltb model must never claim the kernel
    path when the submit (any real Ltb <= full span) would take the XLA
    path — the gates are monotone in Ltb, so pessimism only errs toward
    modeling the bigger XLA footprint."""
    import dataclasses as dc

    from wfa_tpu.engine import EngineConfig
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig
    from wfa_tpu.semi2 import prefix_plan

    for l in (200, 600, 1000, 2000, 8000):
        full_span = 2 * l + 1
        pipe = AlignmentPipeline(PipelineConfig(
            penalties=PEN, options=SEMI, adaptive=ADA, n_devices=1))
        model = pipe._semi2_kernel_prefix(full_span)
        kcfg = EngineConfig(penalties=PEN, global_alignment=False,
                            adaptive=ADA, k_win=full_span, s_cap=8)
        for ltb in (128, l, full_span):
            submit, kf = prefix_plan(kcfg, full_span, ltb)
            assert (not model) or submit, (l, ltb)
            assert kf % 128 == 0 and kf >= full_span


def test_semi_long_reads_ladder_terminates():
    """Semi-global is length-unbounded in the reference
    (wfa.go:163-183); the two-phase ladder must terminate with sane
    batch admission well past l=1000, where the XLA full-span prefix
    (kernel gate fails VMEM) models ~160 MB/pair (VERDICT r4 #5).
    Uses a low error rate so the CPU interpret-mode phase-2 loop stays
    short; the admission math is the same at any error."""
    from wfa_tpu.datagen import generate_pairs
    from wfa_tpu.oracle import Aligner as OracleAligner
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

    pipe = AlignmentPipeline(PipelineConfig(
        penalties=PEN, options=SEMI, adaptive=ADA, n_devices=1))
    l = 6000
    full_span = 2 * l + 1
    assert not pipe._semi2_kernel_prefix(full_span)  # XLA-prefix regime
    for tier in (0, 1, 2):
        caps = pipe._tier_caps(l, l, tier)
        b_cap, batch_bytes = caps[3], caps[6]
        assert b_cap >= 1
        assert batch_bytes <= pipe.cfg.hbm_budget, (tier, batch_bytes)
    pairs = generate_pairs(2, l, 0.01, seed=5)
    res = pipe.align_all(pairs)
    oracle = OracleAligner(PEN, SEMI, ADA)
    for (q, t), r in zip(pairs, res):
        ref = oracle.align(q, t)
        assert r.score == ref.score
        assert r.cigar(False) == ref.cigar(False)
