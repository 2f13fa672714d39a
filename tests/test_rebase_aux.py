"""Rebased aux history (EngineConfig.aux_kw): the fused kernel stores,
per score, only a KW-row window of the live band — row-based at a
32-quantized per-lane base and value-based at the row's minimum live
offset0 (int16 cells at any length).  This is what lets 128-lane blocks
serve l=50k+ global reads within HBM (pipeline routes them as
"auto:kw256").  Interpret mode; bit-exactness vs the oracle."""

import pytest

from wfa_tpu import AdaptiveReductionOption, Options, Penalties, OracleAligner
from wfa_tpu.datagen import generate_pairs
from wfa_tpu.engine import BatchAligner

PEN = Penalties(4, 6, 2)
GLOB = Options(global_alignment=True)
ADA = AdaptiveReductionOption(10, 50, 1)


def _check(eng, oracle, pairs, allow_none=False):
    n_ok = 0
    for (q, t), r in zip(pairs, eng.align_batch(pairs, fallback=False)):
        if r is None:
            assert allow_none, "unexpected escape"
            continue
        o = oracle.align(q, t)
        assert r.score == o.score, (q[:30], r.score, o.score)
        assert r.cigar(False) == o.cigar(False)
        assert (r.q_begin, r.q_end, r.t_begin, r.t_end) == (
            o.q_begin, o.q_end, o.t_begin, o.t_end)
        assert (r.align_len, r.matches, r.gaps, r.gap_regions) == (
            o.align_len, o.matches, o.gaps, o.gap_regions)
        n_ok += 1
    return n_ok


@pytest.mark.parametrize("l,e,kw,k_win,s_cap", [
    (400, 0.10, 256, 512, 512),   # row shifts active (cb > 0 drift)
    (400, 0.20, 256, 512, 1024),  # heavy error: widest per-score bands
    (300, 0.05, 128, 256, 384),   # tightest window
])
def test_rebase_aux_bitexact(l, e, kw, k_win, s_cap):
    eng = BatchAligner(PEN, GLOB, ADA, k_win=k_win, s_cap=s_cap,
                       engine=f"pallas:kw{kw}")
    assert eng.cfg.aux_kw == kw and eng.engine == "pallas"
    oracle = OracleAligner(PEN, GLOB, ADA)
    pairs = generate_pairs(4, l, e, seed=21)
    assert _check(eng, oracle, pairs, allow_none=True) >= 3


def test_rebase_aux_wide_band_escapes():
    """Without wf-adaptive trimming the band outgrows any KW window —
    every pair must escape (None), never return a wrong result."""
    ada_off = AdaptiveReductionOption(10, 10 ** 6, 1)  # never trims
    eng = BatchAligner(PEN, GLOB, ada_off, k_win=256, s_cap=512,
                       engine="pallas:kw128")
    pairs = generate_pairs(3, 300, 0.10, seed=5)
    res = eng.align_batch(pairs, fallback=False)
    assert all(r is None for r in res)


def test_rebase_aux_under_shard_map():
    """The long-read production path on a pod: rebased-aux kernel INSIDE
    shard_map — the sbase translation must survive the dp gather."""
    from wfa_tpu.parallel import make_dp_mesh

    eng = BatchAligner(PEN, GLOB, ADA, k_win=256, s_cap=384,
                       engine="pallas:kw128", mesh=make_dp_mesh(4))
    oracle = OracleAligner(PEN, GLOB, ADA)
    pairs = generate_pairs(8, 200, 0.08, seed=13)
    assert _check(eng, oracle, pairs, allow_none=True) >= 6


def test_rebase_aux_value_only_long_offsets():
    """KW == k_win: pure value-rebase — int16 aux cells at lengths far
    past the 13-bit offset limit (the l>4095 pipeline reroute)."""
    eng = BatchAligner(PEN, GLOB, ADA, k_win=128, s_cap=768,
                       engine="pallas:kw128")
    oracle = OracleAligner(PEN, GLOB, ADA)
    pairs = generate_pairs(2, 4300, 0.02, seed=9)
    assert _check(eng, oracle, pairs, allow_none=True) >= 1
