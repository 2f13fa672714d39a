"""Pipeline tier routing for the long-read kernel modes: every global
read past l=4096 takes the pairs-on-sublanes long-read kernel (its
per-8-pair-group stop-table windows tolerate the cross-pair progress
spread long lengths develop — the main kernel's block-shared window
measured 78-116/128 outrun-overflows at l=10k-50k), and the narrow
just-past-int16 band keeps the main kernel with value-rebased aux.
Routing decisions only — kernel bit-exactness lives in
tests/test_rebase_aux.py and tests/test_long_pairs.py."""

import dataclasses

from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

PEN = Penalties(4, 6, 2)
ADA = AdaptiveReductionOption(10, 50, 1)


def _cfg(**kw):
    return PipelineConfig(penalties=PEN, options=Options(True),
                          adaptive=ADA, n_devices=1, **kw)


def test_long_reads_route_to_longread_kernel():
    pipe = AlignmentPipeline(_cfg())
    k_win, s_cap, _, b_cap, engine, serial, _bb = pipe._tier_caps(
        50000, 50000, 0)
    assert engine == "pallas_long"
    assert serial  # multi-GB batches must drain one at a time
    # tier 0's score cap must cover e=0.1 workloads (score ~0.53*l) so
    # they don't burn a doomed full-length pass before tier 1
    assert s_cap >= int(0.54 * 50000)
    # whole blocks: the kernel pads batches to its block multiple
    assert b_cap >= 64 and b_cap % 64 == 0


def test_midlength_routes_to_longread_kernel():
    pipe = AlignmentPipeline(_cfg())
    for l in (10000, 20000):
        engine = pipe._tier_caps(l, l, 0)[4]
        assert engine == "pallas_long", (l, engine)


def test_just_past_int16_band_keeps_main_kernel():
    """l past the 13-bit offset limit but at most 4096: the main kernel
    with pure value rebase (KW == k_win, int16 cells)."""
    pipe = AlignmentPipeline(_cfg())
    k_win, _, _, _, engine, _, _bb = pipe._tier_caps(4000, 4000, 0)
    assert engine == f"auto:kw{k_win}"


def test_short_reads_route_plain():
    pipe = AlignmentPipeline(_cfg())
    assert pipe._tier_caps(1000, 1000, 0)[4] == "auto"


def test_tiny_budget_falls_to_longread_kernel():
    pipe = AlignmentPipeline(_cfg(hbm_budget=200 << 20))
    _, _, _, b_cap, engine, _, _bb = pipe._tier_caps(50000, 50000, 0)
    assert engine == "pallas_long"
    # sub-block caps stay small (the long-read kernel shrinks its block
    # size) rather than rounding up past the budget
    assert b_cap <= 8


def test_semi_global_unaffected():
    cfg = dataclasses.replace(_cfg(), options=Options(False))
    pipe = AlignmentPipeline(cfg)
    assert pipe._tier_caps(1000, 1010, 0)[4].startswith("semi2")


def test_score_cap_memory_feedback():
    """High-error workloads must not burn a doomed tier-0 pass forever:
    align_all records each bucket's observed max final score, and the
    next call's tier-0 cap is fitted to it (VERDICT r4 #4).  The same
    memory shrinks caps again when the workload gets easier."""
    from wfa_tpu.datagen import generate_pairs

    pipe = AlignmentPipeline(_cfg(batch_size=32))
    base = pipe._tier_caps(1000, 1000, 0)[1]  # un-fitted: 0.55*l
    pairs = generate_pairs(8, 1000, 0.2, seed=3)
    res = pipe.align_all(pairs)
    assert all(r is not None for r in res)
    mx = max(r.score for r in res)
    assert mx > base, "e=0.2 scores must exceed the default tier-0 cap"
    fitted = pipe._tier_caps(1000, 1000, 0, skey=(1024, 1024))[1]
    assert fitted >= mx, (fitted, mx)
    # second call runs tier 0 straight at the fitted cap: same results
    res2 = pipe.align_all(pairs)
    assert [r.score for r in res2] == [r.score for r in res]
    # easier workload shrinks the memory again
    easy = generate_pairs(8, 1000, 0.02, seed=4)
    pipe.align_all(easy)
    shrunk = pipe._tier_caps(1000, 1000, 0, skey=(1024, 1024))[1]
    assert shrunk < fitted
