"""Pipeline tier routing for the rebased-aux kernel modes (VERDICT r2
item 5's pipeline half): over-budget long global reads take the main
kernel with a 256-row rebased aux window ("auto:kw256"), mid-length
reads whose offsets exceed 13 bits take pure value-rebase
("auto:kw<k_win>"), and configs beyond both fall to the pairs-on-
sublanes long-read kernel.  Routing decisions only — kernel
bit-exactness lives in tests/test_rebase_aux.py."""

import dataclasses

from wfa_tpu import AdaptiveReductionOption, Options, Penalties
from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

PEN = Penalties(4, 6, 2)
ADA = AdaptiveReductionOption(10, 50, 1)


def _cfg(**kw):
    return PipelineConfig(penalties=PEN, options=Options(True),
                          adaptive=ADA, n_devices=1, **kw)


def test_long_reads_route_to_windowed_rebase():
    pipe = AlignmentPipeline(_cfg())
    k_win, s_cap, _, b_cap, engine, serial, _bb = pipe._tier_caps(50000, 50000, 0)
    assert engine == "auto:kw256"
    assert serial  # multi-GB batches must drain one at a time
    # the kernel pads to 128-lane blocks: the cap is a whole block, not
    # a partial one that wastes padded lanes
    assert b_cap >= 128 and b_cap % 128 == 0


def test_midlength_routes_to_pure_value_rebase():
    """l past the 13-bit offset limit but within budget at full width:
    KW == k_win (no row windowing, int16 cells via value rebase)."""
    pipe = AlignmentPipeline(_cfg())
    k_win, _, _, _, engine, _, _bb = pipe._tier_caps(4300, 4300, 0)
    assert engine == f"auto:kw{k_win}" or engine == "auto:kw256"
    assert engine.startswith("auto:kw")


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
