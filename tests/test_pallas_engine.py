"""Fused Pallas kernel vs oracle: bit-identical end-to-end results.

Runs the Pallas score-loop kernel in interpreter mode on CPU (the same
kernel code compiles for real TPUs) through the full BatchAligner path —
score loop, device backtrace, token decode — and compares every
observable output against the exact scalar oracle.
"""

import random

import pytest

from wfa_tpu import AdaptiveReductionOption, Options, Penalties, OracleAligner
from wfa_tpu.engine import BatchAligner

BASES = "ACGT"


def random_pairs(rng, count, max_len=70):
    pairs = []
    for _ in range(count):
        n = rng.randint(1, max_len)
        q = "".join(rng.choice(BASES) for _ in range(n))
        out = []
        rate = rng.choice([0.0, 0.05, 0.15, 0.4])
        for ch in q:
            r = rng.random()
            if r < rate / 3:
                out.append(rng.choice(BASES))
            elif r < 2 * rate / 3:
                pass
            elif r < rate:
                out.append(ch)
                out.append(rng.choice(BASES))
            else:
                out.append(ch)
        pairs.append((q.encode(), ("".join(out) or "A").encode()))
    return pairs


@pytest.mark.parametrize("global_alignment", [True, False],
                         ids=["global", "semi"])
@pytest.mark.parametrize("adaptive", [None, AdaptiveReductionOption(10, 50, 1)],
                         ids=["plain", "adaptive"])
def test_pallas_engine_matches_oracle(global_alignment, adaptive):
    rng = random.Random(321 if global_alignment else 654)
    p = Penalties(4, 6, 2)
    opts = Options(global_alignment)
    oracle = OracleAligner(p, opts, adaptive)
    # semi-global seeds span all n+m-1 diagonals -> k_win 256 covers
    # max_len 70 pairs
    engine = BatchAligner(p, opts, adaptive,
                          k_win=128 if global_alignment else 256,
                          s_cap=128, engine="pallas")
    pairs = random_pairs(rng, 10)
    if not global_alignment:
        pairs += [(b"ACGATCTCG", b"CAGGCTCCTCGG"),
                  (b"Bioinformatics helps Biology",
                   b"We learn bioinformatics to help biologists")]
    results = engine.align_batch(pairs)
    for (q, t), res_e in zip(pairs, results):
        res_o = oracle.align(q, t)
        assert res_e.score == res_o.score, (q, t)
        assert res_e.cigar(False) == res_o.cigar(False), (q, t)
        for attr in ("q_begin", "q_end", "t_begin", "t_end", "align_len",
                     "matches", "gaps", "gap_regions"):
            assert getattr(res_e, attr) == getattr(res_o, attr), (attr, q, t)


@pytest.mark.parametrize("penalties", [Penalties(2, 3, 1), Penalties(1, 2, 2)],
                         ids=["ext1", "mis1"])
def test_pallas_degenerate_penalties(penalties):
    """Small penalty steps disable the kernel's REORDER scheduling
    (next-first emission needs x, e, o+e >= 2) — the reference-order
    path must stay bit-exact too."""
    rng = random.Random(777)
    oracle = OracleAligner(penalties, Options(True), None)
    engine = BatchAligner(penalties, Options(True), None, k_win=128,
                          s_cap=128, engine="pallas")
    pairs = random_pairs(rng, 8, max_len=60)
    for (q, t), res_e in zip(pairs, engine.align_batch(pairs)):
        res_o = oracle.align(q, t)
        assert res_e.score == res_o.score, (q, t)
        assert res_e.cigar(False) == res_o.cigar(False), (q, t)


def test_pallas_streaming_window_matches_oracle():
    """Tiny streaming window (wv=2) forces HBM table refills every few
    steps; END-TO-END results (CIGARs and stats decoded through the
    streamed aux history, not just scores) must stay bit-identical."""

    rng = random.Random(55)
    p = Penalties(4, 6, 2)
    ad = AdaptiveReductionOption(10, 50, 1)
    pairs = random_pairs(rng, 8, max_len=80)
    oracle = OracleAligner(p, Options(True), ad)
    # w_win=2 forces the streamed-table mode with refills every few steps
    engine = BatchAligner(p, Options(True), ad, k_win=128, s_cap=256,
                          engine="pallas", w_win=2)
    results = engine.align_batch(pairs, fallback=False)
    n_dev = 0
    for (q, t), res_e in zip(pairs, results):
        if res_e is None:  # genuine window outrun -> retried elsewhere
            continue
        n_dev += 1
        res_o = oracle.align(q, t)
        assert res_e.score == res_o.score, (q, t)
        assert res_e.cigar(False) == res_o.cigar(False), (q, t)
        for attr in ("q_begin", "q_end", "t_begin", "t_end", "align_len",
                     "matches", "gaps", "gap_regions"):
            assert getattr(res_e, attr) == getattr(res_o, attr), (attr, q, t)
    assert n_dev >= len(pairs) // 2  # the tiny window must not reject all
