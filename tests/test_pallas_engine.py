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


@pytest.mark.parametrize("adaptive", [None, AdaptiveReductionOption(10, 50, 1)],
                         ids=["plain", "adaptive"])
def test_pallas_engine_matches_oracle(adaptive):
    rng = random.Random(321)
    p = Penalties(4, 6, 2)
    opts = Options(True)
    oracle = OracleAligner(p, opts, adaptive)
    engine = BatchAligner(p, opts, adaptive, k_win=128, s_cap=128,
                          engine="pallas")
    pairs = random_pairs(rng, 10)
    results = engine.align_batch(pairs)
    for (q, t), res_e in zip(pairs, results):
        res_o = oracle.align(q, t)
        assert res_e.score == res_o.score, (q, t)
        assert res_e.cigar(False) == res_o.cigar(False), (q, t)
        for attr in ("q_begin", "q_end", "t_begin", "t_end", "align_len",
                     "matches", "gaps", "gap_regions"):
            assert getattr(res_e, attr) == getattr(res_o, attr), (attr, q, t)


def test_pallas_streaming_window_matches_oracle():
    """Tiny streaming window (wv=2) forces HBM table refills every few
    steps; end-to-end results must stay bit-identical to the oracle."""
    import functools

    import jax
    import jax.numpy as jnp

    from wfa_tpu.engine import BatchAligner, _run_batch
    from wfa_tpu.pallas_engine import pallas_run_batch

    rng = random.Random(55)
    p = Penalties(4, 6, 2)
    ad = AdaptiveReductionOption(10, 50, 1)
    pairs = random_pairs(rng, 8, max_len=80)
    ba = BatchAligner(p, Options(True), ad, k_win=128, s_cap=256)
    qb, tbuf, qlen, tlen, toff, Lq, Ltb = ba.pack_batch(pairs)
    args = tuple(map(jnp.asarray, (qb, tbuf, qlen, tlen, toff)))
    B = len(pairs)
    st = jax.device_get(_run_batch(*args, cfg=ba.cfg, B=B, Lq=Lq, Ltb=Ltb))
    fs, done, ovf, tc, aux, bs = jax.device_get(pallas_run_batch(
        *args, cfg=ba.cfg, B=B, Lq=Lq, Ltb=Ltb, interpret=True, wv=2))
    assert (fs == st.final_s).all()
    assert (done == st.done).all()
    assert (ovf == st.overflow).all()
