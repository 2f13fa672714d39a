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
