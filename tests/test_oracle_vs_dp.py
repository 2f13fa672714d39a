"""Randomized property tests: oracle WFA score == independent Gotoh DP.

Adaptive reduction must be OFF here — it is a heuristic and may trade
optimality for speed.  CIGAR replay consistency is also validated: the
emitted CIGAR must re-derive exactly the reported score and stats.
"""

import random

import pytest

from wfa_tpu import Options, Penalties, OracleAligner
from wfa_tpu.dp import dp_score

BASES = "ACGT"


def mutate(rng, seq, rate):
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate / 3:
            out.append(rng.choice(BASES))  # substitution
        elif r < 2 * rate / 3:
            pass  # deletion
        elif r < rate:
            out.append(ch)
            out.append(rng.choice(BASES))  # insertion
        else:
            out.append(ch)
    return "".join(out) or rng.choice(BASES)


def random_pair(rng, max_len=120, rate=None):
    n = rng.randint(1, max_len)
    q = "".join(rng.choice(BASES) for _ in range(n))
    if rate is None:
        rate = rng.choice([0.02, 0.05, 0.1, 0.3, 0.8])
    t = mutate(rng, q, rate)
    return q.encode(), t.encode()


def replay_score(res, q, t, penalties, global_alignment):
    """Re-derive the score from the CIGAR ops."""
    score = 0
    ops = res.ops
    # Flanking ops are free in semi-global mode; in global mode every op
    # counts.  Structurally (wfa.go:746-750, 970-976) the trailing flank is
    # at most ONE I-or-H run and the leading flank at most one I run
    # followed by at most one H run — interior I runs are penalized.
    start, end = 0, len(ops) - 1
    if not global_alignment:
        if end >= start and ops[end][0] in ("I", "H"):
            end -= 1
        if start <= end and ops[start][0] == "I":
            start += 1
        if start <= end and ops[start][0] == "H":
            start += 1
    v = h = 0
    for op, n in ops[start : end + 1]:
        if op == "M":
            score += 0
        elif op == "X":
            score += penalties.mismatch * n
        elif op in ("I", "D", "H"):
            score += penalties.gap_open + penalties.gap_ext * n
    return score


@pytest.mark.parametrize("global_alignment", [True, False])
@pytest.mark.parametrize("penalties", [
    Penalties(4, 6, 2),
    Penalties(2, 3, 1),
    Penalties(1, 4, 1),
    Penalties(5, 1, 1),
])
def test_score_matches_dp(global_alignment, penalties):
    rng = random.Random(hash((global_alignment, penalties.mismatch,
                              penalties.gap_open, penalties.gap_ext)) & 0xFFFF)
    algn = OracleAligner(penalties, Options(global_alignment), None)
    for trial in range(40):
        q, t = random_pair(rng, max_len=60)
        want = dp_score(q, t, penalties, global_alignment)
        got = algn.align(q, t).score
        assert got == want, (
            f"trial {trial}: q={q!r} t={t!r} wfa={got} dp={want}"
        )


@pytest.mark.parametrize("global_alignment", [True, False])
def test_cigar_replays_to_score(global_alignment):
    rng = random.Random(7 if global_alignment else 8)
    p = Penalties(4, 6, 2)
    algn = OracleAligner(p, Options(global_alignment), None)
    for trial in range(40):
        q, t = random_pair(rng, max_len=80)
        res = algn.align(q, t)
        got = replay_score(res, q, t, p, global_alignment)
        assert got == res.score, (
            f"trial {trial}: q={q!r} t={t!r} replay={got} score={res.score} "
            f"cigar={res.cigar(False)}"
        )


@pytest.mark.parametrize("global_alignment", [True, False])
def test_cigar_consumes_sequences_fully(global_alignment):
    """CIGAR ops must consume exactly len(q) and len(t)."""
    rng = random.Random(11 if global_alignment else 12)
    p = Penalties(4, 6, 2)
    algn = OracleAligner(p, Options(global_alignment), None)
    for _ in range(40):
        q, t = random_pair(rng, max_len=80)
        res = algn.align(q, t)
        v = h = 0
        for op, n in res.ops:
            if op in ("M", "X"):
                v += n
                h += n
            elif op == "I":
                h += n
            elif op in ("D", "H"):
                v += n
        assert (v, h) == (len(q), len(t)), (
            f"q={q!r} t={t!r} cigar={res.cigar(False)} consumed {(v, h)}"
        )


def test_cigar_match_ops_are_real_matches():
    """Every 'M' run must cover equal bases; 'X' runs unequal bases."""
    rng = random.Random(21)
    algn = OracleAligner(Penalties(), Options(True), None)
    for _ in range(40):
        q, t = random_pair(rng, max_len=80)
        res = algn.align(q, t)
        v = h = 0
        for op, n in res.ops:
            if op == "M":
                assert q[v : v + n] == t[h : h + n]
                v += n
                h += n
            elif op == "X":
                for i in range(n):
                    assert q[v + i] != t[h + i]
                v += n
                h += n
            elif op == "I":
                h += n
            elif op in ("D", "H"):
                v += n


def test_adaptive_reduction_stays_close_to_optimal():
    """wf-adaptive is a heuristic; on low-error pairs it should still find
    the optimal score (sanity, mirrors the reference's benchmark setup)."""
    from wfa_tpu import AdaptiveReductionOption

    rng = random.Random(31)
    p = Penalties(4, 6, 2)
    algn = OracleAligner(p, Options(True), AdaptiveReductionOption(10, 50, 1))
    for _ in range(15):
        q, t = random_pair(rng, max_len=100, rate=0.05)
        want = dp_score(q, t, p, True)
        got = algn.align(q, t).score
        assert got == want
