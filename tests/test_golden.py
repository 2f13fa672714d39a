"""Golden tests against outputs recorded in the reference README/corpus.

Expected values come from recorded CLI outputs of the reference
implementation (its README.md:115-124, :140-149, :17-27, :230-254) and are
therefore oracle values obtainable without running the Go binary.
"""

import pytest

from wfa_tpu import (
    AdaptiveReductionOption,
    Options,
    Penalties,
    OracleAligner,
)

ADAPTIVE = AdaptiveReductionOption(min_wf_len=10, max_dist_diff=50, cutoff_step=1)

# (name, query, target, global?, score, cigar, qb, qe, tb, te,
#  align_len, matches, gaps, gap_regions)
GOLDEN = [
    # reference README.md:115-124 (global)
    (
        "readme-global",
        b"ACCATACTCG",
        b"AGGATGCTCG",
        True,
        12,
        "1M2X2M1X4M",
        1, 10, 1, 10,
        10, 7, 0, 0,
    ),
    # reference README.md:140-149 (semi-global).  NOTE: the README block
    # records "1I1M1X1M1X1M1I4M1I", but that output predates the reference's
    # v0.2.0 backtrace rewrite (the block still uses the pre-v0.4.0
    # "align-region"/"gapRegions" output format, CHANGELOG.md:3-5) and is
    # contradicted by the README's OWN recorded score table in the same
    # section.  See test_readme_semiglobal_manual_backtrace below for the
    # instruction-level trace of the current wfa.go:703-983 on this pair,
    # which derives this equal-score CIGAR cell by cell:
    (
        "readme-semiglobal",
        b"ACGATCTCG",
        b"CAGGCTCCTCGG",
        False,
        16,
        "1I1M1X1M1X2M1I3M1I",
        1, 9, 2, 11,
        10, 7, 1, 1,
    ),
    # reference README.md:230-239, also the WFA2-lib example (global)
    (
        "wfa2lib-example",
        b"AGCTAGTGTCAATGGCTACTTTTCAGGTCCT",
        b"AACTAAGTGTCGGTGGCTACTATATATCAGGTCCT",
        True,
        36,
        "1M1X3M1I5M2X8M3I1M1X9M",
        1, 31, 1, 35,
        35, 27, 4, 2,
    ),
    # reference README.md:245-254 (seqs.txt pair 1, global + adaptive)
    (
        "seqs-pair1",
        b"ATTGGAAAATAGGATTGGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTTCGTCGTCCTTACGTTTCCGGAAGGGAGTGGTTAGCTCGAAGCCCA",
        b"GATTGGAAAATAGGATGGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTTGTCGTCCTTACGTTTCCGGAAGGGAGTGGTTGCTCGAAGCCCA",
        True,
        36,
        "1X1I14M1D39M1D31M1D12M",
        2, 100, 3, 98,
        99, 96, 3, 3,
    ),
    # reference README.md:17-27 (semi-global, non-DNA text)
    (
        "readme-text-semiglobal",
        b"Bioinformatics helps Biology",
        b"We learn bioinformatics to help biologists",
        False,
        32,
        "9I1X14M3I4M1D1M1X5M1X3I",
        2, 27, 11, 38,
        29, 24, 4, 2,
    ),
]


@pytest.mark.parametrize(
    "name,q,t,global_,score,cigar,qb,qe,tb,te,alen,matches,gaps,gapregions",
    GOLDEN,
    ids=[g[0] for g in GOLDEN],
)
def test_oracle_golden(
    name, q, t, global_, score, cigar, qb, qe, tb, te, alen, matches, gaps, gapregions
):
    algn = OracleAligner(
        Penalties(4, 6, 2), Options(global_alignment=global_), ADAPTIVE
    )
    res = algn.align(q, t)
    assert res.score == score
    assert res.cigar(False) == cigar
    assert (res.q_begin, res.q_end) == (qb, qe)
    assert (res.t_begin, res.t_end) == (tb, te)
    assert res.align_len == alen
    assert res.matches == matches
    assert res.gaps == gaps
    assert res.gap_regions == gapregions


def test_alignment_text_readme_global():
    """README.md:115-124 alignment text."""
    algn = OracleAligner(Penalties(), Options(True), ADAPTIVE)
    res = algn.align(b"ACCATACTCG", b"AGGATGCTCG")
    Q, A, T = res.alignment_text(b"ACCATACTCG", b"AGGATGCTCG", False)
    assert Q == b"ACCATACTCG"
    assert A == b"|  || ||||"
    assert T == b"AGGATGCTCG"


def test_alignment_text_readme_semiglobal():
    """README.md:140-149 alignment text (current-code path, see GOLDEN)."""
    q, t = b"ACGATCTCG", b"CAGGCTCCTCGG"
    algn = OracleAligner(Penalties(), Options(False), ADAPTIVE)
    res = algn.align(q, t)
    Q, A, T = res.alignment_text(q, t, False)
    assert Q == b"-ACGATC-TCG-"
    assert A == b" | | || ||| "
    assert T == b"CAGGCTCCTCGG"


def test_alignment_text_text_semiglobal():
    """README.md:18-27 alignment text (mixed-case English words)."""
    q = b"Bioinformatics helps Biology"
    t = b"We learn bioinformatics to help biologists"
    algn = OracleAligner(Penalties(), Options(False), ADAPTIVE)
    res = algn.align(q, t)
    Q, A, T = res.alignment_text(q, t, False)
    assert Q == b"---------Bioinformatics ---helps Biology---"
    # README trims trailing whitespace; compare rstripped.
    assert A.rstrip() == b"          ||||||||||||||   |||| | |||||"
    assert T == b"We learn bioinformatics to help- biologists"


def test_seqs_pair1_alignment_text():
    """README.md:246-248 alignment rows for seqs.txt pair 1."""
    q = b"ATTGGAAAATAGGATTGGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTTCGTCGTCCTTACGTTTCCGGAAGGGAGTGGTTAGCTCGAAGCCCA"
    t = b"GATTGGAAAATAGGATGGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTTGTCGTCCTTACGTTTCCGGAAGGGAGTGGTTGCTCGAAGCCCA"
    algn = OracleAligner(Penalties(), Options(True), ADAPTIVE)
    res = algn.align(q, t)
    Q, A, T = res.alignment_text(q, t, False)
    assert Q == b"A-TTGGAAAATAGGATTGGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTTCGTCGTCCTTACGTTTCCGGAAGGGAGTGGTTAGCTCGAAGCCCA"
    assert T == b"GATTGGAAAATAGGAT-GGGGTTTGTTTATATTTGGGTTGAGGGATGTCCCACCTT-GTCGTCCTTACGTTTCCGGAAGGGAGTGGTT-GCTCGAAGCCCA"


def test_readme_semiglobal_manual_backtrace():
    """Instruction-level trace of the CURRENT reference backtrace
    (wfa.go:703-983) on ACGATCTCG vs CAGGCTCCTCGG (semi-global, 9x12),
    establishing that the README.md:140-149 recorded CIGAR
    ``1I1M1X1M1X1M1I4M1I`` is a stale pre-v0.2.0 output and the current
    code produces ``1I1M1X1M1X2M1I3M1I`` (same score 16).

    Evidence from the reference's OWN recorded README score table
    (README.md:127-140, the M-component plot in the very same section):

    * the backtrace start cell is row 9 / col 11 = ``⬊16`` and the
      recorded insertion cell is ``⟼16`` at row 6 / col 8 — the plot
      back-fills match-run cells from the recomputed PRE-extension
      offset (wfa_component_plot.go:110-140), so ``⟼16`` sitting at
      (v=6, h=8) *is* the recorded statement that offset0 = 8 at
      (s=16, k=2);
    * the stale CIGAR instead needs its insertion at (v=5, h=7) (path
      ...1M @ (5,6), 1I consuming t[7], 4M @ (6..9)x(8..11)), i.e.
      offset0 = 7 and a score-8 M cell at (6,8) — but the recorded
      table shows ``.`` (no cell) at row 5 / col 7 and lowest-score 16
      at (6,8).  The recorded table contradicts the recorded CIGAR and
      matches the current code;
    * the recorded block also still prints "align-region"/"gapRegions",
      the pre-v0.4.0 output format (CHANGELOG.md:3-5; the package was
      rewritten "more accurate" in v0.2.0, CHANGELOG.md:18-21).

    The hand trace below follows wfa.go:703-983 exactly; every wavefront
    value it reads is asserted against the oracle's stored state, so the
    trace in this comment and the executable state cannot drift apart.
    Penalties 4/6/2; x=4, o+e=8, e=2; lenQ=9, lenT=12.

    start (semi-global end finder, wfa.go:270-375): (s=16, k=2),
    GetRaw -> offset h=11, tag InsertOpen; v = h-k = 9.
    trailing flank (wfa.go:746-750): h=11 < 12 -> emit 1I.

    iter 1 @ (s=16, k=2) tag=IO, h=11: default-branch recompute
      (wfa.go:789-817): I-rule max(M[8][1]=7, I[14][1]=4)+1 = 8;
      D-rule max(M[8][3]=6, D[14][3]=7) = 7; X-rule M[12][2]+1 = 6.
      offset0 = 8 (the recorded ⟼16 placement).  matches = 11-8 = 3
      -> emit 3M (TCG), h=8, v=6; emit 1I (tag IO);
      step InsertOpen (wfa.go:888-895): s=8, k=1, h=7;
      next tag = M[8].Get(1) -> Mismatch.
    iter 2 @ (s=8, k=1) tag=X, h=7: X-rule M[4][1]+1 = 5 (I/D sources
      at s-8=0 / s-2=6 absent).  offset0 = 5.  matches = 7-5 = 2
      -> emit 2M (TC) [the disputed split], h=5, v=4; emit 1X;
      step Mismatch: s=4, h=4; next tag = M[4].Get(1) -> Mismatch.
    iter 3 @ (s=4, k=1) tag=X, h=4: offset0 = M[0][1]+1 = 3.
      matches = 4-3 = 1 -> emit 1M (G), h=3, v=2; emit 1X;
      step Mismatch: s=0, h=2; next tag = M[0].Get(1) -> Match.
    iter 4 @ (s=0, k=1) tag=M, h=2, v=1: all sources absent ->
      offset0 = 0 -> break (wfa.go:819-827).
    tail (wfa.go:930-968): nm = min(2,1)-1 = 0; tag Match -> set
      begins (t=2, q=1) and emit 1M; leading flank (wfa.go:970-976):
      v=1 -> no H, h=2 -> emit 1I.

    emission order [1I 3M 1I 2M 1X 1M 1X 1M 1I], reversed+merged
    (wfa_cigar.go:136-169) = 1I1M1X1M1X2M1I3M1I; score 16;
    match-region q[1,9] vs t[2,11].
    """
    from wfa_tpu.constants import (T_INS_OPEN, T_MATCH, T_MISMATCH,
                                   TYPE_BITS, TYPE_MASK)

    a = OracleAligner(Penalties(4, 6, 2), Options(False), ADAPTIVE)
    q, t = b"ACGATCTCG", b"CAGGCTCCTCGG"
    res = a.align(q, t)
    assert res.score == 16
    assert res.cigar(False) == "1I1M1X1M1X2M1I3M1I"
    assert (res.q_begin, res.q_end, res.t_begin, res.t_end) == (1, 9, 2, 11)

    def cell(comp, s, k):
        wf = comp.wavefronts.get(s) if hasattr(comp.wavefronts, "get") \
            else comp.wavefronts[s]
        raw, ok = wf.get_raw(k)
        assert ok, (s, k)
        return raw >> TYPE_BITS, raw & TYPE_MASK

    # every value the hand trace reads, pinned to the oracle state:
    assert cell(a.M, 16, 2) == (11, T_INS_OPEN)    # start cell
    assert cell(a.M, 8, 1) == (7, T_MISMATCH)      # iter-1 I-rule src / next tag
    assert cell(a.I, 14, 1)[0] == 4                # iter-1 I-rule src
    assert cell(a.M, 8, 3)[0] == 6                 # iter-1 D-rule src
    assert cell(a.D, 14, 3)[0] == 7                # iter-1 D-rule src
    assert cell(a.M, 12, 2)[0] == 5                # iter-1 X-rule src
    assert cell(a.M, 4, 1) == (4, T_MISMATCH)      # iter-2 X src / next tag
    assert cell(a.M, 0, 1) == (2, T_MATCH)         # iter-3 src / final tag
    # the stale CIGAR's insertion cell (v=5, h=7) must not exist at any
    # score <= 16 in M (the recorded table likewise shows '.' there)
    for s in range(17):
        wfs = a.M.wavefronts
        wf = wfs.get(s) if hasattr(wfs, "get") else (
            wfs[s] if s < len(wfs) else None)
        if wf is None:
            continue
        raw, ok = wf.get_raw(2)  # k = h - v = 7 - 5 = 2
        if ok and raw:
            assert (raw >> TYPE_BITS) != 7 or s == 16, s


def test_errors():
    import pytest as _pytest

    from wfa_tpu import EmptySeqError

    algn = OracleAligner()
    with _pytest.raises(EmptySeqError):
        algn.align(b"", b"ACGT")
    with _pytest.raises(EmptySeqError):
        algn.align(b"ACGT", b"")


def test_degenerate_pairs():
    """Latent corpus degenerate cases (reference wfa_test.go:98-103)."""
    algn = OracleAligner(Penalties(), Options(True), None)
    res = algn.align(b"C", b"C")
    assert res.score == 0
    assert res.cigar(False) == "1M"

    res = algn.align(b"CG", b"C")
    # one match + one trailing query base: gap-affine cost o+e = 8
    assert res.score == 8

    res = algn.align(b"ACTG", b"ACTGA")
    assert res.score == 8
    assert res.cigar(False) == "4M1I"
