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
    # "align-region" output format, and the recorded M-score table in the
    # very same README section — pre-extension offset 8 at the ⟼16 cell —
    # is only consistent with the current code's path below).  The current
    # reference code (wfa.go:703-983) produces this equal-score CIGAR:
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
