"""Plot/debug-output parity with the reference's recorded tables.

The reference README records the full M-component plot for the global
example ACCATACTCG vs AGGATGCTCG (README.md:100-113, produced by
(*Aligner).Plot); the plot here must reproduce every cell.
"""

import io

from wfa_tpu import AdaptiveReductionOption, Options, OracleAligner, Penalties

# README.md:103-113 rows, cells only (arrow + score)
GOLDEN_GLOBAL_CELLS = [
    "⬊ 0|⟼ 8|🠦10|🠦12|.|.|.|.|.|.",
    "↧ 8|⬂ 4|⬂12|.|.|.|.|.|.|.",
    "🠧10|⬂12|⬂ 8|.|.|.|.|.|.|.",
    "🠧12|.|.|⬊ 8|.|.|.|.|.|.",
    ".|.|.|.|⬊ 8|.|.|.|.|.",
    ".|.|.|.|.|⬂12|.|.|.|.",
    ".|.|.|.|.|.|⬊12|.|.|.",
    ".|.|.|.|.|.|.|⬊12|.|.",
    ".|.|.|.|.|.|.|.|⬊12|.",
    ".|.|.|.|.|.|.|.|.|⬊12",
]


def test_plot_matches_reference_readme_table():
    a = OracleAligner(Penalties(4, 6, 2), Options(True),
                      AdaptiveReductionOption(10, 50, 1))
    q, t = b"ACCATACTCG", b"AGGATGCTCG"
    res = a.align(q, t)
    assert res.score == 12
    table = a.plot(q, t)
    lines = table.splitlines()
    assert len(lines) == 2 + len(q)
    for row, want in zip(lines[2:], GOLDEN_GLOBAL_CELLS):
        cells = [c.strip() for c in row.split("\t")[2:]]
        assert cells == want.split("|"), (cells, want)


def test_plot_not_change_to_match_keeps_origin_tags():
    a = OracleAligner(Penalties(4, 6, 2), Options(True), None)
    q, t = b"ACCATACTCG", b"AGGATGCTCG"
    a.align(q, t)
    plain = a.plot(q, t, not_change_to_match=True)
    assert "⬊ 0" in plain  # the seed match cell survives either way


def test_component_print_and_wavefront_str():
    a = OracleAligner(Penalties(4, 6, 2), Options(True), None)
    a.align(b"ACGT", b"AGGT")
    buf = io.StringIO()
    a.M.print(buf, "M")
    text = buf.getvalue()
    assert text.startswith("M0: k[")
    assert "k(0):" in text
    wf0 = a.M.wavefronts[0]
    assert str(wf0).startswith("k range: [")
