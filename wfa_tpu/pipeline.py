"""High-throughput alignment pipeline: bucketing + tiered window retry.

This is the framework's batching orchestrator (the reference has none —
its CLI aligns one pair at a time, wfa-go.go:166-178).  Pairs are grouped
into length classes (one jit compilation per class), run through the
device engine with economical window caps, and the rare pairs whose band
or score overflows are retried with larger caps before falling back to
the exact host oracle.  Results always come back in input order and are
bit-identical to the oracle regardless of which tier served them.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

from .cigar import AlignmentResult
from .constants import AdaptiveReductionOption, Options, Penalties
from .engine import BatchAligner
from .io import bucket_pairs
from .oracle import Aligner as OracleAligner


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    penalties: Penalties = Penalties()
    options: Options = Options()
    adaptive: Optional[AdaptiveReductionOption] = None
    batch_size: int = 512
    use_device: bool = True
    # base score cap per unit of sequence length (tier 1); tier 2 multiplies
    s_cap_base: int = 256
    k_win_base: int = 128


class AlignmentPipeline:
    """Aligns arbitrary streams of pairs at batch throughput."""

    def __init__(self, cfg: PipelineConfig) -> None:
        self.cfg = cfg
        self._oracle = OracleAligner(cfg.penalties, cfg.options, cfg.adaptive)
        self._engines = {}

    # -- window/cap policy ---------------------------------------------------

    def _tier_caps(self, lq: int, lt: int, tier: int) -> Tuple[int, int]:
        """(k_win, s_cap) for a length class at a retry tier."""
        cfg = self.cfg
        full_span = _round_up(lq + lt - 1 + 2, 128)
        if not cfg.options.global_alignment:
            # semi-global seeds span the full diagonal range
            k_win = full_span
        elif cfg.adaptive is not None:
            # wf-adaptive trims the band to ~2*max_dist_diff; measured
            # whole-run diagonal extents stay within ~2*(max_dist_diff+2)
            # even at 20% error, so tier 0 runs the tight window and the
            # rare escapees retry wider
            band = 2 * (cfg.adaptive.max_dist_diff + 2)
            k_win = min(full_span, _round_up(max(cfg.k_win_base, band), 128))
            if tier == 1:
                k_win = min(full_span, 4 * k_win)
            elif tier >= 2:
                k_win = full_span
        else:
            k_win = full_span
        longest = max(lq, lt)
        s1 = max(cfg.s_cap_base, _round_up(longest // 2, 128))
        if tier == 0:
            s_cap = s1
        else:
            # worst case: every base mismatches plus one gap run
            worst = (
                cfg.penalties.mismatch * longest
                + cfg.penalties.gap_open
                + cfg.penalties.gap_ext * (abs(lq - lt) + 1)
                + 2
            )
            s_cap = min(4 * s1 if tier == 1 else worst + 2, worst + 2)
        return k_win, s_cap

    def _engine(self, k_win: int, s_cap: int) -> BatchAligner:
        key = (k_win, s_cap)
        eng = self._engines.get(key)
        if eng is None:
            eng = BatchAligner(
                self.cfg.penalties,
                self.cfg.options,
                self.cfg.adaptive,
                k_win=k_win,
                s_cap=s_cap,
            )
            self._engines[key] = eng
        return eng

    # -- main entry ------------------------------------------------------------

    def align_all(
        self, pairs: Sequence[Tuple[bytes, bytes]]
    ) -> List[AlignmentResult]:
        """Align pairs, returning results in input order."""
        pairs = list(pairs)
        if not self.cfg.use_device:
            return [self._oracle.align(q, t) for q, t in pairs]

        results: List[Optional[AlignmentResult]] = [None] * len(pairs)
        buckets = bucket_pairs(pairs)
        # one work-list per bucket, retried through up to 3 cap tiers;
        # all batches of a tier are submitted before any is fetched, so
        # the device pipeline stays full (dispatch latency is hidden).
        pending = {key: items for key, items in buckets.items()}
        for tier in (0, 1, 2):
            inflight = []
            for (lq_c, lt_c), items in pending.items():
                if not items:
                    continue
                k_win, s_cap = self._tier_caps(lq_c, lt_c, tier)
                eng = self._engine(k_win, s_cap)
                bs = self.cfg.batch_size
                for start in range(0, len(items), bs):
                    chunk = items[start : start + bs]
                    handle = eng.submit_batch([p for _, p in chunk])
                    inflight.append(((lq_c, lt_c), eng, chunk, handle))
            nxt = {key: [] for key in pending}
            for key, eng, chunk, handle in inflight:
                out = eng.finish_batch(handle, fallback=False)
                for (idx, pair), res in zip(chunk, out):
                    if res is None:
                        nxt[key].append((idx, pair))
                    else:
                        results[idx] = res
            pending = nxt
        for items in pending.values():  # final exact fallback
            for idx, (q, t) in items:
                results[idx] = self._oracle.align(q, t)
        return results  # type: ignore[return-value]

    def align_iter(
        self, pairs: Iterable[Tuple[bytes, bytes]], chunk: int = 4096
    ) -> Iterable[AlignmentResult]:
        """Streaming wrapper: buffers `chunk` pairs, aligns, yields in order."""
        buf: List[Tuple[bytes, bytes]] = []
        for pair in pairs:
            buf.append(pair)
            if len(buf) >= chunk:
                yield from self.align_all(buf)
                buf.clear()
        if buf:
            yield from self.align_all(buf)
