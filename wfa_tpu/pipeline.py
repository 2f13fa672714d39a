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
import os
from typing import Iterable, List, Optional, Sequence, Tuple

from .cigar import AlignmentResult
from .constants import (MAX_SEQ_LEN, AdaptiveReductionOption, EmptySeqError,
                        Options, Penalties, SeqTooLongError)
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
    # HBM budget for one in-flight batch's wavefront/aux tensors; bounds
    # the batch size for long sequences (S grows with length).  The
    # sizing models in _tier_caps are cautious (~1.5-2x true peak), so
    # 9 GiB of model leaves several GiB of true headroom on a 16 GiB
    # v5e chip; multi-GB batches additionally drain serially.  9 GiB is
    # what admits the rebased-aux kernel's single 128-lane block at
    # l=50k tier 0 (7.7 GiB of model) — the l=50k fast path.
    # WFA_HBM_BUDGET (MiB) overrides, for hardware experiments.
    hbm_budget: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get(
            "WFA_HBM_BUDGET", str((9 << 30) >> 20))) << 20)
    # data parallelism over the local (or, after
    # parallel.initialize_distributed, global) device mesh: 0 = all
    # available devices, 1 = single-device, n = first n devices
    n_devices: int = 0


class AlignmentPipeline:
    """Aligns arbitrary streams of pairs at batch throughput."""

    def __init__(self, cfg: PipelineConfig) -> None:
        self.cfg = cfg
        self._oracle = OracleAligner(cfg.penalties, cfg.options, cfg.adaptive)
        self._engines = {}
        self._device_errors = 0  # device-fault counter (see _device_fault)
        self._pool = None  # lazy drain ThreadPoolExecutor (_drain_pool)
        self._spool = None  # lazy submit ThreadPoolExecutor (_submit_pool)
        self._isem = None  # lazy in-flight count semaphore (_inflight_sem)
        # adaptive score-cap memory: bucket class -> max observed final
        # score in the most recent align_all that completed pairs there
        # (see _tier_caps)
        self._score_memory = {}
        import threading

        self._mem_cv = threading.Condition()  # in-flight byte gate
        self._mem_used = 0  # modeled bytes of submitted-not-yet-drained batches
        self._mesh = None
        if cfg.use_device:
            import jax

            n = cfg.n_devices or len(jax.devices())
            if n > 1:
                from .parallel import make_dp_mesh

                self._mesh = make_dp_mesh(n)

    # -- window/cap policy ---------------------------------------------------

    def _tier_caps(self, lq: int, lt: int, tier: int, skey=None):
        """(k_win, s_cap, w_win, batch_cap, engine) for a class/tier.

        ``skey`` names the bucket for the adaptive score-cap memory
        (observed max final score per bucket class, recorded by
        align_all): a high-error workload's first call learns that
        final scores reach ~0.92*l and every later call starts tier 0
        at a fitted cap instead of burning a doomed 0.55*l pass — the
        same feedback also SHRINKS caps (and with them the HBM models,
        so batches grow) for low-error workloads."""
        cfg = self.cfg
        full_span = _round_up(lq + lt - 1 + 2, 128)
        longest = max(lq, lt)
        semi2_s0 = None
        if not cfg.options.global_alignment:
            # semi-global seeds span the full diagonal range — but with
            # wf-adaptive on, the band collapses to tens of diagonals
            # once the best path pulls max_dist_diff ahead (measured
            # last wide row: <=38 at e=0.05, <=86 at e=0.1, <=166 at
            # e=0.2 for l<=1000).  The two-phase path (wfa_tpu.semi2)
            # runs that wide prefix exactly, then resumes the fused
            # kernel in a narrow window; the S0/k_win ladder covers
            # rising error rates, and the exact full-span engine remains
            # the final tier
            if cfg.adaptive is not None and full_span > 512 and tier <= 2:
                # prefix-length ladder: each tier's prefix must outlast
                # the measured band collapse for its error regime; the
                # escape probe keeps doomed tiers cheap.  Tier-0 S0=64:
                # at l=1000/e=0.05 S0=48 left 311/2048 pairs (15%) still
                # full-span-wide at the export (the late-collapse tail;
                # K2 256 vs 384 changed nothing), S0=64 leaves 2.4% —
                # worth the +33% prefix length.
                semi2_s0 = (64, 112, 200)[tier]
                k_win = (256, 512, 512)[tier]
            else:
                k_win = full_span  # exact final tier (and -a runs)
        elif cfg.adaptive is not None:
            # wf-adaptive trims the band to ~2*max_dist_diff around the
            # optimal path, whose diagonal drifts like a random walk —
            # measured whole-run extents: <=104 at l=1k, <=257 at l=50k
            # (20% error).  Tier 0 runs the tight window; escapees retry.
            band = 2 * (cfg.adaptive.max_dist_diff + 2)
            drift = int(0.75 * longest ** 0.5)
            k_win = min(full_span,
                        _round_up(max(cfg.k_win_base, band + drift), 128))
            if longest <= 4096:
                if tier == 1:
                    k_win = min(full_span, 4 * k_win)
                elif tier >= 2:
                    k_win = full_span
            # long sequences keep the tier-0 window: the optimal path's
            # diagonal drifts like a random walk (measured extent <= 257
            # at l=50k, e=0.2), and tier-0 escapes are usually streaming-
            # window outruns that resolve when the escapees regroup
        else:
            k_win = full_span
        # score ladder: ~0.29*l at 5% error, ~0.53*l at 10%, ~0.92*l at
        # 20% — tier 0 covers the common case, tier 1 heavy error rates
        worst = (
            cfg.penalties.mismatch * longest
            + cfg.penalties.gap_open
            + cfg.penalties.gap_ext * (abs(lq - lt) + 1)
            + 2
        )
        # a roomier tier 0 saves the two-pass cost for 10%-error
        # workloads (measured scores: 0.29*l at e=0.05, 0.53*l at e=0.1
        # — l=50k/e=0.1 finishes at 26.5k, so 0.35*l sent EVERY pair
        # through a doomed full-length tier-0 pass).  s_cap headroom is
        # nearly free in time (the loop exits when the batch finishes)
        # and the memory models bound the batch size by it.
        frac = 0.55
        s1 = max(cfg.s_cap_base, _round_up(int(longest * frac), 128))
        smax = self._score_memory.get(skey) if skey is not None else None
        if smax is not None:
            # fitted cap: observed workload max + 20% headroom for
            # batch-to-batch spread, quantized so the jit cache is
            # stable across calls; the ladder above it is unchanged
            # (a workload shift that outruns the fit retries a tier up,
            # and the memory re-learns from that call's results)
            s1 = max(cfg.s_cap_base,
                     _round_up(int(smax * 1.2) + 16, 128))
        s_cap = (s1, 3 * s1, _round_up(worst + 2, 8))[min(tier, 2)]
        s_cap = min(s_cap, _round_up(worst + 2, 8))
        # a single batch's aux tensors must stay well under HBM even at
        # a minimal batch (S rows cost 3 planes * B * K cells; 32 is the
        # long-read kernel's block size, the most memory-bound path)
        s_mem_max = (7 << 30) // (3 * 32 * k_win * 4)
        s_cap = min(s_cap, _round_up(s_mem_max, 8) - 8)
        if semi2_s0 is not None:
            # the phase-2 resume kernel pads its batch to 128 lanes, so
            # its int32 aux dump allocates 3*s_cap*k_win*4*128 bytes no
            # matter how few pairs are admitted — an uncapped tier-2
            # s_cap of 38k at k_win=512 compiled a 30 GB tensor on a
            # 16 GB chip.  Pairs whose scores exceed this cap finish on
            # the exact tiers / host oracle.
            s2_max = (cfg.hbm_budget // 2) // (3 * k_win * 4 * 128)
            s_cap = min(s_cap, _round_up(s2_max, 8) - 8)
        # long sequences: the Pallas kernel streams its own table
        # window; the JAX fallback (forced at the last tier so pairs that
        # outrun the streaming window still finish on device) reads a
        # w_win-word slice per step
        engine = "jax" if (longest > 4096 and tier >= 2) else "auto"
        # the main kernel's 128-lane block minimum makes its aux history
        # 3*s_cap*k_win*cell*128 bytes even for tiny batches; very long
        # reads route to the pairs-on-sublanes long-read kernel (whose
        # per-8-pair-group table windows also tolerate the cross-pair
        # progress spread those lengths develop), or the JAX engine
        # where no kernel applies
        cell_b = 2 if max(lq, lt) + k_win <= 4095 else 4
        pallas_ok = (engine != "jax" and cfg.options.global_alignment
                     and k_win <= 512)
        aux_w = k_win
        lw = (lq + lt) // 32 + 8
        # per-pair footprint model of the rebased-aux kernel (aux mult 7
        # carries VMEM/meta slack over the 6 B/cell history; the 24
        # B/word-cell table term covers the 2x build transient).  The
        # SAME model sizes b_cap below, so admission here guarantees at
        # least one whole padded 128-lane block fits the budget.
        pp_kw = lambda aw: s_cap * aw * 7 + k_win * lw * 24
        if pallas_ok and longest > 4096:
            # long reads: the main kernel's BLOCK-shared streaming table
            # window cannot cover the cross-pair progress spread these
            # lengths develop (measured outrun-overflows: 78/128 at
            # l=10k, 116/128 at l=20k, 113/128 at l=50k — the survivors
            # were the pairs nearest each block's minimum progress) —
            # the pairs-on-sublanes kernel's per-8-pair-group windows
            # can, so it IS the long-read fast path
            engine = "pallas_long"
        elif 3 * s_cap * k_win * cell_b * 128 > cfg.hbm_budget:
            engine = "jax"
        elif pallas_ok and cell_b == 4 and pp_kw(k_win) * 128 <= cfg.hbm_budget:
            # value-rebase alone (KW == k_win): int16 aux cells halve
            # the dominant history DMA stream for the narrow
            # just-past-int16 band (longest in (4095-k_win, 4096])
            engine = f"auto:kw{k_win}"
            cell_b = 2
        if longest <= 4096 and k_win <= 512:
            w_win = None
        elif longest <= 4096:
            # wide diagonal window (semi-global spans every diagonal) but
            # short sequences: window the per-step stop-table reads —
            # streaming the full tables would be hundreds of MB per step
            w_win = (32, 64, None)[min(tier, 2)]
        else:
            # only consumed by the JAX fallback engine (the Pallas kernel
            # streams its own window); retries regroup escapees, which
            # shrinks their progress spread
            w_win = (128, 256, 512)[min(tier, 2)]
        # bound the batch so one batch's device tensors fit the HBM budget
        pallas_likely = engine != "jax" and k_win <= 512
        # aux history dominates: 3 planes x s_cap x k_win cells of 2B
        # (pallas, 16-bit when offsets fit) or, for the JAX engine, six
        # int32 [S,B,K] state tensors (24B/cell) plus while-loop
        # temporaries and the stop-table build transients (measured: 26
        # underestimates at l=100k and crashes the TPU worker — a hard
        # fault, not a clean OOM)
        cell16 = max(lq, lt) + k_win <= 4095
        if semi2_s0 is not None:
            engine = f"semi2:{semi2_s0}"
            semi2_kernel = self._semi2_kernel_prefix(full_span)
            # only the Pallas kernel prefix pads the batch to 128-lane
            # blocks; the XLA prefix runs at the actual batch size (its
            # phase-2 padding term is a minor share of per_pair)
            blk = 128 if semi2_kernel else 1
            if semi2_kernel:
                # kernel prefix (pallas_prefix/EXPORT): no XLA state
                # tensors — the batch carries the int16/int32 aux_old
                # history, the v-space tables (x2 build transient), the
                # kernel state dump, then the phase-2 narrow aux.  The
                # gate IS _submit_semi2's decision (semi2.prefix_plan,
                # Ltb pessimistic) — modeling the kernel footprint
                # while the XLA prefix actually runs would overshoot
                # HBM by ~4x.
                cell = 2 if full_span + 2 <= 4095 else 4
                vw_words = min(1024, max(128, lq)) // 64 + 2
                # sizing upper bound: the submit pads Kf to a 512
                # multiple for KC=512 chunk tiles (semi2.prefix_kf)
                fs = _round_up(full_span, 512)
                per_pair = (3 * semi2_s0 * fs * cell
                            + 2 * 3 * vw_words * fs * 4
                            + 16 * fs * 4
                            + s_cap * k_win * 8 + k_win * lw * 24)
            else:
                # XLA prefix: six int32 [S0+1, B, Kf] state tensors
                # DOUBLE-BUFFERED by the while-loop carry (x48 B/cell),
                # the kept full-span aux history, the v-space stop
                # tables incl. their build transient (measured: the 8
                # B/word-cell model admitted a batch whose compile
                # wanted 19.8 GB on a 15.75 GB chip at l=10k), then the
                # phase-2 narrow aux
                per_pair = ((semi2_s0 + 1) * full_span * 48
                            + 3 * semi2_s0 * full_span * 4
                            + full_span * lw * 20
                            + s_cap * k_win * 8 + k_win * lw * 24)
        elif engine == "pallas_long":
            # value-rebased int16 aux at any length (pallas_longread).
            # mult 7 over the 6 B/cell history covers the aux_base rows
            # and VMEM slack; the table term's 24 B/word-cell covers the
            # build transient (true l=50k peak ≈ 65 MB/pair vs 76
            # modeled) — mult 8 needlessly split 128-pair batches
            mult, blk = 7, 64
            per_pair = s_cap * k_win * mult + k_win * lw * 24
        elif pallas_likely:
            # rebased-aux engines (auto:kw) stream aux_w-row int16 rows
            mult, blk = (7 if (cell16 or engine.startswith("auto:kw"))
                         else 13), 128
            per_pair = s_cap * aux_w * mult + k_win * lw * 24
        else:
            mult, blk = 40, 32
            per_pair = s_cap * k_win * mult + k_win * lw * 24
        # floor 1, not a fixed minimum: a per-pair footprint near (or
        # over) the whole budget must shrink the batch to a single pair
        # rather than admit a guaranteed-OOM batch (semi-global XLA
        # prefix at l=50k models ~2.6 GB/pair)
        b_cap = max(1, min(8192, int(cfg.hbm_budget // max(per_pair, 1))))
        if b_cap >= blk:
            b_cap -= b_cap % blk  # keep batches a whole number of blocks
        # device footprint of one ACTUAL batch (pallas pads to 128-lane
        # blocks).  Moderate batches overlap under the in-flight byte
        # gate (_mem_acquire: submits block while outstanding model
        # bytes would exceed hbm_budget); batches over half the budget
        # run serially — even two of those in flight risk the HBM hard
        # fault
        bs = min(self.cfg.batch_size, b_cap)
        eff_b = max(bs, blk) if pallas_likely else bs
        batch_bytes = per_pair * eff_b
        serial = batch_bytes > max(2 << 30, self.cfg.hbm_budget // 2)
        return k_win, s_cap, w_win, b_cap, engine, serial, batch_bytes

    def _semi2_kernel_prefix(self, full_span: int) -> bool:
        """Whether _submit_semi2 will run the Pallas kernel prefix for
        this class — the SAME semi2.prefix_plan the submit calls, with
        Ltb estimated as the full span (an upper bound; the gates are
        monotone in Ltb, so this can only false-negative — never model
        the small kernel footprint while the big XLA prefix runs)."""
        from .engine import EngineConfig
        from .semi2 import prefix_plan

        kcfg = EngineConfig(
            penalties=self.cfg.penalties, global_alignment=False,
            adaptive=self.cfg.adaptive, k_win=full_span, s_cap=8)
        return prefix_plan(kcfg, full_span, full_span)[0]

    def _engine(self, k_win: int, s_cap: int, w_win, engine) -> BatchAligner:
        key = (k_win, s_cap, w_win, engine)
        eng = self._engines.get(key)
        if eng is None:
            eng = BatchAligner(
                self.cfg.penalties,
                self.cfg.options,
                self.cfg.adaptive,
                k_win=k_win,
                s_cap=s_cap,
                w_win=w_win,
                engine=engine,
                mesh=self._mesh,
            )
            self._engines[key] = eng
        return eng

    # -- main entry ------------------------------------------------------------

    def align_all(
        self, pairs: Sequence[Tuple[bytes, bytes]]
    ) -> List[AlignmentResult]:
        """Align pairs, returning results in input order."""
        pairs = list(pairs)
        results: List[Optional[AlignmentResult]] = [None] * len(pairs)
        # per-pair input guards (reference: per-call errors, wfa.go:204-209;
        # SURVEY §5: a bad pair must not poison the batch) — invalid pairs
        # become error-carrying results, the rest proceed normally
        valid: List[Tuple[int, Tuple[bytes, bytes]]] = []
        for i, (q, t) in enumerate(pairs):
            if len(q) == 0 or len(t) == 0:
                results[i] = AlignmentResult.failed(
                    EmptySeqError("wfa: invalid empty sequence"))
            elif len(q) > MAX_SEQ_LEN or len(t) > MAX_SEQ_LEN:
                results[i] = AlignmentResult.failed(SeqTooLongError(
                    f"wfa: sequences longer than {MAX_SEQ_LEN} are not "
                    "supported"))
            else:
                valid.append((i, (q, t)))
        if not self.cfg.use_device:
            for i, (q, t) in valid:
                results[i] = self._oracle.align(q, t)
            return results  # type: ignore[return-value]

        buckets = bucket_pairs(valid)
        # device-fault budget is per call: transient tunnel/worker errors
        # (which self-recover in minutes) must not permanently disable
        # the device for a pipeline that lives across a whole run
        self._device_errors = 0
        # one work-list per bucket, retried through up to 3 cap tiers.
        # All batches of a tier are submitted before any is collected,
        # and a small drain pool fetches+decodes finished batches on
        # worker threads WHILE the main thread keeps packing/submitting —
        # batch N's device->host transfers and Python decode overlap
        # batch N+1's host pack and the device's compute (the GIL is
        # released during the native pack, jax dispatch, and blocking
        # device_get waits, which is where nearly all the wall time is).
        pending = {key: items for key, items in buckets.items()}
        pool = self._drain_pool()
        prev_caps = {}  # bucket -> previous tier's caps (skip repeats)
        score_seen = {}  # bucket -> max final score observed this call
        for tier in (0, 1, 2, 3):
            if self._device_errors >= 2:
                break  # device unhealthy — finish on the host oracle
            # inflight items: (bucket_key, chunk, out) with out either a
            # finished result list or a Future resolving to one
            inflight = []
            counted = set()  # futures whose device fault is already tallied
            submit_futs = []  # outstanding async submits (serial fence)
            for (lq_c, lt_c), items in pending.items():
                if not items:
                    continue
                # caps follow the bucket's ACTUAL maxima, not the padded
                # class label (power-of-two classes inflate 50k to 64k,
                # and with it every score cap and memory bound)
                lq_max = max(len(p[0]) for _, p in items)
                lt_max = max(len(p[1]) for _, p in items)
                caps = self._tier_caps(lq_max, lt_max, tier,
                                       skey=(lq_c, lt_c))
                if (prev_caps.get((lq_c, lt_c)) == caps
                        and self._device_errors == 0):
                    # the ladder has nothing wider for this bucket (the
                    # global ladder tops out a tier early) — retrying
                    # identical caps cannot succeed, go to the fallback.
                    # (A device FAULT, by contrast, is retryable at the
                    # same caps — hence the fault-free gate.)
                    inflight.append(((lq_c, lt_c), items, [None] * len(items)))
                    continue
                prev_caps[(lq_c, lt_c)] = caps
                k_win, s_cap, w_win, b_cap, engine, serial, batch_bytes = caps
                eng = self._engine(k_win, s_cap, w_win, engine)
                bs = min(self.cfg.batch_size, b_cap)
                n_chunks = (len(items) + bs - 1) // bs
                probe = tier < 3 and n_chunks > 1
                # the probe (does this tier's cap ladder fit the
                # workload at all?) drains ASYNCHRONOUSLY: submission
                # keeps going while it computes (non-blocking done()
                # checks), so the common all-good case pays ZERO serial
                # stall; only past probe_hard chunks does an unresolved
                # probe block — a bad probe then only wastes the
                # already-submitted chunks
                probe_hard = min(8, n_chunks - 1)
                probe_fut = None
                skip_rest = False
                for ci in range(n_chunks):
                    chunk = items[ci * bs : (ci + 1) * bs]
                    if skip_rest or self._device_errors >= 2:
                        # probe said this tier's caps don't fit the
                        # workload (or the device died) — push on
                        inflight.append(
                            ((lq_c, lt_c), chunk, [None] * len(chunk)))
                        continue
                    # per-CHUNK footprint: batch_bytes models a full bs
                    # batch, but tail/retry chunks (tier escapees) are
                    # often far smaller — a ~100-pair semi tier-1 batch
                    # must not serialize the whole call behind a 5.7 GB
                    # full-batch model.  Scale by the actual chunk
                    # (floored at the 128-lane pad so padded kernels
                    # aren't under-modeled).
                    if len(chunk) < bs:
                        eff = max(len(chunk), min(bs, 128))
                        cb = int(batch_bytes * eff / max(bs, 1))
                    else:
                        cb = batch_bytes
                    # only two-phase semi-global batches ever need the
                    # serial path: their phase-1 exports persist on
                    # device between the phases, so two multi-GB
                    # batches in flight really do coexist in HBM.
                    # Single-phase programs allocate their temp arena
                    # per execution (serial device stream — verified
                    # empirically), so overlapping l=50k batches is
                    # safe and hides each batch's pack/upload/fetch
                    # behind the previous batch's compute.
                    serial_c = (engine.startswith("semi2")
                                and cb > max(2 << 30,
                                             self.cfg.hbm_budget // 2))
                    try:
                        if serial_c:
                            # multi-GB configs submit + drain serially —
                            # fence the async submits first so two
                            # multi-GB programs never overlap in HBM
                            for f in submit_futs:
                                try:
                                    f.result()
                                except RuntimeError:
                                    pass  # tallied by its drain future
                            submit_futs.clear()
                            handle = eng.submit_batch(
                                [p for _, p in chunk])
                            out = eng.finish_batch(handle, fallback=False)
                            inflight.append(((lq_c, lt_c), chunk, out))
                            if probe and ci == 0:
                                n_bad = sum(r is None for r in out)
                                skip_rest = n_bad * 10 >= len(out) * 9
                            continue
                        # pack+upload+dispatch all run on submit
                        # workers (the native packer and the blocking
                        # upload both release the GIL, so workers
                        # parallelize cleanly and the main thread stays
                        # free to keep the queue full).  The byte gate
                        # blocks here while too many batches' modeled
                        # EXECUTION arenas are still pending (program
                        # temp memory lives from dispatch until the
                        # outputs land — an unbounded pile-up is an HBM
                        # hard fault); drained-but-undecoded batches
                        # hold only their small input/output buffers
                        chunk_pairs = [p for _, p in chunk]
                        # single-phase batches only HOLD their small
                        # input/output buffers between dispatch and
                        # drain: the device executes programs serially
                        # and allocates each program's temp arena at
                        # execution (verified empirically: 10 queued
                        # batches of 1.6 GB modeled arena ran clean), so
                        # the byte gate reserves a generous buffer model
                        # and an in-flight COUNT cap bounds the queue.
                        # Two-phase semi-global batches reserve their
                        # full model: their phase-1 exports genuinely
                        # persist on device across the host mid-point.
                        hold = (cb if engine.startswith("semi2")
                                else min(cb, cb // 256 + (16 << 20)))
                        self._inflight_sem().acquire()
                        self._mem_acquire(hold)
                        owned = False
                        try:
                            sub = self._submit_pool().submit(
                                eng.submit_batch, chunk_pairs, None)
                            submit_futs.append(sub)
                            fut = pool.submit(
                                self._drain_from, eng, sub, hold)
                            owned = True
                        finally:
                            if not owned:
                                self._mem_release(hold)
                                self._inflight_sem().release()
                        inflight.append(((lq_c, lt_c), chunk, fut))
                        if probe and ci == 0:
                            probe_fut = fut
                    except RuntimeError as exc:  # device fault (SURVEY
                        # §5): a crashed TPU worker / dead tunnel raises
                        # jax runtime errors (RuntimeError subclasses);
                        # the chunk re-queues, and after repeated faults
                        # the remaining work finishes on the host oracle.
                        # Host-side programming errors (TypeError/
                        # ValueError) propagate — silently rerouting them
                        # to the oracle would hide real bugs.
                        self._device_fault(exc)
                        inflight.append(
                            ((lq_c, lt_c), chunk, [None] * len(chunk)))
                        continue
                    if probe_fut is not None and (
                            probe_fut.done() or ci >= probe_hard):
                        try:
                            out = probe_fut.result()
                        except RuntimeError as exc:
                            self._device_fault(exc)
                            counted.add(probe_fut)
                            probe_fut = None
                            continue
                        probe_fut = None
                        n_bad = sum(r is None for r in out)
                        skip_rest = n_bad * 10 >= len(out) * 9
            nxt = {key: [] for key in pending}
            for key, chunk, item in inflight:
                if isinstance(item, list):
                    out = item
                else:
                    try:
                        out = item.result()
                    except RuntimeError as exc:
                        if item not in counted:
                            self._device_fault(exc)
                        out = [None] * len(chunk)
                mx = score_seen.get(key, -1)
                for (idx, pair), res in zip(chunk, out):
                    if res is None:
                        nxt[key].append((idx, pair))
                    else:
                        results[idx] = res
                        if res.score > mx:
                            mx = res.score
                if mx >= 0:
                    score_seen[key] = mx
            pending = nxt
        for items in pending.values():  # final exact fallback
            for idx, (q, t) in items:
                results[idx] = self._oracle.align(q, t)
        # refresh the adaptive score-cap memory from this call's actual
        # score distribution (replace, not max-merge: a shift to easier
        # workloads must shrink the fitted caps again)
        for key, mx in score_seen.items():
            self._score_memory[key] = mx
        return results  # type: ignore[return-value]

    # -- threaded drain --------------------------------------------------------

    def _drain_pool(self):
        """Lazy worker pool that fetches and decodes finished batches.

        Each drain is dominated by the tunnel's fixed ~26 ms round trip
        (GIL released), with only a few ms of Python decode — so several
        workers overlap round trips without meaningful GIL contention.
        WFA_DRAIN_WORKERS overrides for hardware experiments."""
        pool = self._pool
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=int(os.environ.get("WFA_DRAIN_WORKERS", "4")),
                thread_name_prefix="wfa-drain")
            self._pool = pool
        return pool

    def _submit_pool(self):
        """Lazy submit pool for pack+upload+dispatch (uploads through
        the tunnel block, so they get their own lane).

        THREE workers off-mesh: each runs a full pack+upload+dispatch
        (all GIL-releasing), so three overlap one another's blocking
        uploads AND the two-phase semi-global submit's host mid-point
        (meta1 fetch + target re-placement) during which the device
        would otherwise idle.  Under a mesh ONE worker keeps the
        dispatch order deterministic (multi-host shard_map requires
        every process to enqueue the same programs in the same
        order)."""
        pool = self._spool
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            n = (1 if self._mesh is not None
                 else int(os.environ.get("WFA_SUBMIT_WORKERS", "3")))
            pool = ThreadPoolExecutor(
                max_workers=n, thread_name_prefix="wfa-submit")
            self._spool = pool
        return pool

    def _inflight_sem(self):
        """Lazy in-flight batch COUNT cap: bounds how many batches may
        sit between dispatch and drain at once (the byte gate bounds
        their held buffers; this bounds runtime queue growth).
        WFA_MAX_INFLIGHT overrides for hardware experiments."""
        sem = self._isem
        if sem is None:
            import threading

            sem = threading.BoundedSemaphore(
                int(os.environ.get("WFA_MAX_INFLIGHT", "8")))
            self._isem = sem
        return sem

    @staticmethod
    def _drain_one(eng: BatchAligner, handle):
        """Worker-thread body: fetch a submitted batch and decode it."""
        return eng.finish_tokens(eng.finish_small(handle), fallback=False)

    def _drain_from(self, eng: BatchAligner, sub_fut, hold: int):
        """Drain a batch whose submit ran async: wait for the submit
        handle, then fetch + decode (submit-side device faults surface
        here and are handled exactly like drain-side ones).  Releases
        the batch's byte reservation and in-flight slot when its device
        buffers are deleted (or its submit/drain failed)."""
        try:
            return self._drain_one(eng, sub_fut.result())
        finally:
            self._mem_release(hold)
            self._inflight_sem().release()

    # -- in-flight device-memory gate ------------------------------------------

    def _mem_acquire(self, nbytes: int) -> None:
        """Block until `nbytes` more of modeled device memory fits the
        HBM budget (at least one batch is always admitted)."""
        with self._mem_cv:
            while (self._mem_used > 0
                   and self._mem_used + nbytes > self.cfg.hbm_budget):
                self._mem_cv.wait()
            self._mem_used += nbytes

    def _mem_release(self, nbytes: int) -> None:
        with self._mem_cv:
            self._mem_used -= nbytes
            self._mem_cv.notify_all()

    def _device_fault(self, exc: Exception) -> None:
        """Record a device-side failure (worker crash, OOM, comms)."""
        import sys

        self._device_errors += 1
        print(f"wfa-tpu: device error ({exc}); "
              f"{'falling back to host oracle' if self._device_errors >= 2 else 'retrying'}",
              file=sys.stderr)

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
