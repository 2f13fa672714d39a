"""Long-read Pallas kernel: pairs-on-SUBLANES score loop.

The main kernel (wfa_tpu.pallas_engine) runs 128 pair lanes per block —
4-5x faster per pair at short/medium lengths, but its aux history costs
``3 * s_cap * k_win * 128`` cells even for tiny batches, which exceeds
HBM for very long reads (l=50k+ needs s_cap in the tens of thousands).
This kernel keeps the previous pairs-on-sublanes layout whose blocks
shrink to 8 pairs, making it the fast device path for long reads; the
pipeline routes between the two by the aux-size budget (pipeline
_tier_caps), and both produce bit-identical results.

Design notes (shared with the main kernel; see its docstring): the
reference's entire per-pair score loop — extend (wfa.go:381-458),
termination (wfa.go:235-239), wf-adaptive reduce (wfa.go:461-540) and
next (wfa.go:549-700) — runs as ONE Pallas kernel invocation per batch,
with every per-step data structure resident in VMEM:

* the *stop tables* (precomputed extension bitmasks, see
  ``engine._stop_tables``) live in VMEM for the whole block, so the
  match-run (LCP) of every live diagonal is ONE masked pass + clz per
  score step — no HBM traffic, no gathers, no data-dependent inner loop;
* the sliding window of wavefronts that ``next`` reads (the last
  ``max(x, o+e)+1`` scores of M and ``e+1`` of I/D) is a circular VMEM
  buffer;
* the full packed-cell history that the backtrace needs is streamed out
  to HBM with double-buffered async DMA in CH-score chunks, overlapping
  compute;
* each block of ``B_BLK`` pairs iterates in lockstep but terminates as
  soon as *its own* pairs are done, independent of the rest of the batch.

Cells keep the reference encoding ``offset << 3 | tag`` (0 = absent,
wfa_wavefront.go:44/93), and the kernel maintains the invariant that a
cell outside its wavefront's live band [lo, hi] is zero, so downstream
consumers (device backtrace, semi-global end finder) need only the cell
values — per-score band arrays never leave the chip.

The JAX lockstep engine (wfa_tpu.engine) computes identical results and
remains the fallback for configurations the kernel does not support
(huge diagonal windows / penalties; see ``supports``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import (
    T_DEL_EXT,
    T_DEL_OPEN,
    T_INS_EXT,
    T_INS_OPEN,
    T_MISMATCH,
    TYPE_BITS,
)
from .engine import EngineConfig, _seed_rows, _stop_tables

_BIG = np.int32(1 << 30)

B_BLK = 64  # pairs per kernel block (sublane tiles); int16 rebased aux
# halves the per-block HBM footprint that used to cap this at 32
CH = 8  # history scores per output DMA chunk
_NP = 16  # packed per-pair parameter columns


def _block_sizing(S: int, K: int, B=None):
    """(bb_pad, bb, wv): kernel block size and stop-table VMEM window.

    Single source of truth for pallas_run_batch and the supports() VMEM
    gate — a desync between the two reintroduces hardware-only compile
    failures.  ``bb_pad`` is the block multiple the batch is padded to
    (the pre-shrink size); ``bb`` the executed block; ``wv`` the table
    window (groups; see the inline budget note).  ``B`` = batch size;
    None (the gate) models the largest block the sizing can produce."""
    bb = B_BLK
    while bb > 8 and S * K * bb * 6 > (6 << 30):
        bb //= 2
    bb_pad = bb
    # shrink for small batches so block padding stops wasting work
    # (6 B/cell: 3 int16 aux planes).  Do NOT shrink merely for deep
    # s_cap: the step cost is latency-bound, nearly flat in bb
    # (measured bb=32 vs 64 at l=50k: ~same s/step), so halving the
    # block halves per-pair throughput.
    while bb > 8 and B is not None and B <= bb // 2:
        bb //= 2
    # ~18MB of table window: with per-8-pair-group windows the spread a
    # window must cover is the group's, and wv bounds the tolerable
    # within-group progress spread (wv * 64 bases).  Measured at
    # l=50k/e=0.05 (bb=64, K=384): wv=32 left 14/64 outruns, wv=64 left
    # ZERO, and the step cost was flat in wv (0.181 -> 0.187 s/block
    # run) — the select chain is not the step cost driver, so buy the
    # widest window VMEM affords.
    wv = min(64, max(16, (18 << 20) // (3 * bb * K * 4)))
    return bb_pad, bb, wv


def _vmem_bytes(bb: int, wv: int, S: int, K: int, p, stream: bool = True,
                Lw2: int = 0) -> int:
    """Total declared VMEM for one block: mirrors pallas_run_batch's
    scratch_shapes plus its VMEM-blocked in/out specs, so the supports()
    gate tracks the real allocation when either list changes."""
    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    twv = wv if stream else 1
    shapes = [
        # scratch_shapes
        (WM * bb * K, 4), (WE * bb * K, 4), (WE * bb * K, 4),
        (2 * bb * K, 4), (2 * bb * K, 4), (2 * bb * K, 4),
        (2 * CH * bb * K, 2), (2 * CH * bb * K, 2), (2 * CH * bb * K, 2),
        (bb * twv * K, 4), (bb * twv * K, 4), (bb * twv * K, 4),
        (S * bb, 4),
        # VMEM-blocked in/out specs: params, seed rows, out, aux_base
        (bb * _NP, 4), (bb * K, 4), (bb * K, 4),
        (bb * 8, 4), (bb * S, 4),
    ]
    if not stream:
        shapes += [(bb * Lw2 * K, 4)] * 3
    return sum(n * w for n, w in shapes)


def supports(cfg: EngineConfig, Ltb: int, interpret: bool = False) -> bool:
    """Whether the fused kernel handles this config (else JAX fallback).

    ``Ltb`` is the padded target-buffer length (0 = unknown: check only
    the length-independent constraints).  ``interpret`` skips the
    hardware scoped-VMEM gate (the 100MB cap is hardware-only; CPU
    tests/fuzz should still exercise deep-s_cap configs)."""
    p = cfg.penalties
    wm = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    if wm > 64 or p.gap_ext + 1 > 64:
        return False
    if cfg.k_win > 512:  # VMEM budget for the stop tables
        return False
    if not cfg.global_alignment:
        # global-only by design: semi-global runs the main kernel
        # (fused end finder) or the XLA engine for wide spans
        return False
    if cfg.s_cap % CH != 0:
        return False
    if interpret:
        return True
    # scratch VMEM must fit the lifted 100MB cap (v5e VMEM is 128MB):
    # model the run's block sizing (shared _block_sizing) and require
    # 2x the summed declared VMEM — measured Mosaic stack transients
    # run ~2x the declared refs (30.4M total vs 15.9M declared at
    # S=51k, K=384).  Oversize configs (deep s_cap at l~100k+) take the
    # JAX fallback instead of failing at hardware compile time.
    # stream=True models the larger table window (non-stream Lw2 <= wv).
    S, K = cfg.s_cap, cfg.k_win
    _, bb, wv = _block_sizing(S, K)
    if 2 * _vmem_bytes(bb, wv, S, K, p, stream=True) > (96 << 20):
        return False
    # any length is fine: when the stop tables outgrow VMEM the kernel
    # streams a sliding window of them from HBM
    return True


def _iota(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(
    params_ref, whi_ref, wlo_ref, fsa_ref, seed0_ref, seedx_ref,
    out_ref, aux_ref, base_ref,
    m_win, i_win, d_win, am_win, ai_win, ad_win,
    ob_m, ob_i, ob_d, sem, twhi, twlo, tfsa, tsem, sb,
    *, S, K, Lw2, WV, BB, X, OE, E, GLOBAL, REDUCE_ON, MIN_WF_LEN,
    MAX_DIST_DIFF,
):
    # Aux cells stream VALUE-REBASED: per (pair, score) the minimum live
    # pre-extension offset is subtracted (stored +1 so a stored 0 keeps
    # meaning absent and a true offset0 == 0 survives as exactly 1-base),
    # and the per-row bases ride the [S, BB] base_ref output.  Offsets
    # within one row spread by at most the band width + max_dist_diff —
    # far below 12 bits — so the history is int16 at ANY read length
    # (absolute offsets at l=50k+ need 17 bits), halving the dominant
    # DMA stream and the HBM footprint that caps the block size.
    cell_dtype = jnp.int16
    STREAM = Lw2 > WV  # stop tables stay in HBM; a WV-group window
    # slides through VMEM as the block's offsets advance
    WM = max(X, OE) + 1
    WE = E + 1
    WB = 64  # band-slot lanes (>= WM, WE)
    blk = pl.program_id(0)

    prm = params_ref[:]  # [BB, _NP]
    qlen = prm[:, 0:1]
    tlen = prm[:, 1:2]
    toff = prm[:, 2:3]
    j_ak = prm[:, 3:4]
    ovf0 = prm[:, 4:5]
    lo0 = prm[:, 5:6]
    hi0 = prm[:, 6:7]
    ex0 = prm[:, 7:8]
    lox = prm[:, 8:9]
    hix = prm[:, 9:10]
    exx = prm[:, 10:11]
    ak = prm[:, 11:12]

    k0 = -toff
    ks = k0 + _iota((BB, K), 1)  # [BB, K] diagonal of each column
    lane_k = _iota((BB, K), 1)
    lane_b = _iota((BB, WB), 1)

    # ---- init windows & band slots (seeding, wfa.go:143-184) ----
    # windows are FLATTENED 2-D [slots*BB, K]: dynamic-slot access on
    # 3-D VMEM refs relayouts per load/store — 2-D sublane slices with
    # computed starts are near-free (the main kernel's pattern)
    m_win[...] = jnp.zeros((WM * BB, K), jnp.int32)
    i_win[...] = jnp.zeros((WE * BB, K), jnp.int32)
    d_win[...] = jnp.zeros((WE * BB, K), jnp.int32)
    m_win[pl.ds(0, BB)] = seed0_ref[:]
    if 0 < X < WM:
        m_win[pl.ds(X * BB, BB)] = seedx_ref[:]
    # aux plane (backtrace pre-extension offsets): seed cells have no
    # sources (the reference's from-itself break), so their aux value is
    # just the tag bits
    am_win[...] = jnp.zeros((2 * BB, K), jnp.int32)
    ai_win[...] = jnp.zeros((2 * BB, K), jnp.int32)
    ad_win[...] = jnp.zeros((2 * BB, K), jnp.int32)
    am_win[pl.ds(0, BB)] = seed0_ref[:] & 7

    def band_init(lo_v, hi_v, ex_v, slot):
        sel = lane_b == slot
        return (
            jnp.where(sel, lo_v, _BIG),
            jnp.where(sel, hi_v, -_BIG),
            jnp.where(sel, ex_v, 0),
        )

    m_lo, m_hi, m_ex = band_init(lo0, hi0, ex0, 0)
    if 0 < X:
        sel = lane_b == X
        m_lo = jnp.where(sel, lox, m_lo)
        m_hi = jnp.where(sel, hix, m_hi)
        m_ex = jnp.where(sel, exx, m_ex)
    i_lo = jnp.full((BB, WB), _BIG, jnp.int32)
    i_hi = jnp.full((BB, WB), -_BIG, jnp.int32)
    i_ex = jnp.zeros((BB, WB), jnp.int32)
    d_lo, d_hi, d_ex = i_lo, i_hi, i_ex

    def slot_read(arr, slot):
        """[BB, WB] band array -> [BB, 1] value at lane `slot`."""
        return jnp.sum(jnp.where(lane_b == slot, arr, 0), axis=1,
                       keepdims=True)

    def slot_write(arr, slot, val):
        return jnp.where(lane_b == slot, val, arr)

    def src_read(win, lo_a, hi_a, ex_a, s2, diff, W):
        """Fused KRange (wfa_component.go:91-101, with its (0,0) fallback)
        + GetAfterDiff row read (wfa_component.go:158) for one source."""
        sp = s2 - diff
        okd = sp >= 0
        slot = lax.rem(jnp.maximum(sp, 0), W)
        sel = lane_b == slot
        lo_sp = jnp.sum(jnp.where(sel, lo_a, 0), axis=1, keepdims=True)
        hi_sp = jnp.sum(jnp.where(sel, hi_a, 0), axis=1, keepdims=True)
        ex_sp = (jnp.sum(jnp.where(sel, ex_a, 0), axis=1,
                         keepdims=True) > 0) & okd
        lo_kr = jnp.where(ex_sp, lo_sp, 0)
        hi_kr = jnp.where(ex_sp, hi_sp, 0)
        row = win[pl.ds(slot * BB, BB)]  # [BB, K]
        found = ex_sp & (ks >= lo_sp) & (ks <= hi_sp) & (row > 0)
        # masked PACKED value: tags are 1..6, so pv > 0 <=> found and
        # pv >> TYPE_BITS is the offset — one tensor carries both through
        # the k+-1 shifts (half the lane-rolls of shifting (offset, found))
        return lo_kr, hi_kr, jnp.where(found, row, 0)

    def shift_km1(row):
        r = pltpu.roll(row, 1, axis=1)
        return jnp.where(lane_k == 0, 0, r)

    def shift_kp1(row):
        r = pltpu.roll(row, K - 1, axis=1)
        return jnp.where(lane_k == K - 1, 0, r)

    def hist_dma(comp, ob, c):
        # destination: component plane `comp` of the combined backtrace
        # aux tensor int32[3, S, B, K] (offset0 << 3 | tag per cell;
        # plane-major so each DMA row is contiguous)
        slot = lax.rem(c, 2)
        return pltpu.make_async_copy(
            ob.at[pl.ds(slot * CH, CH)],
            aux_ref.at[comp, pl.ds(c * CH, CH), pl.ds(blk * BB, BB)],
            sem.at[slot, comp],
        )

    def delete_range_asc(dl, dh, lo, hi):
        """Ascending Delete sweep over [dl, dh] on band [lo, hi]
        (wfa_wavefront.go:171-183 via wfa.go:526-535)."""
        nonempty = (dl <= dh) & (lo <= dh) & (hi >= dl)
        z_lo = jnp.maximum(dl, lo)
        z_hi = jnp.minimum(dh, hi)
        case_chain = lo >= dl
        hi_in = hi <= dh
        new_lo_a = jnp.where(hi_in, hi, dh + 1)
        new_hi_a = jnp.where(hi_in, hi - 1, hi)
        new_lo = jnp.where(nonempty, jnp.where(case_chain, new_lo_a, lo), lo)
        new_hi = jnp.where(nonempty, new_hi_a, hi)
        z_lo = jnp.where(nonempty, z_lo, 1)
        z_hi = jnp.where(nonempty, z_hi, 0)
        return new_lo, new_hi, z_lo, z_hi


    def select_chain(n, load_hi, load_lo, load_fsa, w2, base=None):
        """One-hot select over n word groups, split into 4 independent
        sub-chains so the accumulator dependency depth is ~n/4 (the body
        is latency-bound); one-hot partials merge with | / min."""
        hi = [jnp.zeros((BB, K), jnp.int32) for _ in range(4)]
        lo = [jnp.zeros((BB, K), jnp.int32) for _ in range(4)]
        fs = [jnp.full((BB, K), _BIG, jnp.int32) for _ in range(4)]
        for w in range(n):
            c = w & 3
            m = w2 == (w if base is None else base + w)
            hi[c] = jnp.where(m, load_hi(w), hi[c])
            lo[c] = jnp.where(m, load_lo(w), lo[c])
            fs[c] = jnp.where(m, load_fsa(w), fs[c])
        word_hi = (hi[0] | hi[1]) | (hi[2] | hi[3])
        word_lo = (lo[0] | lo[1]) | (lo[2] | lo[3])
        fsa0 = jnp.minimum(jnp.minimum(fs[0], fs[1]),
                           jnp.minimum(fs[2], fs[3]))
        return word_hi, word_lo, fsa0

    # ---------------- the score loop ----------------
    # With x >= 2, e >= 2 and o+e >= 2, next(s+1) reads only rows/bands
    # older than anything extend/reduce(s) writes (all its source slots
    # differ from slot_s), so the two phases are data-independent and are
    # emitted next-first to give the VLIW scheduler two chains to
    # interleave.  For degenerate penalties the reference order is kept.
    REORDER = X >= 2 and E >= 2 and OE >= 2

    def run_next(s, done, overflow, live_in, bands):
        """WF_NEXT (wfa.go:549-700) + backtrace-aux row construction."""
        (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex) = bands
        s2 = s + 1
        lo_x, hi_x, pv_x = src_read(m_win, m_lo, m_hi, m_ex, s2, X, WM)
        lo_o, hi_o, pv_o = src_read(m_win, m_lo, m_hi, m_ex, s2, OE, WM)
        lo_ie, hi_ie, pv_ie = src_read(i_win, i_lo, i_hi, i_ex, s2, E, WE)
        lo_de, hi_de, pv_de = src_read(d_win, d_lo, d_hi, d_ex, s2, E, WE)

        hi_n = jnp.minimum(
            tlen - 1,
            jnp.maximum(jnp.maximum(hi_x, hi_o),
                        jnp.maximum(hi_ie, hi_de)) + 1)
        lo_n = jnp.maximum(
            -(qlen - 1),
            jnp.minimum(jnp.minimum(lo_x, lo_o),
                        jnp.minimum(lo_ie, lo_de)) - 1)

        overflow = jnp.where(
            live_in & ((lo_n < k0) | (hi_n >= k0 + K)), 1, overflow)
        live = live_in & (overflow == 0)

        # insertion (wfa.go:578-608): sources at k-1.  Invalidation is
        # keep-style (keep <=> in bounds): an absent source has pv = 0 so
        # offset 0 <= any bound, making keep true and the value unchanged
        # — identical to the reference's found & out-of-bounds test.
        pm_i = shift_km1(pv_o)
        pi_i = shift_km1(pv_ie)
        v1i = pm_i >> TYPE_BITS
        v2i = pi_i >> TYPE_BITS
        # pre-invalidation snapshot: the backtrace recomputes offsets from
        # the raw stored cells, i.e. WITHOUT the bound invalidation below
        # (wfa.go:757-827) — bake those values into the aux plane.  The
        # snapshots are unmasked: every consumer masks them (aux_* by
        # wr_*, aux_m_val by wr_m via tag_m).
        isk_nb = jnp.maximum(v1i, v2i) + 1
        keep = v1i <= tlen
        fmi = (pm_i > 0) & keep
        v1i = jnp.where(keep, v1i, 0)
        keep = v2i <= tlen
        fii = (pi_i > 0) & keep
        v2i = jnp.where(keep, v2i, 0)
        Isk = jnp.maximum(v1i, v2i) + 1
        upd_i = fmi | fii
        tag_i = jnp.where(fmi & (v1i >= v2i), T_INS_OPEN, T_INS_EXT)

        # deletion (wfa.go:612-643): sources at k+1
        pm_d = shift_kp1(pv_o)
        pd_d = shift_kp1(pv_de)
        v1d = pm_d >> TYPE_BITS
        v2d = pd_d >> TYPE_BITS
        dsk_nb = jnp.maximum(v1d, v2d)
        keep = (v1d - ks) <= qlen
        fmd = (pm_d > 0) & keep
        v1d = jnp.where(keep, v1d, 0)
        keep = (v2d - ks) <= qlen
        fdd = (pd_d > 0) & keep
        v2d = jnp.where(keep, v2d, 0)
        Dsk = jnp.maximum(v1d, v2d)
        upd_d = fmd | fdd
        tag_d = jnp.where(fmd & (v1d >= v2d), T_DEL_OPEN, T_DEL_EXT)

        # mismatch / M with the reference tie-breaking (wfa.go:648-698)
        v1x = pv_x >> TYPE_BITS
        off_def_nb = jnp.maximum(jnp.maximum(isk_nb, dsk_nb), v1x + 1)
        keep = (v1x <= tlen) & ((v1x - ks) <= qlen)
        fmx = (pv_x > 0) & keep
        v1x = jnp.where(keep, v1x, 0)
        Msk = jnp.maximum(
            jnp.maximum(jnp.where(upd_i, Isk, 0), jnp.where(upd_d, Dsk, 0)),
            v1x + 1)
        tag_m = jnp.where(
            fmx & (Msk == v1x + 1), T_MISMATCH,
            jnp.where(upd_i & (Msk == Isk), tag_i, tag_d))
        wr_m = upd_i | upd_d | fmx

        band = (ks >= lo_n) & (ks <= hi_n)
        wr_i = upd_i & band & live
        wr_d = upd_d & band & live
        wr_m = wr_m & band & live

        row_i_new = jnp.where(wr_i, (Isk << TYPE_BITS) | tag_i, 0)
        row_d_new = jnp.where(wr_d, (Dsk << TYPE_BITS) | tag_d, 0)
        # aux values: each cell's backtrace branch is selected by its OWN
        # tag (InsertExt -> I-rule, DeleteExt -> D-rule, else the default
        # M-rule, wfa.go:757-817)
        aux_i_new = jnp.where(
            wr_i,
            (jnp.where(tag_i == T_INS_EXT, isk_nb, off_def_nb)
             << TYPE_BITS) | tag_i, 0)
        aux_d_new = jnp.where(
            wr_d,
            (jnp.where(tag_d == T_DEL_EXT, dsk_nb, off_def_nb)
             << TYPE_BITS) | tag_d, 0)
        aux_m_val = jnp.where(
            tag_m == T_INS_EXT, isk_nb,
            jnp.where(tag_m == T_DEL_EXT, dsk_nb, off_def_nb))

        # merge a pre-existing seed wavefront at s2 (only score X can
        # pre-exist; its slot has not been overwritten yet since X < WM)
        slot_s2 = lax.rem(s2, WM)
        slot_s2e = lax.rem(s2, WE)
        at_seed = (s2 == X) if X > 0 else False
        if X > 0:
            cur = m_win[pl.ds(slot_s2 * BB, BB)]
            row_m_old = jnp.where(at_seed, cur, 0)
            ex_m_old = jnp.where(at_seed, slot_read(m_ex, slot_s2), 0) > 0
            lo_m_old = slot_read(m_lo, slot_s2)
            hi_m_old = slot_read(m_hi, slot_s2)
        else:
            row_m_old = jnp.zeros((BB, K), jnp.int32)
            ex_m_old = jnp.zeros((BB, 1), bool)
            lo_m_old = jnp.full((BB, 1), _BIG, jnp.int32)
            hi_m_old = jnp.full((BB, 1), -_BIG, jnp.int32)
        row_m_new = jnp.where(wr_m, (Msk << TYPE_BITS) | tag_m, row_m_old)
        aux_m_new = jnp.where(wr_m, (aux_m_val << TYPE_BITS) | tag_m,
                              row_m_old & 7)

        # ONE batched cross-lane reduce for all six band extremes
        # (maxes as min of the negation): cross-lane reduces are this
        # layout's costly op and their cost is latency-bound (~fixed per
        # op), so six [BB, K] reduces collapse into one [6*BB, K] pass.
        # The lo mins double as existence tests (empty -> _BIG).
        mins = jnp.min(jnp.concatenate([
            jnp.where(wr_i, ks, _BIG), jnp.where(wr_i, -ks, _BIG),
            jnp.where(wr_d, ks, _BIG), jnp.where(wr_d, -ks, _BIG),
            jnp.where(wr_m, ks, _BIG), jnp.where(wr_m, -ks, _BIG),
        ], axis=0), axis=1, keepdims=True)
        lo_i_n = mins[0 * BB:1 * BB]
        hi_i_n = -mins[1 * BB:2 * BB]
        lo_d_n = mins[2 * BB:3 * BB]
        hi_d_n = -mins[3 * BB:4 * BB]
        lo_m_raw = mins[4 * BB:5 * BB]
        any_i = lo_i_n < _BIG
        any_d = lo_d_n < _BIG
        any_m = lo_m_raw < _BIG
        lo_m_n = jnp.minimum(lo_m_raw,
                             jnp.where(ex_m_old, lo_m_old, _BIG))
        hi_m_n = jnp.maximum(
            -mins[5 * BB:6 * BB],
            jnp.where(ex_m_old, hi_m_old, -_BIG))

        frz = ~live
        # window writes need no freeze select: wr_* already carries
        # `live`, so frozen lanes get 0 (i/d/aux-i/aux-d) or fall through
        # to row_m_old / row_m_old & 7 (m/aux-m), which is itself
        # at_seed-masked — exactly the frozen-lane requirement
        i_win[pl.ds(slot_s2e * BB, BB)] = row_i_new
        d_win[pl.ds(slot_s2e * BB, BB)] = row_d_new
        m_win[pl.ds(slot_s2 * BB, BB)] = row_m_new
        slot_s2a = lax.rem(s2, 2)
        ai_win[pl.ds(slot_s2a * BB, BB)] = aux_i_new
        ad_win[pl.ds(slot_s2a * BB, BB)] = aux_d_new
        am_win[pl.ds(slot_s2a * BB, BB)] = aux_m_new

        i_lo = slot_write(i_lo, slot_s2e,
                          jnp.where(frz | ~any_i, _BIG, lo_i_n))
        i_hi = slot_write(i_hi, slot_s2e,
                          jnp.where(frz | ~any_i, -_BIG, hi_i_n))
        i_ex = slot_write(i_ex, slot_s2e,
                          jnp.where(frz, 0, any_i.astype(jnp.int32)))
        d_lo = slot_write(d_lo, slot_s2e,
                          jnp.where(frz | ~any_d, _BIG, lo_d_n))
        d_hi = slot_write(d_hi, slot_s2e,
                          jnp.where(frz | ~any_d, -_BIG, hi_d_n))
        d_ex = slot_write(d_ex, slot_s2e,
                          jnp.where(frz, 0, any_d.astype(jnp.int32)))
        keep_m = any_m | ex_m_old
        m_lo = slot_write(
            m_lo, slot_s2,
            jnp.where(frz, jnp.where(ex_m_old, lo_m_old, _BIG),
                      jnp.where(keep_m, lo_m_n, _BIG)))
        m_hi = slot_write(
            m_hi, slot_s2,
            jnp.where(frz, jnp.where(ex_m_old, hi_m_old, -_BIG),
                      jnp.where(keep_m, hi_m_n, -_BIG)))
        m_ex = slot_write(
            m_ex, slot_s2,
            jnp.where(frz, ex_m_old.astype(jnp.int32),
                      keep_m.astype(jnp.int32)))

        return overflow, (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex,
                          d_lo, d_hi, d_ex)

    def body(carry):
        (s, done, overflow, final_s, term_cell, wbase,
         m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex) = carry

        live0 = (done == 0) & (overflow == 0)  # [BB, 1]
        slot_s = lax.rem(s, WM)
        slot_se = lax.rem(s, WE)
        lo_ms = slot_read(m_lo, slot_s)
        hi_ms = slot_read(m_hi, slot_s)
        ex_ms = slot_read(m_ex, slot_s) > 0

        # -- DMA bookkeeping: before writing into this chunk's obuf slot,
        # wait out the DMA issued two chunks ago on the same slot.
        c = s // CH

        @pl.when((lax.rem(s, CH) == 0) & (c >= 2))
        def _():
            hist_dma(0, ob_m, c - 2).wait()
            hist_dma(1, ob_i, c - 2).wait()
            hist_dma(2, ob_d, c - 2).wait()

        bands = (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex)
        if REORDER:
            # a pair that terminates at s harmlessly writes s+1 rows
            # (never read: rows above final_s are ignored downstream)
            overflow, bands = run_next(s, done, overflow, live0, bands)
            (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex) = bands

        # ---- extend (wfa.go:381-458) ----
        # One select-chain pass over the 64-bit stop words plus a 64-bit
        # clz; runs crossing the 64-bit group resolve via the
        # first-stop-after table.  No gathers, no data-dependent loop.
        cell = m_win[pl.ds(slot_s * BB, BB)]
        off = cell >> TYPE_BITS
        valid = (cell > 0) & (ks >= lo_ms) & (ks <= hi_ms) & ex_ms & live0
        h0 = off
        v0 = off - ks
        act0 = valid & (v0 > 0) & (v0 < qlen) & (h0 < tlen)
        c0 = h0 + toff
        w2 = jnp.clip(c0 >> 6, 0, Lw2 - 1)
        if not STREAM:
            word_hi, word_lo, fsa0 = select_chain(
                Lw2,
                lambda w: whi_ref[:, w * K:(w + 1) * K],
                lambda w: wlo_ref[:, w * K:(w + 1) * K],
                lambda w: fsa_ref[:, w * K:(w + 1) * K],
                w2)
        else:
            # PER-GROUP sliding VMEM windows: pairs advance in groups of
            # G=8 (the HBM sublane tiling — DMA row slices must be
            # 8-aligned), each group's window anchored at ITS OWN
            # slowest member.  A single block-shared window (anchored at
            # the slowest pair of all 64) caps the tolerable cross-pair
            # progress spread at WV 64-base groups — measured at
            # l=50k/e=0.05 the spread grows to thousands of bases and
            # 113/128 pairs outran a shared window (only the per-block
            # minima survived).  8-pair groups cut the governing spread
            # ~8x; stragglers that still exceed WV retry a wider tier.
            G = 8
            wmm = jnp.min(jnp.concatenate([
                jnp.where(act0, w2, Lw2),
                jnp.where(act0, -w2, _BIG),
            ], axis=0), axis=1, keepdims=True)  # one batched reduce
            wminp = jnp.clip(wmm[:BB], 0, Lw2 - WV)
            wmaxp = -wmm[BB:]  # empty lane-set -> -_BIG (never refills)
            refillp = wmaxp >= wbase + WV  # [BB, 1]
            any_ref = jnp.any(refillp)
            # group-min base / group-any refill, broadcast back per pair
            # (BB//G rank-0 masked reduces on [BB,1] vectors — cheap;
            # moving these under the refill branch via a VMEM-scratch
            # wbase measured SLOWER, 0.228 vs 0.185 s/block: the scratch
            # round-trip serializes the step)
            rows = _iota((BB, 1), 0)
            gid = rows >> 3
            act_pair = wmaxp >= 0
            gbase = jnp.full((BB, 1), 0, jnp.int32)
            gref = jnp.zeros((BB, 1), jnp.int32)
            for g in range(BB // G):
                sel = gid == g
                m = jnp.min(jnp.where(sel & act_pair, wminp, Lw2 - WV))
                f = jnp.max(jnp.where(sel, refillp.astype(jnp.int32), 0))
                gbase = jnp.where(sel, jnp.maximum(m, 0), gbase)
                gref = jnp.where(sel, f, gref)

            @pl.when(any_ref)
            def _():
                def refill_one(g, tok):
                    sel = gid == g
                    flag = jnp.max(jnp.where(sel, gref, 0))
                    nb = jnp.max(jnp.where(sel, gbase, 0))

                    @pl.when(flag > 0)
                    def _():
                        row = pl.ds(blk * BB + g * G, G)
                        span = pl.ds(nb * K, WV * K)
                        dst = pl.ds(g * G, G)
                        pltpu.make_async_copy(
                            whi_ref.at[row, span], twhi.at[dst],
                            tsem.at[0]).start()
                        pltpu.make_async_copy(
                            wlo_ref.at[row, span], twlo.at[dst],
                            tsem.at[1]).start()
                        pltpu.make_async_copy(
                            fsa_ref.at[row, span], tfsa.at[dst],
                            tsem.at[2]).start()
                        pltpu.make_async_copy(
                            whi_ref.at[row, span], twhi.at[dst],
                            tsem.at[0]).wait()
                        pltpu.make_async_copy(
                            wlo_ref.at[row, span], twlo.at[dst],
                            tsem.at[1]).wait()
                        pltpu.make_async_copy(
                            fsa_ref.at[row, span], tfsa.at[dst],
                            tsem.at[2]).wait()

                    return tok

                lax.fori_loop(0, BB // G, refill_one, 0)

            wbase = jnp.where(any_ref & (gref > 0), gbase, wbase)
            wbase_n = wbase
            outrun = act0 & (w2 >= wbase_n + WV)
            overflow = jnp.where(
                jnp.any(outrun, axis=1)[:, None] & live0, 1, overflow)
            act0 = act0 & ~outrun
            word_hi, word_lo, fsa0 = select_chain(
                WV,
                lambda j: twhi[:, j * K:(j + 1) * K],
                lambda j: twlo[:, j * K:(j + 1) * K],
                lambda j: tfsa[:, j * K:(j + 1) * K],
                w2, base=wbase_n)
        r = c0 & 63
        rl = jnp.maximum(r - 32, 0)  # clamped: unused branch must not trap
        rr = jnp.clip(32 - r, 0, 31)
        rc = r & 31  # clamped shift for the r < 32 branch
        vis_hi = jnp.where(
            r >= 32,
            word_lo << rl,
            (word_hi << rc) | jnp.where(r == 0, 0,
                                        lax.shift_right_logical(word_lo, rr)),
        )
        vis_lo = jnp.where(r >= 32, 0, word_lo << rc)
        n_ext = jnp.where(
            vis_hi != 0,
            lax.clz(vis_hi),
            jnp.where(vis_lo != 0, 32 + lax.clz(vis_lo), fsa0 - c0),
        )
        n_ext = jnp.where(act0, n_ext, 0)
        row_m = jnp.where(act0 & (n_ext > 0), cell + (n_ext << TYPE_BITS),
                          cell)

        # ---- termination (wfa.go:235-239) ----
        cell_ak = jnp.sum(jnp.where(lane_k == j_ak, row_m, 0), axis=1,
                          keepdims=True)
        found_ak = ex_ms & (ak >= lo_ms) & (ak <= hi_ms) & (cell_ak > 0)
        off_ak = jnp.where(found_ak, cell_ak >> TYPE_BITS, 0)
        newly = live0 & ex_ms & (off_ak >= tlen)
        final_s = jnp.where(newly, s, final_s)
        term_cell = jnp.where(newly, cell_ak, term_cell)
        done = jnp.where(newly, 1, done)
        # A pair terminating at s may have picked up a spurious overflow
        # earlier in this step (REORDER's run_next band-escape for s+1, or
        # a stop-table window outrun on a diagonal the terminal cell does
        # not need) — the reference checks termination before next
        # (wfa.go:235-250), so a terminated pair's result is valid.
        # Entering this step it had overflow == 0 (live0), so clearing
        # here only cancels this step's bit.
        overflow = jnp.where(newly, 0, overflow)
        live = (done == 0) & (overflow == 0)

        # ---- wf-adaptive reduce (wfa.go:461-540) ----
        row_i = i_win[pl.ds(slot_se * BB, BB)]
        row_d = d_win[pl.ds(slot_se * BB, BB)]
        if REDUCE_ON:
            red = ex_ms & live & ((hi_ms - lo_ms + 1) >= MIN_WF_LEN)
            offc = row_m >> TYPE_BITS
            hs = offc
            vs = offc - ks
            validc = (row_m > 0) & (ks >= lo_ms) & (ks <= hi_ms)
            okd = validc & ~((vs < 0) | (vs >= qlen) | (hs >= tlen))
            dist = jnp.maximum(tlen - hs, qlen - vs)
            dmin = jnp.min(jnp.where(okd, dist, _BIG), axis=1, keepdims=True)
            marked = okd & ((dist - dmin) > MAX_DIST_DIFF)
            good = okd & ~marked
            jj = lane_k
            # one batched reduce for first_good / last_good / any_marked
            s2m = jnp.min(jnp.concatenate([
                jnp.where(good, jj, _BIG),
                jnp.where(good, -jj, _BIG),
                jnp.where(marked, 0, 1),
            ], axis=0), axis=1, keepdims=True)
            first_good = s2m[:BB]
            last_good = -s2m[BB:2 * BB]
            any_marked = s2m[2 * BB:] == 0
            any_good = first_good < _BIG
            last_mark = jnp.max(
                jnp.where(marked & (jj < first_good), jj, -_BIG),
                axis=1, keepdims=True)
            new_lo = jnp.where(last_mark > -_BIG, k0 + last_mark + 1, lo_ms)
            new_hi = jnp.where(any_marked & any_good, k0 + last_good, hi_ms)
            new_lo = jnp.where(red, new_lo, lo_ms)
            new_hi = jnp.where(red, new_hi, hi_ms)

            zero_m = validc & ((ks < new_lo) | (ks > new_hi)) & red
            row_m = jnp.where(zero_m, 0, row_m)
            m_lo = slot_write(m_lo, slot_s, jnp.where(red, new_lo, lo_ms))
            m_hi = slot_write(m_hi, slot_s, jnp.where(red, new_hi, hi_ms))

            # co-deletion from I and D (wfa.go:526-535)
            def co_delete(row_c, lo_a, hi_a, ex_a, slot):
                lo_cs = slot_read(lo_a, slot)
                hi_cs = slot_read(hi_a, slot)
                gate = red & (slot_read(ex_a, slot) > 0)
                l1, h1, zl1, zh1 = delete_range_asc(
                    lo_ms, new_lo - 1, lo_cs, hi_cs)
                l2, h2, zl2, zh2 = delete_range_asc(
                    new_hi + 1, hi_ms, l1, h1)
                zero = gate & (((ks >= zl1) & (ks <= zh1))
                               | ((ks >= zl2) & (ks <= zh2)))
                row_c = jnp.where(zero, 0, row_c)
                lo_a = slot_write(lo_a, slot, jnp.where(gate, l2, lo_cs))
                hi_a = slot_write(hi_a, slot, jnp.where(gate, h2, hi_cs))
                return row_c, lo_a, hi_a

            row_i, i_lo, i_hi = co_delete(row_i, i_lo, i_hi, i_ex, slot_se)
            row_d, d_lo, d_hi = co_delete(row_d, d_lo, d_hi, d_ex, slot_se)
            i_win[pl.ds(slot_se * BB, BB)] = row_i
            d_win[pl.ds(slot_se * BB, BB)] = row_d

        m_win[pl.ds(slot_s * BB, BB)] = row_m

        # ---- stream backtrace-aux row s to HBM (value-rebased) ----
        # aux row values were final at creation (aux = pre-extension
        # offsets); masking by the current cell row applies this
        # iteration's reduce/co-delete deletions.  The per-row minimum
        # live offset0 is subtracted (+1 so absent stays 0 and a true
        # offset0 of exactly `base` stays nonzero) and recorded in
        # base_ref — the backtrace adds it back.
        och = lax.rem(s, CH)
        oslot = lax.rem(c, 2)
        wrote = live0
        slot_sa = lax.rem(s, 2)
        am0 = jnp.where(wrote & (row_m != 0),
                        am_win[pl.ds(slot_sa * BB, BB)], 0)
        ai0 = jnp.where(wrote & (row_i != 0),
                        ai_win[pl.ds(slot_sa * BB, BB)], 0)
        ad0 = jnp.where(wrote & (row_d != 0),
                        ad_win[pl.ds(slot_sa * BB, BB)], 0)

        # ONE cross-lane reduce for the shared base (elementwise 3-way
        # min first): cross-lane reduces are this layout's costly op
        vm = jnp.minimum(
            jnp.minimum(jnp.where(am0 > 0, am0 >> TYPE_BITS, _BIG),
                        jnp.where(ai0 > 0, ai0 >> TYPE_BITS, _BIG)),
            jnp.where(ad0 > 0, ad0 >> TYPE_BITS, _BIG))
        base = jnp.min(vm, axis=1, keepdims=True)
        base = jnp.maximum(jnp.where(base >= _BIG, 0, base), 0)
        # accumulate [S, BB] (dynamic-row writes are cheap; the blocked
        # [BB, S] output is filled by one transpose at exit)
        sb[pl.ds(s, 1)] = base.reshape(1, BB)

        def reb(a):
            v = (a >> TYPE_BITS) - base + 1
            return jnp.where(a > 0, (v << TYPE_BITS) | (a & 7), 0)

        orow = oslot * CH + och
        ob_m[pl.ds(orow, 1)] = reb(am0).astype(cell_dtype)[None]
        ob_i[pl.ds(orow, 1)] = reb(ai0).astype(cell_dtype)[None]
        ob_d[pl.ds(orow, 1)] = reb(ad0).astype(cell_dtype)[None]

        @pl.when(lax.rem(s, CH) == CH - 1)
        def _():
            hist_dma(0, ob_m, c).start()
            hist_dma(1, ob_i, c).start()
            hist_dma(2, ob_d, c).start()

        if not REORDER:
            bands = (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex)
            overflow, bands = run_next(s, done, overflow, live, bands)
            (m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex) = bands

        return (s + 1, done, overflow, final_s, term_cell, wbase,
                m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex)

    def cond(carry):
        s = carry[0]
        done, overflow = carry[1], carry[2]
        return (s < S - 1) & jnp.any((done == 0) & (overflow == 0))

    z1 = jnp.zeros((BB, 1), jnp.int32)
    carry = (jnp.int32(0), z1, ovf0, z1, z1,
             jnp.full((BB, 1), -WV, jnp.int32),
             m_lo, m_hi, m_ex, i_lo, i_hi, i_ex, d_lo, d_hi, d_ex)
    carry = lax.while_loop(cond, body, carry)
    s_exit, done, overflow, final_s, term_cell = carry[:5]

    # flush the partial output chunk and drain outstanding DMAs
    nchunks = (s_exit + CH - 1) // CH

    @pl.when(lax.rem(s_exit, CH) != 0)
    def _():
        hist_dma(0, ob_m, nchunks - 1).start()
        hist_dma(1, ob_i, nchunks - 1).start()
        hist_dma(2, ob_d, nchunks - 1).start()

    @pl.when(nchunks >= 1)
    def _():
        hist_dma(0, ob_m, nchunks - 1).wait()
        hist_dma(1, ob_i, nchunks - 1).wait()
        hist_dma(2, ob_d, nchunks - 1).wait()

    @pl.when(nchunks >= 2)
    def _():
        hist_dma(0, ob_m, nchunks - 2).wait()
        hist_dma(1, ob_i, nchunks - 2).wait()
        hist_dma(2, ob_d, nchunks - 2).wait()

    overflow = jnp.where(done == 0, 1, overflow)
    res = jnp.concatenate(
        [final_s, done, overflow, jnp.broadcast_to(s_exit, (BB, 1)),
         term_cell] + [z1] * 3, axis=1)
    out_ref[:] = res
    base_ref[...] = sb[...].T  # [S, BB] accumulator -> [BB, S] output


def pallas_run_batch(qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig,
                     B: int, Lq: int, Ltb: int, interpret: bool = False,
                     wv: int = 0):
    """Run the fused score-loop kernel; returns
    (final_s, done, overflow, term_cell, aux[3, S, B, K]) for B pairs.

    ``aux`` holds, per cell, the backtrace's branch-selected
    pre-extension offset and the cell tag (``offset0 << 3 | tag``, 0 =
    absent) — everything the device backtrace's chase needs in ONE value;
    ``term_cell`` is the raw packed M cell at (final_s, Ak) that
    triggered termination (the backtrace start point).  Rows above a
    pair's final score and overflow pairs' columns contain garbage —
    consumers must respect final_s/overflow."""
    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win
    assert supports(cfg, Ltb), "config not supported by the fused kernel"

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff = toff.astype(jnp.int32)
    k0 = -toff
    Ak = tlen - qlen

    overflow0 = (Ak < k0) | (Ak >= k0 + K) | (0 < k0) | (0 >= k0 + K)

    words, fsa = _stop_tables(qb, tbuf, qlen, tlen, toff, K, Lq, Ltb)
    # regroup the 32-bit stop words into 64-bit (hi, lo) pairs; the
    # 64-level first-stop-after table is the 32-level one at odd indices
    Lw = words.shape[-1]
    if Lw % 2:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, 1)))
        fsa = jnp.pad(fsa, ((0, 0), (0, 0), (0, 1)),
                      constant_values=int(_BIG))
    whi = jnp.transpose(words[..., 0::2], (0, 2, 1))  # [B, Lw2, K]
    wlo = jnp.transpose(words[..., 1::2], (0, 2, 1))
    fsa64 = jnp.transpose(fsa[..., 1::2], (0, 2, 1))
    Lw2 = whi.shape[1]
    # flatten to 2-D so the kernel's select chain uses cheap static lane
    # slices (3-D ref slicing costs a relayout per load)
    whi = whi.reshape(B, Lw2 * K)
    wlo = wlo.reshape(B, Lw2 * K)
    fsa64 = fsa64.reshape(B, Lw2 * K)

    (row0, lo0, hi0, ex0), (rowx, lox, hix, exx) = _seed_rows(
        qb, tbuf, qlen, tlen, toff,
        mismatch=int(p.mismatch), global_alignment=cfg.global_alignment,
        K=K, Lq=Lq, Ltb=Ltb)
    if p.mismatch >= S:
        overflow0 = overflow0 | exx

    params = jnp.stack(
        [qlen, tlen, toff, Ak - k0, overflow0.astype(jnp.int32),
         lo0, hi0, ex0.astype(jnp.int32),
         lox, hix, exx.astype(jnp.int32), Ak]
        + [jnp.zeros_like(qlen)] * (_NP - 12), axis=1)

    # block size: see _block_sizing (shared with the supports() gate);
    # shrink when a block's aux plane would strain HBM or the batch is
    # small.  Vector ops cost much the same regardless of sublane
    # occupancy, so block padding is nearly free.
    bb_pad, bb, wv_auto = _block_sizing(S, K, B)
    # pad the batch to a block multiple (padding rows are overflow)
    Bp = ((B + bb_pad - 1) // bb_pad) * bb_pad
    if Bp != B:
        pad = Bp - B
        params = jnp.concatenate(
            [params, jnp.tile(params[:1], (pad, 1))
             .at[:, 4].set(1)], axis=0)
        whi = jnp.concatenate([whi, jnp.tile(whi[:1], (pad, 1))], 0)
        wlo = jnp.concatenate([wlo, jnp.tile(wlo[:1], (pad, 1))], 0)
        fsa64 = jnp.concatenate([fsa64, jnp.tile(fsa64[:1], (pad, 1))], 0)
        row0 = jnp.concatenate([row0, jnp.zeros((pad, K), jnp.int32)], 0)
        rowx = jnp.concatenate([rowx, jnp.zeros((pad, K), jnp.int32)], 0)

    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    if wv <= 0:  # table window sized to a ~7MB VMEM budget
        wv = wv_auto
    WV = wv
    stream = Lw2 > WV
    # aux cells are ALWAYS int16: values stream rebased against the
    # per-row minimum live offset (base_out carries the bases), and one
    # row's offsets spread at most band-width + max_dist_diff
    cell_dtype = jnp.int16
    kern = functools.partial(
        _kernel, S=S, K=K, Lw2=Lw2, WV=WV, BB=bb,
        X=int(p.mismatch), OE=int(p.gap_open + p.gap_ext),
        E=int(p.gap_ext),
        GLOBAL=cfg.global_alignment,
        REDUCE_ON=cfg.adaptive is not None,
        MIN_WF_LEN=int(cfg.adaptive.min_wf_len) if cfg.adaptive else 0,
        MAX_DIST_DIFF=int(cfg.adaptive.max_dist_diff) if cfg.adaptive else 0,
    )
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        table_specs = [
            pl.BlockSpec((bb, Lw2 * K), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 3
    twv = WV if stream else 1

    nblk = Bp // bb
    out, aux, aux_base = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bb, _NP), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + table_specs + [
            pl.BlockSpec((bb, K), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, K), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bb, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 8), jnp.int32),
            jax.ShapeDtypeStruct((3, S, Bp, K), cell_dtype),
            jax.ShapeDtypeStruct((Bp, S), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WM * bb, K), jnp.int32),
            pltpu.VMEM((WE * bb, K), jnp.int32),
            pltpu.VMEM((WE * bb, K), jnp.int32),
            pltpu.VMEM((2 * bb, K), jnp.int32),
            pltpu.VMEM((2 * bb, K), jnp.int32),
            pltpu.VMEM((2 * bb, K), jnp.int32),
            pltpu.VMEM((2 * CH, bb, K), cell_dtype),
            pltpu.VMEM((2 * CH, bb, K), cell_dtype),
            pltpu.VMEM((2 * CH, bb, K), cell_dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((bb, twv * K), jnp.int32),
            pltpu.VMEM((bb, twv * K), jnp.int32),
            pltpu.VMEM((bb, twv * K), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((S, bb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # lift the 16MB scoped-VMEM default: the per-block scratch +
            # Mosaic's stack transients exceed it at deep s_cap (measured
            # 30.4M at S=51k, K=384, bb=32 — a hard compile failure on
            # hardware that interpret-mode CPU tests never see); v5e has
            # 128MB VMEM
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(params, whi, wlo, fsa64, row0, rowx)

    final_s = out[:B, 0]
    done = out[:B, 1] > 0
    overflow = out[:B, 2] > 0
    term_cell = out[:B, 4]
    # aux stays padded to the block multiple — slicing would copy GBs;
    # the backtrace takes the padded batch stride instead
    return final_s, done, overflow, term_cell, aux, Bp, aux_base
