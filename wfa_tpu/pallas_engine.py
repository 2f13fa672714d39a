"""Fused Pallas TPU kernel for the WFA score loop (pairs-on-lanes).

This is the performance core of the framework (SURVEY.md §7 step 5): the
reference's entire per-pair score loop — extend (wfa.go:381-458),
termination (wfa.go:235-239), wf-adaptive reduce (wfa.go:461-540) and
next (wfa.go:549-700) — runs as ONE Pallas kernel invocation per batch,
with every per-step data structure resident in VMEM.

Layout (the round-2 redesign): **diagonals live on sublanes, pairs on
lanes** — every tensor is ``[K(+slots) rows, BB pair lanes]``.  Measured
on v5e, this flips the kernel's cost structure:

* the per-wavefront band bounds (lo/hi/exists) sit in VMEM ref rows, so
  every KRange/slot access is a dynamic *row* read/write (~free) instead
  of a masked cross-lane reduce (~160 ns each — the old layout spent
  >half of every step there);
* reduces over the diagonal axis (band bounds, wf-adaptive dmin, window
  outrun checks) are sublane reduces (~5 ns/pair-block vs ~160 ns);
* the k±1 shifted reads in next() are sublane rolls (~free);
* four times more pairs per block (BB=128 lanes) amortize the per-step
  scalar/loop overhead.

Everything else matches the previous design: the *stop tables*
(precomputed extension bitmasks, ``engine._stop_tables``) make each
match-run (LCP) one masked select pass + clz; the sliding window of
wavefronts that ``next`` reads is a circular VMEM buffer; the packed
backtrace-aux history streams to HBM with double-buffered async DMA in
CH-score chunks; each block of ``BB`` pairs terminates as soon as its
own pairs are done.

Cells keep the reference encoding ``offset << 3 | tag`` (0 = absent,
wfa_wavefront.go:44/93), and cells outside a wavefront's live band are
always zero, so downstream consumers need only the cell values.

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

B_BLK = 128  # pair lanes per kernel block
CH = 8  # history scores per output DMA chunk
_NP = 24  # packed per-pair parameter rows (12 base + 7 resume-state)


def supports(cfg: EngineConfig, Ltb: int) -> bool:
    """Whether the fused kernel handles this config (else JAX fallback).

    ``Ltb`` is the padded target-buffer length (0 = unknown: check only
    the length-independent constraints)."""
    p = cfg.penalties
    wm = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    if wm > 64 or p.gap_ext + 1 > 64:
        return False
    # VMEM budget for the window scratch.  (A K=2176 semi-global build
    # compiles and is bit-exact, but ops on [2176, 128] tiles run ~5x
    # below the [512,128] efficiency and lose to the XLA engine — wide
    # full-span windows stay on the XLA engine.)
    if cfg.k_win > 512:
        return False
    if cfg.s_cap % CH != 0:
        return False
    # any length is fine: when the stop tables outgrow VMEM the kernel
    # streams a sliding window of them from HBM
    return True


def _iota(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(
    *refs,
    S, K, Lw2, WV, BB, CH, X, OE, E, GLOBAL, REDUCE_ON, MIN_WF_LEN,
    MAX_DIST_DIFF, CELL16, RESUME=None, VSPACE=False, EXPORT=False,
    KW=0,
):
    # RESUME=S0 runs the loop from score S0 with imported state (the
    # two-phase semi-global handoff, wfa_tpu.semi2) instead of seeding;
    # EXPORT stops at score S-1 and dumps the VMEM windows/bands (the
    # phase-1 side of the same handoff); VSPACE indexes the stop tables
    # by query progress v instead of buffer column (engine._stop_tables_v
    # — the full-span prefix's lookups only cluster in v-space).  KW>0
    # streams REBASED aux history: per score only a KW-row window of the
    # live band, row-based at a per-lane 32-quantized base cb and
    # value-based at the row's minimum live offset0 (int16 cells at any
    # length); (vbase << 5 | cb) rides the sbase_ref output for the
    # backtrace's index/value translation.  The in/out ref list differs
    # between the modes, hence *refs.
    assert not (KW and (EXPORT or RESUME is not None))
    state_ref = sbase_ref = None
    if RESUME is None and not EXPORT:
        if KW:
            (params_ref, whi_ref, wlo_ref, fsa_ref, seed0_ref, seedx_ref,
             out_ref, aux_ref, sbase_ref, *scr) = refs
        else:
            (params_ref, whi_ref, wlo_ref, fsa_ref, seed0_ref, seedx_ref,
             out_ref, aux_ref, *scr) = refs
        minit_ref = iinit_ref = dinit_ref = ainit_ref = binit_ref = None
    elif EXPORT:
        (params_ref, whi_ref, wlo_ref, fsa_ref, seed0_ref, seedx_ref,
         out_ref, aux_ref, state_ref, *scr) = refs
        minit_ref = iinit_ref = dinit_ref = ainit_ref = binit_ref = None
    else:
        (params_ref, whi_ref, wlo_ref, fsa_ref, minit_ref, iinit_ref,
         dinit_ref, ainit_ref, binit_ref, out_ref, aux_ref, *scr) = refs
        seed0_ref = seedx_ref = None
    (m_win, i_win, d_win, am_win, ai_win, ad_win,
     mb_lo, mb_hi, mb_ex, ib_lo, ib_hi, ib_ex, db_lo, db_hi, db_ex,
     ob_m, ob_i, ob_d, sem, twhi, twlo, tfsa, tsem, *scr_extra) = scr
    st_sem = scr_extra[0] if EXPORT else None
    bscr = scr_extra[1] if EXPORT else None
    sb_ob = scr_extra[0] if KW else None
    S0 = RESUME or 0
    C0 = S0 // CH  # aux_ref rows cover scores S0..S-1 (offset C0 chunks)
    cell_dtype = jnp.int16 if CELL16 else jnp.int32
    STREAM = Lw2 > WV  # stop tables stay in HBM; a WV-group window
    # slides through VMEM as the block's offsets advance
    WM = max(X, OE) + 1
    WE = E + 1
    blk = pl.program_id(0)

    def prow(i):  # [1, BB] per-pair parameter row
        return params_ref[i:i + 1]

    qlen = prow(0)
    tlen = prow(1)
    toff = prow(2)
    j_ak = prow(3)
    ovf0 = prow(4)
    lo0 = prow(5)
    hi0 = prow(6)
    ex0 = prow(7)
    lox = prow(8)
    hix = prow(9)
    exx = prow(10)
    ak = prow(11)

    k0 = -toff  # [1, BB]
    row_k = _iota((K, BB), 0)
    ks = k0 + row_k  # [K, BB] diagonal of each row
    if VSPACE:
        # per-row 64-bit-group shear applied to the tables at build time
        # (pallas_run_prefix): lookups subtract it so every cell indexes
        # near its diagonal progress
        sg6 = jnp.maximum(0, toff - row_k) >> 6  # [K, BB] groups

    if RESUME is None:
        # ---- init windows & band slots (seeding, wfa.go:143-184) ----
        m_win[...] = jnp.zeros((WM * K, BB), jnp.int32)
        i_win[...] = jnp.zeros((WE * K, BB), jnp.int32)
        d_win[...] = jnp.zeros((WE * K, BB), jnp.int32)
        m_win[0:K] = seed0_ref[:]
        if 0 < X < WM:
            m_win[X * K:(X + 1) * K] = seedx_ref[:]
        # aux plane (backtrace pre-extension offsets): seed cells have no
        # sources (the reference's from-itself break), so their aux value
        # is just the tag bits
        am_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        ai_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        ad_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        am_win[0:K] = seed0_ref[:] & 7

        mb_lo[...] = jnp.full((WM, BB), _BIG, jnp.int32)
        mb_hi[...] = jnp.full((WM, BB), -_BIG, jnp.int32)
        mb_ex[...] = jnp.zeros((WM, BB), jnp.int32)
        mb_lo[0:1] = lo0
        mb_hi[0:1] = hi0
        mb_ex[0:1] = ex0
        if 0 < X < WM:
            mb_lo[X:X + 1] = lox
            mb_hi[X:X + 1] = hix
            mb_ex[X:X + 1] = exx
        ib_lo[...] = jnp.full((WE, BB), _BIG, jnp.int32)
        ib_hi[...] = jnp.full((WE, BB), -_BIG, jnp.int32)
        ib_ex[...] = jnp.zeros((WE, BB), jnp.int32)
        db_lo[...] = jnp.full((WE, BB), _BIG, jnp.int32)
        db_hi[...] = jnp.full((WE, BB), -_BIG, jnp.int32)
        db_ex[...] = jnp.zeros((WE, BB), jnp.int32)
    else:
        # ---- init from the phase-1 handoff: window rows, aux row S0 and
        # band slots arrive pre-arranged in circular-slot order
        m_win[...] = minit_ref[:]
        i_win[...] = iinit_ref[:]
        d_win[...] = dinit_ref[:]
        am_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        ai_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        ad_win[...] = jnp.zeros((2 * K, BB), jnp.int32)
        sa0 = S0 % 2
        am_win[sa0 * K:(sa0 + 1) * K] = ainit_ref[0:K]
        ai_win[sa0 * K:(sa0 + 1) * K] = ainit_ref[K:2 * K]
        ad_win[sa0 * K:(sa0 + 1) * K] = ainit_ref[2 * K:3 * K]
        mb_lo[...] = binit_ref[0:WM]
        mb_hi[...] = binit_ref[WM:2 * WM]
        mb_ex[...] = binit_ref[2 * WM:3 * WM]
        o = 3 * WM
        ib_lo[...] = binit_ref[o:o + WE]
        ib_hi[...] = binit_ref[o + WE:o + 2 * WE]
        ib_ex[...] = binit_ref[o + 2 * WE:o + 3 * WE]
        db_lo[...] = binit_ref[o + 3 * WE:o + 4 * WE]
        db_hi[...] = binit_ref[o + 4 * WE:o + 5 * WE]
        db_ex[...] = binit_ref[o + 5 * WE:o + 6 * WE]

    def src_read(win, lo_r, hi_r, ex_r, s2, diff, W):
        """Fused KRange (wfa_component.go:91-101, with its (0,0) fallback)
        + GetAfterDiff row read (wfa_component.go:158) for one source.
        ``s2`` is the lockstep scalar score, so the slot is a scalar and
        every access is a dynamic-row read."""
        sp = s2 - diff
        okd = sp >= 0
        slot = lax.rem(jnp.maximum(sp, 0), W)
        lo_sp = lo_r[pl.ds(slot, 1)]  # [1, BB]
        hi_sp = hi_r[pl.ds(slot, 1)]
        ex_sp = (ex_r[pl.ds(slot, 1)] > 0) & okd
        lo_kr = jnp.where(ex_sp, lo_sp, 0)
        hi_kr = jnp.where(ex_sp, hi_sp, 0)
        row = win[pl.ds(slot * K, K)]  # [K, BB]
        found = ex_sp & (ks >= lo_sp) & (ks <= hi_sp) & (row > 0)
        # masked PACKED value: tags are 1..6, so pv > 0 <=> found and
        # pv >> TYPE_BITS is the offset — one tensor carries both through
        # the k+-1 shifts (half the rolls of shifting (offset, found))
        return lo_kr, hi_kr, jnp.where(found, row, 0)

    def shift_km1(row):
        r = pltpu.roll(row, 1, axis=0)
        return jnp.where(row_k == 0, 0, r)

    def shift_kp1(row):
        r = pltpu.roll(row, K - 1, axis=0)
        return jnp.where(row_k == K - 1, 0, r)

    def hist_dma(comp, ob, c):
        # destination: component plane `comp` of the combined backtrace
        # aux tensor [3, S - S0, K(or KW), Bp] (offset0 << 3 | tag per
        # cell, rebased when KW); chunk indices are absolute, rows
        # offset by the resume score
        slot = lax.rem(c, 2)
        return pltpu.make_async_copy(
            ob.at[slot],
            aux_ref.at[comp, pl.ds((c - C0) * CH, CH), :,
                       pl.ds(blk * BB, BB)],
            sem.at[slot, comp],
        )

    def sbase_dma(c):
        # per-score rebase words (vbase << 5 | cb) -> sbase_ref [S, Bp]
        slot = lax.rem(c, 2)
        return pltpu.make_async_copy(
            sb_ob.at[slot],
            sbase_ref.at[pl.ds(c * CH, CH), pl.ds(blk * BB, BB)],
            sem.at[slot, 3],
        )

    def table_dma(idx, src_ref, dst_ref, base):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(base * K, WV * K), pl.ds(blk * BB, BB)],
            dst_ref,
            tsem.at[idx],
        )

    def delete_range_asc(dl, dh, lo, hi):
        """Ascending Delete sweep over [dl, dh] on band [lo, hi]
        (wfa_wavefront.go:171-183 via wfa.go:526-535); [1, BB] rows."""
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
        hi = [jnp.zeros((K, BB), jnp.int32) for _ in range(4)]
        lo = [jnp.zeros((K, BB), jnp.int32) for _ in range(4)]
        fs = [jnp.full((K, BB), _BIG, jnp.int32) for _ in range(4)]
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

    def smax(x, mask):
        """Masked sublane max [K, BB] -> [1, BB]."""
        return jnp.max(jnp.where(mask, x, -_BIG), axis=0, keepdims=True)

    def smin(x, mask):
        return jnp.min(jnp.where(mask, x, _BIG), axis=0, keepdims=True)

    def sany(mask):
        return jnp.max(jnp.where(mask, 1, 0), axis=0, keepdims=True) > 0

    # ---------------- the score loop ----------------
    # With x >= 2, e >= 2 and o+e >= 2, next(s+1) reads only rows/bands
    # older than anything extend/reduce(s) writes (all its source slots
    # differ from slot_s), so the two phases are data-independent and are
    # emitted next-first to give the VLIW scheduler two chains to
    # interleave.  For degenerate penalties the reference order is kept.
    REORDER = X >= 2 and E >= 2 and OE >= 2

    def run_next(s, done, overflow, live_in):
        """WF_NEXT (wfa.go:549-700) + backtrace-aux row construction."""
        s2 = s + 1
        lo_x, hi_x, pv_x = src_read(m_win, mb_lo, mb_hi, mb_ex, s2, X, WM)
        lo_o, hi_o, pv_o = src_read(m_win, mb_lo, mb_hi, mb_ex, s2,
                                    OE, WM)
        lo_ie, hi_ie, pv_ie = src_read(i_win, ib_lo, ib_hi, ib_ex, s2,
                                       E, WE)
        lo_de, hi_de, pv_de = src_read(d_win, db_lo, db_hi, db_ex, s2,
                                       E, WE)

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
            cur = m_win[pl.ds(slot_s2 * K, K)]
            row_m_old = jnp.where(at_seed, cur, 0)
            ex_m_old = jnp.where(at_seed,
                                 mb_ex[pl.ds(slot_s2, 1)], 0) > 0
            lo_m_old = mb_lo[pl.ds(slot_s2, 1)]
            hi_m_old = mb_hi[pl.ds(slot_s2, 1)]
        else:
            row_m_old = jnp.zeros((K, BB), jnp.int32)
            ex_m_old = jnp.zeros((1, BB), bool)
            lo_m_old = jnp.full((1, BB), _BIG, jnp.int32)
            hi_m_old = jnp.full((1, BB), -_BIG, jnp.int32)
        row_m_new = jnp.where(wr_m, (Msk << TYPE_BITS) | tag_m, row_m_old)
        aux_m_new = jnp.where(wr_m, (aux_m_val << TYPE_BITS) | tag_m,
                              row_m_old & 7)

        # the lo min-reduces double as existence tests (empty -> _BIG),
        # saving three dedicated any-reduces
        lo_i_n = smin(ks, wr_i)
        hi_i_n = smax(ks, wr_i)
        lo_d_n = smin(ks, wr_d)
        hi_d_n = smax(ks, wr_d)
        lo_m_raw = smin(ks, wr_m)
        any_i = lo_i_n < _BIG
        any_d = lo_d_n < _BIG
        any_m = lo_m_raw < _BIG
        lo_m_n = jnp.minimum(lo_m_raw,
                             jnp.where(ex_m_old, lo_m_old, _BIG))
        hi_m_n = jnp.maximum(smax(ks, wr_m),
                             jnp.where(ex_m_old, hi_m_old, -_BIG))

        frz = ~live
        # window writes need no freeze select: wr_* already carries
        # `live`, so frozen lanes get 0 (i/d/aux-i/aux-d) or fall through
        # to row_m_old / row_m_old & 7 (m/aux-m), which is itself
        # at_seed-masked — exactly the frozen-lane requirement
        i_win[pl.ds(slot_s2e * K, K)] = row_i_new
        d_win[pl.ds(slot_s2e * K, K)] = row_d_new
        m_win[pl.ds(slot_s2 * K, K)] = row_m_new
        slot_s2a = lax.rem(s2, 2)
        ai_win[pl.ds(slot_s2a * K, K)] = aux_i_new
        ad_win[pl.ds(slot_s2a * K, K)] = aux_d_new
        am_win[pl.ds(slot_s2a * K, K)] = aux_m_new

        ib_lo[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_i, _BIG, lo_i_n)
        ib_hi[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_i, -_BIG, hi_i_n)
        ib_ex[pl.ds(slot_s2e, 1)] = jnp.where(
            frz, 0, any_i.astype(jnp.int32))
        db_lo[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_d, _BIG, lo_d_n)
        db_hi[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_d, -_BIG, hi_d_n)
        db_ex[pl.ds(slot_s2e, 1)] = jnp.where(
            frz, 0, any_d.astype(jnp.int32))
        keep_m = any_m | ex_m_old
        mb_lo[pl.ds(slot_s2, 1)] = jnp.where(
            frz, jnp.where(ex_m_old, lo_m_old, _BIG),
            jnp.where(keep_m, lo_m_n, _BIG))
        mb_hi[pl.ds(slot_s2, 1)] = jnp.where(
            frz, jnp.where(ex_m_old, hi_m_old, -_BIG),
            jnp.where(keep_m, hi_m_n, -_BIG))
        mb_ex[pl.ds(slot_s2, 1)] = jnp.where(
            frz, ex_m_old.astype(jnp.int32), keep_m.astype(jnp.int32))

        return overflow

    def body(carry):
        (s, done, overflow, final_s, term_cell, wbase,
         end_found, end_s, end_k, end_cell) = carry

        live0 = (done == 0) & (overflow == 0)  # [1, BB]
        slot_s = lax.rem(s, WM)
        slot_se = lax.rem(s, WE)
        lo_ms = mb_lo[pl.ds(slot_s, 1)]
        hi_ms = mb_hi[pl.ds(slot_s, 1)]
        ex_ms = mb_ex[pl.ds(slot_s, 1)] > 0

        # -- DMA bookkeeping: before writing into this chunk's obuf slot,
        # wait out the DMA issued two chunks ago on the same slot.
        c = s // CH

        @pl.when((lax.rem(s, CH) == 0) & (c >= C0 + 2))
        def _():
            hist_dma(0, ob_m, c - 2).wait()
            hist_dma(1, ob_i, c - 2).wait()
            hist_dma(2, ob_d, c - 2).wait()
            if KW:
                sbase_dma(c - 2).wait()

        if REORDER:
            # a pair that terminates at s harmlessly writes s+1 rows
            # (never read: rows above final_s are ignored downstream)
            overflow = run_next(s, done, overflow, live0)

        # ---- extend (wfa.go:381-458) ----
        # One select-chain pass over the 64-bit stop words plus a 64-bit
        # clz; runs crossing the 64-bit group resolve via the
        # first-stop-after table.  No gathers, no data-dependent loop.
        cell = m_win[pl.ds(slot_s * K, K)]
        off = cell >> TYPE_BITS
        valid = (cell > 0) & (ks >= lo_ms) & (ks <= hi_ms) & ex_ms & live0
        h0 = off
        v0 = off - ks
        act0 = valid & (v0 > 0) & (v0 < qlen) & (h0 < tlen)
        outrun_now = jnp.zeros((1, BB), jnp.int32)
        # VSPACE: the table indexes query progress v through the per-row
        # shear (c0 = sheared lookup, c_abs = absolute v for run math)
        if VSPACE:
            c_abs = v0
            c0 = v0 - (sg6 << 6)
        else:
            c0 = c_abs = h0 + toff
        w2 = jnp.clip(c0 >> 6, 0, Lw2 - 1)
        WF = 8  # fast-path word-group window (VMEM-resident tables)
        if not STREAM and Lw2 <= WF:
            word_hi, word_lo, fsa0 = select_chain(
                Lw2,
                lambda w: whi_ref[w * K:(w + 1) * K],
                lambda w: wlo_ref[w * K:(w + 1) * K],
                lambda w: fsa_ref[w * K:(w + 1) * K],
                w2)
        elif not STREAM:
            # offsets advance monotonically and a block's live cells
            # cluster, so a small window anchored at the minimum live
            # group almost always covers the step; the full-table scan
            # runs only on the rare spread-out step (lax.cond, so the
            # slow branch costs nothing when not taken)
            wmin = jnp.clip(jnp.min(jnp.where(act0, w2, Lw2)),
                            0, Lw2 - WF)
            spread = jnp.any(act0 & (w2 >= wmin + WF))

            def _full():
                return select_chain(
                    Lw2,
                    lambda w: whi_ref[w * K:(w + 1) * K],
                    lambda w: wlo_ref[w * K:(w + 1) * K],
                    lambda w: fsa_ref[w * K:(w + 1) * K],
                    w2)

            def _fast():
                return select_chain(
                    WF,
                    lambda j: whi_ref[pl.ds((wmin + j) * K, K)],
                    lambda j: wlo_ref[pl.ds((wmin + j) * K, K)],
                    lambda j: fsa_ref[pl.ds((wmin + j) * K, K)],
                    w2, base=wmin)

            word_hi, word_lo, fsa0 = lax.cond(spread, _full, _fast)
        else:
            # slide the VMEM window when any live lane leaves it; offsets
            # only grow, so the window base is monotone.  Pairs whose
            # spread exceeds the window are marked overflow and excluded.
            wmax = jnp.max(jnp.where(act0, w2, -1))
            wmin = jnp.clip(jnp.min(jnp.where(act0, w2, Lw2)),
                            0, Lw2 - WV)
            refill = wmax >= wbase + WV

            @pl.when(refill)
            def _():
                table_dma(0, whi_ref, twhi, wmin).start()
                table_dma(1, wlo_ref, twlo, wmin).start()
                table_dma(2, fsa_ref, tfsa, wmin).start()
                table_dma(0, whi_ref, twhi, wmin).wait()
                table_dma(1, wlo_ref, twlo, wmin).wait()
                table_dma(2, fsa_ref, tfsa, wmin).wait()

            wbase = jnp.where(refill, wmin, wbase)
            wbase_n = wbase
            outrun = act0 & (w2 >= wbase_n + WV)
            outrun_now = jnp.where(sany(outrun) & live0, 1, outrun_now)
            overflow = jnp.where(outrun_now > 0, 1, overflow)
            act0 = act0 & ~outrun
            word_hi, word_lo, fsa0 = select_chain(
                WV,
                lambda j: twhi[j * K:(j + 1) * K],
                lambda j: twlo[j * K:(j + 1) * K],
                lambda j: tfsa[j * K:(j + 1) * K],
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
            jnp.where(vis_lo != 0, 32 + lax.clz(vis_lo), fsa0 - c_abs),
        )
        n_ext = jnp.where(act0, n_ext, 0)
        if VSPACE:
            # a first stop at/past the v-table edge is unrepresentable
            # (the true stop may lie further; sheared-away top groups
            # read as stop-free with fsa=BIG) — escape those pairs (the
            # retries are exact).  The table's extra 64-position group
            # (engine._stop_tables_v) keeps the v == qlen stop of
            # qlen == VW pairs representable, so only shear-outrun
            # cells and qlen >= VW + 64 pairs can hit this.
            vwt = Lw2 * 64
            bad_ext = act0 & (c_abs + n_ext >= vwt)
            outrun_now = jnp.where(sany(bad_ext), 1, outrun_now)
            overflow = jnp.where(outrun_now > 0, 1, overflow)
            act0 = act0 & ~bad_ext
            n_ext = jnp.where(act0, n_ext, 0)
        row_m = jnp.where(act0 & (n_ext > 0), cell + (n_ext << TYPE_BITS),
                          cell)

        # ---- termination (wfa.go:235-239) ----
        cell_ak = jnp.sum(jnp.where(row_k == j_ak, row_m, 0), axis=0,
                          keepdims=True)
        found_ak = ex_ms & (ak >= lo_ms) & (ak <= hi_ms) & (cell_ak > 0)
        off_ak = jnp.where(found_ak, cell_ak >> TYPE_BITS, 0)
        newly = live0 & ex_ms & (off_ak >= tlen)
        final_s = jnp.where(newly, s, final_s)
        term_cell = jnp.where(newly, cell_ak, term_cell)
        done = jnp.where(newly, 1, done)
        # A pair terminating at s may have picked up a spurious overflow
        # earlier in this step (REORDER's run_next band-escape for s+1,
        # or — global only — a stop-table window outrun on a diagonal the
        # terminal cell does not need); the reference checks termination
        # before next (wfa.go:235-250), so such a pair's result is valid.
        # Entering this step it had overflow == 0 (live0), so clearing
        # here only cancels this step's bit.  Semi-global keeps outrun
        # overflows: its end finder reads every stored row, and the
        # outran cell is missing the reference's extension.
        cancel = newly if GLOBAL else (newly & (outrun_now == 0))
        overflow = jnp.where(cancel, 0, overflow)
        live = (done == 0) & (overflow == 0)

        # ---- wf-adaptive reduce (wfa.go:461-540) ----
        row_i = i_win[pl.ds(slot_se * K, K)]
        row_d = d_win[pl.ds(slot_se * K, K)]
        if REDUCE_ON:
            red = ex_ms & live & ((hi_ms - lo_ms + 1) >= MIN_WF_LEN)
            offc = row_m >> TYPE_BITS
            hs = offc
            vs = offc - ks
            validc = (row_m > 0) & (ks >= lo_ms) & (ks <= hi_ms)
            okd = validc & ~((vs < 0) | (vs >= qlen) | (hs >= tlen))
            dist = jnp.maximum(tlen - hs, qlen - vs)
            dmin = smin(dist, okd)
            marked = okd & ((dist - dmin) > MAX_DIST_DIFF)
            good = okd & ~marked
            first_good = smin(row_k, good)
            last_mark = smax(row_k, marked & (row_k < first_good))
            any_marked = sany(marked)
            any_good = first_good < _BIG  # smin doubles as the any-test
            last_good = smax(row_k, good)
            new_lo = jnp.where(last_mark > -_BIG, k0 + last_mark + 1, lo_ms)
            new_hi = jnp.where(any_marked & any_good, k0 + last_good, hi_ms)
            new_lo = jnp.where(red, new_lo, lo_ms)
            new_hi = jnp.where(red, new_hi, hi_ms)

            zero_m = validc & ((ks < new_lo) | (ks > new_hi)) & red
            row_m = jnp.where(zero_m, 0, row_m)
            mb_lo[pl.ds(slot_s, 1)] = jnp.where(red, new_lo, lo_ms)
            mb_hi[pl.ds(slot_s, 1)] = jnp.where(red, new_hi, hi_ms)

            # co-deletion from I and D (wfa.go:526-535)
            def co_delete(row_c, lo_r, hi_r, ex_r, slot):
                lo_cs = lo_r[pl.ds(slot, 1)]
                hi_cs = hi_r[pl.ds(slot, 1)]
                gate = red & (ex_r[pl.ds(slot, 1)] > 0)
                l1, h1, zl1, zh1 = delete_range_asc(
                    lo_ms, new_lo - 1, lo_cs, hi_cs)
                l2, h2, zl2, zh2 = delete_range_asc(
                    new_hi + 1, hi_ms, l1, h1)
                zero = gate & (((ks >= zl1) & (ks <= zh1))
                               | ((ks >= zl2) & (ks <= zh2)))
                row_c = jnp.where(zero, 0, row_c)
                lo_r[pl.ds(slot, 1)] = jnp.where(gate, l2, lo_cs)
                hi_r[pl.ds(slot, 1)] = jnp.where(gate, h2, hi_cs)
                return row_c

            row_i = co_delete(row_i, ib_lo, ib_hi, ib_ex, slot_se)
            row_d = co_delete(row_d, db_lo, db_hi, db_ex, slot_se)
            i_win[pl.ds(slot_se * K, K)] = row_i
            d_win[pl.ds(slot_se * K, K)] = row_d

        m_win[pl.ds(slot_s * K, K)] = row_m

        if not GLOBAL:
            # ---- semi-global end finder, fused into the loop ----
            # The reference scans stored scores high->low after the loop
            # (wfa.go:270-375); per score the nearest *stop* cell on each
            # side of Ak decides (absent cells are skipped, the first
            # bound-violating cell fails the direction, the first
            # last-row/col cell succeeds), the up-scan result winning at
            # the kept score.  Row s is final right here (post-extend,
            # post-reduce; never rewritten), and ascending s makes the
            # first success the minimum score — so one masked pass per
            # step replaces the post-hoc scan over the raw history that
            # the old kernel could not keep.
            h_e = row_m >> TYPE_BITS
            v_e = h_e - ks
            okc = row_m > 0
            viol = (v_e <= 0) | (v_e > qlen) | (h_e > tlen)
            elig = (((v_e == qlen) & (h_e >= qlen))
                    | ((h_e == tlen) & (v_e >= tlen)))
            stop = okc & (viol | elig)
            succ = okc & ~viol & elig
            dn = ks <= ak
            k_dn = smax(ks, stop & dn)
            succ_dn = sany(succ & dn & (ks == k_dn))
            up = ks >= ak + 1
            k_up = smin(ks, stop & up)
            succ_up = sany(succ & up & (ks == k_up))
            newly_e = live0 & (end_found == 0) & (succ_dn | succ_up)
            k_sel = jnp.where(succ_up, k_up, k_dn)
            cell_sel = jnp.sum(jnp.where(ks == k_sel, row_m, 0), axis=0,
                               keepdims=True)
            end_s = jnp.where(newly_e, s, end_s)
            end_k = jnp.where(newly_e, k_sel, end_k)
            end_cell = jnp.where(newly_e, cell_sel, end_cell)
            end_found = jnp.where(newly_e, 1, end_found)

        # ---- stream backtrace-aux row s to HBM ----
        # aux row values were final at creation (aux = pre-extension
        # offsets); masking by the current cell row applies this
        # iteration's reduce/co-delete deletions
        och = lax.rem(s, CH)
        oslot = lax.rem(c, 2)
        wrote = live0
        slot_sa = lax.rem(s, 2)
        am = am_win[pl.ds(slot_sa * K, K)]
        ai = ai_win[pl.ds(slot_sa * K, K)]
        ad = ad_win[pl.ds(slot_sa * K, K)]
        a_m = jnp.where(wrote & (row_m != 0), am, 0)
        a_i = jnp.where(wrote & (row_i != 0), ai, 0)
        a_d = jnp.where(wrote & (row_d != 0), ad, 0)
        if KW:
            # rebased aux: keep only a KW-row window per score.  Window
            # base = the post-reduce M/I/D band union's first row,
            # 32-quantized (cb); values rebase to the row's minimum
            # live offset0 (vbase) so cells are int16 at any length —
            # longread's trick (pallas_longread.py:623-657) with an
            # explicit spread check instead of trust.  Pairs whose band
            # width or offset spread escapes the window overflow and
            # retry a wider tier.
            lo_u = jnp.full((1, BB), _BIG, jnp.int32)
            hi_u = jnp.full((1, BB), -_BIG, jnp.int32)
            anyb = jnp.zeros((1, BB), bool)
            for lo_r, hi_r, ex_r, sl in ((mb_lo, mb_hi, mb_ex, slot_s),
                                         (ib_lo, ib_hi, ib_ex, slot_se),
                                         (db_lo, db_hi, db_ex, slot_se)):
                exc = ex_r[pl.ds(sl, 1)] > 0
                lo_u = jnp.where(exc, jnp.minimum(
                    lo_u, lo_r[pl.ds(sl, 1)]), lo_u)
                hi_u = jnp.where(exc, jnp.maximum(
                    hi_u, hi_r[pl.ds(sl, 1)]), hi_u)
                anyb = anyb | exc
            jlo = lo_u - k0
            jhi = hi_u - k0
            # 32-row base quantum: sublane-tile aligned, <= 31 so the
            # base fits sbase's low 5 bits, and only 31 rows of window
            # budget lost to rounding
            cb = jnp.clip(lax.div(jlo, 32), 0, (K - KW) // 32)
            cb = jnp.where(anyb, cb, 0)

            def vext(a, mi):
                v = a >> TYPE_BITS
                fill = _BIG if mi else -_BIG
                red_ = jnp.min if mi else jnp.max
                return red_(jnp.where(a > 0, v, fill), axis=0,
                            keepdims=True)

            vb = jnp.minimum(jnp.minimum(vext(a_m, True), vext(a_i, True)),
                             vext(a_d, True))
            vmx = jnp.maximum(jnp.maximum(vext(a_m, False),
                                          vext(a_d, False)),
                              vext(a_i, False))
            vb = jnp.maximum(jnp.where(vb >= _BIG, 0, vb), 0)
            escape = anyb & wrote & (
                ((jhi - cb * 32) >= KW) | ((vmx - vb + 1) > 4095))
            overflow = jnp.where(escape, 1, overflow)

            def reb(a):
                v = (a >> TYPE_BITS) - vb + 1
                a2 = jnp.where(a > 0, (v << TYPE_BITS) | (a & 7), 0)
                bit = 0
                while (32 << bit) <= (K - KW):
                    amt = 32 << bit
                    sh = jnp.concatenate(
                        [a2[amt:], jnp.zeros((amt, BB), a2.dtype)], 0)
                    a2 = jnp.where(((cb >> bit) & 1) == 1, sh, a2)
                    bit += 1
                return a2[:KW]

            a_m = reb(a_m)
            a_i = reb(a_i)
            a_d = reb(a_d)
            sb_ob[pl.ds(oslot, 1), pl.ds(och, 1)] = (
                (vb << 5) | cb)[None]
        ob_m[pl.ds(oslot, 1), pl.ds(och, 1)] = a_m.astype(
            cell_dtype)[None, None]
        ob_i[pl.ds(oslot, 1), pl.ds(och, 1)] = a_i.astype(
            cell_dtype)[None, None]
        ob_d[pl.ds(oslot, 1), pl.ds(och, 1)] = a_d.astype(
            cell_dtype)[None, None]

        @pl.when(lax.rem(s, CH) == CH - 1)
        def _():
            hist_dma(0, ob_m, c).start()
            hist_dma(1, ob_i, c).start()
            hist_dma(2, ob_d, c).start()
            if KW:
                sbase_dma(c).start()

        if not REORDER:
            overflow = run_next(s, done, overflow, live)

        return (s + 1, done, overflow, final_s, term_cell, wbase,
                end_found, end_s, end_k, end_cell)

    def cond(carry):
        s = carry[0]
        done, overflow = carry[1], carry[2]
        return (s < S - 1) & jnp.any((done == 0) & (overflow == 0))

    z1 = jnp.zeros((1, BB), jnp.int32)
    if RESUME is None:
        carry = (jnp.int32(0), z1, ovf0, z1, z1, jnp.int32(-WV),
                 z1, z1, z1, z1)
    else:
        # done/final_s/term_cell and the end-finder state carry over
        # from the phase-1 prefix (params rows 12..18)
        carry = (jnp.int32(S0), prow(12), ovf0, prow(13), prow(14),
                 jnp.int32(-WV), prow(15), prow(16), prow(17), prow(18))
    carry = lax.while_loop(cond, body, carry)
    (s_exit, done, overflow, final_s, term_cell, _,
     end_found, end_s, end_k, end_cell) = carry

    # flush the partial output chunk and drain outstanding DMAs
    nchunks = (s_exit + CH - 1) // CH

    @pl.when(lax.rem(s_exit, CH) != 0)
    def _():
        hist_dma(0, ob_m, nchunks - 1).start()
        hist_dma(1, ob_i, nchunks - 1).start()
        hist_dma(2, ob_d, nchunks - 1).start()
        if KW:
            sbase_dma(nchunks - 1).start()

    @pl.when(nchunks >= C0 + 1)
    def _():
        hist_dma(0, ob_m, nchunks - 1).wait()
        hist_dma(1, ob_i, nchunks - 1).wait()
        hist_dma(2, ob_d, nchunks - 1).wait()
        if KW:
            sbase_dma(nchunks - 1).wait()

    @pl.when(nchunks >= C0 + 2)
    def _():
        hist_dma(0, ob_m, nchunks - 2).wait()
        hist_dma(1, ob_i, nchunks - 2).wait()
        hist_dma(2, ob_d, nchunks - 2).wait()
        if KW:
            sbase_dma(nchunks - 2).wait()

    if EXPORT:
        # phase-1 export: still-running pairs continue in phase 2 (no
        # overflow marking, raw end-finder state), and the VMEM windows
        # + band slots DMA to the HBM state_ref for the XLA-side rebase
        # (a VMEM state block would double-buffer ~38MB past the cap)
        res = jnp.concatenate(
            [final_s, done, overflow, end_found,
             term_cell, end_s, end_k, end_cell], axis=0)
        out_ref[:] = res
        sae = (S - 1) % 2  # aux rows for score S-1
        # bands stage through one 8-aligned scratch (DMA row counts must
        # be multiples of 8; WM=9/WE=3 rows are not)
        o = 0
        for r, n in ((mb_lo, WM), (mb_hi, WM), (mb_ex, WM),
                     (ib_lo, WE), (ib_hi, WE), (ib_ex, WE),
                     (db_lo, WE), (db_hi, WE), (db_ex, WE)):
            bscr[o:o + n] = r[...]
            o += n
        NBP = bscr.shape[0]
        srcs = [
            (m_win, WM * K), (i_win, WE * K), (d_win, WE * K),
            (am_win.at[pl.ds(sae * K, K)], K),
            (ai_win.at[pl.ds(sae * K, K)], K),
            (ad_win.at[pl.ds(sae * K, K)], K),
            (bscr, NBP),
        ]
        o = 0
        dmas = []
        for i, (src, n) in enumerate(srcs):
            d = pltpu.make_async_copy(
                src,
                state_ref.at[pl.ds(o, n), pl.ds(blk * BB, BB)],
                st_sem.at[i])
            d.start()
            dmas.append(d)
            o += n
        for d in dmas:
            d.wait()
        return
    overflow = jnp.where(done == 0, 1, overflow)
    # the reference's end finder falls back to (termination score, Ak)
    # when no last-row/col cell exists (wfa.go:280-282 init values)
    if not GLOBAL:
        fb = end_found == 0
        end_s = jnp.where(fb, final_s, end_s)
        end_k = jnp.where(fb, ak, end_k)
        end_cell = jnp.where(fb, term_cell, end_cell)
    else:
        end_s, end_k, end_cell = final_s, ak, term_cell
    res = jnp.concatenate(
        [final_s, done, overflow, jnp.broadcast_to(s_exit, (1, BB)),
         term_cell, end_s, end_k, end_cell], axis=0)
    out_ref[:] = res


def pallas_run_batch(qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig,
                     B: int, Lq: int, Ltb: int, interpret: bool = False,
                     wv: int = 0, bb: int = 0):
    """Run the fused score-loop kernel; returns
    (final_s, done, overflow, term_cell, aux[3, S, K, Bp], Bp) for B pairs.

    ``aux`` holds, per cell, the backtrace's branch-selected
    pre-extension offset and the cell tag (``offset0 << 3 | tag``, 0 =
    absent) — everything the device backtrace's chase needs in ONE value;
    pairs live on the LAST axis (lanes), matching the kernel layout —
    consumers index it as ``aux[comp, s, k - k0, b]``.  ``term_cell`` is
    the raw packed M cell at (final_s, Ak) that triggered termination
    (the backtrace start point).  Rows above a pair's final score and
    overflow pairs' lanes contain garbage — consumers must respect
    final_s/overflow."""
    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win
    assert supports(cfg, Ltb), "config not supported by the fused kernel"

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff = toff.astype(jnp.int32)
    k0 = -toff
    Ak = tlen - qlen

    overflow0 = (Ak < k0) | (Ak >= k0 + K) | (0 < k0) | (0 >= k0 + K)
    if not cfg.global_alignment:
        overflow0 = overflow0 | ((tlen - 1) >= k0 + K)

    words, fsa = _stop_tables(qb, tbuf, qlen, tlen, toff, K, Lq, Ltb)
    # regroup the 32-bit stop words into 64-bit (hi, lo) pairs; the
    # 64-level first-stop-after table is the 32-level one at odd indices
    Lw = words.shape[-1]
    if Lw % 2:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, 1)))
        fsa = jnp.pad(fsa, ((0, 0), (0, 0), (0, 1)),
                      constant_values=int(_BIG))
    # group-major rows, pairs on lanes: [Lw2*K, B]
    whi = jnp.transpose(words[..., 0::2], (2, 1, 0))  # [Lw2, K, B]
    wlo = jnp.transpose(words[..., 1::2], (2, 1, 0))
    fsa64 = jnp.transpose(fsa[..., 1::2], (2, 1, 0))
    Lw2 = whi.shape[0]
    whi = whi.reshape(Lw2 * K, B)
    wlo = wlo.reshape(Lw2 * K, B)
    fsa64 = fsa64.reshape(Lw2 * K, B)

    (row0, lo0, hi0, ex0), (rowx, lox, hix, exx) = _seed_rows(
        qb, tbuf, qlen, tlen, toff,
        mismatch=int(p.mismatch), global_alignment=cfg.global_alignment,
        K=K, Lq=Lq, Ltb=Ltb)
    if p.mismatch >= S:
        overflow0 = overflow0 | exx
    row0 = row0.T  # [K, B]
    rowx = rowx.T

    params = jnp.stack(
        [qlen, tlen, toff, Ak - k0, overflow0.astype(jnp.int32),
         lo0, hi0, ex0.astype(jnp.int32),
         lox, hix, exx.astype(jnp.int32), Ak]
        + [jnp.zeros_like(qlen)] * (_NP - 12), axis=0)  # [_NP, B]

    # block size: 128 pair lanes amortize the per-step fixed cost.  On
    # hardware the lane-axis DMA slices (aux history, streamed tables)
    # must be 128-aligned, so bb is fixed at 128 there (small batches
    # pad); interpret mode (CPU tests) shrinks blocks to fit the batch.
    if bb <= 0:
        bb = B_BLK
        if interpret:
            while bb > 8 and B <= bb // 2:
                bb //= 2
    # pad the batch to a block multiple along the lane axis (padding
    # lanes are marked overflow so the loop never waits on them)
    Bp = ((B + bb - 1) // bb) * bb
    if Bp != B:
        pad = Bp - B

        def pad_lanes(a, ovf_row=None):
            fill = jnp.tile(a[:, :1], (1, pad))
            if ovf_row is not None:
                fill = fill.at[ovf_row].set(1)
            return jnp.concatenate([a, fill], axis=1)

        params = pad_lanes(params, ovf_row=4)
        whi = pad_lanes(whi)
        wlo = pad_lanes(wlo)
        fsa64 = pad_lanes(fsa64)
        row0 = jnp.concatenate([row0, jnp.zeros((K, pad), jnp.int32)], 1)
        rowx = jnp.concatenate([rowx, jnp.zeros((K, pad), jnp.int32)], 1)

    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    # wide windows (semi-global full-span) shrink the DMA chunk and the
    # minimum table window so the VMEM working set stays under budget
    ch = CH if K <= 256 else (4 if K <= 512 else 2)
    budget_wv = max(4, ((6 if K <= 512 else 12) << 20) // (3 * bb * K * 4))
    if wv <= 0:
        wv = cfg.w_win or 0  # engine-config hint (also the jit key)
    # explicit windows are clamped to the VMEM budget, never raised
    wv = min(wv, budget_wv) if wv > 0 else min(64, budget_wv)
    WV = wv
    stream = Lw2 > WV
    # 16-bit aux cells when offsets fit 13 bits shrink the dominant
    # history DMA stream and HBM footprint by half; rebased aux (aux_kw)
    # is value-rebased, so int16 at ANY length
    KW = int(cfg.aux_kw or 0)
    if KW:
        # rebased aux needs bands that fit a KW window; semi-global's
        # full-span seed bands never do (every pair would escape)
        assert cfg.global_alignment, "aux_kw is global-alignment only"
        assert KW % 128 == 0 and 0 < KW <= K, (KW, K)
        assert (K - KW) // 32 <= 31  # the base fits sbase's low 5 bits
        assert Ltb < (1 << 26)  # vbase rides sbase words as vb << 5
    cell16 = Ltb <= 4095 or KW > 0
    cell_dtype = jnp.int16 if cell16 else jnp.int32
    kern = functools.partial(
        _kernel, S=S, K=K, Lw2=Lw2, WV=WV, BB=bb, CH=ch,
        X=int(p.mismatch), OE=int(p.gap_open + p.gap_ext),
        E=int(p.gap_ext),
        GLOBAL=cfg.global_alignment,
        REDUCE_ON=cfg.adaptive is not None,
        MIN_WF_LEN=int(cfg.adaptive.min_wf_len) if cfg.adaptive else 0,
        MAX_DIST_DIFF=int(cfg.adaptive.max_dist_diff) if cfg.adaptive else 0,
        CELL16=cell16, KW=KW,
    )
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        table_specs = [
            pl.BlockSpec((Lw2 * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ] * 3
    twv = WV if stream else 1

    nblk = Bp // bb
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_NP, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ] + table_specs + [
            pl.BlockSpec((K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
    out_specs=[
            pl.BlockSpec((8, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if KW else []),
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((3, S, KW or K, Bp), cell_dtype),
        ] + ([jax.ShapeDtypeStruct((S, Bp), jnp.int32)] if KW else []),
        scratch_shapes=[
            pltpu.VMEM((WM * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((2, ch, KW or K, bb), cell_dtype),
            pltpu.VMEM((2, ch, KW or K, bb), cell_dtype),
            pltpu.VMEM((2, ch, KW or K, bb), cell_dtype),
            pltpu.SemaphoreType.DMA((2, 4 if KW else 3)),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ] + ([pltpu.VMEM((2, ch, bb), jnp.int32)] if KW else []),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # wide-window kernels (semi-global full-span K) legitimately
            # hold >16MB of VMEM scratch; v5e has 128MB physical VMEM
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(params, whi, wlo, fsa64, row0, rowx)
    if KW:
        out, aux, sbase = out
    else:
        (out, aux), sbase = out, None

    final_s = out[0, :B]
    done = out[1, :B] > 0
    overflow = out[2, :B] > 0
    term_cell = out[4, :B]
    end = (out[5, :B], out[6, :B], out[7, :B])  # semi-global start point
    # aux stays padded to the block multiple — slicing would copy GBs;
    # the backtrace takes the padded lane stride instead
    return final_s, done, overflow, term_cell, aux, Bp, end, sbase


def supports_prefix(cfg: EngineConfig) -> bool:
    """Penalty gates for the wide prefix-export kernel (the K<=512 perf
    gate does not apply: the prefix runs a few dozen steps, where even a
    tile-inefficient wide kernel beats the XLA engine ~10x)."""
    p = cfg.penalties
    wm = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    return wm <= 64 and p.gap_ext + 1 <= 64


def prefix_kernel_fits(cfg: EngineConfig, Kf: int, Ltb: int) -> bool:
    """VMEM-size gate for BOTH wide prefix kernels (whole-K EXPORT and
    the chunked variant): their scratch scales linearly with the full
    span Kf — M/I/D circular windows (WM+2*WE rows of Kf), aux mirrors
    (6*Kf), obuf staging (12*Kf cells), the streamed v-table window
    (3*WV*Kf) and the seed-row in-specs (2*Kf), all at 128 lanes.  At
    the default 4/6/2 penalties that is ~27 KB per diagonal: ~59 MB at
    Kf=2176 (l=1000, fits) but >110 MB at Kf>=4224 (l>=2000) — over the
    100 MB Mosaic scoped-VMEM cap, a hardware-only compile failure that
    interpret-mode tests cannot see.  Callers fall back to the XLA
    full-span prefix when this returns False."""
    p = cfg.penalties
    wm = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    we = p.gap_ext + 1
    cell = 2 if Ltb + 2 <= 4095 else 4
    rows32 = (wm + 2 * we) * Kf + 6 * Kf + 3 * 8 * Kf + 2 * Kf
    vmem = rows32 * B_BLK * 4 + 12 * Kf * B_BLK * cell + (1 << 20)
    return vmem <= 92 << 20


def _prefix_inputs(qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig,
                   B: int, Lq: int, Ltb: int, VW: int):
    """Shared phase-1 input construction for the wide prefix kernels
    (whole-K EXPORT mode here; chunked variant in wfa_tpu.pallas_prefix):
    sheared v-space stop tables in the kernels' group-major
    pairs-on-lanes layout, seed rows, and the packed params tensor."""
    from .engine import _seed_rows, _stop_tables_v_lanes

    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff = toff.astype(jnp.int32)
    k0 = -toff
    Ak = tlen - qlen

    overflow0 = (
        (Ak < k0) | (Ak >= k0 + K) | (0 < k0) | (0 >= k0 + K)
        | ((tlen - 1) >= k0 + K)
    )

    # lane-major build: tables arrive already word-major/pairs-on-lanes
    # ([Lvw, K, B]) — no [B, K, Lw] megatranspose (engine._stop_tables_v_lanes)
    words_t, fsa_t = _stop_tables_v_lanes(
        qb, tbuf, qlen, tlen, toff, K, Lq, Ltb, VW)
    whi = words_t[0::2]  # [Lw2, K, B]
    wlo = words_t[1::2]
    fsa64 = fsa_t[1::2]
    Lw2 = whi.shape[0]
    # per-row 64-bit-group shear by max(0, toff - j) >> 6 (see
    # engine._run_batch_impl): first-row AND first-column seeds then
    # both look up near their progress-along-the-diagonal, so the
    # kernel's anchored group window covers every live cell; the kernel
    # subtracts the same shear from its lookup index (VSPACE mode)
    sg = (jnp.maximum(0, toff[None, :]
                      - jnp.arange(K, dtype=jnp.int32)[:, None]) >> 6)
    for bit in range(max(1, Lw2).bit_length()):
        amt = 1 << bit
        if amt > Lw2:
            break
        m = (((sg >> bit) & 1) == 1)[None]
        z = jnp.zeros((amt,) + whi.shape[1:], jnp.int32)
        zf = jnp.full((amt,) + whi.shape[1:], int(_BIG), jnp.int32)
        whi = jnp.where(m, jnp.concatenate([whi[amt:], z], 0), whi)
        wlo = jnp.where(m, jnp.concatenate([wlo[amt:], z], 0), wlo)
        fsa64 = jnp.where(m, jnp.concatenate([fsa64[amt:], zf], 0), fsa64)
    whi = whi.reshape(Lw2 * K, B)
    wlo = wlo.reshape(Lw2 * K, B)
    fsa64 = fsa64.reshape(Lw2 * K, B)

    (row0, lo0, hi0, ex0), (rowx, lox, hix, exx) = _seed_rows(
        qb, tbuf, qlen, tlen, toff,
        mismatch=int(p.mismatch), global_alignment=False,
        K=K, Lq=Lq, Ltb=Ltb)
    if p.mismatch >= S:
        overflow0 = overflow0 | exx
    row0 = row0.T
    rowx = rowx.T

    params = jnp.stack(
        [qlen, tlen, toff, Ak - k0, overflow0.astype(jnp.int32),
         lo0, hi0, ex0.astype(jnp.int32),
         lox, hix, exx.astype(jnp.int32), Ak]
        + [jnp.zeros_like(qlen)] * (_NP - 12), axis=0)
    return params, whi, wlo, fsa64, row0, rowx, Lw2


def pallas_run_prefix(
    qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig, B: int, Lq: int,
    Ltb: int, VW: int, interpret: bool = False,
):
    """Run the full-span semi-global prefix (scores 0..s_cap-2) on the
    wide kernel and export the handoff state (EXPORT mode).

    Stop tables are v-space (engine._stop_tables_v): during the wide
    prefix every diagonal's progress clusters below VW, where a c-space
    window would outrun on the seed row.  Returns
    (out [8, B], aux [3, Sa, K, Bp] pairs-on-lanes with rows 0..s_cap-2
    valid, state [TOT, Bp], Bp) — out rows are final_s, done, overflow,
    end_found, term_cell, end_s, end_k, end_cell.
    """
    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win
    assert supports_prefix(cfg) and not cfg.global_alignment

    params, whi, wlo, fsa64, row0, rowx, Lw2 = _prefix_inputs(
        qb, tbuf, qlen, tlen, toff, cfg=cfg, B=B, Lq=Lq, Ltb=Ltb, VW=VW)

    bb = B_BLK  # hardware lane blocks must be 128-wide
    if interpret:
        while bb > 8 and B <= bb // 2:
            bb //= 2
    Bp = ((B + bb - 1) // bb) * bb
    if Bp != B:
        pad = Bp - B

        def pad_lanes(a, ovf_row=None):
            fill = jnp.tile(a[:, :1], (1, pad))
            if ovf_row is not None:
                fill = fill.at[ovf_row].set(1)
            return jnp.concatenate([a, fill], axis=1)

        params = pad_lanes(params, ovf_row=4)
        whi = pad_lanes(whi)
        wlo = pad_lanes(wlo)
        fsa64 = pad_lanes(fsa64)
        row0 = jnp.concatenate([row0, jnp.zeros((K, pad), jnp.int32)], 1)
        rowx = jnp.concatenate([rowx, jnp.zeros((K, pad), jnp.int32)], 1)

    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    ch = CH if K <= 256 else (4 if K <= 512 else 2)
    Sa = ((S + ch - 1) // ch) * ch  # aux rows padded to whole DMA chunks
    # 8-group window (512 v-positions): in-row lookup spread is the
    # wf-adaptive band (~110) plus the 63-position shear remainder
    WV = 8
    stream = Lw2 > WV
    cell16 = Ltb + 2 <= 4095
    cell_dtype = jnp.int16 if cell16 else jnp.int32
    NB = 3 * WM + 6 * WE
    NBP = ((NB + 7) // 8) * 8  # band rows 8-padded for the exit DMA
    TOT = (WM + 2 * WE + 3) * K + NBP
    kern = functools.partial(
        _kernel, S=S, K=K, Lw2=Lw2, WV=WV, BB=bb, CH=ch,
        X=int(p.mismatch), OE=int(p.gap_open + p.gap_ext),
        E=int(p.gap_ext),
        GLOBAL=False,
        REDUCE_ON=cfg.adaptive is not None,
        MIN_WF_LEN=int(cfg.adaptive.min_wf_len) if cfg.adaptive else 0,
        MAX_DIST_DIFF=int(cfg.adaptive.max_dist_diff) if cfg.adaptive else 0,
        CELL16=cell16,
        VSPACE=True, EXPORT=True,
    )
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        table_specs = [
            pl.BlockSpec((Lw2 * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ] * 3
    twv = WV if stream else 1

    nblk = Bp // bb
    out, aux, state = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_NP, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ] + table_specs + [
            pl.BlockSpec((K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((3, Sa, K, Bp), cell_dtype),
            jax.ShapeDtypeStruct((TOT, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WM * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.VMEM((NBP, bb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(params, whi, wlo, fsa64, row0, rowx)
    return out, aux, state, Bp


def pallas_run_resume(
    qb, tbuf2, qlen, tlen, toff2, win_m, win_i, win_d, ainit, b_m, b_ie,
    meta1, *, cfg: EngineConfig, B: int, Lq: int, Ltb2: int,
    Ltb_full: int, S0: int, interpret: bool = False,
):
    """Resume the fused kernel at score ``S0`` from a phase-1 handoff
    (wfa_tpu.semi2.prefix_export): the narrow-window second phase of
    two-phase semi-global alignment.

    ``tbuf2``/``toff2`` are the targets re-placed for the narrow window
    (column c = h + toff2; toff2 may be negative, meaning the buffer
    holds the target's suffix).  Returns
    (final_s, done, overflow, start_s, start_k, start_cell,
    aux2[3, s_cap - S0, K, Bp], Bp) — aux2 rows cover scores >= S0.
    """
    from .semi2 import (M1_DONE, M1_ECELL, M1_EFOUND, M1_EK, M1_ES,
                        M1_FS, M1_OVF, M1_TERM)

    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win
    assert supports(cfg, Ltb2) and not cfg.global_alignment
    assert S0 % CH == 0 and 0 < S0 < S
    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    NB = 3 * WM + 6 * WE

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    toff2 = toff2.astype(jnp.int32)
    k0 = -toff2
    Ak = tlen - qlen

    overflow0 = (meta1[:, M1_OVF] > 0) | (Ak < k0) | (Ak >= k0 + K)

    words, fsa = _stop_tables(qb, tbuf2, qlen, tlen, toff2, K, Lq, Ltb2)
    Lw = words.shape[-1]
    if Lw % 2:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, 1)))
        fsa = jnp.pad(fsa, ((0, 0), (0, 0), (0, 1)),
                      constant_values=int(_BIG))
    whi = jnp.transpose(words[..., 0::2], (2, 1, 0))
    wlo = jnp.transpose(words[..., 1::2], (2, 1, 0))
    fsa64 = jnp.transpose(fsa[..., 1::2], (2, 1, 0))
    Lw2 = whi.shape[0]
    whi = whi.reshape(Lw2 * K, B)
    wlo = wlo.reshape(Lw2 * K, B)
    fsa64 = fsa64.reshape(Lw2 * K, B)

    params = jnp.stack(
        [qlen, tlen, toff2, Ak - k0, overflow0.astype(jnp.int32),
         jnp.zeros_like(qlen), jnp.zeros_like(qlen), jnp.zeros_like(qlen),
         jnp.zeros_like(qlen), jnp.zeros_like(qlen), jnp.zeros_like(qlen),
         Ak,
         meta1[:, M1_DONE], meta1[:, M1_FS], meta1[:, M1_TERM],
         meta1[:, M1_EFOUND], meta1[:, M1_ES], meta1[:, M1_EK],
         meta1[:, M1_ECELL]]
        + [jnp.zeros_like(qlen)] * (_NP - 19), axis=0)

    # pairs-on-lanes layouts: [rows*K, B]
    minit = jnp.transpose(win_m, (0, 2, 1)).reshape(WM * K, B)
    iinit = jnp.transpose(win_i, (0, 2, 1)).reshape(WE * K, B)
    dinit = jnp.transpose(win_d, (0, 2, 1)).reshape(WE * K, B)
    ainit2 = jnp.transpose(ainit, (0, 2, 1)).reshape(3 * K, B)
    binit = jnp.concatenate([b_m, b_ie], axis=0)  # [NB, B]
    assert binit.shape[0] == NB

    bb = B_BLK
    if interpret:
        while bb > 8 and B <= bb // 2:
            bb //= 2
    Bp = ((B + bb - 1) // bb) * bb
    if Bp != B:
        pad = Bp - B

        def pad_lanes(a, ovf_row=None):
            fill = jnp.tile(a[:, :1], (1, pad))
            if ovf_row is not None:
                fill = fill.at[ovf_row].set(1)
            return jnp.concatenate([a, fill], axis=1)

        params = pad_lanes(params, ovf_row=4)
        whi = pad_lanes(whi)
        wlo = pad_lanes(wlo)
        fsa64 = pad_lanes(fsa64)
        minit = pad_lanes(minit)
        iinit = pad_lanes(iinit)
        dinit = pad_lanes(dinit)
        ainit2 = pad_lanes(ainit2)
        binit = pad_lanes(binit)

    ch = CH if K <= 256 else (4 if K <= 512 else 2)
    budget_wv = max(4, ((6 if K <= 512 else 12) << 20) // (3 * bb * K * 4))
    wv = cfg.w_win or 0
    wv = min(wv, budget_wv) if wv > 0 else min(64, budget_wv)
    WV = wv
    stream = Lw2 > WV
    # offsets are absolute target positions (<= tlen <= Ltb_full), even
    # when the re-placed buffer is shorter — Ltb2 must not decide cell16
    cell16 = Ltb_full + 2 <= 4095
    cell_dtype = jnp.int16 if cell16 else jnp.int32
    kern = functools.partial(
        _kernel, S=S, K=K, Lw2=Lw2, WV=WV, BB=bb, CH=ch,
        X=int(p.mismatch), OE=int(p.gap_open + p.gap_ext),
        E=int(p.gap_ext),
        GLOBAL=False,
        REDUCE_ON=cfg.adaptive is not None,
        MIN_WF_LEN=int(cfg.adaptive.min_wf_len) if cfg.adaptive else 0,
        MAX_DIST_DIFF=int(cfg.adaptive.max_dist_diff) if cfg.adaptive else 0,
        CELL16=cell16,
        RESUME=S0,
    )
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        table_specs = [
            pl.BlockSpec((Lw2 * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ] * 3
    twv = WV if stream else 1

    nblk = Bp // bb
    out, aux2 = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_NP, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ] + table_specs + [
            pl.BlockSpec((WM * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WE * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WE * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((3, S - S0, K, Bp), cell_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((WM * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((WE * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((2 * K, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WM, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((WE, bb), jnp.int32),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.VMEM((2, ch, K, bb), cell_dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(params, whi, wlo, fsa64, minit, iinit, dinit, ainit2, binit)

    final_s = out[0, :B]
    done = out[1, :B] > 0
    overflow = out[2, :B] > 0
    start = (out[5, :B], out[6, :B], out[7, :B])
    return final_s, done, overflow, start, aux2, Bp
