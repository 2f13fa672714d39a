"""Chunked wide-K Pallas kernel for the semi-global full-span prefix.

The two-phase semi-global path (wfa_tpu.semi2) needs scores ``0..S0-1``
run at the FULL diagonal span (the reference seeds every diagonal,
wfa.go:163-183) before the live band collapses and the narrow kernel
resumes.  The whole-K EXPORT kernel (pallas_engine, K≈2048) works but
pays two structural costs measured on v5e:

* Mosaic ops on ``[2048, 128]`` tiles run far below ``[512, 128]`` tile
  efficiency (~5x on the round-2 wide-window builds);
* Mosaic compile time scales with per-op tile count — the whole-K
  EXPORT build takes ~12 minutes, gating it behind an env var.

This kernel runs the same algorithm with the diagonal axis processed in
``KC``-row CHUNKS inside ``lax.fori_loop``s: every vector op touches a
``[KC, 128]`` tile (the main kernel's shape), and the compiled body is
one chunk's ops instead of K/KC copies of them.  Semantics follow
pallas_engine._kernel exactly (same phases, same tie-breaks, same
exports); the chunk decomposition changes only HOW each row-space pass
is executed:

* per-step phases become three chunk passes —
  A: next(s+1) first (the REORDER trick: with x>=2, e>=2, o+e>=2 every
     source row/band of next(s+1) is older than anything this step
     writes) then extend + termination/dmin partials;
  B1: the wf-adaptive trim fold (marked-run scan, needs the global dmin
      from A);
  B2: apply reduce/co-delete zeroing + the fused end-finder partials +
      backtrace-aux staging (needs the global band from B1);
* the k±1 shifted reads of next() become neighbour-offset chunk reads:
  window slots are separated by 8 always-zero GUARD rows, so the
  ``j-1``/``j+1`` reads at chunk edges land on zeros (= absent cells,
  exactly the reference's out-of-band semantics) instead of wrapping
  into another wavefront's rows;
* cross-chunk reductions (dmin, band extents, termination cell, the
  end finder's nearest-stop scan, the trim fold's first-good/last-mark
  pair) carry ``[1, BB]`` partials through the fori_loop — the marked-
  run fold exploits ascending chunk order for the reference's
  "contiguous leading run" rule (wfa.go:499-516);
* the chunk loops run DYNAMIC bounds — only the chunks overlapping the
  union of the step's live bands (all lanes) execute, so once
  wf-adaptive collapses the band a step costs ~1 chunk instead of
  K/KC.  Skipped chunks keep stale window rows; every internal read
  band-masks, the per-score obuf rows are bulk-zeroed before staging,
  and the final EXPORT masks each dumped slot by its band so the
  zero-outside-band invariant holds for phase-2 consumers.  Exported
  state for pairs that finished or overflowed inside the prefix is a
  don't-care (they skip phase 2 / retry a wider tier).

The penalty gate (supports_prefix_chunked) requires x, e, o+e >= 2 —
degenerate penalties keep the whole-K kernel (reference order).
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
from .engine import EngineConfig
from .pallas_engine import _NP, B_BLK, _iota, _prefix_inputs

_BIG = np.int32(1 << 30)
G = 8  # guard rows between window slots (always zero)


def supports_prefix_chunked(cfg: EngineConfig) -> bool:
    """Penalty gate: the chunked pass order hoists next(s+1) before this
    step's extend/reduce, which is only legal when every next() source
    is at least two scores old (pallas_engine's REORDER condition)."""
    p = cfg.penalties
    wm = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    return (wm <= 64 and p.gap_ext + 1 <= 64
            and p.mismatch >= 2 and p.gap_ext >= 2
            and p.gap_open + p.gap_ext >= 2)


def _kernel(
    params_ref, whi_ref, wlo_ref, fsa_ref, seed0_ref, seedx_ref,
    out_ref, aux_ref, state_ref,
    m_win, i_win, d_win, am_win, ai_win, ad_win,
    mb_lo, mb_hi, mb_ex, ib_lo, ib_hi, ib_ex, db_lo, db_hi, db_ex,
    ob_m, ob_i, ob_d, sem, twhi, twlo, tfsa, tsem, st_sem, bscr,
    *,
    S, K, KC, Lw2, WV, BB, CH, X, OE, E, REDUCE_ON, MIN_WF_LEN,
    MAX_DIST_DIFF, CELL16,
):
    WM = max(X, OE) + 1
    WE = E + 1
    NC = K // KC
    SS = K + G  # window slot stride (data at slot*SS + G .. + G + K)
    cell_dtype = jnp.int16 if CELL16 else jnp.int32
    STREAM = Lw2 > WV
    blk = pl.program_id(0)

    def prow(i):
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
    iota_c = _iota((KC, BB), 0)

    def drow(win, slot, b0, doff=0):
        """Dynamic start of a KC-row data slice of window ``slot`` at
        row offset b0+doff (guards make doff = ±1 reads safe)."""
        return win[pl.ds(slot * SS + (G + doff) + b0, KC)]

    def dwrite(win, slot, b0, val):
        win[pl.ds(slot * SS + G + b0, KC)] = val

    # ---- init windows & band slots (seeding, wfa.go:143-184) ----
    m_win[...] = jnp.zeros(m_win.shape, jnp.int32)
    i_win[...] = jnp.zeros(i_win.shape, jnp.int32)
    d_win[...] = jnp.zeros(d_win.shape, jnp.int32)
    m_win[G:G + K] = seed0_ref[:]
    if 0 < X < WM:
        m_win[X * SS + G:X * SS + G + K] = seedx_ref[:]
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

    def smax(x, mask):
        return jnp.max(jnp.where(mask, x, -_BIG), axis=0, keepdims=True)

    def smin(x, mask):
        return jnp.min(jnp.where(mask, x, _BIG), axis=0, keepdims=True)

    def sany(mask):
        return jnp.max(jnp.where(mask, 1, 0), axis=0, keepdims=True) > 0

    def src_band(lo_r, hi_r, ex_r, s2, diff, W):
        """KRange + slot for one next() source (scalar [1, BB] parts of
        pallas_engine's src_read; the row reads happen per chunk)."""
        sp = s2 - diff
        okd = sp >= 0
        slot = lax.rem(jnp.maximum(sp, 0), W)
        lo_sp = lo_r[pl.ds(slot, 1)]
        hi_sp = hi_r[pl.ds(slot, 1)]
        ex_sp = (ex_r[pl.ds(slot, 1)] > 0) & okd
        lo_kr = jnp.where(ex_sp, lo_sp, 0)
        hi_kr = jnp.where(ex_sp, hi_sp, 0)
        return slot, lo_sp, hi_sp, ex_sp, lo_kr, hi_kr

    def src_cells(win, slot, lo_sp, hi_sp, ex_sp, ks_c, b0, doff):
        """Masked packed source chunk at row offset doff: the value of
        source diagonal ks_c + doff for each target row (replaces
        shift_km1/kp1 — guard rows supply zeros at the band edges)."""
        row = drow(win, slot, b0, doff)
        ksrc = ks_c + doff
        found = ex_sp & (ksrc >= lo_sp) & (ksrc <= hi_sp) & (row > 0)
        return jnp.where(found, row, 0)

    def hist_dma(comp, ob, c):
        slot = lax.rem(c, 2)
        return pltpu.make_async_copy(
            ob.at[pl.ds(slot * CH * K, CH * K)],
            aux_ref.at[comp, pl.ds(c * CH * K, CH * K),
                       pl.ds(blk * BB, BB)],
            sem.at[slot, comp],
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
        """One-hot select over n word groups on a [KC, BB] chunk."""
        hi = [jnp.zeros((KC, BB), jnp.int32) for _ in range(4)]
        lo = [jnp.zeros((KC, BB), jnp.int32) for _ in range(4)]
        fs = [jnp.full((KC, BB), _BIG, jnp.int32) for _ in range(4)]
        for w in range(n):
            cc = w & 3
            m = w2 == (w if base is None else base + w)
            hi[cc] = jnp.where(m, load_hi(w), hi[cc])
            lo[cc] = jnp.where(m, load_lo(w), lo[cc])
            fs[cc] = jnp.where(m, load_fsa(w), fs[cc])
        word_hi = (hi[0] | hi[1]) | (hi[2] | hi[3])
        word_lo = (lo[0] | lo[1]) | (lo[2] | lo[3])
        fsa0 = jnp.minimum(jnp.minimum(fs[0], fs[1]),
                           jnp.minimum(fs[2], fs[3]))
        return word_hi, word_lo, fsa0

    # ---------------- the score loop ----------------
    def body(carry):
        (s, done, overflow, final_s, term_cell, wbase,
         end_found, end_s, end_k, end_cell) = carry

        live0 = (done == 0) & (overflow == 0)  # [1, BB]
        s2 = s + 1
        slot_s = lax.rem(s, WM)
        slot_se = lax.rem(s, WE)
        lo_ms = mb_lo[pl.ds(slot_s, 1)]
        hi_ms = mb_hi[pl.ds(slot_s, 1)]
        ex_ms = mb_ex[pl.ds(slot_s, 1)] > 0

        c = s // CH

        @pl.when((lax.rem(s, CH) == 0) & (c >= 2))
        def _():
            hist_dma(0, ob_m, c - 2).wait()
            hist_dma(1, ob_i, c - 2).wait()
            hist_dma(2, ob_d, c - 2).wait()

        # ---- next(s+1) scalar prep (bands are slot rows, no chunks) --
        (slot_x, lo_xs, hi_xs, ex_xs, lo_x, hi_x) = src_band(
            mb_lo, mb_hi, mb_ex, s2, X, WM)
        (slot_o, lo_os, hi_os, ex_os, lo_o, hi_o) = src_band(
            mb_lo, mb_hi, mb_ex, s2, OE, WM)
        (slot_ie, lo_ies, hi_ies, ex_ies, lo_ie, hi_ie) = src_band(
            ib_lo, ib_hi, ib_ex, s2, E, WE)
        (slot_de, lo_des, hi_des, ex_des, lo_de, hi_de) = src_band(
            db_lo, db_hi, db_ex, s2, E, WE)
        hi_n = jnp.minimum(
            tlen - 1,
            jnp.maximum(jnp.maximum(hi_x, hi_o),
                        jnp.maximum(hi_ie, hi_de)) + 1)
        lo_n = jnp.maximum(
            -(qlen - 1),
            jnp.minimum(jnp.minimum(lo_x, lo_o),
                        jnp.minimum(lo_ie, lo_de)) - 1)
        overflow = jnp.where(
            live0 & ((lo_n < k0) | (hi_n >= k0 + K)), 1, overflow)
        live_nx = live0 & (overflow == 0)

        slot_s2 = lax.rem(s2, WM)
        slot_s2e = lax.rem(s2, WE)
        slot_s2a = lax.rem(s2, 2)
        at_seed = s2 == X
        ex_m_olds = jnp.where(at_seed, mb_ex[pl.ds(slot_s2, 1)], 0) > 0
        lo_m_olds = mb_lo[pl.ds(slot_s2, 1)]
        hi_m_olds = mb_hi[pl.ds(slot_s2, 1)]

        # ---- dynamic chunk bounds: only the live band's chunks run.
        # Rows outside them keep stale window data, which every read
        # masks away by the per-score band bounds; the obuf rows for
        # skipped chunks are bulk-zeroed in pass B2.  j = k + toff.
        ex_any = ex_xs | ex_os | ex_ies | ex_des
        m_s = ex_ms & live0
        m_n = live_nx & ex_any
        jlo_s = jnp.where(m_s, lo_ms + toff, _BIG)
        jhi_s = jnp.where(m_s, hi_ms + toff, -_BIG)
        jlo_n = jnp.where(m_n, lo_n + toff, _BIG)
        jhi_n = jnp.where(m_n, hi_n + toff, -_BIG)

        def crange(jlo, jhi):
            lo = jnp.min(jlo)
            hi = jnp.max(jhi)
            c0 = lax.div(jnp.clip(lo, 0, K - 1), KC)
            c1 = lax.div(jnp.clip(hi, 0, K - 1), KC)
            c1 = jnp.where(hi < lo, c0 - 1, c1)  # empty: upper < lower
            return c0, c1

        ca0, ca1 = crange(jnp.minimum(jlo_s, jlo_n),
                          jnp.maximum(jhi_s, jhi_n))
        cb0, cb1 = crange(jlo_s, jhi_s)
        # the X seed row spans every diagonal: band(s2==X) widens to the
        # full span in the finalization below, so this step's next-aux
        # staging (read back by pass B2 at s==X) must cover all chunks
        ca0 = jnp.where(at_seed, 0, ca0)
        ca1 = jnp.where(at_seed, NC - 1, ca1)

        # ---- pass A: next(s+1) + extend + termination/dmin partials --
        # (the s2 band extents ride the fori carry — VMEM band-slot
        # read-modify-writes inside the chunk loop serialize the step
        # on ref round-trips, the long-read kernel's measured trap)
        if STREAM:
            # anchored v-table window: find this step's live word-group
            # range first (a cheap pre-scan), refill if outrun
            def w2_range(ci, acc):
                wmn, wmx = acc
                b0 = ci * KC
                ks_c = k0 + b0 + iota_c
                cell = drow(m_win, slot_s, b0)
                off = cell >> TYPE_BITS
                h0 = off
                v0 = off - ks_c
                act = ((cell > 0) & (ks_c >= lo_ms) & (ks_c <= hi_ms)
                       & ex_ms & live0
                       & (v0 > 0) & (v0 < qlen) & (h0 < tlen))
                sg6 = jnp.maximum(0, toff - (b0 + iota_c)) >> 6
                w2 = jnp.clip((v0 - (sg6 << 6)) >> 6, 0, Lw2 - 1)
                wmn = jnp.minimum(wmn, jnp.min(jnp.where(act, w2, Lw2)))
                wmx = jnp.maximum(wmx, jnp.max(jnp.where(act, w2, -1)))
                return wmn, wmx

            wmn, wmx = lax.fori_loop(
                cb0, cb1 + 1, w2_range, (jnp.int32(Lw2), jnp.int32(-1)))
            wmin = jnp.clip(wmn, 0, Lw2 - WV)
            refill = wmx >= wbase + WV

            @pl.when(refill)
            def _():
                table_dma(0, whi_ref, twhi, wmin).start()
                table_dma(1, wlo_ref, twlo, wmin).start()
                table_dma(2, fsa_ref, tfsa, wmin).start()
                table_dma(0, whi_ref, twhi, wmin).wait()
                table_dma(1, wlo_ref, twlo, wmin).wait()
                table_dma(2, fsa_ref, tfsa, wmin).wait()

            wbase = jnp.where(refill, wmin, wbase)

        def pass_a(ci, acc):
            (term_acc, dmin_acc, outrun_now,
             lo_i_a, hi_i_a, lo_d_a, hi_d_a, lo_m_a, hi_m_a) = acc
            b0 = ci * KC
            ks_c = k0 + b0 + iota_c
            row_k_c = b0 + iota_c

            # -- next(s+1) for this chunk (sources are >= 2 scores old)
            pv_x = src_cells(m_win, slot_x, lo_xs, hi_xs, ex_xs,
                             ks_c, b0, 0)
            pm_i = src_cells(m_win, slot_o, lo_os, hi_os, ex_os,
                             ks_c, b0, -1)
            pm_d = src_cells(m_win, slot_o, lo_os, hi_os, ex_os,
                             ks_c, b0, 1)
            pi_i = src_cells(i_win, slot_ie, lo_ies, hi_ies, ex_ies,
                             ks_c, b0, -1)
            pd_d = src_cells(d_win, slot_de, lo_des, hi_des, ex_des,
                             ks_c, b0, 1)

            # insertion (wfa.go:578-608): sources at k-1; keep-style
            # invalidation exactly as pallas_engine.run_next
            v1i = pm_i >> TYPE_BITS
            v2i = pi_i >> TYPE_BITS
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
            v1d = pm_d >> TYPE_BITS
            v2d = pd_d >> TYPE_BITS
            dsk_nb = jnp.maximum(v1d, v2d)
            keep = (v1d - ks_c) <= qlen
            fmd = (pm_d > 0) & keep
            v1d = jnp.where(keep, v1d, 0)
            keep = (v2d - ks_c) <= qlen
            fdd = (pd_d > 0) & keep
            v2d = jnp.where(keep, v2d, 0)
            Dsk = jnp.maximum(v1d, v2d)
            upd_d = fmd | fdd
            tag_d = jnp.where(fmd & (v1d >= v2d), T_DEL_OPEN, T_DEL_EXT)

            # mismatch / M with the reference tie-breaking
            v1x = pv_x >> TYPE_BITS
            off_def_nb = jnp.maximum(jnp.maximum(isk_nb, dsk_nb), v1x + 1)
            keep = (v1x <= tlen) & ((v1x - ks_c) <= qlen)
            fmx = (pv_x > 0) & keep
            v1x = jnp.where(keep, v1x, 0)
            Msk = jnp.maximum(
                jnp.maximum(jnp.where(upd_i, Isk, 0),
                            jnp.where(upd_d, Dsk, 0)),
                v1x + 1)
            tag_m = jnp.where(
                fmx & (Msk == v1x + 1), T_MISMATCH,
                jnp.where(upd_i & (Msk == Isk), tag_i, tag_d))
            wr_m = upd_i | upd_d | fmx

            band = (ks_c >= lo_n) & (ks_c <= hi_n)
            wr_i = upd_i & band & live_nx
            wr_d = upd_d & band & live_nx
            wr_m = wr_m & band & live_nx

            row_i_new = jnp.where(wr_i, (Isk << TYPE_BITS) | tag_i, 0)
            row_d_new = jnp.where(wr_d, (Dsk << TYPE_BITS) | tag_d, 0)
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

            cur = drow(m_win, slot_s2, b0)
            row_m_old = jnp.where(at_seed, cur, 0)
            row_m_new = jnp.where(wr_m, (Msk << TYPE_BITS) | tag_m,
                                  row_m_old)
            aux_m_new = jnp.where(wr_m, (aux_m_val << TYPE_BITS) | tag_m,
                                  row_m_old & 7)

            dwrite(i_win, slot_s2e, b0, row_i_new)
            dwrite(d_win, slot_s2e, b0, row_d_new)
            dwrite(m_win, slot_s2, b0, row_m_new)
            ai_win[pl.ds(slot_s2a * K + b0, KC)] = aux_i_new
            ad_win[pl.ds(slot_s2a * K + b0, KC)] = aux_d_new
            am_win[pl.ds(slot_s2a * K + b0, KC)] = aux_m_new

            # next-band extent partials ride the band scratch slots:
            # accumulate chunk extents into the s2 band rows afterwards
            lo_i_c = smin(ks_c, wr_i)
            hi_i_c = smax(ks_c, wr_i)
            lo_d_c = smin(ks_c, wr_d)
            hi_d_c = smax(ks_c, wr_d)
            lo_m_c = smin(ks_c, wr_m)
            hi_m_c = smax(ks_c, wr_m)

            # -- extend (wfa.go:381-458) for this chunk at score s
            cell = drow(m_win, slot_s, b0)
            off = cell >> TYPE_BITS
            h0 = off
            v0 = off - ks_c
            valid = ((cell > 0) & (ks_c >= lo_ms) & (ks_c <= hi_ms)
                     & ex_ms & live0)
            act0 = valid & (v0 > 0) & (v0 < qlen) & (h0 < tlen)
            sg6 = jnp.maximum(0, toff - row_k_c) >> 6
            c_abs = v0
            c0 = v0 - (sg6 << 6)
            w2 = jnp.clip(c0 >> 6, 0, Lw2 - 1)
            if STREAM:
                outrun = act0 & (w2 >= wbase + WV)
                outrun_now = jnp.where(sany(outrun) & live0, 1,
                                       outrun_now)
                act0 = act0 & ~outrun
                word_hi, word_lo, fsa0 = select_chain(
                    WV,
                    lambda g: twhi[pl.ds(g * K + b0, KC)],
                    lambda g: twlo[pl.ds(g * K + b0, KC)],
                    lambda g: tfsa[pl.ds(g * K + b0, KC)],
                    w2, base=wbase)
            else:
                word_hi, word_lo, fsa0 = select_chain(
                    Lw2,
                    lambda g: whi_ref[pl.ds(g * K + b0, KC)],
                    lambda g: wlo_ref[pl.ds(g * K + b0, KC)],
                    lambda g: fsa_ref[pl.ds(g * K + b0, KC)],
                    w2)
            r = c0 & 63
            rl = jnp.maximum(r - 32, 0)
            rr = jnp.clip(32 - r, 0, 31)
            rc = r & 31
            vis_hi = jnp.where(
                r >= 32,
                word_lo << rl,
                (word_hi << rc)
                | jnp.where(r == 0, 0,
                            lax.shift_right_logical(word_lo, rr)),
            )
            vis_lo = jnp.where(r >= 32, 0, word_lo << rc)
            n_ext = jnp.where(
                vis_hi != 0,
                lax.clz(vis_hi),
                jnp.where(vis_lo != 0, 32 + lax.clz(vis_lo),
                          fsa0 - c_abs),
            )
            n_ext = jnp.where(act0, n_ext, 0)
            # v-table edge escape (see pallas_engine; Lw2 counts the
            # whole table, so the threshold is the absolute edge)
            vwt = Lw2 * 64
            bad_ext = act0 & (c_abs + n_ext >= vwt)
            outrun_now = jnp.where(sany(bad_ext), 1, outrun_now)
            act0 = act0 & ~bad_ext
            n_ext = jnp.where(act0, n_ext, 0)
            row_m = jnp.where(act0 & (n_ext > 0),
                              cell + (n_ext << TYPE_BITS), cell)
            dwrite(m_win, slot_s, b0, row_m)

            # termination partial: the Ak-diagonal cell lives in exactly
            # one chunk — masked-sum accumulates it
            term_acc = term_acc + jnp.sum(
                jnp.where(row_k_c == j_ak, row_m, 0), axis=0,
                keepdims=True)

            # wf-adaptive dmin partial (post-extend values)
            if REDUCE_ON:
                offc = row_m >> TYPE_BITS
                hs = offc
                vs2 = offc - ks_c
                validc = (row_m > 0) & (ks_c >= lo_ms) & (ks_c <= hi_ms)
                okd = validc & ~((vs2 < 0) | (vs2 >= qlen)
                                 | (hs >= tlen))
                dist = jnp.maximum(tlen - hs, qlen - vs2)
                dmin_acc = jnp.minimum(dmin_acc, smin(dist, okd))

            # merge the next-band partials into the carry (registers)
            lo_i_a = jnp.minimum(lo_i_a, lo_i_c)
            hi_i_a = jnp.maximum(hi_i_a, hi_i_c)
            lo_d_a = jnp.minimum(lo_d_a, lo_d_c)
            hi_d_a = jnp.maximum(hi_d_a, hi_d_c)
            lo_m_a = jnp.minimum(lo_m_a, lo_m_c)
            hi_m_a = jnp.maximum(hi_m_a, hi_m_c)
            return (term_acc, dmin_acc, outrun_now,
                    lo_i_a, hi_i_a, lo_d_a, hi_d_a, lo_m_a, hi_m_a)

        z1 = jnp.zeros((1, BB), jnp.int32)
        big1 = jnp.full((1, BB), _BIG, jnp.int32)
        (term_acc, dmin, outrun_now, lo_i_n, hi_i_n, lo_d_n, hi_d_n,
         lo_m_raw, hi_m_raw) = lax.fori_loop(
            ca0, ca1 + 1, pass_a,
            (z1, big1, z1, big1, -big1, big1, -big1, big1, -big1))

        # finalize the s2 bands: freeze/any semantics as run_next.
        # NOTE the carried extents hold the raw chunk-merged values
        # (BIG/-BIG when nothing was written).
        any_i = lo_i_n < _BIG
        any_d = lo_d_n < _BIG
        any_m = lo_m_raw < _BIG
        lo_m_n = jnp.minimum(lo_m_raw, jnp.where(ex_m_olds, lo_m_olds,
                                                 _BIG))
        hi_m_n = jnp.maximum(hi_m_raw, jnp.where(ex_m_olds, hi_m_olds,
                                                 -_BIG))
        frz = ~live_nx
        ib_lo[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_i, _BIG, lo_i_n)
        ib_hi[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_i, -_BIG,
                                              hi_i_n)
        ib_ex[pl.ds(slot_s2e, 1)] = jnp.where(
            frz, 0, any_i.astype(jnp.int32))
        db_lo[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_d, _BIG, lo_d_n)
        db_hi[pl.ds(slot_s2e, 1)] = jnp.where(frz | ~any_d, -_BIG,
                                              hi_d_n)
        db_ex[pl.ds(slot_s2e, 1)] = jnp.where(
            frz, 0, any_d.astype(jnp.int32))
        keep_m = any_m | ex_m_olds
        mb_lo[pl.ds(slot_s2, 1)] = jnp.where(
            frz, jnp.where(ex_m_olds, lo_m_olds, _BIG),
            jnp.where(keep_m, lo_m_n, _BIG))
        mb_hi[pl.ds(slot_s2, 1)] = jnp.where(
            frz, jnp.where(ex_m_olds, hi_m_olds, -_BIG),
            jnp.where(keep_m, hi_m_n, -_BIG))
        mb_ex[pl.ds(slot_s2, 1)] = jnp.where(
            frz, ex_m_olds.astype(jnp.int32), keep_m.astype(jnp.int32))

        # ---- termination (wfa.go:235-239) ----
        cell_ak = term_acc
        found_ak = ex_ms & (ak >= lo_ms) & (ak <= hi_ms) & (cell_ak > 0)
        off_ak = jnp.where(found_ak, cell_ak >> TYPE_BITS, 0)
        newly = live0 & ex_ms & (off_ak >= tlen)
        final_s = jnp.where(newly, s, final_s)
        term_cell = jnp.where(newly, cell_ak, term_cell)
        done = jnp.where(newly, 1, done)
        overflow = jnp.where(outrun_now > 0, 1, overflow)
        # semi-global: cancel this step's band-escape overflow on newly
        # terminated pairs, but keep table outruns (the end finder needs
        # every stored row complete) — as pallas_engine
        cancel = newly & (outrun_now == 0)
        overflow = jnp.where(cancel, 0, overflow)
        live = (done == 0) & (overflow == 0)

        # ---- pass B1: wf-adaptive trim fold (wfa.go:461-524) ----
        if REDUCE_ON:
            red = ex_ms & live & ((hi_ms - lo_ms + 1) >= MIN_WF_LEN)

            def pass_b1(ci, acc):
                (fg_found, first_good, last_mark, last_good,
                 any_marked) = acc
                b0 = ci * KC
                ks_c = k0 + b0 + iota_c
                row_k_c = b0 + iota_c
                row_m = drow(m_win, slot_s, b0)
                offc = row_m >> TYPE_BITS
                hs = offc
                vs2 = offc - ks_c
                validc = (row_m > 0) & (ks_c >= lo_ms) & (ks_c <= hi_ms)
                okd = validc & ~((vs2 < 0) | (vs2 >= qlen)
                                 | (hs >= tlen))
                dist = jnp.maximum(tlen - hs, qlen - vs2)
                marked = okd & ((dist - dmin) > MAX_DIST_DIFF)
                good = okd & ~marked
                fg_c = smin(row_k_c, good)
                lm_c = smax(row_k_c, marked & (row_k_c < fg_c))
                # contiguous-leading-run rule: chunks after the first
                # good row contribute no last-mark candidates
                last_mark = jnp.maximum(
                    last_mark, jnp.where(fg_found > 0, -_BIG, lm_c))
                first_good = jnp.minimum(first_good, fg_c)
                last_good = jnp.maximum(last_good, smax(row_k_c, good))
                any_marked = any_marked | sany(marked).astype(jnp.int32)
                fg_found = fg_found | (fg_c < _BIG).astype(jnp.int32)
                return (fg_found, first_good, last_mark, last_good,
                        any_marked)

            (fg_found, first_good, last_mark, last_good,
             any_marked) = lax.fori_loop(
                cb0, cb1 + 1, pass_b1,
                (z1, jnp.full((1, BB), _BIG, jnp.int32),
                 jnp.full((1, BB), -_BIG, jnp.int32),
                 jnp.full((1, BB), -_BIG, jnp.int32), z1))
            any_good = first_good < _BIG
            new_lo = jnp.where(last_mark > -_BIG, k0 + last_mark + 1,
                               lo_ms)
            new_hi = jnp.where((any_marked > 0) & any_good,
                               k0 + last_good, hi_ms)
            new_lo = jnp.where(red, new_lo, lo_ms)
            new_hi = jnp.where(red, new_hi, hi_ms)
            mb_lo[pl.ds(slot_s, 1)] = jnp.where(red, new_lo, lo_ms)
            mb_hi[pl.ds(slot_s, 1)] = jnp.where(red, new_hi, hi_ms)

            # co-deletion band updates + zero ranges (wfa.go:526-535)
            def co_ranges(lo_r, hi_r, ex_r, slot):
                lo_cs = lo_r[pl.ds(slot, 1)]
                hi_cs = hi_r[pl.ds(slot, 1)]
                gate = red & (ex_r[pl.ds(slot, 1)] > 0)
                l1, h1, zl1, zh1 = delete_range_asc(
                    lo_ms, new_lo - 1, lo_cs, hi_cs)
                l2, h2, zl2, zh2 = delete_range_asc(
                    new_hi + 1, hi_ms, l1, h1)
                lo_r[pl.ds(slot, 1)] = jnp.where(gate, l2, lo_cs)
                hi_r[pl.ds(slot, 1)] = jnp.where(gate, h2, hi_cs)
                return gate, zl1, zh1, zl2, zh2
            gi = co_ranges(ib_lo, ib_hi, ib_ex, slot_se)
            gd = co_ranges(db_lo, db_hi, db_ex, slot_se)
        else:
            red = jnp.zeros((1, BB), bool)
            new_lo, new_hi = lo_ms, hi_ms
            gi = gd = None

        # ---- pass B2: apply deletions + end finder + aux staging ----
        och = lax.rem(s, CH)
        oslot = lax.rem(c, 2)
        slot_sa = lax.rem(s, 2)
        wrote = live0
        # bulk-zero this score's obuf rows: chunks pass B2 skips must
        # stream absent (0) cells, not stale data from two scores ago
        zK = jnp.zeros((K, BB), cell_dtype)
        obase0 = (oslot * CH + och) * K
        ob_m[pl.ds(obase0, K)] = zK
        ob_i[pl.ds(obase0, K)] = zK
        ob_d[pl.ds(obase0, K)] = zK

        def pass_b2(ci, acc):
            (k_dn, succ_dn, cell_dn, k_up, succ_up, cell_up) = acc
            b0 = ci * KC
            ks_c = k0 + b0 + iota_c
            row_m = drow(m_win, slot_s, b0)
            row_i = drow(i_win, slot_se, b0)
            row_d = drow(d_win, slot_se, b0)
            if REDUCE_ON:
                validc = (row_m > 0) & (ks_c >= lo_ms) & (ks_c <= hi_ms)
                zero_m = validc & ((ks_c < new_lo) | (ks_c > new_hi)) \
                    & red
                row_m = jnp.where(zero_m, 0, row_m)
                dwrite(m_win, slot_s, b0, row_m)
                gate_i, zl1i, zh1i, zl2i, zh2i = gi
                zero_i = gate_i & (((ks_c >= zl1i) & (ks_c <= zh1i))
                                   | ((ks_c >= zl2i) & (ks_c <= zh2i)))
                row_i = jnp.where(zero_i, 0, row_i)
                dwrite(i_win, slot_se, b0, row_i)
                gate_d, zl1d, zh1d, zl2d, zh2d = gd
                zero_d = gate_d & (((ks_c >= zl1d) & (ks_c <= zh1d))
                                   | ((ks_c >= zl2d) & (ks_c <= zh2d)))
                row_d = jnp.where(zero_d, 0, row_d)
                dwrite(d_win, slot_se, b0, row_d)

            # fused end-finder partials (wfa.go:270-375; see
            # pallas_engine for the one-pass-per-step argument).  The
            # nearest stop to Ak per direction combines across chunks by
            # (key, payload) max/min merge.
            h_e = row_m >> TYPE_BITS
            v_e = h_e - ks_c
            okc = row_m > 0
            viol = (v_e <= 0) | (v_e > qlen) | (h_e > tlen)
            elig = (((v_e == qlen) & (h_e >= qlen))
                    | ((h_e == tlen) & (v_e >= tlen)))
            stop = okc & (viol | elig)
            succ = okc & ~viol & elig
            dn = ks_c <= ak
            k_dn_c = smax(ks_c, stop & dn)
            succ_dn_c = sany(succ & dn & (ks_c == k_dn_c))
            cell_dn_c = jnp.sum(
                jnp.where((ks_c == k_dn_c) & stop & dn, row_m, 0),
                axis=0, keepdims=True)
            upm = ks_c >= ak + 1
            k_up_c = smin(ks_c, stop & upm)
            succ_up_c = sany(succ & upm & (ks_c == k_up_c))
            cell_up_c = jnp.sum(
                jnp.where((ks_c == k_up_c) & stop & upm, row_m, 0),
                axis=0, keepdims=True)
            take_dn = k_dn_c > k_dn
            k_dn = jnp.where(take_dn, k_dn_c, k_dn)
            succ_dn = jnp.where(take_dn, succ_dn_c.astype(jnp.int32),
                                succ_dn)
            cell_dn = jnp.where(take_dn, cell_dn_c, cell_dn)
            take_up = k_up_c < k_up
            k_up = jnp.where(take_up, k_up_c, k_up)
            succ_up = jnp.where(take_up, succ_up_c.astype(jnp.int32),
                                succ_up)
            cell_up = jnp.where(take_up, cell_up_c, cell_up)

            # stage backtrace-aux chunk (masked by the post-deletion
            # cells — as pallas_engine's obuf writes)
            am = am_win[pl.ds(slot_sa * K + b0, KC)]
            ai = ai_win[pl.ds(slot_sa * K + b0, KC)]
            ad = ad_win[pl.ds(slot_sa * K + b0, KC)]
            obase = (oslot * CH + och) * K + b0
            ob_m[pl.ds(obase, KC)] = jnp.where(
                wrote & (row_m != 0), am, 0).astype(cell_dtype)
            ob_i[pl.ds(obase, KC)] = jnp.where(
                wrote & (row_i != 0), ai, 0).astype(cell_dtype)
            ob_d[pl.ds(obase, KC)] = jnp.where(
                wrote & (row_d != 0), ad, 0).astype(cell_dtype)
            return (k_dn, succ_dn, cell_dn, k_up, succ_up, cell_up)

        (k_dn, succ_dn, cell_dn, k_up, succ_up, cell_up) = lax.fori_loop(
            cb0, cb1 + 1, pass_b2,
            (jnp.full((1, BB), -_BIG, jnp.int32), z1, z1,
             jnp.full((1, BB), _BIG, jnp.int32), z1, z1))
        newly_e = live0 & (end_found == 0) & ((succ_dn > 0)
                                              | (succ_up > 0))
        k_sel = jnp.where(succ_up > 0, k_up, k_dn)
        cell_sel = jnp.where(succ_up > 0, cell_up, cell_dn)
        end_s = jnp.where(newly_e, s, end_s)
        end_k = jnp.where(newly_e, k_sel, end_k)
        end_cell = jnp.where(newly_e, cell_sel, end_cell)
        end_found = jnp.where(newly_e, 1, end_found)

        @pl.when(lax.rem(s, CH) == CH - 1)
        def _():
            hist_dma(0, ob_m, c).start()
            hist_dma(1, ob_i, c).start()
            hist_dma(2, ob_d, c).start()

        return (s + 1, done, overflow, final_s, term_cell, wbase,
                end_found, end_s, end_k, end_cell)

    def cond(carry):
        s = carry[0]
        done, overflow = carry[1], carry[2]
        return (s < S - 1) & jnp.any((done == 0) & (overflow == 0))

    z1 = jnp.zeros((1, BB), jnp.int32)
    carry = (jnp.int32(0), z1, ovf0, z1, z1, jnp.int32(-WV),
             z1, z1, z1, z1)
    carry = lax.while_loop(cond, body, carry)
    (s_exit, done, overflow, final_s, term_cell, _,
     end_found, end_s, end_k, end_cell) = carry

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

    # ---- EXPORT: the phase-2 handoff (same layout as pallas_engine's
    # EXPORT dump so semi2.prefix_export_kernel_impl parses either) ----
    res = jnp.concatenate(
        [final_s, done, overflow, end_found,
         term_cell, end_s, end_k, end_cell], axis=0)
    out_ref[:] = res
    sae = (S - 1) % 2

    # Re-establish the zero-outside-band invariant on the dumped rows:
    # chunks the dynamic bounds skipped hold stale cells from WM (resp.
    # WE) scores ago, and downstream consumers — the RESUME kernel's
    # fused end finder, the aux mirror — rely on absent == 0.  Inside
    # this kernel every read band-masks, so masking once here suffices.
    def mask_slot(win, slot, lo_r, hi_r, ex_r):
        lo = lo_r[pl.ds(slot, 1)]
        hi = hi_r[pl.ds(slot, 1)]
        ex = ex_r[pl.ds(slot, 1)] > 0
        for ci in range(NC):
            b0 = ci * KC
            ks_c = k0 + b0 + iota_c
            row = drow(win, slot, b0)
            keep = ex & (ks_c >= lo) & (ks_c <= hi)
            dwrite(win, slot, b0, jnp.where(keep, row, 0))

    for r in range(WM):
        mask_slot(m_win, r, mb_lo, mb_hi, mb_ex)
    for r in range(WE):
        mask_slot(i_win, r, ib_lo, ib_hi, ib_ex)
        mask_slot(d_win, r, db_lo, db_hi, db_ex)
    # aux mirrors cell existence exactly: mask the exported ainit rows
    # (score S-1) by that score's just-masked cells
    for aw, cw, slot_c in ((am_win, m_win, (S - 1) % WM),
                           (ai_win, i_win, (S - 1) % WE),
                           (ad_win, d_win, (S - 1) % WE)):
        for ci in range(NC):
            b0 = ci * KC
            cell = drow(cw, slot_c, b0)
            a = aw[pl.ds(sae * K + b0, KC)]
            aw[pl.ds(sae * K + b0, KC)] = jnp.where(cell != 0, a, 0)
    o = 0
    for r, n in ((mb_lo, WM), (mb_hi, WM), (mb_ex, WM),
                 (ib_lo, WE), (ib_hi, WE), (ib_ex, WE),
                 (db_lo, WE), (db_hi, WE), (db_ex, WE)):
        bscr[o:o + n] = r[...]
        o += n
    NBP = bscr.shape[0]
    # per-slot DMAs skip the guard rows so the state layout stays flat
    dmas = []
    o = 0
    i_sem = 0
    for slot in range(WM):
        d = pltpu.make_async_copy(
            m_win.at[pl.ds(slot * SS + G, K)],
            state_ref.at[pl.ds(o, K), pl.ds(blk * BB, BB)],
            st_sem.at[i_sem])
        d.start()
        dmas.append(d)
        o += K
        i_sem += 1
    for win in (i_win, d_win):
        for slot in range(WE):
            d = pltpu.make_async_copy(
                win.at[pl.ds(slot * SS + G, K)],
                state_ref.at[pl.ds(o, K), pl.ds(blk * BB, BB)],
                st_sem.at[i_sem])
            d.start()
            dmas.append(d)
            o += K
            i_sem += 1
    for win in (am_win, ai_win, ad_win):
        d = pltpu.make_async_copy(
            win.at[pl.ds(sae * K, K)],
            state_ref.at[pl.ds(o, K), pl.ds(blk * BB, BB)],
            st_sem.at[i_sem])
        d.start()
        dmas.append(d)
        o += K
        i_sem += 1
    d = pltpu.make_async_copy(
        bscr, state_ref.at[pl.ds(o, NBP), pl.ds(blk * BB, BB)],
        st_sem.at[i_sem])
    d.start()
    dmas.append(d)
    for d in dmas:
        d.wait()


def pallas_run_prefix_chunked(
    qb, tbuf, qlen, tlen, toff, *, cfg: EngineConfig, B: int, Lq: int,
    Ltb: int, VW: int, KC: int = 512, interpret: bool = False,
):
    """Chunked-K drop-in for pallas_engine.pallas_run_prefix: same
    inputs, same (out [8, B], aux [3, Sa, K, Bp], state [TOT, Bp], Bp)
    outputs, with every kernel vector op on a [KC, 128] tile."""
    p = cfg.penalties
    S, K = cfg.s_cap, cfg.k_win
    assert supports_prefix_chunked(cfg) and not cfg.global_alignment
    # largest chunk <= KC that divides K (K is always a multiple of 128)
    KC = min(KC, K)
    while K % KC:
        KC -= 128
    assert KC >= 128 and K % KC == 0

    params, whi, wlo, fsa64, row0, rowx, Lw2 = _prefix_inputs(
        qb, tbuf, qlen, tlen, toff, cfg=cfg, B=B, Lq=Lq, Ltb=Ltb, VW=VW)

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
        row0 = jnp.concatenate([row0, jnp.zeros((K, pad), jnp.int32)], 1)
        rowx = jnp.concatenate([rowx, jnp.zeros((K, pad), jnp.int32)], 1)

    WM = max(p.mismatch, p.gap_open + p.gap_ext) + 1
    WE = p.gap_ext + 1
    ch = 2  # CH-score DMA chunks (obuf rows are KC-staged)
    Sa = ((S + ch - 1) // ch) * ch
    WV = 8
    stream = Lw2 > WV
    cell16 = Ltb + 2 <= 4095
    cell_dtype = jnp.int16 if cell16 else jnp.int32
    NB = 3 * WM + 6 * WE
    NBP = ((NB + 7) // 8) * 8
    TOT = (WM + 2 * WE + 3) * K + NBP
    SS = K + G
    kern = functools.partial(
        _kernel, S=S, K=K, KC=KC, Lw2=Lw2, WV=WV, BB=bb, CH=ch,
        X=int(p.mismatch), OE=int(p.gap_open + p.gap_ext),
        E=int(p.gap_ext),
        REDUCE_ON=cfg.adaptive is not None,
        MIN_WF_LEN=int(cfg.adaptive.min_wf_len) if cfg.adaptive else 0,
        MAX_DIST_DIFF=int(cfg.adaptive.max_dist_diff) if cfg.adaptive
        else 0,
        CELL16=cell16,
    )
    if stream:
        table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        table_specs = [
            pl.BlockSpec((Lw2 * K, bb), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ] * 3
    twv = WV if stream else 1
    n_sem = WM + 2 * WE + 4

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
            jax.ShapeDtypeStruct((3, Sa * K, Bp), cell_dtype),
            jax.ShapeDtypeStruct((TOT, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WM * SS + G, bb), jnp.int32),
            pltpu.VMEM((WE * SS + G, bb), jnp.int32),
            pltpu.VMEM((WE * SS + G, bb), jnp.int32),
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
            pltpu.VMEM((2 * ch * K, bb), cell_dtype),
            pltpu.VMEM((2 * ch * K, bb), cell_dtype),
            pltpu.VMEM((2 * ch * K, bb), cell_dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.VMEM((twv * K, bb), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((n_sem,)),
            pltpu.VMEM((NBP, bb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(params, whi, wlo, fsa64, row0, rowx)
    return out, aux.reshape(3, Sa, K, Bp), state, Bp
