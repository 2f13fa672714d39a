"""Batched TPU score-loop engine (JAX).

TPU-native re-design of the reference's per-pair scalar score loop
(wfa.go:228-251): a whole batch of pairs advances in lockstep, one score
per iteration of a single compiled ``lax.while_loop``, with per-pair done
masks.  Storage is dense, not pointer-chased:

* per component (M/I/D) a ``int32[B, S_cap, K_win]`` history of packed
  cells (``offset << 3 | tag``, 0 = absent — the same encoding as the
  reference, wfa_wavefront.go:44/93, so backtraces replay bit-identically);
* per score a window origin ``k0[B, S_cap]`` mapping window column j to
  diagonal ``k = k0 + j``, plus per-component live bands ``lo/hi`` and
  existence flags (the dense analogs of wfa_wavefront.go:45-48 and
  wfa_component.go:81-101).

One engine iteration fuses the reference's extend (wfa.go:381-458) —
a vectorized 4-byte-packed LCP over all live diagonals — the termination
test (wfa.go:235-239), wf-adaptive reduction (wfa.go:461-540) expressed as
masked band-bound updates, and next (wfa.go:549-700) as shifted window
reads + element-wise max/select with the reference's exact tie-breaking.

The sequential, data-dependent backtrace runs host-side over the fetched
history (wfa_tpu.backtrace; optionally the native C++ runtime), which is
the right split: the device does the O(s·band) vector work, the host the
O(path) pointer chase.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .backtrace import back_trace, backtrace_start_position
from .cigar import AlignmentResult
from .constants import (
    MAX_SEQ_LEN,
    T_DEL_EXT,
    T_DEL_OPEN,
    T_INS_EXT,
    T_INS_OPEN,
    T_MATCH,
    T_MISMATCH,
    TYPE_BITS,
    AdaptiveReductionOption,
    EmptySeqError,
    Options,
    Penalties,
    SeqTooLongError,
)
from .oracle import Aligner as OracleAligner

_BIG = np.int32(1 << 30)


class _State(NamedTuple):
    s: jnp.ndarray  # scalar int32 — current score (lockstep)
    done: jnp.ndarray  # [B] bool
    overflow: jnp.ndarray  # [B] bool — window/score-cap overflow → fallback
    final_s: jnp.ndarray  # [B] int32
    hist_m: jnp.ndarray  # [B, S, K] int32 packed cells
    hist_i: jnp.ndarray
    hist_d: jnp.ndarray
    k0: jnp.ndarray  # [B, S] int32 window origin (diagonal of column 0)
    lo_m: jnp.ndarray  # [B, S] int32 live band (k-space)
    hi_m: jnp.ndarray
    lo_i: jnp.ndarray
    hi_i: jnp.ndarray
    lo_d: jnp.ndarray
    hi_d: jnp.ndarray
    ex_m: jnp.ndarray  # [B, S] bool — wavefront exists (has_score)
    ex_i: jnp.ndarray
    ex_d: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    penalties: Penalties = Penalties()
    global_alignment: bool = True
    adaptive: Optional[AdaptiveReductionOption] = None
    k_win: int = 128  # diagonal window width (power of two preferred)
    s_cap: int = 256  # max score + 1


def _pack_words(b: jnp.ndarray) -> jnp.ndarray:
    """[B, L] uint8 -> [B, L] uint32 big-endian 4-byte words at each start."""
    p = jnp.pad(b, ((0, 0), (0, 3))).astype(jnp.uint32)
    return (p[:, :-3] << 24) | (p[:, 1:-2] << 16) | (p[:, 2:-1] << 8) | p[:, 3:]


def _row_at(arr: jnp.ndarray, s) -> jnp.ndarray:
    """arr[:, s, :] with traced s."""
    B, S, K = arr.shape
    return lax.dynamic_slice(arr, (0, s, 0), (B, 1, K))[:, 0, :]


def _col_at(arr: jnp.ndarray, s) -> jnp.ndarray:
    """arr[:, s] with traced s."""
    B, S = arr.shape
    return lax.dynamic_slice(arr, (0, s), (B, 1))[:, 0]


def _set_row(arr: jnp.ndarray, s, row: jnp.ndarray) -> jnp.ndarray:
    return lax.dynamic_update_slice(arr, row[:, None, :], (0, s, 0))


def _set_col(arr: jnp.ndarray, s, col: jnp.ndarray) -> jnp.ndarray:
    return lax.dynamic_update_slice(arr, col[:, None], (0, s))


def _masked_min(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, vals, _BIG), axis=1)


def _masked_max(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, vals, -_BIG), axis=1)


def _delete_range_asc(dl, dh, lo, hi):
    """Effect of the reference's ascending Delete loop over k in [dl, dh]
    on a wavefront band [lo, hi] (wfa_wavefront.go:171-183 repeated by
    wfa.go:526-535).  Returns (new_lo, new_hi, zero_lo, zero_hi); cells in
    [zero_lo, zero_hi] are zeroed (empty when zero_lo > zero_hi)."""
    nonempty = (dl <= dh) & (lo <= dh) & (hi >= dl)
    z_lo = jnp.maximum(dl, lo)
    z_hi = jnp.minimum(dh, hi)
    case_chain = lo >= dl  # Lo inside the delete range → chain advance
    hi_in = hi <= dh
    new_lo_a = jnp.where(hi_in, hi, dh + 1)
    new_hi_a = jnp.where(hi_in, hi - 1, hi)
    new_hi_b = jnp.where(hi_in, hi - 1, hi)
    new_lo = jnp.where(nonempty, jnp.where(case_chain, new_lo_a, lo), lo)
    new_hi = jnp.where(nonempty, jnp.where(case_chain, new_hi_a, new_hi_b), hi)
    z_lo = jnp.where(nonempty, z_lo, 1)
    z_hi = jnp.where(nonempty, z_hi, 0)
    return new_lo, new_hi, z_lo, z_hi


@functools.partial(
    jax.jit, static_argnames=("cfg", "B", "Lq", "Lt")
)
def _run_batch(qb, tb, qlen, tlen, *, cfg: EngineConfig, B: int, Lq: int, Lt: int):
    """Run the full score loop for a padded batch; returns final state."""
    p = cfg.penalties
    x = np.int32(p.mismatch)
    oe = np.int32(p.gap_open + p.gap_ext)
    e = np.int32(p.gap_ext)
    S = cfg.s_cap
    K = cfg.k_win
    reduce_on = cfg.adaptive is not None
    min_wf_len = np.int32(cfg.adaptive.min_wf_len if reduce_on else 0)
    max_dist_diff = np.int32(cfg.adaptive.max_dist_diff if reduce_on else 0)

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    q4 = _pack_words(qb)
    t4 = _pack_words(tb)
    qi = qb.astype(jnp.int32)
    ti = tb.astype(jnp.int32)

    iota = jnp.arange(K, dtype=jnp.int32)[None, :]  # [1, K]
    Ak = tlen - qlen  # [B]

    # ---------------- seeding (wfa.go:143-184) ----------------
    hist_m = jnp.zeros((B, S, K), jnp.int32)
    hist_i = jnp.zeros((B, S, K), jnp.int32)
    hist_d = jnp.zeros((B, S, K), jnp.int32)
    k0 = jnp.zeros((B, S), jnp.int32)
    lo_m = jnp.full((B, S), _BIG, jnp.int32)
    hi_m = jnp.full((B, S), -_BIG, jnp.int32)
    lo_i = jnp.full((B, S), _BIG, jnp.int32)
    hi_i = jnp.full((B, S), -_BIG, jnp.int32)
    lo_d = jnp.full((B, S), _BIG, jnp.int32)
    hi_d = jnp.full((B, S), -_BIG, jnp.int32)
    ex_m = jnp.zeros((B, S), bool)
    ex_i = jnp.zeros((B, S), bool)
    ex_d = jnp.zeros((B, S), bool)

    eq00 = qi[:, 0] == ti[:, 0]  # [B]
    if cfg.global_alignment:
        s0 = jnp.where(eq00, 0, x).astype(jnp.int32)  # [B]
        tag0 = jnp.where(eq00, T_MATCH, T_MISMATCH).astype(jnp.int32)
        cell0 = (jnp.int32(1) << TYPE_BITS) | tag0
        bidx = jnp.arange(B)
        hist_m = hist_m.at[bidx, s0, 0].set(cell0)
        lo_m = lo_m.at[bidx, s0].set(0)
        hi_m = hi_m.at[bidx, s0].set(0)
        ex_m = ex_m.at[bidx, s0].set(True)
        # k0 at s0 is already 0
    else:
        # semi-global first-row/column seeds over the full diagonal range
        # [-(n-1), m-1] (wfa.go:163-183).  Requires K >= n + m - 1.
        k0_seed = -(qlen - 1)  # [B]
        ks = k0_seed[:, None] + iota  # [B, K]
        in_range = (ks >= k0_seed[:, None]) & (ks <= (tlen - 1)[:, None])
        # k >= 0: first row, offset k+1, compare q[0] vs t[k]
        # k < 0: first column, offset 1, compare q[-k] vs t[0]
        t_at_k = jnp.take_along_axis(ti, jnp.clip(ks, 0, Lt - 1), axis=1)
        q_at_mk = jnp.take_along_axis(qi, jnp.clip(-ks, 0, Lq - 1), axis=1)
        eq = jnp.where(ks >= 0, qi[:, :1] == t_at_k, q_at_mk == ti[:, :1])
        off = jnp.where(ks >= 0, ks + 1, 1)
        cell_eq = (off << TYPE_BITS) | T_MATCH
        cell_ne = (off << TYPE_BITS) | T_MISMATCH
        row_eq = jnp.where(in_range & eq, cell_eq, 0)
        row_ne = jnp.where(in_range & ~eq, cell_ne, 0)
        if p.mismatch == 0:  # both seed sets land on score 0
            row0, rowx = row_eq + row_ne, jnp.zeros_like(row_eq)
        else:
            row0, rowx = row_eq, row_ne
        for s_seed, row in ((0, row0), (int(p.mismatch), rowx)):
            if s_seed == 0 and row is rowx:
                continue
            any_set = jnp.any(row > 0, axis=1)
            lo_s = _masked_min(ks, row > 0)
            hi_s = _masked_max(ks, row > 0)
            hist_m = hist_m.at[:, s_seed, :].set(row)
            k0 = k0.at[:, s_seed].set(k0_seed)
            lo_m = lo_m.at[:, s_seed].set(jnp.where(any_set, lo_s, _BIG))
            hi_m = hi_m.at[:, s_seed].set(jnp.where(any_set, hi_s, -_BIG))
            ex_m = ex_m.at[:, s_seed].set(any_set)
            if p.mismatch == 0:
                break

    state = _State(
        s=jnp.int32(0),
        done=jnp.zeros((B,), bool),
        overflow=jnp.zeros((B,), bool),
        final_s=jnp.zeros((B,), jnp.int32),
        hist_m=hist_m, hist_i=hist_i, hist_d=hist_d,
        k0=k0,
        lo_m=lo_m, hi_m=hi_m, lo_i=lo_i, hi_i=hi_i, lo_d=lo_d, hi_d=hi_d,
        ex_m=ex_m, ex_i=ex_i, ex_d=ex_d,
    )

    def read_source(hist, lo_c, hi_c, ex_c, k0_all, s_cur, diff, k_tgt):
        """Component value at score s_cur - diff and diagonals k_tgt [B,K].
        Returns (offset [B,K], found [B,K]) — GetAfterDiff semantics
        (wfa_component.go:158-167)."""
        sp = s_cur - diff
        okd = diff <= s_cur  # scalar bool (diff is a trace-time constant)
        spc = jnp.clip(sp, 0, S - 1)
        row = _row_at(hist, spc)
        k0sp = _col_at(k0_all, spc)[:, None]
        lo_sp = _col_at(lo_c, spc)[:, None]
        hi_sp = _col_at(hi_c, spc)[:, None]
        ex_sp = _col_at(ex_c, spc)[:, None]
        j = k_tgt - k0sp
        val = jnp.take_along_axis(row, jnp.clip(j, 0, K - 1), axis=1)
        found = (
            okd
            & ex_sp
            & (j >= 0)
            & (j < K)
            & (k_tgt >= lo_sp)
            & (k_tgt <= hi_sp)
            & (val > 0)
        )
        return jnp.where(found, val >> TYPE_BITS, 0), found

    def krange(lo_c, hi_c, ex_c, s_cur, diff):
        """KRange with the reference's (0,0) fallback (wfa_component.go:91)."""
        sp = s_cur - diff
        okd = diff <= s_cur
        spc = jnp.clip(sp, 0, S - 1)
        ex_sp = _col_at(ex_c, spc) & okd
        lo = jnp.where(ex_sp, _col_at(lo_c, spc), 0)
        hi = jnp.where(ex_sp, _col_at(hi_c, spc), 0)
        return lo, hi

    def body(st: _State) -> _State:
        s = st.s
        k0s = _col_at(st.k0, s)  # [B]
        lo_ms = _col_at(st.lo_m, s)
        hi_ms = _col_at(st.hi_m, s)
        ex_ms = _col_at(st.ex_m, s)
        ks = k0s[:, None] + iota  # [B, K]

        # ---------------- extend (wfa.go:381-458) ----------------
        row_m = _row_at(st.hist_m, s)
        cell = row_m
        off = cell >> TYPE_BITS
        valid = (
            (cell > 0)
            & (ks >= lo_ms[:, None])
            & (ks <= hi_ms[:, None])
            & ex_ms[:, None]
            & (~st.done)[:, None]
        )
        h0 = off
        v0 = off - ks
        act0 = (
            valid
            & (v0 > 0)
            & (v0 < qlen[:, None])
            & (h0 < tlen[:, None])
        )

        def lcp_cond(c):
            return jnp.any(c[3])

        def lcp_body(c):
            v, h, n_acc, act = c
            qa = jnp.take_along_axis(q4, jnp.clip(v, 0, Lq - 1), axis=1)
            ta = jnp.take_along_axis(t4, jnp.clip(h, 0, Lt - 1), axis=1)
            xw = qa ^ ta
            # leading equal bytes of the 4-byte words
            nb = jnp.where(
                xw == 0,
                4,
                jnp.where(
                    xw >= (1 << 24),
                    0,
                    jnp.where(xw >= (1 << 16), 1, jnp.where(xw >= (1 << 8), 2, 3)),
                ),
            ).astype(jnp.int32)
            rem = jnp.minimum(qlen[:, None] - v, tlen[:, None] - h)
            adv = jnp.where(act, jnp.minimum(nb, rem), 0)
            v2 = v + adv
            h2 = h + adv
            act2 = (
                act
                & (adv == 4)
                & (v2 < qlen[:, None])
                & (h2 < tlen[:, None])
            )
            return v2, h2, n_acc + adv, act2

        _, _, n_ext, _ = lax.while_loop(
            lcp_cond, lcp_body, (v0, h0, jnp.zeros_like(v0), act0)
        )
        row_m = jnp.where(act0 & (n_ext > 0), cell + (n_ext << TYPE_BITS), cell)
        hist_m = _set_row(st.hist_m, s, row_m)

        # ---------------- termination (wfa.go:235-239) ----------------
        j_ak = Ak - k0s  # [B]
        cell_ak = jnp.take_along_axis(
            row_m, jnp.clip(j_ak, 0, K - 1)[:, None], axis=1
        )[:, 0]
        found_ak = (
            ex_ms
            & (j_ak >= 0)
            & (j_ak < K)
            & (Ak >= lo_ms)
            & (Ak <= hi_ms)
            & (cell_ak > 0)
        )
        off_ak = jnp.where(found_ak, cell_ak >> TYPE_BITS, 0)
        newly = (~st.done) & ex_ms & (off_ak >= tlen)
        final_s = jnp.where(newly, s, st.final_s)
        done = st.done | newly

        # ---------------- reduce (wfa.go:461-540) ----------------
        lo_m_all, hi_m_all = st.lo_m, st.hi_m
        lo_i_all, hi_i_all = st.lo_i, st.hi_i
        lo_d_all, hi_d_all = st.lo_d, st.hi_d
        hist_i, hist_d = st.hist_i, st.hist_d
        if reduce_on:
            red = ex_ms & (~done) & ((hi_ms - lo_ms + 1) >= min_wf_len)
            offc = row_m >> TYPE_BITS
            hs = offc
            vs = offc - ks
            validc = (row_m > 0) & (ks >= lo_ms[:, None]) & (ks <= hi_ms[:, None])
            okd = validc & ~(
                (vs < 0) | (vs >= qlen[:, None]) | (hs >= tlen[:, None])
            )
            dist = jnp.maximum(tlen[:, None] - hs, qlen[:, None] - vs)
            dmin = _masked_min(dist, okd)[:, None]
            marked = okd & ((dist - dmin) > max_dist_diff)
            good = okd & ~marked
            jj = jnp.broadcast_to(iota, marked.shape)
            first_good = _masked_min(jj, good)[:, None]
            last_mark = _masked_max(jj, marked & (jj < first_good))
            any_marked = jnp.any(marked, axis=1)
            any_good = jnp.any(good, axis=1)
            last_good = _masked_max(jj, good)
            new_lo = jnp.where(last_mark > -_BIG, k0s + last_mark + 1, lo_ms)
            new_hi = jnp.where(any_marked & any_good, k0s + last_good, hi_ms)
            new_lo = jnp.where(red, new_lo, lo_ms)
            new_hi = jnp.where(red, new_hi, hi_ms)

            zero_m = (
                validc
                & ((ks < new_lo[:, None]) | (ks > new_hi[:, None]))
                & red[:, None]
            )
            row_m = jnp.where(zero_m, 0, row_m)
            hist_m = _set_row(hist_m, s, row_m)
            lo_m_all = _set_col(lo_m_all, s, jnp.where(red, new_lo, lo_ms))
            hi_m_all = _set_col(hi_m_all, s, jnp.where(red, new_hi, hi_ms))

            # co-deletion from I and D (wfa.go:526-535): two ascending
            # Delete sweeps, [lo, _lo) then (_hi, hi].
            def co_delete(hist_c, lo_c, hi_c, ex_c):
                row = _row_at(hist_c, s)
                lo_cs = _col_at(lo_c, s)
                hi_cs = _col_at(hi_c, s)
                gate = red & _col_at(ex_c, s)
                l1, h1, zl1, zh1 = _delete_range_asc(
                    lo_ms, new_lo - 1, lo_cs, hi_cs
                )
                l2, h2, zl2, zh2 = _delete_range_asc(
                    new_hi + 1, hi_ms, l1, h1
                )
                zero = gate[:, None] & (
                    ((ks >= zl1[:, None]) & (ks <= zh1[:, None]))
                    | ((ks >= zl2[:, None]) & (ks <= zh2[:, None]))
                )
                row = jnp.where(zero, 0, row)
                hist_c = _set_row(hist_c, s, row)
                lo_c = _set_col(lo_c, s, jnp.where(gate, l2, lo_cs))
                hi_c = _set_col(hi_c, s, jnp.where(gate, h2, hi_cs))
                return hist_c, lo_c, hi_c

            hist_i, lo_i_all, hi_i_all = co_delete(
                hist_i, lo_i_all, hi_i_all, st.ex_i
            )
            hist_d, lo_d_all, hi_d_all = co_delete(
                hist_d, lo_d_all, hi_d_all, st.ex_d
            )

        # ---------------- next (wfa.go:549-700) ----------------
        s2 = s + 1
        lo_x, hi_x = krange(lo_m_all, hi_m_all, st.ex_m, s2, x)
        lo_o, hi_o = krange(lo_m_all, hi_m_all, st.ex_m, s2, oe)
        lo_ie, hi_ie = krange(lo_i_all, hi_i_all, st.ex_i, s2, e)
        lo_de, hi_de = krange(lo_d_all, hi_d_all, st.ex_d, s2, e)

        hi_n = jnp.minimum(
            tlen - 1,
            jnp.maximum(jnp.maximum(hi_x, hi_o), jnp.maximum(hi_ie, hi_de)) + 1,
        )
        lo_n = jnp.maximum(
            -(qlen - 1),
            jnp.minimum(jnp.minimum(lo_x, lo_o), jnp.minimum(lo_ie, lo_de)) - 1,
        )

        ex_m_old = _col_at(st.ex_m, s2)
        k0_old = _col_at(st.k0, s2)
        lo_m_old = _col_at(lo_m_all, s2)
        hi_m_old = _col_at(hi_m_all, s2)
        k0n = jnp.where(ex_m_old, jnp.minimum(lo_n, k0_old), lo_n)
        width = jnp.maximum(hi_n, jnp.where(ex_m_old, hi_m_old, hi_n)) - k0n + 1
        overflow = st.overflow | ((~done) & (width > K))
        live = ((~done) & (~overflow))[:, None]

        ks2 = k0n[:, None] + iota  # [B, K]

        # insertion (wfa.go:578-608)
        v1i, fmi = read_source(
            hist_m, lo_m_all, hi_m_all, st.ex_m, st.k0, s2, oe, ks2 - 1
        )
        v2i, fii = read_source(
            hist_i, lo_i_all, hi_i_all, st.ex_i, st.k0, s2, e, ks2 - 1
        )
        bad = fmi & (v1i > tlen[:, None])
        fmi, v1i = fmi & ~bad, jnp.where(bad, 0, v1i)
        bad = fii & (v2i > tlen[:, None])
        fii, v2i = fii & ~bad, jnp.where(bad, 0, v2i)
        Isk = jnp.maximum(v1i, v2i) + 1
        upd_i = fmi | fii
        tag_i = jnp.where(fmi & (v1i >= v2i), T_INS_OPEN, T_INS_EXT)

        # deletion (wfa.go:612-643)
        v1d, fmd = read_source(
            hist_m, lo_m_all, hi_m_all, st.ex_m, st.k0, s2, oe, ks2 + 1
        )
        v2d, fdd = read_source(
            hist_d, lo_d_all, hi_d_all, st.ex_d, st.k0, s2, e, ks2 + 1
        )
        bad = fmd & ((v1d - ks2) > qlen[:, None])
        fmd, v1d = fmd & ~bad, jnp.where(bad, 0, v1d)
        bad = fdd & ((v2d - ks2) > qlen[:, None])
        fdd, v2d = fdd & ~bad, jnp.where(bad, 0, v2d)
        Dsk = jnp.maximum(v1d, v2d)
        upd_d = fmd | fdd
        tag_d = jnp.where(fmd & (v1d >= v2d), T_DEL_OPEN, T_DEL_EXT)

        # mismatch / M (wfa.go:648-698)
        v1x, fmx = read_source(
            hist_m, lo_m_all, hi_m_all, st.ex_m, st.k0, s2, x, ks2
        )
        bad = fmx & ((v1x > tlen[:, None]) | ((v1x - ks2) > qlen[:, None]))
        fmx, v1x = fmx & ~bad, jnp.where(bad, 0, v1x)
        Msk = jnp.maximum(
            jnp.maximum(
                jnp.where(upd_i, Isk, 0), jnp.where(upd_d, Dsk, 0)
            ),
            v1x + 1,
        )
        tag_m = jnp.where(
            fmx & (Msk == v1x + 1),
            T_MISMATCH,
            jnp.where(upd_i & (Msk == Isk), tag_i, tag_d),
        )
        wr_m = upd_i | upd_d | fmx

        band = (ks2 >= lo_n[:, None]) & (ks2 <= hi_n[:, None])
        wr_i = upd_i & band & live
        wr_d = upd_d & band & live
        wr_m = wr_m & band & live

        # write I / D rows (fresh wavefronts at s2)
        row_i_new = jnp.where(wr_i, (Isk << TYPE_BITS) | tag_i, 0)
        row_d_new = jnp.where(wr_d, (Dsk << TYPE_BITS) | tag_d, 0)

        # write M row, merging any pre-existing wavefront at s2 (semi-global
        # seeds / global mismatch seed live at score x; next() merges into
        # them exactly like the reference's Component.Set does).
        row_m_old = _row_at(hist_m, s2)
        j_old = ks2 - k0_old[:, None]
        old_val = jnp.take_along_axis(row_m_old, jnp.clip(j_old, 0, K - 1), axis=1)
        old_ok = ex_m_old[:, None] & (j_old >= 0) & (j_old < K)
        row_m_new = jnp.where(
            wr_m,
            (Msk << TYPE_BITS) | tag_m,
            jnp.where(old_ok, old_val, 0),
        )

        any_i = jnp.any(wr_i, axis=1)
        any_d = jnp.any(wr_d, axis=1)
        any_m = jnp.any(wr_m, axis=1)
        lo_i_n = _masked_min(ks2, wr_i)
        hi_i_n = _masked_max(ks2, wr_i)
        lo_d_n = _masked_min(ks2, wr_d)
        hi_d_n = _masked_max(ks2, wr_d)
        lo_m_n = jnp.minimum(
            _masked_min(ks2, wr_m), jnp.where(ex_m_old, lo_m_old, _BIG)
        )
        hi_m_n = jnp.maximum(
            _masked_max(ks2, wr_m), jnp.where(ex_m_old, hi_m_old, -_BIG)
        )

        frozen = (done | overflow)[:, None]
        hist_i = _set_row(
            hist_i, s2, jnp.where(frozen, _row_at(hist_i, s2), row_i_new)
        )
        hist_d = _set_row(
            hist_d, s2, jnp.where(frozen, _row_at(hist_d, s2), row_d_new)
        )
        hist_m = _set_row(
            hist_m, s2, jnp.where(frozen, row_m_old, row_m_new)
        )
        frz = done | overflow
        k0_new = _set_col(st.k0, s2, jnp.where(frz, k0_old, k0n))
        lo_i_all = _set_col(
            lo_i_all, s2,
            jnp.where(frz, _col_at(lo_i_all, s2),
                      jnp.where(any_i, lo_i_n, _BIG)),
        )
        hi_i_all = _set_col(
            hi_i_all, s2,
            jnp.where(frz, _col_at(hi_i_all, s2),
                      jnp.where(any_i, hi_i_n, -_BIG)),
        )
        lo_d_all = _set_col(
            lo_d_all, s2,
            jnp.where(frz, _col_at(lo_d_all, s2),
                      jnp.where(any_d, lo_d_n, _BIG)),
        )
        hi_d_all = _set_col(
            hi_d_all, s2,
            jnp.where(frz, _col_at(hi_d_all, s2),
                      jnp.where(any_d, hi_d_n, -_BIG)),
        )
        lo_m_all = _set_col(
            lo_m_all, s2,
            jnp.where(frz, lo_m_old,
                      jnp.where(any_m | ex_m_old, lo_m_n, _BIG)),
        )
        hi_m_all = _set_col(
            hi_m_all, s2,
            jnp.where(frz, hi_m_old,
                      jnp.where(any_m | ex_m_old, hi_m_n, -_BIG)),
        )
        ex_i_all = _set_col(
            st.ex_i, s2, jnp.where(frz, _col_at(st.ex_i, s2), any_i)
        )
        ex_d_all = _set_col(
            st.ex_d, s2, jnp.where(frz, _col_at(st.ex_d, s2), any_d)
        )
        ex_m_all = _set_col(
            st.ex_m, s2, jnp.where(frz, ex_m_old, any_m | ex_m_old)
        )

        return _State(
            s=s2, done=done, overflow=overflow, final_s=final_s,
            hist_m=hist_m, hist_i=hist_i, hist_d=hist_d,
            k0=k0_new,
            lo_m=lo_m_all, hi_m=hi_m_all,
            lo_i=lo_i_all, hi_i=hi_i_all,
            lo_d=lo_d_all, hi_d=hi_d_all,
            ex_m=ex_m_all, ex_i=ex_i_all, ex_d=ex_d_all,
        )

    def cond(st: _State):
        return (st.s < S - 1) & jnp.any(~(st.done | st.overflow))

    final = lax.while_loop(cond, body, state)
    overflow = final.overflow | ~final.done
    return final._replace(overflow=overflow)


class _HistView:
    """Component view over one pair's dense history — implements the
    component protocol used by the shared backtrace."""

    __slots__ = ("hist", "k0", "lo", "hi", "ex", "s_max", "K")

    def __init__(self, hist, k0, lo, hi, ex, s_max):
        self.hist = hist  # [S, K]
        self.k0 = k0  # [S]
        self.lo = lo
        self.hi = hi
        self.ex = ex
        self.s_max = s_max
        self.K = hist.shape[1]

    def has_score(self, s: int) -> bool:
        return 0 <= s <= self.s_max and bool(self.ex[s])

    def k_range(self, s: int, diff: int) -> Tuple[int, int]:
        if diff > s:
            return 0, 0
        sp = s - diff
        if not self.has_score(sp):
            return 0, 0
        return int(self.lo[sp]), int(self.hi[sp])

    def _cell(self, s: int, k: int) -> int:
        j = k - int(self.k0[s])
        if j < 0 or j >= self.K:
            return 0
        return int(self.hist[s, j])

    def get(self, s: int, k: int):
        if s < 0 or s > self.s_max or not self.ex[s]:
            return 0, 0, False
        if k < self.lo[s] or k > self.hi[s]:
            return 0, 0, False
        cell = self._cell(s, k)
        return cell >> TYPE_BITS, cell & ((1 << TYPE_BITS) - 1), cell > 0

    def get_raw(self, s: int, k: int):
        if s < 0 or s > self.s_max or not self.ex[s]:
            return 0, False
        if k < self.lo[s] or k > self.hi[s]:
            return 0, False
        cell = self._cell(s, k)
        return cell, cell > 0

    def get_after_diff(self, s: int, diff: int, k: int):
        if diff > s:
            return 0, 0, False
        return self.get(s - diff, k)


class BatchAligner:
    """Batched aligner: device score loop + host backtrace.

    The TPU-native replacement for the reference's one-pair-at-a-time CLI
    loop (wfa-go.go:166-178): B pairs advance in lockstep on-device; pairs
    whose bands or scores exceed the configured windows fall back to the
    exact host oracle (rare for sanely bucketed input).
    """

    def __init__(
        self,
        penalties: Penalties = Penalties(),
        options: Options = Options(),
        adaptive: Optional[AdaptiveReductionOption] = None,
        k_win: int = 128,
        s_cap: int = 256,
    ) -> None:
        self.cfg = EngineConfig(
            penalties=penalties,
            global_alignment=options.global_alignment,
            adaptive=adaptive,
            k_win=k_win,
            s_cap=s_cap,
        )
        self._oracle = OracleAligner(penalties, options, adaptive)

    # -- public API ---------------------------------------------------------

    def align_batch(
        self,
        pairs: Sequence[Tuple[bytes, bytes]],
        fallback: bool = True,
    ) -> List[Optional[AlignmentResult]]:
        """Align a batch of (query, target) pairs; returns results in order.

        Pairs that overflow the configured windows are completed by the
        exact host oracle when ``fallback`` is True, else returned as
        ``None`` (so a pipeline can re-batch them with larger caps).

        Raises EmptySeqError/SeqTooLongError on invalid pairs, matching
        the reference's guards (wfa.go:204-209).
        """
        for q, t in pairs:
            if len(q) == 0 or len(t) == 0:
                raise EmptySeqError("wfa: invalid empty sequence")
            if len(q) > MAX_SEQ_LEN or len(t) > MAX_SEQ_LEN:
                raise SeqTooLongError(
                    f"wfa: sequences longer than {MAX_SEQ_LEN} are not supported"
                )

        B = len(pairs)
        Lq = max(len(q) for q, _ in pairs)
        Lt = max(len(t) for _, t in pairs)
        if not self.cfg.global_alignment:
            need = Lq + Lt - 1
            if need > self.cfg.k_win:
                # semi-global seeds span the full diagonal range; fall back
                # when the window cannot hold them.
                if fallback:
                    return [self._oracle.align(q, t) for q, t in pairs]
                return [None] * B

        qb = np.zeros((B, Lq), np.uint8)
        tb = np.zeros((B, Lt), np.uint8)
        qlen = np.zeros((B,), np.int32)
        tlen = np.zeros((B,), np.int32)
        for i, (q, t) in enumerate(pairs):
            qb[i, : len(q)] = np.frombuffer(q, np.uint8)
            tb[i, : len(t)] = np.frombuffer(t, np.uint8)
            qlen[i] = len(q)
            tlen[i] = len(t)

        st = _run_batch(
            jnp.asarray(qb), jnp.asarray(tb),
            jnp.asarray(qlen), jnp.asarray(tlen),
            cfg=self.cfg, B=B, Lq=Lq, Lt=Lt,
        )
        st = jax.device_get(st)
        return self._finish(pairs, st, fallback)

    # -- host-side completion -------------------------------------------------

    def _finish(self, pairs, st, fallback: bool) -> List[Optional[AlignmentResult]]:
        results: List[Optional[AlignmentResult]] = []
        p = self.cfg.penalties
        for i, (q, t) in enumerate(pairs):
            if st.overflow[i]:
                results.append(self._oracle.align(q, t) if fallback else None)
                continue
            s_fin = int(st.final_s[i])
            M = _HistView(
                st.hist_m[i], st.k0[i], st.lo_m[i], st.hi_m[i], st.ex_m[i], s_fin
            )
            I = _HistView(
                st.hist_i[i], st.k0[i], st.lo_i[i], st.hi_i[i], st.ex_i[i], s_fin
            )
            D = _HistView(
                st.hist_d[i], st.k0[i], st.lo_d[i], st.hi_d[i], st.ex_d[i], s_fin
            )
            m, n = len(t), len(q)
            min_s, last_k = s_fin, m - n
            if not self.cfg.global_alignment:
                min_s, last_k = backtrace_start_position(M, n, m, s_fin)
            results.append(
                back_trace(
                    M, I, D, p, self.cfg.global_alignment, q, t, min_s, last_k
                )
            )
        return results
