"""On-device CIGAR backtrace + semi-global end finder.

The reference's backtrace (wfa.go:703-983) is a sequential pointer chase
through the wavefront history.  Running it host-side would require
shipping the whole packed history off-device (hundreds of MB per batch);
instead the chase runs *on device*: all B pairs step in lockstep through
a ``lax.while_loop``, each iteration doing a handful of scalar-per-pair
gathers from the HBM-resident history, and emitting (op, run-length)
tokens into a small per-pair buffer.  Only those token buffers (~KB/pair)
ever leave the device.

Layout: histories are ``[S, B, K]`` with a fixed per-pair window origin
``k0[b]`` (column j holds diagonal ``k0 + j`` at every score).

Outputs are bit-identical to the host backtrace: the loop is an exact
port including break order, ``previousFromM`` handling and the
pre-extension offset recomputation without bound checks (wfa.go:757-827).

Op-token encoding: ``code << 28 | run_length`` with codes
0=M 1=X 2=I 3=D 4=H (host decodes to the reference's op characters).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .constants import (
    T_DEL_EXT,
    T_DEL_OPEN,
    T_INS_EXT,
    T_INS_OPEN,
    T_MATCH,
    T_MISMATCH,
    TYPE_BITS,
)

_BIG = np.int32(1 << 30)

CODE_M, CODE_X, CODE_I, CODE_D, CODE_H = 0, 1, 2, 3, 4
OP_CHARS = "MXIDH"
# tag (0..7) -> op code; tags 1,2 -> I; 3,4 -> D; 5 -> X; 6 -> M
_TAG2CODE = np.array([7, CODE_I, CODE_I, CODE_D, CODE_D, CODE_X, CODE_M, 7],
                     dtype=np.int32)


def _pack(code, n):
    return (code << 28) | n


def _reader(hist, k0, lo, hi, ex, S, B, K):
    """Build a component reader: (s[B], k[B]) -> (cell[B], found[B]).

    Implements Get/GetRaw semantics over the dense [S, B, K] history:
    score known, k within the row's live band, window hit, cell non-zero
    (wfa_wavefront.go:153-168)."""
    flat = hist.reshape(S * B * K)
    lo_f = lo.reshape(S * B)
    hi_f = hi.reshape(S * B)
    ex_f = ex.reshape(S * B)
    bidx = jnp.arange(B, dtype=jnp.int32)

    def read(s, k):
        ok_s = (s >= 0) & (s < S)
        sc = jnp.clip(s, 0, S - 1)
        sb = sc * B + bidx
        exs = jnp.take(ex_f, sb) & ok_s
        los = jnp.take(lo_f, sb)
        his = jnp.take(hi_f, sb)
        j = k - k0
        cell = jnp.take(flat, sb * K + jnp.clip(j, 0, K - 1))
        found = exs & (j >= 0) & (j < K) & (k >= los) & (k <= his) & (cell > 0)
        return jnp.where(found, cell, 0), found

    return read


def end_finder(hist_m, k0, lo_m, hi_m, ex_m, final_s, qlen, tlen, S, K):
    """Vectorized semi-global end finder (wfa.go:270-375).

    For every existing score row the reference scans k downward from Ak
    and upward from Ak+1, skipping absent cells, failing at the first
    bound-violating cell and succeeding at the first last-row/col cell.
    Equivalently: the nearest *stop* cell in each direction decides.
    Returns (min_s, last_k) per pair.
    """
    B = qlen.shape[0]
    ks = k0[None, :, None] + jnp.arange(K, dtype=jnp.int32)[None, None, :]
    cell = hist_m  # [S, B, K]
    n = qlen[None, :, None]
    m = tlen[None, :, None]
    s_rows = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    okc = (
        ex_m[:, :, None]
        & (cell > 0)
        & (ks >= lo_m[:, :, None])
        & (ks <= hi_m[:, :, None])
        & (s_rows <= final_s[None, :, None])
    )
    h = cell >> TYPE_BITS
    v = h - ks
    viol = (v <= 0) | (v > n) | (h > m)
    elig = ((v == n) & (h >= n)) | ((h == m) & (v >= m))
    stop = okc & (viol | elig)
    succ = okc & ~viol & elig

    Ak = (tlen - qlen)[None, :, None]
    stop_dn = stop & (ks <= Ak)
    k_dn = jnp.max(jnp.where(stop_dn, ks, -_BIG), axis=2)  # [S,B]
    succ_dn = jnp.any(succ & (ks <= Ak) & (ks == k_dn[:, :, None]), axis=2)
    stop_up = stop & (ks >= Ak + 1)
    k_up = jnp.min(jnp.where(stop_up, ks, _BIG), axis=2)
    succ_up = jnp.any(succ & (ks >= Ak + 1) & (ks == k_up[:, :, None]), axis=2)

    row_ok = succ_dn | succ_up  # [S,B]
    s_idx = jnp.arange(S, dtype=jnp.int32)[:, None]
    min_s = jnp.min(jnp.where(row_ok, s_idx, _BIG), axis=0)  # [B]
    found = min_s < _BIG
    sc = jnp.clip(min_s, 0, S - 1)
    up_at = jnp.take_along_axis(succ_up, sc[None, :], 0)[0]
    k_sel = jnp.where(
        up_at,
        jnp.take_along_axis(k_up, sc[None, :], 0)[0],
        jnp.take_along_axis(k_dn, sc[None, :], 0)[0],
    )
    ak = tlen - qlen
    return (
        jnp.where(found, min_s, final_s),
        jnp.where(found, k_sel, ak),
    )


def device_backtrace(
    hist_m, hist_i, hist_d,
    k0, lo_m, hi_m, lo_i, hi_i, lo_d, hi_d, ex_m, ex_i, ex_d,
    start_s, start_k, qlen, tlen, active0,
    *, penalties, global_alignment: bool, S: int, K: int, ops_cap: int,
):
    """Exact device port of the backtrace loop (wfa.go:703-983).

    Returns (buf [B, ops_cap] int32 op tokens in emission order,
    cnt [B], q_begin, q_end, t_begin, t_end).
    """
    B = qlen.shape[0]
    x = np.int32(penalties.mismatch)
    oe = np.int32(penalties.gap_open + penalties.gap_ext)
    e = np.int32(penalties.gap_ext)
    semi = not global_alignment

    read_m = _reader(hist_m, k0, lo_m, hi_m, ex_m, S, B, K)
    read_i = _reader(hist_i, k0, lo_i, hi_i, ex_i, S, B, K)
    read_d = _reader(hist_d, k0, lo_d, hi_d, ex_d, S, B, K)

    bidx = jnp.arange(B)
    code_tab = jnp.asarray(_TAG2CODE)

    def emit(buf, cnt, do, code, n):
        idx = jnp.where(do, cnt, ops_cap)  # OOB index -> dropped
        buf = buf.at[bidx, idx].set(_pack(code, n), mode="drop")
        return buf, cnt + do.astype(jnp.int32)

    # ---- start point (wfa.go:738-750); existence deliberately unchecked.
    raw, _ = read_m(start_s, start_k)
    tag = raw & ((1 << TYPE_BITS) - 1)
    h = raw >> TYPE_BITS
    v = h - start_k

    buf = jnp.zeros((B, ops_cap), jnp.int32)
    cnt = jnp.zeros((B,), jnp.int32)
    fl_i = h < tlen
    fl_h = (~fl_i) & (v < qlen)
    buf, cnt = emit(
        buf, cnt, active0 & (fl_i | fl_h),
        jnp.where(fl_i, CODE_I, CODE_H),
        jnp.maximum(jnp.where(fl_i, tlen - h, qlen - v), 0),
    )

    alive = active0 & (v > 0) & (h > 0)
    pfm = jnp.ones((B,), bool)  # previousFromM
    first = jnp.ones((B,), bool)  # firstMatch
    qe = jnp.zeros((B,), jnp.int32)
    te = jnp.zeros((B,), jnp.int32)
    qb0 = jnp.zeros((B,), jnp.int32)
    tb0 = jnp.zeros((B,), jnp.int32)
    s = start_s
    k = start_k
    it = jnp.int32(0)

    def body(c):
        (s, k, h, v, tag, pfm, first, qe, te, qb0, tb0, buf, cnt, alive, it) = c
        smis = s - x
        sgo = s - oe
        sge = s - e

        # the five source reads of the offset recomputation (wfa.go:766-817)
        v1a, fa = read_m(sgo, k - 1)
        v2a, ga = read_i(sge, k - 1)
        v1b, fb = read_m(sgo, k + 1)
        v2b, gb = read_d(sge, k + 1)
        vx, fx = read_m(smis, k)
        v1a >>= TYPE_BITS
        v2a >>= TYPE_BITS
        v1b >>= TYPE_BITS
        v2b >>= TYPE_BITS
        vx >>= TYPE_BITS

        is_ie = tag == T_INS_EXT
        is_de = tag == T_DEL_EXT
        isk = jnp.where(fa | ga, jnp.maximum(v1a, v2a) + 1, 0)
        dsk = jnp.where(fb | gb, jnp.maximum(v1b, v2b), 0)
        from_any = fa | ga | fb | gb | fx
        off_def = jnp.maximum(jnp.maximum(isk, dsk), vx + 1)
        offset0 = jnp.where(
            is_ie, isk,
            jnp.where(is_de, dsk, jnp.where(from_any, off_def, 0)),
        )
        from_itself = (~is_ie) & (~is_de) & (~from_any)
        die = from_itself | (offset0 == 0)
        cont = alive & ~die

        # traceback matches (wfa.go:832-869)
        nmatch = h - offset0
        emit1 = cont & pfm & (nmatch > 0)
        set_end = emit1 & first
        te = jnp.where(set_end, h, te)
        qe = jnp.where(set_end, v, qe)
        first = first & ~emit1
        buf, cnt = emit(buf, cnt, emit1, CODE_M, jnp.maximum(nmatch, 0))

        upd_hv = cont & pfm
        h = jnp.where(upd_hv, offset0, h)
        v = jnp.where(upd_hv, h - k, v)

        is_match = tag == T_MATCH
        set_b1 = upd_hv & is_match
        set_b2 = upd_hv & (~is_match) & (nmatch > 0)
        tb0 = jnp.where(set_b1, h, jnp.where(set_b2, h + 1, tb0))
        qb0 = jnp.where(set_b1, v, jnp.where(set_b2, v + 1, qb0))

        die2 = upd_hv & ((h <= 0) | (v <= 0))
        cont2 = cont & ~die2

        # record the current op (wfa.go:871-874)
        buf, cnt = emit(buf, cnt, cont2, code_tab[tag], jnp.int32(1))

        die3 = cont2 & semi & ((h == 1) | (v == 1))
        cont3 = cont2 & ~die3

        # step to the source cell (wfa.go:884-909)
        is_mis = tag == T_MISMATCH
        is_io = tag == T_INS_OPEN
        is_do = tag == T_DEL_OPEN
        valid_tag = is_mis | is_io | is_ie | is_do | is_de
        die4 = cont3 & ~valid_tag

        step = cont3 & valid_tag
        s_n = jnp.where(
            is_mis, smis, jnp.where(is_io | is_do, sgo, sge)
        )
        k_n = k + jnp.where(is_io | is_ie, -1, jnp.where(is_do | is_de, 1, 0))
        h_n = h + jnp.where(is_mis | is_io | is_ie, -1, 0)
        s = jnp.where(step, s_n, s)
        k = jnp.where(step, k_n, k)
        h = jnp.where(step, h_n, h)
        v = jnp.where(step, h - k, v)
        pfm = jnp.where(step, ~(is_ie | is_de), pfm)

        # read the next tag from the matching component (wfa.go:915-920)
        raw_m, ok_m = read_m(s, k)
        raw_i, ok_i = read_i(s, k)
        raw_d, ok_d = read_d(s, k)
        raw_n = jnp.where(is_ie, raw_i, jnp.where(is_de, raw_d, raw_m))
        ok_n = jnp.where(is_ie, ok_i, jnp.where(is_de, ok_d, ok_m))
        die5 = step & ~ok_n
        tag = jnp.where(step & ok_n, raw_n & ((1 << TYPE_BITS) - 1), tag)

        alive = step & ~die5 & (v > 0) & (h > 0) & (it < S + 4)
        return (s, k, h, v, tag, pfm, first, qe, te, qb0, tb0, buf, cnt,
                alive, it + 1)

    def cond(c):
        return jnp.any(c[13])

    (s, k, h, v, tag, pfm, first, qe, te, qb0, tb0, buf, cnt, alive, it) = (
        lax.while_loop(
            cond, body,
            (s, k, h, v, tag, pfm, first, qe, te, qb0, tb0, buf, cnt,
             alive, it),
        )
    )

    # ---- the last one (wfa.go:930-968), one-shot masked tail
    tl = active0 & (h > 0) & (v > 0)
    nm = jnp.minimum(h, v) - 1
    e1 = tl & (nm > 0)
    set_end = e1 & first
    te = jnp.where(set_end, h, te)
    qe = jnp.where(set_end, v, qe)
    first = first & ~e1
    buf, cnt = emit(buf, cnt, e1, CODE_M, jnp.maximum(nm, 0))
    h = jnp.where(e1, h - nm, h)
    v = jnp.where(e1, v - nm, v)
    is_match = tag == T_MATCH
    tb0 = jnp.where(e1, jnp.where(is_match, h, h + 1), tb0)
    qb0 = jnp.where(e1, jnp.where(is_match, v, v + 1), qb0)
    e1b = tl & (nm <= 0) & is_match
    tb0 = jnp.where(e1b, h, tb0)
    qb0 = jnp.where(e1b, v, qb0)
    set_end2 = e1b & first
    te = jnp.where(set_end2, h, te)
    qe = jnp.where(set_end2, v, qe)
    buf, cnt = emit(buf, cnt, tl, code_tab[tag], jnp.int32(1))

    # leading flanks (wfa.go:970-976)
    ev = active0 & (v > 1)
    buf, cnt = emit(buf, cnt, ev, CODE_H, jnp.maximum(v - 1, 0))
    eh = active0 & (h > 1)
    buf, cnt = emit(buf, cnt, eh, CODE_I, jnp.maximum(h - 1, 0))

    return buf, cnt, qb0, qe, tb0, te
