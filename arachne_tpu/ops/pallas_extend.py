"""Pallas TPU kernel for batched banded seed-extension DP.

Same math as ops.sw_extend.extend_batch_kernel (the XLA formulation of
ksw_extend2, ksw.c:380-479), but with the whole DP state resident in VMEM
for the entire target-row loop.  The XLA `fori_loop` round-trips the
(qmax, B) H/E carries through HBM every row; here each grid step owns a
(qmax, B_TILE) lane tile, loops over all target rows on-chip, and writes
only the six result scalars per problem back to HBM.  HBM traffic drops
from O(tmax * qmax * B) to O((qmax + tmax) * B).

Layout: problems on the lane (last) axis, query positions on the sublane
axis.  The F (gap-in-query) recurrence's running max is computed with
log-depth pad-shift doubling (lax.cummax has no Pallas TPU lowering).
Scores come from the bwa_fill_scmat structure (bwa.c:110-119): match=+a,
mismatch=-b, any-N=-1 — computed arithmetically instead of a 5x5 gather.

Outputs are bit-identical to extend_batch_kernel's 6-tuple; parity is
enforced by tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -(1 << 30)


def _shift_down(x: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    """Shift rows down by k along the sublane axis, filling with `fill`."""
    n = x.shape[0]
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x], axis=0)[:n]


def _prefix_max(v: jnp.ndarray, fill=NEG_BIG) -> jnp.ndarray:
    """Inclusive running max along the sublane axis (log-depth doubling)."""
    n = v.shape[0]
    k = 1
    while k < n:
        v = jnp.maximum(v, _shift_down(v, k, fill))
        k <<= 1
    return v


def _extend_kernel(
    qsT_ref,      # (qmax, B_TILE) int32 query codes 0..4
    tsT_ref,      # (tmax, B_TILE) int32 target codes 0..4
    params_ref,   # (4, B_TILE) int32: qlens, tlens, ws, h0s
    out_ref,      # (8, B_TILE) int32: maxv, qle, tle, gtle, gscore, max_off, 0, 0
    *,
    qmax: int,
    tmax: int,
    a: int,
    b: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    zdrop: int,
    sdt=jnp.int32,
):
    """``sdt`` is the (qmax, B) DP-state dtype: int16 when the dispatcher
    proves the score range fits (2 lanes/VPU-word -> ~2x element
    throughput on the big per-row tensors), int32 otherwise.  All (1, B)
    bookkeeping stays int32; the DP recurrences are identical integer
    arithmetic in either width, so outputs are bit-equal."""
    B = qsT_ref.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    NEG_S = jnp.asarray(NEG_BIG if sdt == jnp.int32 else -(1 << 13), sdt)

    qsT = qsT_ref[:]
    qlens = params_ref[0:1, :]                       # (1, B)
    tlens = params_ref[1:2, :]
    ws = params_ref[2:3, :]
    h0s = params_ref[3:4, :]

    jidx = jax.lax.broadcasted_iota(jnp.int32, (qmax, B), 0)
    jidx_s = jidx.astype(sdt)
    valid_q = jidx < qlens
    q_is_n = qsT == 4

    def sel(cond, x, y):
        """where(cond, x, y) with x/y in sdt.  Mosaic (v5e) supports
        neither i1 relayout between 32-bit and 16-bit tilings nor i16
        vector compares, so in int16 mode the mask (always computed from
        int32 operands) is value-cast to an int16 0/1 vector and the
        select becomes arithmetic."""
        if sdt == jnp.int32:
            return jnp.where(cond, x, y)
        m = cond.astype(jnp.int32).astype(sdt)
        return y + m * (x - y)

    j_ge_1 = (jidx >= 1).astype(jnp.int32).astype(sdt) if sdt != jnp.int32 else None

    # initial previous-row H: H(-1, j) = max(h0 - oe_ins - j*e_ins, 0)
    Hprev = jnp.maximum(h0s - oe_ins - jidx * e_ins, 0)
    Hprev = jnp.where(valid_q, Hprev, 0).astype(sdt)
    Eprev = jnp.zeros((qmax, B), sdt)

    zero1 = jnp.zeros((1, B), jnp.int32)
    carry = (
        Hprev,                                   # H
        Eprev,                                   # E
        (tlens > 0).astype(jnp.int32),           # alive (0/1; i1 carries
                                                 # fail Mosaic legalization)
        qlens,                                   # end
        h0s,                                     # maxv
        zero1 - 1,                               # max_i
        zero1 - 1,                               # max_j
        zero1 - 1,                               # max_ie
        zero1 - 1,                               # gscore
        zero1,                                   # max_off
    )

    def body(i, st):
        H0, E0, alive, end, maxv, max_i, max_j, max_ie, gscore, max_off = st
        ii = jnp.int32(i)
        row_live = (alive != 0) & (ii < tlens)                 # (1, B)
        tcode = jnp.where(ii < tlens, tsT_ref[i, :][None, :], 4)  # (1, B)
        # bwa_fill_scmat: match=+a, mismatch=-b, any N=-1
        q_row = sel(
            q_is_n | (tcode == 4),
            jnp.asarray(-1, sdt),
            sel(qsT == tcode, jnp.asarray(a, sdt), jnp.asarray(-b, sdt)),
        )
        end_used = jnp.minimum(jnp.minimum(end, ii + ws + 1), qlens)  # (1, B)
        in_band = (jidx >= ii - ws) & (jidx < end_used) & valid_q
        beg0 = (ii - ws) <= 0
        h1_init = jnp.where(
            beg0, jnp.maximum(h0s - (o_del + e_del * (ii + 1)), 0), 0
        )
        # H(i-1, -1): h0 on the first row (eh[0].h init, ksw.c:395), else
        # the previous row's first-column boundary
        bound_prev = jnp.where(
            ii == 0,
            h0s,
            jnp.where(
                (ii - 1) - ws <= 0,
                jnp.maximum(h0s - (o_del + e_del * ii), 0),
                0,
            ),
        )
        Hdiag = jnp.concatenate([bound_prev.astype(sdt), H0[:-1]], axis=0)
        # Hdiag >= 0 always, so min(Hdiag, 1) is the 0/1 nonzero mask —
        # no i16 compare needed
        M = jnp.minimum(Hdiag, jnp.asarray(1, sdt)) * (Hdiag + q_row) \
            if sdt != jnp.int32 else \
            jnp.where(Hdiag != 0, Hdiag + q_row, 0)
        u = jnp.maximum(M - jnp.asarray(oe_ins, sdt), jnp.asarray(0, sdt))
        v = u + jidx_s * jnp.asarray(e_ins, sdt)
        run = _prefix_max(v, NEG_S)
        run_prev = _shift_down(run, 1, NEG_S)
        Fv = jnp.maximum(run_prev - (jidx_s - 1) * jnp.asarray(e_ins, sdt),
                         jnp.asarray(0, sdt))
        F = j_ge_1 * Fv if sdt != jnp.int32 else jnp.where(jidx >= 1, Fv, 0)
        H = jnp.maximum(jnp.maximum(M, E0), F)
        H = sel(in_band, H, jnp.asarray(0, sdt))
        Enew = jnp.maximum(E0 - jnp.asarray(e_del, sdt),
                           jnp.maximum(M - jnp.asarray(oe_del, sdt),
                                       jnp.asarray(0, sdt)))
        Enew = sel(in_band, Enew, jnp.asarray(0, sdt))

        # Mosaic has no int16 reductions: reduce via an int32 view.
        # m and mj (largest j attaining m — ties to later j, ksw.c:437)
        # come from ONE composite reduction: max(H*K + j) with K = the
        # sublane capacity, so the winner is max-H-then-max-j.  Out-of-
        # band positions hold H == 0 and can only win when m == 0, in
        # which case the lane dies this row (zero_row) and mj is unused.
        H32 = H.astype(jnp.int32)
        K_SHIFT = max(qmax - 1, 1).bit_length()
        comp = jnp.max(
            (H32 << K_SHIFT) + jidx, axis=0, keepdims=True
        )                                                      # (1, B)
        m = comp >> K_SHIFT
        mj = comp & ((1 << K_SHIFT) - 1)

        # gscore: the window reached the end of the query this row
        ends_q = (end_used == qlens) & (ii < tlens)
        # H >= 0 everywhere, so a masked max extracts H[qlen-1] exactly
        h_last = jnp.max(
            jnp.where(jidx == qlens - 1, H32, 0), axis=0, keepdims=True
        )
        # ksw.c:451-452: max_ie updates on ties (gscore > h1 keeps old)
        upd_ie = ends_q & row_live & ~(gscore > h_last)
        gscore = jnp.where(
            ends_q & row_live, jnp.maximum(gscore, h_last), gscore
        )
        max_ie = jnp.where(upd_ie, ii, max_ie)

        # break conditions
        zero_row = m == 0
        improved = m > maxv
        diag_i = ii - max_i
        diag_j = mj - max_j
        drop_del = maxv - m - (diag_i - diag_j) * e_del > zdrop
        drop_ins = maxv - m - (diag_j - diag_i) * e_ins > zdrop
        if zdrop > 0:
            ins_side = diag_i > diag_j
            zdropped = (ins_side & drop_del) | (~ins_side & drop_ins)
        else:
            zdropped = jnp.zeros_like(zero_row)
        die = row_live & (zero_row | ((~improved) & zdropped))

        upd = row_live & improved
        maxv = jnp.where(upd, m, maxv)
        max_i = jnp.where(upd, ii, max_i)
        max_j = jnp.where(upd, mj, max_j)
        max_off = jnp.where(
            upd, jnp.maximum(max_off, jnp.abs(mj - ii)), max_off
        )

        # adaptive end update (ksw.c:468-469): slot s holds H(i, s-1) and
        # E(i+1, s); find the last nonzero slot <= end_used.
        # Slots 1..qmax: slot s <-> H[s-1], E[s] (E beyond qmax-1 is 0).
        e_shift32 = jnp.concatenate(
            [Enew[1:], jnp.zeros((1, B), sdt)], 0
        ).astype(jnp.int32)
        nzA = ((H32 != 0) | (e_shift32 != 0)) & ((jidx + 1) <= end_used)
        jstarA = jnp.max(jnp.where(nzA, jidx + 1, -1), axis=0, keepdims=True)
        # Slot 0: h=h1_init, e=Enew[0]; 0 <= end_used always (end >= 1).
        e0 = Enew[0:1, :].astype(jnp.int32)
        jstar0 = jnp.where((h1_init != 0) | (e0 != 0), 0, -1)
        jstar = jnp.maximum(jstarA, jstar0)
        new_end = jnp.minimum(jstar + 2, qlens)
        survive = row_live & ~die
        end = jnp.where(survive, new_end, end)

        return (
            sel(row_live, H, H0),
            sel(row_live, Enew, E0),
            ((alive != 0) & ~die).astype(jnp.int32),
            end,
            maxv,
            max_i,
            max_j,
            max_ie,
            gscore,
            max_off,
        )

    # dynamic trip count: a row only does real work for lanes that are
    # still alive AND have target left; rows past that are pure masked
    # work.  Callers sort submissions by tlen so tiles are coherent and
    # early tiles stop at small bounds.  (Output-identical: dead/past-end
    # lanes never update state in `body`.)
    def cond(ist):
        i, st = ist
        work_left = jnp.max(jnp.where(st[2] != 0, tlens, 0))   # (scalar)
        return (i < jnp.int32(tmax)) & (i < work_left)

    def wbody(ist):
        i, st = ist
        return i + 1, body(i, st)

    _, st = jax.lax.while_loop(cond, wbody, (jnp.int32(0), carry))
    (_, _, _, _, maxv, max_i, max_j, max_ie, gscore, max_off) = st
    out_ref[0:1, :] = maxv
    out_ref[1:2, :] = max_j + 1
    out_ref[2:3, :] = max_i + 1
    out_ref[3:4, :] = max_ie + 1
    out_ref[4:5, :] = gscore
    out_ref[5:6, :] = max_off
    out_ref[6:7, :] = jnp.zeros((1, out_ref.shape[1]), jnp.int32)
    out_ref[7:8, :] = jnp.zeros((1, out_ref.shape[1]), jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "zdrop", "b_tile", "interpret", "wide_state",
    ),
)
def extend_batch_pallas(
    qs: jnp.ndarray,        # (B, qmax) int8 query codes (0..4), padded
    ts: jnp.ndarray,        # (B, tmax) int8 target codes
    qlens: jnp.ndarray,     # (B,) int32
    tlens: jnp.ndarray,     # (B,) int32
    ws: jnp.ndarray,        # (B,) int32 band width (already min-clamped)
    h0s: jnp.ndarray,       # (B,) int32 seed scores
    *,
    qmax: int,
    tmax: int,
    a: int,
    b: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    zdrop: int,
    b_tile: int = 512,
    interpret: bool = False,
    wide_state: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Drop-in pallas twin of extend_batch_kernel (same 6-tuple outputs).

    ``wide_state=False`` runs the DP state in int16 (callers must prove
    max(h0) + band growth fits — see BatchExtender); bit-identical
    outputs either way."""
    B = qs.shape[0]
    b_tile = min(b_tile, B)
    if B % b_tile:
        raise ValueError(f"batch {B} not a multiple of tile {b_tile}")
    qsT = qs.T.astype(jnp.int32)
    tsT = ts.T.astype(jnp.int32)
    params = jnp.stack(
        [
            qlens.astype(jnp.int32),
            tlens.astype(jnp.int32),
            ws.astype(jnp.int32),
            h0s.astype(jnp.int32),
        ],
        axis=0,
    )
    kernel = functools.partial(
        _extend_kernel,
        qmax=qmax, tmax=tmax, a=a, b=b,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
        sdt=jnp.int32 if wide_state else jnp.int16,
    )
    grid = (B // b_tile,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qmax, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((tmax, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * qmax * tmax * B, bytes_accessed=(qmax + tmax + 12) * B * 4,
            transcendentals=0,
        ),
    )(qsT, tsT, params)
    return (out[0], out[1], out[2], out[3], out[4], out[5])


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "zdrop", "b_tile", "interpret", "wide_state",
    ),
)
def extend_batch_pallas_packed(
    qs_p, qs_n, ts_p, ts_n, qlens, tlens, ws, h0s,
    *, qmax, tmax, a, b, o_del, e_del, o_ins, e_ins, zdrop,
    b_tile=512, interpret=False, wide_state=True,
):
    """extend_batch_pallas fed 2-bit packed uploads (ops/packing.py):
    codes are unpacked on device in the jit prologue, cutting the
    host->device bytes ~2.7x — the tunnel upload dominates a chunk's
    steady-state cost."""
    from .packing import unpack_codes

    qs = unpack_codes(qs_p, qs_n, qmax)
    ts = unpack_codes(ts_p, ts_n, tmax)
    return extend_batch_pallas(
        qs, ts, qlens, tlens, ws, h0s,
        qmax=qmax, tmax=tmax, a=a, b=b, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, zdrop=zdrop, b_tile=b_tile,
        interpret=interpret, wide_state=wide_state,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "zdrop", "b_tile", "interpret", "wide_state",
    ),
)
def extend_batch_pallas_bundled(
    u8, meta,
    *, qmax, tmax, a, b, o_del, e_del, o_ins, e_ins, zdrop,
    b_tile=512, interpret=False, wide_state=True,
):
    """Single-buffer transfer variant: ``u8`` is packing.bundle_seqs of
    (qs, ts); ``meta`` stacks (qlens, tlens, ws, h0s) as (4, B) int32;
    the 6 result vectors return as ONE (6, B) matrix.  Through the axon
    tunnel each array transfer costs a fixed ~35 ms round trip, so the
    2-upload/1-fetch shape is what makes a steady-state dispatch cheap."""
    from .packing import unbundle_seqs

    qs, ts = unbundle_seqs(u8, qmax, tmax)
    out = extend_batch_pallas(
        qs, ts, meta[0], meta[1], meta[2], meta[3],
        qmax=qmax, tmax=tmax, a=a, b=b, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, zdrop=zdrop, b_tile=b_tile,
        interpret=interpret, wide_state=wide_state,
    )
    return jnp.stack(out, axis=0)
