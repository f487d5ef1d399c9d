"""Pallas TPU kernel for batched local Smith-Waterman (mate rescue).

VMEM-resident twin of ops.sw_local.local_sw_batch_kernel (the batched
reformulation of ksw_u8/ksw_i16, ksw.c:111-335): the H/E/Hmax state lives
in VMEM for the whole target-row loop; per-row maxima stream to a
(tmax, B) output for the host-side second-best reconstruction.  Same
layout as pallas_extend: problems on lanes, query positions on sublanes,
prefix max via log-depth pad-shift doubling.

Outputs are bit-identical to local_sw_batch_kernel's 4-tuple
(gmax, te, qe, row_max); tests/test_pallas.py enforces parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_extend import _prefix_max, _shift_down


def _local_kernel(
    qsT_ref,      # (qmax, B_TILE) int32
    tsT_ref,      # (tmax, B_TILE) int32
    params_ref,   # (4, B_TILE) int32: qlens, tlens, endscs, 0
    out_ref,      # (8, B_TILE) int32: gmax, te, qe, 0...
    rowmax_ref,   # (tmax, B_TILE) int32
    *,
    qmax: int,
    tmax: int,
    a: int,
    b: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
):
    B = qsT_ref.shape[1]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    qsT = qsT_ref[:]
    qlens = params_ref[0:1, :]
    tlens = params_ref[1:2, :]
    endscs = params_ref[2:3, :]

    jidx = jax.lax.broadcasted_iota(jnp.int32, (qmax, B), 0)
    valid_q = jidx < qlens
    q_is_n = qsT == 4

    zero1 = jnp.zeros((1, B), jnp.int32)
    # rows the dynamic loop below never reaches must still read as zero in
    # the row-max stream (the host second-best scan walks [0, tlen))
    rowmax_ref[:] = jnp.zeros((tmax, B), jnp.int32)
    carry = (
        jnp.zeros((qmax, B), jnp.int32),   # H
        jnp.zeros((qmax, B), jnp.int32),   # E
        jnp.zeros((qmax, B), jnp.int32),   # Hmax
        zero1,                             # gmax
        zero1 - 1,                         # te
        (tlens > 0).astype(jnp.int32),     # alive (int: i1 carries fail)
    )

    def body(i, st):
        H0, E0, Hmax, gmax, te, alive = st
        ii = jnp.int32(i)
        row_live = (alive != 0) & (ii < tlens)
        tcode = jnp.where(ii < tlens, tsT_ref[i, :][None, :], 4)
        q_row = jnp.where(
            q_is_n | (tcode == 4),
            jnp.int32(-1),
            jnp.where(qsT == tcode, jnp.int32(a), jnp.int32(-b)),
        )
        Hdiag = jnp.concatenate([jnp.zeros((1, B), jnp.int32), H0[:-1]], axis=0)
        Hpre = jnp.maximum(jnp.maximum(Hdiag + q_row, 0), E0)
        Hpre = jnp.where(valid_q, Hpre, 0)
        # F scan: F(0)=0; F(j)=max(0, F(j-1)-e_ins, Hpre(j-1)-oe_ins)
        v = (Hpre - oe_ins) + jidx * e_ins
        run = _prefix_max(v)
        run_prev = _shift_down(run, 1, -(1 << 30))
        F = jnp.where(
            jidx >= 1, jnp.maximum(run_prev - (jidx - 1) * e_ins, 0), 0
        )
        H = jnp.maximum(Hpre, F)
        H = jnp.where(valid_q, H, 0)
        Enew = jnp.maximum(jnp.maximum(E0 - e_del, H - oe_del), 0)
        Enew = jnp.where(valid_q, Enew, 0)
        imax = jnp.max(H, axis=0, keepdims=True)               # (1, B)
        improved = imax > gmax
        upd = row_live & improved
        gmax = jnp.where(upd, imax, gmax)
        te = jnp.where(upd, ii, te)
        upd_q = jnp.broadcast_to(upd, (qmax, B))
        Hmax = jnp.where(upd_q, H, Hmax)
        # early stop AFTER recording this row (ksw.c:205)
        die = upd & (gmax >= endscs)
        rowmax_ref[pl.ds(i, 1), :] = jnp.where(row_live, imax, 0)
        keep = jnp.broadcast_to(row_live, (qmax, B))
        return (
            jnp.where(keep, H, H0),
            jnp.where(keep, Enew, E0),
            Hmax,
            gmax,
            te,
            ((alive != 0) & ~die).astype(jnp.int32),
        )

    # dynamic trip count (see pallas_extend): stop once no lane is both
    # alive (endsc early-stop) and inside its target
    def cond(ist):
        i, st = ist
        work_left = jnp.max(jnp.where(st[5] != 0, tlens, 0))
        return (i < jnp.int32(tmax)) & (i < work_left)

    def wbody(ist):
        i, st = ist
        return i + 1, body(i, st)

    _, st = jax.lax.while_loop(cond, wbody, (jnp.int32(0), carry))
    H0, E0, Hmax, gmax, te, alive = st
    # qe: smallest query index achieving the Hmax row's max
    col_max = jnp.max(Hmax, axis=0, keepdims=True)
    big = jnp.int32(1 << 30)
    qe = jnp.min(jnp.where(Hmax == col_max, jidx, big), axis=0, keepdims=True)
    qe = jnp.where(col_max > 0, qe, -1)
    out_ref[0:1, :] = gmax
    out_ref[1:2, :] = te
    out_ref[2:3, :] = qe
    zero = jnp.zeros((1, B), jnp.int32)
    for r in range(3, 8):
        out_ref[r : r + 1, :] = zero


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "b_tile", "interpret",
    ),
)
def local_sw_batch_pallas(
    qs: jnp.ndarray,      # (B, qmax) int8
    ts: jnp.ndarray,      # (B, tmax) int8
    qlens: jnp.ndarray,   # (B,)
    tlens: jnp.ndarray,   # (B,)
    endscs: jnp.ndarray,  # (B,) early-stop score (0x10000 = never)
    *,
    qmax: int,
    tmax: int,
    a: int,
    b: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    b_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Drop-in pallas twin of local_sw_batch_kernel (same 4-tuple)."""
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
            endscs.astype(jnp.int32),
            jnp.zeros_like(qlens, jnp.int32),
        ],
        axis=0,
    )
    kernel = functools.partial(
        _local_kernel,
        qmax=qmax, tmax=tmax, a=a, b=b,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
    )
    grid = (B // b_tile,)
    out, rowmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qmax, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((tmax, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((tmax, b_tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, B), jnp.int32),
            jax.ShapeDtypeStruct((tmax, B), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * qmax * tmax * B,
            bytes_accessed=(qmax + 2 * tmax + 12) * B * 4,
            transcendentals=0,
        ),
    )(qsT, tsT, params)
    return (out[0], out[1], out[2], rowmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "b_tile", "interpret",
    ),
)
def local_sw_batch_pallas_packed(
    qs_p, qs_n, ts_p, ts_n, qlens, tlens, endscs,
    *, qmax, tmax, a, b, o_del, e_del, o_ins, e_ins,
    b_tile=256, interpret=False,
):
    """local_sw_batch_pallas fed 2-bit packed uploads (ops/packing.py)."""
    from .packing import unpack_codes

    qs = unpack_codes(qs_p, qs_n, qmax)
    ts = unpack_codes(ts_p, ts_n, tmax)
    return local_sw_batch_pallas(
        qs, ts, qlens, tlens, endscs,
        qmax=qmax, tmax=tmax, a=a, b=b, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, b_tile=b_tile, interpret=interpret,
    )
