"""Pallas TPU kernel for batched banded global alignment (CIGAR DP).

VMEM-resident twin of ops.sw_global.global_batch_kernel (the batched
ksw_global2, ksw.c:504-607).  The H/E state lives in VMEM scratch and
persists across a sequential (batch-tile, target-chunk) grid; direction
bits stream out one T_CHUNK-row block at a time as a flattened
(tmax*qmax, B) uint8 output, so VMEM never holds more than one chunk of
the direction tensor while HBM receives exactly one copy of it.

Two variants share one kernel body:
  * score-only (the common case thanks to BatchGlobal's all-M shortcut):
    no direction output at all;
  * full traceback: direction bytes with the reference's layout (bits 0-1
    H-source 0=M/1=E/2=F, bit 2 E-continuation, bit 5 F-continuation).

Bit-identical to global_batch_kernel (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.ksw import MINUS_INF
from .pallas_extend import _prefix_max, _shift_down

# fill for masked maxima: strictly below any reachable DP value (which
# drift at most ~tmax*e below MINUS_INF) but far from int32 overflow
FILL = -0x7E000000


def _global_kernel_body(
    qsT_ref, tsT_ref, params_ref, score_ref, z_ref, H_s, E_s,
    *, qmax, t_chunk, a, b, o_del, e_del, o_ins, e_ins, want_z,
):
    B = qsT_ref.shape[1]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    NEG = jnp.int32(MINUS_INF)
    gt = pl.program_id(1)
    qsT = qsT_ref[:]
    qlens = params_ref[0:1, :]
    tlens = params_ref[1:2, :]
    ws = params_ref[2:3, :]

    jidx = jax.lax.broadcasted_iota(jnp.int32, (qmax, B), 0)
    valid_q = jidx < qlens
    q_is_n = qsT == 4

    @pl.when(gt == 0)
    def _init():
        # first row: H(-1, j) = -(o_ins + e_ins*(j+1)) within the band
        H_s[:] = jnp.where(
            (jidx + 1 <= ws) & valid_q, -(o_ins + e_ins * (jidx + 1)), NEG
        )
        E_s[:] = jnp.full((qmax, B), NEG, jnp.int32)
        score_ref[:] = jnp.full(score_ref.shape, MINUS_INF, jnp.int32)

    def body(local_i, _):
        ii = gt * t_chunk + local_i
        H0 = H_s[:]
        E = E_s[:]
        row_live = ii < tlens                                   # (1, B)
        tcode = jnp.where(row_live, tsT_ref[local_i, :][None, :], 4)
        q_row = jnp.where(
            q_is_n | (tcode == 4),
            jnp.int32(-1),
            jnp.where(qsT == tcode, jnp.int32(a), jnp.int32(-b)),
        )
        in_band = (jidx >= ii - ws) & (jidx < ii + ws + 1) & valid_q
        bound_prev = jnp.where(
            ii == 0,
            0,
            jnp.where((ii - 1) <= ws, -(o_del + e_del * ii), NEG),
        )
        Hdiag = jnp.concatenate([bound_prev, H0[:-1]], axis=0)
        M = Hdiag + q_row
        # F scan with -inf init: F(j) = max_k<j (M(k) - oe_ins - (j-1-k)e_ins)
        v = (M - oe_ins) + jidx * e_ins
        run = _prefix_max(jnp.where(in_band, v, NEG))
        run_prev = _shift_down(run, 1, FILL)
        F = jnp.where(jidx >= 1, run_prev - (jidx - 1) * e_ins, NEG)
        d = jnp.where(M >= E, 0, 1)
        H = jnp.maximum(M, E)
        d = jnp.where(H >= F, d, 2)
        H = jnp.maximum(H, F)
        d = d | jnp.where((E - e_del) > (M - oe_del), 4, 0)
        d = d | jnp.where((F - e_ins) > (M - oe_ins), 32, 0)
        Enew = jnp.maximum(E - e_del, M - oe_del)
        H = jnp.where(in_band, H, NEG)
        Enew = jnp.where(in_band, Enew, NEG)
        if want_z:
            dm = jnp.where(in_band & row_live, d, 0).astype(jnp.uint8)
            z_ref[pl.ds(pl.multiple_of(local_i * qmax, qmax), qmax), :] = dm
        # score: H at (tlen-1, qlen-1); exactly one j matches the mask
        h_last = jnp.max(
            jnp.where(jidx == qlens - 1, H, FILL), axis=0, keepdims=True
        )
        sc = jnp.where(ii == tlens - 1, h_last, score_ref[0:1, :])
        score_ref[0:1, :] = sc
        keep = jnp.broadcast_to(row_live, (qmax, B))
        H_s[:] = jnp.where(keep, H, H0)
        E_s[:] = jnp.where(keep, Enew, E)
        return 0

    # chunk-level skip: when this whole target chunk lies beyond every
    # lane's target (tiles are tlen-sorted by the caller), there is no DP
    # to run — only the z rows must still read as zero
    tile_hi = jnp.max(tlens)
    past_all = gt * t_chunk >= tile_hi

    @pl.when(past_all)
    def _skip():
        if want_z:
            z_ref[:] = jnp.zeros(z_ref.shape, jnp.uint8)

    @pl.when(jnp.logical_not(past_all))
    def _run():
        jax.lax.fori_loop(0, t_chunk, body, 0)


def _score_kernel(qsT_ref, tsT_ref, params_ref, score_ref, H_s, E_s, **kw):
    _global_kernel_body(
        qsT_ref, tsT_ref, params_ref, score_ref, None, H_s, E_s,
        want_z=False, **kw,
    )


def _z_kernel(qsT_ref, tsT_ref, params_ref, score_ref, z_ref, H_s, E_s, **kw):
    _global_kernel_body(
        qsT_ref, tsT_ref, params_ref, score_ref, z_ref, H_s, E_s,
        want_z=True, **kw,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "want_z", "b_tile", "t_chunk", "interpret",
    ),
)
def global_batch_pallas(
    qs: jnp.ndarray,     # (B, qmax) int8
    ts: jnp.ndarray,     # (B, tmax) int8
    qlens: jnp.ndarray,  # (B,)
    tlens: jnp.ndarray,  # (B,)
    ws: jnp.ndarray,     # (B,) band width
    *,
    qmax: int,
    tmax: int,
    a: int,
    b: int,
    o_del: int,
    e_del: int,
    o_ins: int,
    e_ins: int,
    want_z: bool = True,
    b_tile: int = 256,
    t_chunk: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pallas twin of global_batch_kernel.

    Returns (score (B,), z) where z is (tmax, qmax, B) uint8 when want_z
    else None."""
    B = qs.shape[0]
    b_tile = min(b_tile, B)
    if B % b_tile:
        raise ValueError(f"batch {B} not a multiple of tile {b_tile}")
    while tmax % t_chunk:
        t_chunk >>= 1
    qsT = qs.T.astype(jnp.int32)
    tsT = ts.T.astype(jnp.int32)
    params = jnp.stack(
        [
            qlens.astype(jnp.int32),
            tlens.astype(jnp.int32),
            ws.astype(jnp.int32),
            jnp.zeros_like(qlens, jnp.int32),
        ],
        axis=0,
    )
    n_t = tmax // t_chunk
    grid = (B // b_tile, n_t)
    kw = dict(
        qmax=qmax, t_chunk=t_chunk, a=a, b=b,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
    )
    in_specs = [
        pl.BlockSpec((qmax, b_tile), lambda gb, gt: (0, gb), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, b_tile), lambda gb, gt: (gt, gb), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, b_tile), lambda gb, gt: (0, gb), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((qmax, b_tile), jnp.int32),
        pltpu.VMEM((qmax, b_tile), jnp.int32),
    ]
    score_spec = pl.BlockSpec(
        (8, b_tile), lambda gb, gt: (0, gb), memory_space=pltpu.VMEM
    )
    if want_z:
        out = pl.pallas_call(
            functools.partial(_z_kernel, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                score_spec,
                pl.BlockSpec(
                    (t_chunk * qmax, b_tile),
                    lambda gb, gt: (gt, gb),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((8, B), jnp.int32),
                jax.ShapeDtypeStruct((tmax * qmax, B), jnp.uint8),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(qsT, tsT, params)
        score, zflat = out
        z = zflat.reshape(tmax, qmax, B)
        return score[0], z
    out = pl.pallas_call(
        functools.partial(_score_kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=score_spec,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qsT, tsT, params)
    return out[0], None


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "want_z", "b_tile", "t_chunk", "interpret",
    ),
)
def global_batch_pallas_packed(
    qs_p, qs_n, ts_p, ts_n, qlens, tlens, ws,
    *, qmax, tmax, a, b, o_del, e_del, o_ins, e_ins,
    want_z=True, b_tile=256, t_chunk=8, interpret=False,
):
    """global_batch_pallas fed 2-bit packed uploads (ops/packing.py)."""
    from .packing import unpack_codes

    qs = unpack_codes(qs_p, qs_n, qmax)
    ts = unpack_codes(ts_p, ts_n, tmax)
    return global_batch_pallas(
        qs, ts, qlens, tlens, ws,
        qmax=qmax, tmax=tmax, a=a, b=b, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, want_z=want_z, b_tile=b_tile,
        t_chunk=t_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmax", "tmax", "a", "b", "o_del", "e_del", "o_ins", "e_ins",
        "want_z", "b_tile", "t_chunk", "interpret", "pack_z",
    ),
)
def global_batch_pallas_bundled(
    u8, meta,
    *, qmax, tmax, a, b, o_del, e_del, o_ins, e_ins,
    want_z=True, b_tile=256, t_chunk=8, interpret=False, pack_z=False,
):
    """Single-buffer transfer variant (see pallas_extend
    extend_batch_pallas_bundled): u8 = bundle_seqs(qs, ts), meta stacks
    (qlens, tlens, ws) as (3, B) int32.

    ``pack_z``: repack the direction tensor on device to 4 bits/cell —
    bits (0,1,2,5) of the reference layout become nibble bits (0,1,2,3),
    adjacent qmax columns share a byte — so the traceback fetch ships
    (tmax, qmax/2, B) instead of (tmax, qmax, B); sw_global unpacks on
    the host.  The z fetch is the dominant tunnel transfer of the CIGAR
    stage."""
    from .packing import unbundle_seqs

    qs, ts = unbundle_seqs(u8, qmax, tmax)
    score, z = global_batch_pallas(
        qs, ts, meta[0], meta[1], meta[2],
        qmax=qmax, tmax=tmax, a=a, b=b, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, want_z=want_z, b_tile=b_tile,
        t_chunk=t_chunk, interpret=interpret,
    )
    if want_z and pack_z:
        z4 = (z & 7) | (((z >> 5) & 1) << 3)        # 4 live bits
        z = z4[:, 0::2, :] | (z4[:, 1::2, :] << 4)  # 2 columns/byte
    return score, z


def unpack_z(zp: "np.ndarray", qmax: int) -> "np.ndarray":
    """Host-side inverse of pack_z: (tmax, qmax/2, B) -> (tmax, qmax, B)
    with the reference's bit layout (0-1 H-source, 2 E-cont, 5 F-cont)."""
    lo = zp & 0xF
    hi = (zp >> 4) & 0xF
    out = np.empty((zp.shape[0], zp.shape[1] * 2, zp.shape[2]), np.uint8)
    out[:, 0::2, :] = (lo & 7) | ((lo >> 3) << 5)
    out[:, 1::2, :] = (hi & 7) | ((hi >> 3) << 5)
    return out[:, :qmax, :]
