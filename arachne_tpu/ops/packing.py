"""2-bit sequence packing for host->device uploads.

Through the axon tunnel the per-chunk upload of code arrays dominates the
steady-state cost of a device batch (measured ~0.55 s of a ~0.6 s chunk
for the extension kernel's 3 MB of int8 codes).  DNA codes are 0..4, so a
chunk ships as 2-bit packed bases (4 codes/byte) plus an N bitmask
(1 bit/base) — 0.375 B/base instead of 1 — and is unpacked on device by a
few fused VPU shifts in the jit prologue before the pallas call.

Host packing is vectorized numpy; device unpacking is jnp (XLA fuses it
with the kernel's input processing).  Lengths must be multiples of 8
(the dispatchers pad shapes to 64-multiples).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pack_codes(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, L) codes 0..4 -> ((B, L//4) 2-bit packed, (B, L//8) N bitmask)."""
    B, L = arr.shape
    bits = (arr.astype(np.uint8) & 3).reshape(B, L // 4, 4)
    packed = (
        bits[:, :, 0]
        | (bits[:, :, 1] << 2)
        | (bits[:, :, 2] << 4)
        | (bits[:, :, 3] << 6)
    )
    nmask = np.packbits(arr >= 4, axis=1, bitorder="little")
    return packed, nmask


def unpack_codes(packed: jnp.ndarray, nmask: jnp.ndarray, L: int) -> jnp.ndarray:
    """Device-side inverse of pack_codes -> (B, L) int8 codes 0..4."""
    B = packed.shape[0]
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 2)[None, None, :]
    codes = (
        (packed.astype(jnp.uint32)[:, :, None] >> shifts) & 3
    ).reshape(B, L)
    nbits = (
        (nmask.astype(jnp.uint32)[:, :, None]
         >> jnp.arange(8, dtype=jnp.uint32)[None, None, :]) & 1
    ).reshape(B, L)
    return jnp.where(nbits != 0, 4, codes).astype(jnp.int8)


def bundle_seqs(qs: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Pack a (query, target) code pair into ONE uint8 upload buffer.

    Through the axon tunnel each host->device array transfer costs a
    ~35 ms round trip REGARDLESS of size (measured), so a dispatch's cost
    is dominated by its transfer count: bundling the four packed arrays
    of a problem batch into one buffer (and the int32 scalars into one
    (k, B) matrix at the call site) cuts a kernel dispatch from ~8
    uploads + ~6 fetches to 2 uploads + 1 fetch."""
    qs_p, qs_n = pack_codes(qs)
    ts_p, ts_n = pack_codes(ts)
    return np.concatenate([qs_p, qs_n, ts_p, ts_n], axis=1)


def unbundle_seqs(u8: jnp.ndarray, qmax: int, tmax: int):
    """Device-side inverse of bundle_seqs -> ((B, qmax), (B, tmax)) codes."""
    qp, qn, tp = qmax // 4, qmax // 8, tmax // 4
    qs = unpack_codes(u8[:, :qp], u8[:, qp : qp + qn], qmax)
    ts = unpack_codes(
        u8[:, qp + qn : qp + qn + tp], u8[:, qp + qn + tp :], tmax
    )
    return qs, ts
