"""Device-resident FM-index rank queries (occ4 / bwt_extend) in JAX.

The planar index layout (index/build.py) uploads directly: ``occ``
(int32 [n_blocks, 4] checkpoints every 128 bases) and ``bwt_words``
(uint32, 16 bases/word MSB-first).  A rank query is a gather of one
checkpoint row + 8 words, lane-sliced popcounts, and the standard
bit-trick character match (bwt.c:98-105 __occ_aux) — all VPU work.

Row coordinates and checkpoint counters are int32 for genomes under 2^31
rows (fwd+rev) and int64 above (the "wide" mode: GRCh38 fwd+rev is ~6.2G
rows).  Wide mode needs jax x64 enabled (ops.engine does this when it
loads a big index); everything downstream keys off the occ table's dtype,
so the same jitted programs serve both widths as separate specializations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex


@dataclass(frozen=True)
class DeviceFMIndex:
    """FM-index tables living in device HBM.

    With ``axis`` set, ``occ``/``words`` are the LOCAL block rows of a
    table sharded across that mesh axis (``rows`` rows starting at global
    block row ``row_lo``); rank queries answer locally-owned blocks and
    psum over the axis — the large-genome lookup-as-collective mode
    (SURVEY.md 5).  primary/seq_len stay GLOBAL either way."""

    occ: jnp.ndarray        # int32 (n_blocks, 4) — global or local shard
    words: jnp.ndarray      # uint32 (n_blocks * 8,)
    L2: jnp.ndarray         # int32 (5,)
    primary: int
    seq_len: int
    l_pac: int
    row_lo: object = None   # traced scalar: first local occ-block row
    rows: int = 0           # local rows (static)
    axis: object = None     # mesh axis name for the psum

    @property
    def idt(self):
        """Row-coordinate dtype: int64 iff the tables are wide."""
        return jnp.int64 if self.occ.dtype == jnp.int64 else jnp.int32

    @staticmethod
    def from_host(idx: FMIndex, wide: bool = None) -> "DeviceFMIndex":
        if wide is None:
            wide = idx.seq_len >= (1 << 31)
        if wide:
            import jax as _jax

            if not _jax.config.jax_enable_x64:
                # int64 device arrays cannot exist without this flag, so
                # wide tables force it process-wide.  Every compute kernel
                # in ops/ pins explicit dtypes (int32/uint32/int8), so
                # narrow-path outputs are unaffected — asserted by
                # tests/test_fm_seed.py::test_narrow_kernels_unchanged_under_x64.
                # Log loudly because weakly-typed jnp ops elsewhere WOULD
                # change default dtype under this flag.
                print(
                    "[arachne] wide FM-index (seq_len >= 2^31): enabling "
                    "jax_enable_x64 process-wide",
                    flush=True,
                )
                _jax.config.update("jax_enable_x64", True)
        it = np.int64 if wide else np.int32
        return DeviceFMIndex(
            occ=jnp.asarray(idx.fm.occ.astype(it)),
            words=jnp.asarray(idx.fm.bwt_words),
            L2=jnp.asarray(idx.fm.L2.astype(it)),
            primary=int(idx.primary),
            seq_len=int(idx.seq_len),
            l_pac=int(idx.l_pac),
        )


_LANE = 0x55555555  # cast at use site; module-level jnp constants initialize the backend at import


def occ4_device(fm: DeviceFMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """Occ(k, c) for all four chars; k int32 (...,); returns (..., 4).

    Handles the reference's row conventions: k == -1 -> 0,
    k == seq_len -> L2[c+1]-L2[c] (bwt.c:169-186)."""
    idt = fm.idt
    k = k.astype(idt)
    at_end = k == fm.seq_len
    neg = k == -1
    kk = jnp.clip(k - (k >= fm.primary).astype(idt), 0, fm.seq_len - 1)
    block = kk >> 7
    widx = jnp.arange(8, dtype=jnp.int32)
    if fm.axis is not None:
        # sharded tables: answer locally-owned blocks, psum merges below.
        # Edge rows (-1 / seq_len) are fixed up after the psum, so the
        # garbage a non-owner computes for them is harmless.
        lb = block - fm.row_lo
        mine = (lb >= 0) & (lb < fm.rows)
        lbc = jnp.clip(lb, 0, fm.rows - 1)
        base = fm.occ[lbc]
        gather = lbc[..., None] * 8 + widx
        words = fm.words[gather]
    else:
        mine = None
        base = fm.occ[block]                                 # (..., 4)
        gather = block[..., None] * 8 + widx                 # (..., 8)
        words = fm.words[gather]                             # (..., 8) uint32
    j = kk & 127
    wi = (j >> 4)[..., None]
    p = (j & 15)[..., None]
    nvalid = jnp.where(widx < wi, 16, jnp.where(widx == wi, p + 1, 0))
    shift = ((16 - nvalid) * 2).astype(jnp.uint32)
    mask = jnp.where(
        nvalid == 0,
        jnp.uint32(0),
        (~((jnp.uint32(1) << jnp.minimum(shift, 31)) - jnp.uint32(1))),
    )
    mask = jnp.where(nvalid == 16, jnp.uint32(0xFFFFFFFF), mask)
    y = words & mask
    ny = ~y
    cnts = []
    for c in range(4):
        sel_hi = y if (c & 2) else ny
        sel_lo = y if (c & 1) else ny
        t = (sel_hi >> jnp.uint32(1)) & sel_lo & jnp.uint32(_LANE)
        # explicit accumulator dtype: jnp.sum promotes int32 -> int64 when
        # jax_enable_x64 is on (wide-index processes), which would silently
        # widen the narrow path's compiled kernels
        cnt = jax.lax.population_count(t).astype(idt).sum(axis=-1, dtype=idt)
        if c == 0:
            cnt = cnt - (16 - nvalid).sum(axis=-1, dtype=idt)
        cnts.append(cnt)
    res = base + jnp.stack(cnts, axis=-1)
    if fm.axis is not None:
        res = jax.lax.psum(jnp.where(mine[..., None], res, 0), fm.axis)
    res = jnp.where(neg[..., None], 0, res)
    end_vals = (fm.L2[1:5] - fm.L2[0:4]).astype(idt)
    res = jnp.where(at_end[..., None], end_vals, res)
    return res


def extend_device(
    fm: DeviceFMIndex,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    is_back: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """bwt_extend (bwt.c:262-275) on device; shapes (...,) -> (..., 4)."""
    xb = x0 if is_back else x1
    tk = occ4_device(fm, xb - 1)
    tl = occ4_device(fm, xb - 1 + x2)
    ok_b = fm.L2[:4] + 1 + tk
    ok_s = tl - tk
    hit_primary = ((xb <= fm.primary) & (xb + x2 - 1 >= fm.primary)).astype(fm.idt)
    o3 = (x1 if is_back else x0) + hit_primary
    o2 = o3 + ok_s[..., 3]
    o1 = o2 + ok_s[..., 2]
    o0 = o1 + ok_s[..., 1]
    ok_o = jnp.stack([o0, o1, o2, o3], axis=-1)
    if is_back:
        return ok_b, ok_o, ok_s
    return ok_o, ok_b, ok_s
