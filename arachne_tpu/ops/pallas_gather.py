"""Experimental Pallas occ4 rank kernel with per-query DMA gathers.

ARCHITECTURE.md's device-seeding analysis (round 4) pinned the occ4
ceiling at ~15.5M queries/s and attributed it to XLA's gather lowering
for random row access — not loop latency (14.3M dependent q/s at 4k
lanes) and not HBM bandwidth (~1% used).  The one untested lever was a
Pallas kernel that issues its own DMA per query instead of going through
XLA's gather: this module is that kernel, written for the round-5
microbenchmark that settles the question with a measurement
(scripts/seeding_microbench.py).

Mosaic constraint discovered on the way: a dynamically-indexed HBM row
DMA requires the row to be a whole lane tile (128 x int32 = 512 B;
8- or 16-int rows fail to compile).  So the DMA unit here is one padded
512 B row per 128-base occ block — words (8 x u32) + occ (4 x i32) +
112 ints of padding, a 10.7x blowup of the rank tables.  That is fine
for measuring the mechanism's throughput ceiling (the question), but it
means productionizing would need sub-block packing (several blocks per
row + an in-VMEM masked select), only worth designing if the measured
ceiling clears the host+XLA paths decisively.

Semantics: interior-row occ4 (bwt.c:98-220); the caller precomputes the
primary-adjusted row and handles -1/seq_len edges, like ops/fm_rank.py.
Narrow (int32) tables only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 512    # queries per grid step (one DMA wave)
ROW = 128      # ints per block row (one int32 lane tile)


def _popcount_u32(v):
    """SWAR popcount on uint32 (Mosaic-safe; no population_count op)."""
    v = v - ((v >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    v = (v + (v >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return (v * jnp.uint32(0x01010101)) >> jnp.uint32(24)


def _rank_kernel(kk_smem, kk_vec, table_hbm, out_ref, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    def dma(j):
        blk = kk_smem[i * CHUNK + j] >> 7
        # semaphores round-robin over 16 slots: sflag space is ~2 KB, so
        # one per query does not fit; every copy is the same 512 B, so a
        # shared semaphore's counter decrements correctly per wait
        return pltpu.make_async_copy(
            table_hbm.at[blk], scratch.at[j], sem.at[j & 15]
        )

    def start(j, _):
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, CHUNK, start, 0)

    def wait(j, _):
        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, CHUNK, wait, 0)

    # vectorized occ4 over the landed rows (same math as ops/fm_rank.py)
    kk = kk_vec[0, 0, :]                             # (CHUNK,) int32
    j_off = kk & 127
    wi = (j_off >> 4)[:, None]                       # (CHUNK, 1)
    p = (j_off & 15)[:, None]
    widx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 8), 1)
    nvalid = jnp.where(widx < wi, 16, jnp.where(widx == wi, p + 1, 0))
    # min in int32: Mosaic has no unsigned-min (arith.minui) legalization
    shift = jnp.minimum((16 - nvalid) * 2, 31).astype(jnp.uint32)
    mask = jnp.where(
        nvalid == 0,
        jnp.uint32(0),
        ~((jnp.uint32(1) << shift) - jnp.uint32(1)),
    )
    mask = jnp.where(nvalid == 16, jnp.uint32(0xFFFFFFFF), mask)
    words = pltpu.bitcast(scratch[:, 0:8], jnp.uint32)
    base = scratch[:, 8:12]                          # (CHUNK, 4) int32
    y = words & mask
    ny = ~y
    invalid = (16 - nvalid).sum(axis=-1, dtype=jnp.int32)
    cnts = []
    for c in range(4):
        sel_hi = y if (c & 2) else ny
        sel_lo = y if (c & 1) else ny
        t = (sel_hi >> jnp.uint32(1)) & sel_lo & jnp.uint32(0x55555555)
        cnt = _popcount_u32(t).astype(jnp.int32).sum(axis=-1, dtype=jnp.int32)
        if c == 0:
            cnt = cnt - invalid
        cnts.append(cnt)
    out_ref[:] = base + jnp.stack(cnts, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_queries",))
def _rank_call(kk, table, n_queries: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_queries // CHUNK,),
        in_specs=[
            # (grid, 1, CHUNK) 3-D: a 1-D (CHUNK,) block trips the
            # T(1024) int32 tiling rule and a (1, CHUNK) block fails the
            # sublane-divisibility rule; with the middle dim 1 the block's
            # last-two dims (1, CHUNK) equal/divide the array's
            pl.BlockSpec((1, 1, CHUNK), lambda i, *_: (i, 0, 0)),
            # table stays in HBM; rows are DMA'd per query
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((CHUNK, 4), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, ROW), jnp.int32),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        _rank_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_queries, 4), jnp.int32),
    )(kk, kk.reshape(n_queries // CHUNK, 1, CHUNK), table)


class PallasRankTable:
    """Padded (n_blocks, 128)-int32 DMA table + query entry point."""

    def __init__(self, fm):
        # occ carries one extra checkpoint row past the final block
        # (occ_checkpoints); interior queries only touch word-backed blocks
        n_blocks = fm.words.shape[0] // 8
        words = np.asarray(fm.words).view(np.int32).reshape(n_blocks, 8)
        tab = np.zeros((n_blocks, ROW), np.int32)
        tab[:, 0:8] = words
        tab[:, 8:12] = np.asarray(fm.occ, np.int32)[:n_blocks]
        self.table = jnp.asarray(tab)
        self.primary = fm.primary
        self.seq_len = fm.seq_len

    def occ4(self, k: jnp.ndarray) -> jnp.ndarray:
        """occ4 for interior rows; pads the batch to a CHUNK multiple."""
        n = int(k.shape[0])
        n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
        kk = jnp.clip(
            k.astype(jnp.int32) - (k >= self.primary).astype(jnp.int32),
            0,
            self.seq_len - 1,
        )
        if n_pad != n:
            kk = jnp.concatenate([kk, jnp.zeros(n_pad - n, jnp.int32)])
        # the scalar-prefetch operand lives in SMEM (~1 MB): cap one
        # pallas_call at 128k queries (512 KB) and chain above that
        cap = 1 << 17
        if n_pad <= cap:
            return _rank_call(kk, self.table, n_pad)[:n]
        outs = [
            _rank_call(kk[s0 : s0 + cap], self.table, cap)
            for s0 in range(0, n_pad, cap)
        ]
        return jnp.concatenate(outs)[:n]
