"""Native (C++) SMEM seeding driver.

Wraps native/smem.cpp's `smem_collect_batch`: the full three-pass seed
collection (mem_collect_intv semantics) runs in C++ over the planar
occ/bwt_words arrays, releasing the GIL for the whole batch — the dense
numpy engine (smem_dense.py) spends most of its time in per-read Python
loops that serialize the CLI's superbatch thread pool.

Exact output vs the scalar collector (tests/test_fm_seed.py); reads whose
seed count exceeds MAXS fall back to the scalar path (rare: MAXS=256 vs
the typical handful of SMEMs per short read).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from ..config import MemOptions
from ..index.fmindex import FMIndex
from ..native import get_lib, native_threads, smem_available
from .smem import SMEM, collect_seeds


def collect_seeds_native(
    idx: FMIndex,
    reads: List[np.ndarray],
    opt: MemOptions,
    MAXS: int = 256,
    n_threads: Optional[int] = None,
) -> List[List[SMEM]]:
    """Three-pass seed collection in native code; exact scalar output."""
    lib = get_lib()
    if n_threads is None:
        n_threads = native_threads()
    n = len(reads)
    if n == 0:
        return []
    L = max(1, max(len(r) for r in reads))
    qs = np.full((n, L), 4, np.uint8)
    qlens = np.zeros(n, np.int32)
    for i, r in enumerate(reads):
        qs[i, : len(r)] = r
        qlens[i] = len(r)
    words = np.ascontiguousarray(idx.fm.bwt_words, dtype=np.uint32)
    occ = np.ascontiguousarray(idx.fm.occ, dtype=np.int64)
    L2 = np.ascontiguousarray(idx.L2, dtype=np.int64)
    out = np.zeros((n, MAXS, 5), np.int64)
    out_n = np.zeros(n, np.int32)
    overflow = np.zeros(n, np.uint8)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    rc = lib.smem_collect_batch(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(len(words)),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        L2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(int(idx.primary)),
        ctypes.c_int64(int(idx.seq_len)),
        qs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        qlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(n),
        ctypes.c_int32(L),
        ctypes.c_int32(opt.min_seed_len),
        ctypes.c_int32(split_len),
        ctypes.c_int32(opt.split_width),
        ctypes.c_int64(opt.max_mem_intv),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(MAXS),
        ctypes.c_int32(n_threads),
    )
    if rc != 0:
        raise RuntimeError(f"smem_collect_batch failed: {rc}")
    result: List[List[SMEM]] = []
    for r in range(n):
        if overflow[r]:
            result.append(collect_seeds(idx, reads[r], opt))
            continue
        rows = out[r, : int(out_n[r])]
        result.append(
            [
                SMEM(k=int(k), l=int(l), s=int(s), qb=int(qb), qe=int(qe))
                for k, l, s, qb, qe in rows
            ]
        )
    return result


__all__ = ["collect_seeds_native", "smem_available"]
