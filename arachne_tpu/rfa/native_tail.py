"""ctypes glue for the native RFA finish tail (native/rfa_tail.cpp).

Marshals one barcode's alignment lists into flat arrays, runs the C++
tagBestAlignments -> molecules -> optimize -> estimateMapQualities tail,
and writes the results back onto the Alignment objects — the pure-Python
tail (molecules.py/optimizer.py/mapq.py) stays as the reference
implementation and the fallback.  Disable with ARACHNE_NATIVE_RFA=0.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from ..config import ArachneConfig
from .types import Alignment, MapQData, Region

_i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
_i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
_f64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
_u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
_u64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def native_rfa_enabled() -> bool:
    if os.environ.get("ARACHNE_NATIVE_RFA", "") == "0":
        return False
    from ..native import get_lib

    lib = get_lib()
    return lib is not None and hasattr(lib, "rfa_tail")


def run_native_tail(
    alignments: List[List[Alignment]],
    run_rfa: bool,
    cfg: ArachneConfig,
    centromeres: Dict[str, Region],
) -> Optional[int]:
    """Returns n_molecules, or None when the native library is unusable
    (caller falls back to the Python tail)."""
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "rfa_tail"):
        return None

    R = len(alignments)
    A = sum(len(arr) for arr in alignments)
    flat: List[Alignment] = []
    aln_off = np.zeros(R + 1, np.int64)
    mate_of = np.zeros(R, np.int32)
    jitter = np.zeros(R, np.uint64)
    for r, arr in enumerate(alignments):
        aln_off[r + 1] = aln_off[r] + len(arr)
        if arr:
            mate_of[r] = arr[0].mate_id
            (seed,) = struct.unpack(
                "<Q", hashlib.md5(arr[0].read_name.encode()).digest()[:8]
            )
            jitter[r] = seed
        else:
            mate_of[r] = r ^ 1
        flat.extend(arr)

    pos = np.empty(A, np.int64)
    aend = np.empty(A, np.int64)
    logp = np.empty(A, np.float64)
    score = np.empty(A, np.float64)
    mism = np.empty(A, np.int32)
    indels = np.empty(A, np.int32)
    sclip = np.empty(A, np.int32)
    slen = np.empty(A, np.int32)
    seqlen = np.empty(A, np.int32)
    rev = np.empty(A, np.uint8)
    contig = np.empty(A, np.int32)
    aln_id = np.empty(A, np.int32)
    read_of = np.empty(A, np.int32)
    locs_off = np.zeros(A + 1, np.int64)
    contig_ids: Dict[str, int] = {}
    locs_parts: List[List[int]] = []
    for a, al in enumerate(flat):
        pos[a] = al.pos
        aend[a] = al.aend
        logp[a] = al.log_alignment_probability
        score[a] = al.score
        mism[a] = al.mismatches
        indels[a] = al.indels
        sclip[a] = al.soft_clipped
        slen[a] = al.soft_clipped_length
        seqlen[a] = len(al.read_seq)
        rev[a] = 1 if al.reversed_ else 0
        cid = contig_ids.get(al.contig)
        if cid is None:
            cid = len(contig_ids)
            contig_ids[al.contig] = cid
        contig[a] = cid
        aln_id[a] = al.id
        read_of[a] = al.read_id
        locs_parts.append(al.mismatch_locs)
        locs_off[a + 1] = locs_off[a] + len(al.mismatch_locs)
    locs = (
        np.fromiter(
            (v for part in locs_parts for v in part), np.int64, int(locs_off[-1])
        )
        if locs_off[-1]
        else np.zeros(1, np.int64)
    )
    n_contigs = max(1, len(contig_ids))
    cen_start = np.full(n_contigs, -1, np.int64)
    cen_end = np.full(n_contigs, -1, np.int64)
    for name, cid in contig_ids.items():
        reg = centromeres.get(name)
        if reg is not None:
            cen_start[cid] = reg.start
            cen_end[cid] = reg.end

    o_active = np.zeros(A, np.uint8)
    o_proper = np.zeros(A, np.uint8)
    o_pick = np.zeros(A, np.uint8)
    o_mapq = np.zeros(A, np.int32)
    o_molid = np.full(A, -1, np.int32)
    o_amol = np.zeros(A, np.uint8)
    o_mconf = np.full(A, 0.00075 * 0.025, np.float64)
    o_mdiff = np.zeros(A, np.float64)
    o_sum = np.ones(A, np.float64)
    o_mate = np.full(A, -1, np.int32)
    o_sb = np.full(A, -1, np.int32)
    o_sbs = np.zeros(A, np.float64)
    o_sbp = np.zeros(A, np.uint8)
    o_sbr = np.zeros(A, np.int32)
    o_sbc = np.zeros(A, np.float64)
    o_cp = np.zeros(A, np.int32)
    o_cpi = np.zeros(A, np.int32)
    o_cpo = np.zeros(A, np.int32)
    o_uniq = np.zeros(A, np.int32)
    o_mds = np.zeros(A, np.float64)
    o_rim = np.zeros(A, np.int32)
    o_nmol = np.zeros(1, np.int32)

    rc = lib.rfa_tail(
        np.int32(R), np.int32(A),
        _i64p(pos), _i64p(aend), _f64p(logp), _f64p(score),
        _i32p(mism), _i32p(indels), _i32p(sclip), _i32p(slen),
        _i32p(seqlen), _u8p(rev), _i32p(contig), _i32p(aln_id),
        _i32p(read_of), _i64p(locs), _i64p(locs_off), _i64p(aln_off),
        _i32p(mate_of), _u64p(jitter),
        ctypes.c_double(cfg.rfa.improper_pair_penalty),
        ctypes.c_double(cfg.rfa.reference_length),
        np.int32(1 if run_rfa else 0),
        np.int32(cfg.rfa.anneal_temp_steps),
        np.int32(cfg.rfa.anneal_steps_per_temp_factor),
        _i64p(cen_start), _i64p(cen_end),
        _u8p(o_active), _u8p(o_proper), _u8p(o_pick), _i32p(o_mapq),
        _i32p(o_molid), _u8p(o_amol), _f64p(o_mconf), _f64p(o_mdiff),
        _f64p(o_sum), _i32p(o_mate), _i32p(o_sb), _f64p(o_sbs),
        _u8p(o_sbp), _i32p(o_sbr), _f64p(o_sbc), _i32p(o_cp),
        _i32p(o_cpi), _i32p(o_cpo), _i32p(o_uniq), _f64p(o_mds),
        _i32p(o_rim), _i32p(o_nmol),
    )
    if rc != 0:
        return None

    for a, al in enumerate(flat):
        al.active = bool(o_active[a])
        al.is_proper = bool(o_proper[a])
        al.bwa_pick = bool(o_pick[a])
        al.mapq = int(o_mapq[a])
        al.molecule_id = int(o_molid[a])
        al.active_molecule = bool(o_amol[a])
        al.molecule_confidence = float(o_mconf[a])
        al.molecule_difference = float(o_mdiff[a])
        al.sum_move_probability_change = float(o_sum[a])
        al.mate_alignment = flat[o_mate[a]] if o_mate[a] >= 0 else None
        md = al.mapq_data
        if md is None:
            md = MapQData()
            al.mapq_data = md
        md.second_best = flat[o_sb[a]] if o_sb[a] >= 0 else None
        md.second_best_score = float(o_sbs[a])
        md.second_best_proper_pair = bool(o_sbp[a])
        md.second_best_molecule_reads = int(o_sbr[a])
        md.second_best_molecule_confidence = float(o_sbc[a])
        md.copies = int(o_cp[a])
        md.copies_in_active_molecules = int(o_cpi[a])
        md.copies_outside_active_molecules = int(o_cpo[a])
        md.unique_molecules_active = int(o_uniq[a])
        md.score = float(o_mds[a])
        md.reads_in_molecule = int(o_rim[a])
    return int(o_nmol[0])
