"""Batched device execution of the candidate-generation DP.

``batch_align_single`` runs mem_align1_core over MANY reads with all seed
extensions executed as device batches instead of per-seed scalar DP:

  1. host: chaining + filtering per read (FM-index batch queries);
  2. wave 1: every seed's LEFT extension at the base band in one batch,
     then the doubled band (the reference's band-doubling retry,
     bwamem.c:723-733) in a small follow-up batch only for seeds whose
     try-0 result triggers the retry condition;
  3. wave 2: every seed's RIGHT extension — its h0 is the left-extended
     score, which wave 1 determined (including which band try "won") —
     same lazy band-doubling;
  4. host: replay chain2aln's sequential bookkeeping (containment skips,
     band retries, local-vs-to-end choice) with the precomputed results.

The replay is exact: extension inputs never depend on *other* seeds'
extension outputs, only the right-extension h0 depends on the same seed's
left result, which the two-wave split resolves.  The replay extender looks
results up by problem content, so chain2aln's code path is identical to
the scalar engine's.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..align.chain import Chain, chain_filter, filter_chained_seeds, mem_chain_batch
from ..align.extend import AlnReg, cal_max_gap, chain2aln, sort_dedup_patch
from ..config import MemOptions
from ..index.fmindex import FMIndex
from .sw_extend import BatchExtender


def _problem_key(qs: np.ndarray, ts: np.ndarray, w: int, end_bonus: int, h0: int):
    return (qs.tobytes(), ts.tobytes(), w, end_bonus, h0)


class _SeedProblems:
    """Extension problems for one seed within one chain."""

    __slots__ = ("left", "right_parts", "h0")

    def __init__(self):
        self.left = None          # (qs, rs) or None
        self.right_parts = None   # (q_tail, r_tail) or None
        self.h0 = 0               # s.len * a


def _chain_window(idx: FMIndex, q: np.ndarray, c: Chain, opt: MemOptions):
    """The rmax/rseq construction of mem_chain2aln (bwamem.c:642-659)."""
    if c.win_seq is not None:
        return c.win_seq, c.win_rmax0
    l_query = len(q)
    l_pac = idx.l_pac
    rmax0, rmax1 = l_pac << 1, 0
    for t in c.seeds:
        b = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg))
        e = t.rbeg + t.len + (
            (l_query - t.qbeg - t.len) + cal_max_gap(opt, l_query - t.qbeg - t.len)
        )
        rmax0 = min(rmax0, b)
        rmax1 = max(rmax1, e)
    rmax0 = max(rmax0, 0)
    rmax1 = min(rmax1, l_pac << 1)
    if rmax0 < l_pac < rmax1:
        if c.seeds[0].rbeg < l_pac:
            rmax1 = l_pac
        else:
            rmax0 = l_pac
    rseq, rid, rmax0, rmax1 = idx.fetch_seq(rmax0, c.seeds[0].rbeg, rmax1)
    return rseq, rmax0


def batch_align_single(
    idx: FMIndex,
    opt: MemOptions,
    reads: List[np.ndarray],
    extender_batch: Optional[BatchExtender] = None,
    mat: Optional[np.ndarray] = None,
    dfm=None,
) -> List[List[AlnReg]]:
    """mem_align1_core over a batch of reads with device-batched extension.

    With ``dfm`` (a DeviceFMIndex) seeding runs on device too."""
    if mat is None:
        mat = opt.scoring_matrix()
    if extender_batch is None:
        extender_batch = BatchExtender(opt)

    from ..runtime.timers import TIMERS

    if dfm is not None:
        from .fm_seed import collect_seeds_device

        with TIMERS.stage("seed.device"):
            all_mems = collect_seeds_device(idx, reads, opt, dfm=dfm)
    else:
        from ..align.smem_native import smem_available

        if smem_available():
            # C++ three-pass collector: exact scalar output, releases the
            # GIL, ~40x faster than the dense numpy engine on this host
            from ..align.smem_native import collect_seeds_native

            with TIMERS.stage("seed.host"):
                all_mems = collect_seeds_native(idx, reads, opt)
        else:
            from ..align.smem_dense import collect_seeds_dense

            with TIMERS.stage("seed.host"):
                all_mems = collect_seeds_dense(idx, reads, opt)
    per_read_chains: List[List[Chain]] = []
    seed_probs: List[_SeedProblems] = []
    with TIMERS.stage("chain.host"):
        from ..align.chain_native import mem_chain_batch_native

        chained = mem_chain_batch_native(idx, reads, opt, all_mems)
        prefiltered = chained is not None
        if chained is None:
            chained = mem_chain_batch(idx, reads, opt, all_mems)
        for codes, chains in zip(reads, chained):
            if not prefiltered:
                chains = chain_filter(opt, chains)
            filter_chained_seeds(idx, codes, chains, opt)
            per_read_chains.append(chains)
            l_query = len(codes)
            for c in chains:
                if not c.seeds:
                    continue
                rseq, rmax0 = _chain_window(idx, codes, c, opt)
                for s in c.seeds:
                    sp = _SeedProblems()
                    sp.h0 = s.len * opt.a
                    if s.qbeg:
                        qs = codes[: s.qbeg][::-1].copy()
                        rs = rseq[: s.rbeg - rmax0][::-1].copy()
                        sp.left = (qs, rs)
                    if s.qbeg + s.len != l_query:
                        sp.right_parts = (
                            codes[s.qbeg + s.len :],
                            rseq[s.rbeg + s.len - rmax0 :],
                        )
                    seed_probs.append(sp)

    cache: Dict[Tuple, Tuple] = {}

    def _run_wave(probs: List[Tuple]) -> None:
        """Dispatch the wave's problems, deduplicated by content: seeds
        sharing an identical problem (same qs/rs/w/h0) would otherwise each
        occupy a device batch slot; results land in the shared cache."""
        uniq: List[Tuple] = []
        seen = set()
        for p in probs:
            key = _problem_key(*p)
            if key in seen or key in cache:
                continue
            seen.add(key)
            uniq.append(p)
        if not uniq:
            return
        for p in uniq:
            extender_batch.submit(*p)
        with TIMERS.stage("extend.device"):
            out = extender_batch.run()
        for p, res in zip(uniq, out):
            cache[_problem_key(*p)] = res

    def _needs_retry(res: Tuple, prev_score: int, band_try: int) -> bool:
        """The band-doubling continue condition (bwamem.c:723-733, replayed
        in chain2aln): another try runs only when the score changed AND
        max_off reached 3/4 of the band."""
        aw = opt.w << band_try
        return not (res[0] == prev_score or res[5] < (aw >> 1) + (aw >> 2))

    # Extension rounds.  Round 1: every seed's LEFT extension at the base
    # band.  The doubled-band retry (triggered only when try-0's max_off
    # reached 3/4 of the band — rare) and the RIGHT extensions whose h0
    # (= effective left score) is already known MERGE into one round-2
    # dispatch; right extensions of retried seeds + right-side retries form
    # round 3; a final tiny round 4 covers right retries from round 3.
    # Identical outputs to the sequential band-doubling driver (the replay
    # looks results up by problem content), but 3-4 dispatch rounds total
    # instead of one device round trip per band try per side.
    wave1 = [
        (sp.left[0], sp.left[1], opt.w, opt.pen_clip5, sp.h0)
        for sp in seed_probs
        if sp.left is not None
    ]
    if wave1:
        _run_wave(wave1)

    def _left_sc0(sp):
        """Effective left score; None if its doubled-band try is pending."""
        if sp.left is None:
            return sp.h0
        qs, rs = sp.left
        res0 = cache[_problem_key(qs, rs, opt.w, opt.pen_clip5, sp.h0)]
        if not _needs_retry(res0, -1, 0):
            return res0[0]
        key1 = _problem_key(qs, rs, opt.w << 1, opt.pen_clip5, sp.h0)
        res1 = cache.get(key1)
        return res1[0] if res1 is not None else None

    round2: List[Tuple] = []
    deferred: List[object] = []     # right extensions waiting on a left retry
    right_submitted: List[Tuple] = []
    for sp in seed_probs:
        sc0 = _left_sc0(sp)
        if sc0 is None:
            qs, rs = sp.left
            round2.append((qs, rs, opt.w << 1, opt.pen_clip5, sp.h0))
            if sp.right_parts is not None:
                deferred.append(sp)
        elif sp.right_parts is not None:
            qt, rt = sp.right_parts
            round2.append((qt, rt, opt.w, opt.pen_clip3, sc0))
            right_submitted.append((qt, rt, opt.w, opt.pen_clip3, sc0))
    if round2:
        _run_wave(round2)

    round3: List[Tuple] = []
    for sp in deferred:
        sc0 = _left_sc0(sp)
        qt, rt = sp.right_parts
        round3.append((qt, rt, opt.w, opt.pen_clip3, sc0))
    for p in right_submitted:
        res = cache[_problem_key(*p)]
        if _needs_retry(res, p[4], 0):
            round3.append((p[0], p[1], opt.w << 1, p[3], p[4]))
    if round3:
        _run_wave(round3)
        retry4 = [
            (qt, rt, opt.w << 1, eb, sc0)
            for (qt, rt, w, eb, sc0) in round3
            if w == opt.w
            and _needs_retry(cache[_problem_key(qt, rt, w, eb, sc0)], sc0, 0)
        ]
        if retry4:
            _run_wave(retry4)

    misses = [0]

    def lookup_extender(qs, ts, w, end_bonus, h0):
        key = _problem_key(np.asarray(qs), np.asarray(ts), w, end_bonus, h0)
        res = cache.get(key)
        if res is None:
            misses[0] += 1
            from ..align import ksw

            res = ksw.extend2(
                np.asarray(qs), np.asarray(ts), mat,
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                w, end_bonus, opt.zdrop, h0,
            )
            cache[key] = res
        return res

    out: List[List[AlnReg]] = []
    with TIMERS.stage("extend.replay"):
        for codes, chains in zip(reads, per_read_chains):
            regs: List[AlnReg] = []
            for c in chains:
                chain2aln(idx, codes, c, opt, regs, extender=lookup_extender, mat=mat)
            regs = sort_dedup_patch(opt, regs, idx, codes, mat)
            out.append(regs)
    return out


def make_tpu_extender(opt: MemOptions):
    """A synchronous per-problem device extender (for the pluggable
    extender interface).  Correct but not batched — the batched path is
    batch_align_single; this exists so --engine tpu exercises the device
    kernel end-to-end."""
    be = BatchExtender(opt)

    def run(qs, ts, w, end_bonus, h0):
        be.submit(np.asarray(qs), np.asarray(ts), w, end_bonus, h0)
        return be.run()[0]

    return run
