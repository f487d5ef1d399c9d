"""Wave-batched SMEM seeding across many reads.

The scalar collector (smem.py) issues one rank query per FM-index
extension — the dominant cost of candidate generation (SURVEY.md 3.5 hot
loop 1).  This module runs the identical algorithm as lock-step state
machines over a whole batch of reads: every wave gathers the pending
``bwt_extend`` requests from all active sweeps into one vectorized occ4
batch, then advances each sweep's control flow with results in hand.

Output is exactly ``collect_seeds`` per read (same SMEMs, same order):
extension results never depend on other extensions in the same wave, only
the control flow consumes them sequentially — which we replay per read
after each wave.

This is also the shape of the device (Pallas) formulation: the irregular
while-loops become fixed-trip masked scans over a dense state matrix.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import MemOptions
from ..index.fmindex import FMIndex
from .smem import SMEM


@dataclass
class _Sweep:
    """One in-flight smem1a or seed_strategy1 execution."""

    read_id: int
    kind: str                 # "fwd" | "back" | "s3"
    x: int                    # pivot
    min_intv: int
    i: int = 0
    ik: Tuple[int, int, int, int] = (0, 0, 0, 0)   # (k, l, s, info_end)
    curr: List[Tuple[int, int, int, int]] = field(default_factory=list)
    prev: List[Tuple[int, int, int, int]] = field(default_factory=list)
    mems: List[SMEM] = field(default_factory=list)
    ret: int = 0
    done: bool = False
    out_slot: Optional[Tuple[int, int]] = None     # (pass, order) for assembly


class _WaveEngine:
    """Advance sweeps in waves, batching all extend() rank queries."""

    def __init__(self, idx: FMIndex):
        self.idx = idx

    def run(self, sweeps: List[_Sweep], reads: List[np.ndarray]) -> None:
        active = [s for s in sweeps if not s.done]
        while active:
            requests = []   # (x0, x1, x2, is_back)
            owners = []     # (sweep, tag)
            for s in active:
                q = reads[s.read_id]
                if s.kind in ("fwd", "s3"):
                    # needs one forward extension unless terminating
                    if s.i < len(q) and q[s.i] < 4:
                        k, l, sz, _ = s.ik
                        requests.append((k, l, sz, False))
                        owners.append((s, 0))
                elif s.kind == "back":
                    c = -1 if s.i < 0 else (int(q[s.i]) if q[s.i] < 4 else -1)
                    if c >= 0:
                        for j, p in enumerate(s.prev):
                            requests.append((p[0], p[1], p[2], True))
                            owners.append((s, j))
            results: Dict[Tuple[int, int], Tuple] = {}
            if requests:
                fwd_idx = [i for i, r in enumerate(requests) if not r[3]]
                back_idx = [i for i, r in enumerate(requests) if r[3]]
                for idx_list, is_back in ((fwd_idx, False), (back_idx, True)):
                    if not idx_list:
                        continue
                    x0 = np.array([requests[i][0] for i in idx_list], np.int64)
                    x1 = np.array([requests[i][1] for i in idx_list], np.int64)
                    x2 = np.array([requests[i][2] for i in idx_list], np.int64)
                    o0, o1, osz = self.idx.extend(x0, x1, x2, is_back=is_back)
                    for row, i in enumerate(idx_list):
                        s, tag = owners[i]
                        results[(id(s), tag)] = (o0[row], o1[row], osz[row])
            next_active = []
            for s in active:
                self._advance(s, reads[s.read_id], results)
                if not s.done:
                    next_active.append(s)
            active = next_active

    def _advance(self, s: _Sweep, q: np.ndarray, results: Dict) -> None:
        if s.kind == "fwd":
            self._advance_fwd(s, q, results)
        elif s.kind == "back":
            self._advance_back(s, q, results)
        else:
            self._advance_s3(s, q, results)

    # ----- forward sweep of smem1a (bwt.c:304-324) -----
    def _advance_fwd(self, s: _Sweep, q: np.ndarray, results: Dict) -> None:
        length = len(q)
        if s.i >= length:
            s.curr.append(s.ik)
            self._to_back(s)
            return
        if q[s.i] >= 4:
            s.curr.append(s.ik)
            self._to_back(s)
            return
        res = results.get((id(s), 0))
        c = 3 - int(q[s.i])
        o0, o1, osz = res
        new_sz = int(osz[c])
        if new_sz != s.ik[2]:
            s.curr.append(s.ik)
            if new_sz < s.min_intv:
                self._to_back(s)
                return
        s.ik = (int(o0[c]), int(o1[c]), new_sz, s.i + 1)
        s.i += 1
        if s.i == length:
            s.curr.append(s.ik)
            self._to_back(s)

    def _to_back(self, s: _Sweep) -> None:
        s.curr.reverse()
        s.ret = s.curr[0][3]
        s.prev = s.curr
        s.curr = []
        s.kind = "back"
        s.i = s.x - 1

    # ----- backward sweep (bwt.c:326-345) -----
    def _advance_back(self, s: _Sweep, q: np.ndarray, results: Dict) -> None:
        c = -1 if s.i < 0 else (int(q[s.i]) if q[s.i] < 4 else -1)
        curr: List[Tuple[int, int, int, int]] = []
        for j, p in enumerate(s.prev):
            if c >= 0:
                o0, o1, osz = results[(id(s), j)]
                oc = (int(o0[c]), int(o1[c]), int(osz[c]), p[3])
            else:
                oc = None
            if c < 0 or (oc is not None and oc[2] < s.min_intv):
                if not curr:
                    if not s.mems or s.i + 1 < s.mems[-1].qb:
                        s.mems.append(SMEM(k=p[0], l=p[1], s=p[2], qb=s.i + 1, qe=p[3]))
            elif not curr or oc[2] != curr[-1][2]:
                curr.append(oc)
        if not curr:
            s.mems.reverse()
            s.done = True
            return
        s.prev = curr
        s.i -= 1
        if s.i < -1:
            s.mems.reverse()
            s.done = True

    # ----- pass-3 LAST-like seeding (bwt.c:358-379) -----
    def _advance_s3(self, s: _Sweep, q: np.ndarray, results: Dict) -> None:
        length = len(q)
        if s.i >= length:
            s.ret = length
            s.done = True
            return
        if q[s.i] >= 4:
            s.ret = s.i + 1
            s.done = True
            return
        res = results.get((id(s), 0))
        c = 3 - int(q[s.i])
        o0, o1, osz = res
        nxt = (int(o0[c]), int(o1[c]), int(osz[c]))
        if nxt[2] < s.max_intv and s.i - s.x >= s.min_len:
            if nxt[2] > 0:
                s.mems.append(SMEM(k=nxt[0], l=nxt[1], s=nxt[2], qb=s.x, qe=s.i + 1))
            s.ret = s.i + 1
            s.done = True
            return
        s.ik = (nxt[0], nxt[1], nxt[2], s.i + 1)
        s.i += 1
        if s.i >= length:
            s.ret = length
            s.done = True


def _new_smem_sweep(idx: FMIndex, read_id: int, q: np.ndarray, x: int, min_intv: int) -> Optional[_Sweep]:
    if q[x] > 3:
        return None
    if min_intv < 1:
        min_intv = 1
    x0, x1, x2 = idx.set_intv(np.array([int(q[x])]))
    s = _Sweep(read_id=read_id, kind="fwd", x=x, min_intv=min_intv)
    s.ik = (int(x0[0]), int(x1[0]), int(x2[0]), x + 1)
    s.i = x + 1
    return s


def _new_s3_sweep(idx: FMIndex, read_id: int, q: np.ndarray, x: int, min_len: int, max_intv: int) -> Optional[_Sweep]:
    if q[x] > 3:
        return None
    x0, x1, x2 = idx.set_intv(np.array([int(q[x])]))
    s = _Sweep(read_id=read_id, kind="s3", x=x, min_intv=1)
    s.min_len = min_len
    s.max_intv = max_intv
    s.ik = (int(x0[0]), int(x1[0]), int(x2[0]), x + 1)
    s.i = x + 1
    return s


def collect_seeds_batch(
    idx: FMIndex, reads: List[np.ndarray], opt: MemOptions
) -> List[List[SMEM]]:
    """collect_seeds for a batch of reads; identical per-read output."""
    engine = _WaveEngine(idx)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    n = len(reads)
    pass1_mems: List[List[SMEM]] = [[] for _ in range(n)]

    # ---- pass 1: sequential pivots per read, all reads in lock-step ----
    cursors = [0] * n
    active_sweeps: Dict[int, _Sweep] = {}
    while True:
        # (re)start sweeps for reads whose cursor is ready
        for r in range(n):
            if r in active_sweeps or cursors[r] >= len(reads[r]):
                continue
            q = reads[r]
            while cursors[r] < len(q) and q[cursors[r]] >= 4:
                cursors[r] += 1
            if cursors[r] >= len(q):
                continue
            sw = _new_smem_sweep(idx, r, q, cursors[r], 1)
            active_sweeps[r] = sw
        if not active_sweeps:
            break
        engine.run(list(active_sweeps.values()), reads)
        for r in list(active_sweeps):
            sw = active_sweeps[r]
            if sw.done:
                for m in sw.mems:
                    if m.length >= opt.min_seed_len:
                        pass1_mems[r].append(m)
                cursors[r] = sw.ret
                del active_sweeps[r]

    # ---- pass 2: re-seed long low-occ SMEMs (independent sweeps) ----
    pass2_sweeps: List[Tuple[int, int, _Sweep]] = []
    for r in range(n):
        for k, p in enumerate(pass1_mems[r]):
            if p.length < split_len or p.s > opt.split_width:
                continue
            sw = _new_smem_sweep(idx, r, reads[r], (p.qb + p.qe) >> 1, p.s + 1)
            if sw is not None:
                pass2_sweeps.append((r, k, sw))
    if pass2_sweeps:
        engine.run([sw for _, _, sw in pass2_sweeps], reads)
    pass2_mems: List[List[SMEM]] = [[] for _ in range(n)]
    for r, k, sw in pass2_sweeps:
        for m in sw.mems:
            if m.length >= opt.min_seed_len:
                pass2_mems[r].append(m)

    # ---- pass 3: LAST-like sequential cursors ----
    pass3_mems: List[List[SMEM]] = [[] for _ in range(n)]
    if opt.max_mem_intv > 0:
        cursors = [0] * n
        active_sweeps = {}
        while True:
            for r in range(n):
                if r in active_sweeps or cursors[r] >= len(reads[r]):
                    continue
                q = reads[r]
                while cursors[r] < len(q) and q[cursors[r]] >= 4:
                    cursors[r] += 1
                if cursors[r] >= len(q):
                    continue
                sw = _new_s3_sweep(idx, r, q, cursors[r], opt.min_seed_len, opt.max_mem_intv)
                active_sweeps[r] = sw
            if not active_sweeps:
                break
            engine.run(list(active_sweeps.values()), reads)
            for r in list(active_sweeps):
                sw = active_sweeps[r]
                if sw.done:
                    for m in sw.mems:
                        if m.s > 0:
                            pass3_mems[r].append(m)
                    cursors[r] = sw.ret
                    del active_sweeps[r]

    out: List[List[SMEM]] = []
    for r in range(n):
        mems = pass1_mems[r] + pass2_mems[r] + pass3_mems[r]
        mems.sort(key=lambda m: (m.qb << 32) | m.qe)
        out.append(mems)
    return out
