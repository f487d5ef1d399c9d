"""Dense-state host seeding: the device formulation in numpy.

Same lock-step three-pass program as ops/fm_seed.py but with numpy state
arrays advanced on the host — one batched occ4 per wave and vectorized
mask updates instead of per-sweep Python objects (align/smem_batch.py).
Exact output (tested against the scalar collector); this is the default
host engine and the fallback for reads that overflow the device buffers.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import MemOptions
from ..index.fmindex import FMIndex
from .smem import SMEM

PH_PIVOT, PH_FWD, PH_BACK, PH_DONE = 0, 1, 2, 3


class _DenseSmem:
    """Lock-step smem1a sweeps over R reads (pass 1 / pass 2)."""

    def __init__(self, idx: FMIndex, qs: np.ndarray, qlens: np.ndarray,
                 pivots0: np.ndarray, min_intvs: np.ndarray, single_sweep: bool,
                 MAXC: int = 16, MAXS: int = 64):
        self.idx = idx
        self.qs = qs
        self.qlens = qlens
        self.min_intvs = min_intvs.astype(np.int64)
        self.single = single_sweep
        R = qs.shape[0]
        self.R = R
        self.MAXC = MAXC
        self.MAXS = MAXS
        self.phase = np.full(R, PH_PIVOT, np.int64)
        self.x = pivots0.astype(np.int64).copy()
        self.pivot_keep = self.x.copy()
        self.i = np.zeros(R, np.int64)
        self.ik = np.zeros((R, 4), np.int64)
        self.curr = np.zeros((R, MAXC, 4), np.int64)
        self.curr_n = np.zeros(R, np.int64)
        self.prev = np.zeros((R, MAXC, 4), np.int64)
        self.prev_n = np.zeros(R, np.int64)
        self.smem = np.zeros((R, MAXS, 5), np.int64)
        self.smem_n = np.zeros(R, np.int64)
        self.out = np.zeros((R, MAXS, 5), np.int64)
        self.out_n = np.zeros(R, np.int64)
        self.overflow = np.zeros(R, bool)

    def code_at(self, pos: np.ndarray) -> np.ndarray:
        c = self.qs[np.arange(self.R), np.clip(pos, 0, self.qs.shape[1] - 1)]
        return np.where((pos >= 0) & (pos < self.qlens), c, 4).astype(np.int64)

    def push_curr(self, do: np.ndarray, item: np.ndarray) -> None:
        ovf = do & (self.curr_n >= self.MAXC)
        self.overflow |= ovf
        w = do & ~ovf
        rows = np.flatnonzero(w)
        self.curr[rows, self.curr_n[rows]] = item[rows]
        self.curr_n[rows] += 1

    def step(self) -> bool:
        idx = self.idx
        # ---- PH_PIVOT ----
        in_pivot = self.phase == PH_PIVOT
        if in_pivot.any():
            cx = self.code_at(self.x)
            past = self.x >= self.qlens
            self.phase[in_pivot & past] = PH_DONE
            skip = in_pivot & ~past & (cx >= 4)
            self.x[skip] += 1
            ready = in_pivot & ~past & (cx < 4)
            if ready.any():
                c = np.clip(cx, 0, 3)
                L2 = idx.L2
                self.ik[ready, 0] = L2[c[ready]] + 1
                self.ik[ready, 1] = L2[3 - c[ready]] + 1
                self.ik[ready, 2] = L2[c[ready] + 1] - L2[c[ready]]
                self.ik[ready, 3] = self.x[ready] + 1
                self.pivot_keep[ready] = self.x[ready]
                self.i[ready] = self.x[ready] + 1
                self.curr_n[ready] = 0
                self.smem_n[ready] = 0
                self.phase[ready] = PH_FWD

        # ---- PH_FWD ----
        in_fwd = self.phase == PH_FWD
        if in_fwd.any():
            ci = self.code_at(self.i)
            at_end = self.i >= self.qlens
            terminal = in_fwd & (at_end | (ci >= 4))
            live = in_fwd & ~terminal
            rows = np.flatnonzero(live)
            ns = np.zeros(self.R, np.int64)
            n0 = np.zeros(self.R, np.int64)
            n1 = np.zeros(self.R, np.int64)
            if rows.size:
                o0, o1, osz = idx.extend(
                    self.ik[rows, 0], self.ik[rows, 1], self.ik[rows, 2], is_back=False
                )
                comp = 3 - np.clip(ci[rows], 0, 3)
                ar = np.arange(rows.size)
                n0[rows] = o0[ar, comp]
                n1[rows] = o1[ar, comp]
                ns[rows] = osz[ar, comp]
            changed = live & (ns != self.ik[:, 2])
            self.push_curr(changed | terminal, self.ik)
            too_small = changed & (ns < self.min_intvs)
            advance = live & ~too_small
            arows = np.flatnonzero(advance)
            self.ik[arows, 0] = n0[arows]
            self.ik[arows, 1] = n1[arows]
            self.ik[arows, 2] = ns[arows]
            self.ik[arows, 3] = self.i[arows] + 1
            self.i[arows] += 1
            hit_len = advance & (self.i >= self.qlens)
            self.push_curr(hit_len, self.ik)
            to_back = terminal | too_small | hit_len
            rows = np.flatnonzero(to_back)
            if rows.size:
                cn = self.curr_n[rows]
                self.x[rows] = self.curr[rows, np.maximum(cn - 1, 0), 3]  # ret
                for r, c in zip(rows, cn):
                    self.prev[r, :c] = self.curr[r, :c][::-1]
                self.prev_n[rows] = cn
                self.i[rows] = self.pivot_keep[rows] - 1
                self.phase[rows] = PH_BACK

        # ---- PH_BACK ----
        in_back = self.phase == PH_BACK
        if in_back.any():
            cb = self.code_at(self.i)
            c_ok = in_back & (self.i >= 0) & (cb < 4)
            rows = np.flatnonzero(in_back)
            # batch-extend all prev items of all back sweeps
            flat_idx = []
            flat_rows = []
            for r in rows:
                n = int(self.prev_n[r])
                if c_ok[r] and n:
                    flat_rows.extend([r] * n)
                    flat_idx.extend(range(n))
            nb = {}
            if flat_rows:
                fr = np.array(flat_rows)
                fj = np.array(flat_idx)
                p = self.prev[fr, fj]
                b0, b1, bs = idx.extend(p[:, 0], p[:, 1], p[:, 2], is_back=True)
                sel = np.clip(cb[fr], 0, 3)
                ar = np.arange(fr.size)
                nb0 = b0[ar, sel]
                nb1 = b1[ar, sel]
                nbs = bs[ar, sel]
                pos = 0
                for r in rows:
                    n = int(self.prev_n[r])
                    if c_ok[r] and n:
                        nb[r] = (nb0[pos : pos + n], nb1[pos : pos + n], nbs[pos : pos + n])
                        pos += n
            # sequential per-read item logic (small loops)
            for r in rows:
                n = int(self.prev_n[r])
                ncurr = 0
                last_s = -1
                new_curr = self.curr[r]
                mi = int(self.i[r])
                for j in range(n):
                    pj = self.prev[r, j]
                    if c_ok[r]:
                        oks = int(nb[r][2][j])
                        keep = oks < self.min_intvs[r]
                    else:
                        oks = 0
                        keep = True
                    if keep:
                        if ncurr == 0:
                            sn = int(self.smem_n[r])
                            last_qb = self.smem[r, sn - 1, 3] if sn else -1
                            if sn == 0 or mi + 1 < last_qb:
                                if sn >= self.MAXS:
                                    self.overflow[r] = True
                                else:
                                    self.smem[r, sn] = (pj[0], pj[1], pj[2], mi + 1, pj[3])
                                    self.smem_n[r] += 1
                    elif ncurr == 0 or oks != last_s:
                        if ncurr >= self.MAXC:
                            self.overflow[r] = True
                        else:
                            new_curr[ncurr] = (nb[r][0][j], nb[r][1][j], oks, pj[3])
                            ncurr += 1
                        last_s = oks
                if ncurr == 0 or mi - 1 < -1:
                    # sweep done: flush reversed smems into out
                    sn = int(self.smem_n[r])
                    on = int(self.out_n[r])
                    if on + sn > self.MAXS:
                        self.overflow[r] = True
                        sn = min(sn, self.MAXS - on)
                    if sn > 0:
                        self.out[r, on : on + sn] = self.smem[r, :sn][::-1]
                        self.out_n[r] = on + sn
                    self.phase[r] = PH_DONE if self.single else PH_PIVOT
                else:
                    self.curr[r] = new_curr
                    self.prev[r, :ncurr] = new_curr[:ncurr]
                    self.prev_n[r] = ncurr
                    self.i[r] -= 1
        return bool((self.phase != PH_DONE).any())

    def run(self):
        guard = 0
        limit = 16 * self.qs.shape[1] + 64
        while self.step():
            guard += 1
            if guard > limit:
                self.overflow[self.phase != PH_DONE] = True
                break
        return self.out, self.out_n, self.overflow


def _pass3_dense(idx: FMIndex, qs, qlens, min_seed_len: int, max_intv: int, MAXS: int = 64):
    """Lock-step seed_strategy1 pivot chains."""
    R, L = qs.shape
    x = np.zeros(R, np.int64)
    i = np.zeros(R, np.int64)
    ik = np.zeros((R, 3), np.int64)
    scanning = np.zeros(R, bool)
    done = np.zeros(R, bool)
    out = np.zeros((R, MAXS, 5), np.int64)
    out_n = np.zeros(R, np.int64)
    overflow = np.zeros(R, bool)
    L2 = idx.L2

    def code_at(pos):
        c = qs[np.arange(R), np.clip(pos, 0, L - 1)]
        return np.where((pos >= 0) & (pos < qlens), c, 4).astype(np.int64)

    guard = 0
    while (~done).any():
        guard += 1
        if guard > 8 * L + 64:
            overflow[~done] = True
            break
        idle = ~scanning & ~done
        cx = code_at(x)
        past = x >= qlens
        done |= idle & past
        skip = idle & ~past & (cx >= 4)
        x[skip] += 1
        start = idle & ~past & (cx < 4)
        srows = np.flatnonzero(start)
        if srows.size:
            c = np.clip(cx[srows], 0, 3)
            ik[srows, 0] = L2[c] + 1
            ik[srows, 1] = L2[3 - c] + 1
            ik[srows, 2] = L2[c + 1] - L2[c]
            i[srows] = x[srows] + 1
            scanning[srows] = True
        scan = scanning.copy()
        if not scan.any():
            continue
        ci = code_at(i)
        at_end = scan & (i >= qlens)
        hit_n = scan & ~at_end & (ci >= 4)
        live = scan & ~at_end & ~hit_n
        rows = np.flatnonzero(live)
        ns = np.zeros(R, np.int64)
        n0 = np.zeros(R, np.int64)
        n1 = np.zeros(R, np.int64)
        if rows.size:
            o0, o1, osz = idx.extend(ik[rows, 0], ik[rows, 1], ik[rows, 2], is_back=False)
            comp = 3 - np.clip(ci[rows], 0, 3)
            ar = np.arange(rows.size)
            n0[rows] = o0[ar, comp]
            n1[rows] = o1[ar, comp]
            ns[rows] = osz[ar, comp]
        emit = live & (ns < max_intv) & (i - x >= min_seed_len)
        do_push = emit & (ns > 0)
        prow = np.flatnonzero(do_push)
        for r in prow:
            if out_n[r] >= MAXS:
                overflow[r] = True
            else:
                out[r, out_n[r]] = (n0[r], n1[r], ns[r], x[r], i[r] + 1)
                out_n[r] += 1
        adv = live & ~emit
        arows = np.flatnonzero(adv)
        ik[arows, 0] = n0[arows]
        ik[arows, 1] = n1[arows]
        ik[arows, 2] = ns[arows]
        i[arows] += 1
        stop = at_end | hit_n | emit
        x[stop] = np.where(at_end[stop], qlens[stop], i[stop] + 1)
        scanning &= ~stop
    return out, out_n, overflow


def collect_seeds_dense(
    idx: FMIndex, reads: List[np.ndarray], opt: MemOptions,
    MAXC: int = 16, MAXS: int = 64,
) -> List[List[SMEM]]:
    """Three-pass collection with dense numpy state; exact output."""
    from .smem import collect_seeds

    n = len(reads)
    if n == 0:
        return []
    L = max(1, max(len(r) for r in reads))
    qs = np.full((n, L), 4, np.uint8)
    qlens = np.zeros(n, np.int64)
    for i, r in enumerate(reads):
        qs[i, : len(r)] = r
        qlens[i] = len(r)

    eng = _DenseSmem(
        idx, qs, qlens, np.zeros(n, np.int64), np.ones(n, np.int64), False,
        MAXC, MAXS,
    )
    out1, n1, overflow = eng.run()
    overflow = overflow.copy()

    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    pass1: List[List[SMEM]] = []
    pass2_jobs: List[List[Tuple[int, int]]] = []
    for r in range(n):
        lst, jobs = [], []
        if not overflow[r]:
            for t in range(int(n1[r])):
                k, l, s, qb, qe = (int(v) for v in out1[r, t])
                if qe - qb >= opt.min_seed_len:
                    m = SMEM(k=k, l=l, s=s, qb=qb, qe=qe)
                    lst.append(m)
                    if m.length >= split_len and m.s <= opt.split_width:
                        jobs.append(((m.qb + m.qe) >> 1, m.s + 1))
        pass1.append(lst)
        pass2_jobs.append(jobs)

    pass2: List[List[SMEM]] = [[] for _ in range(n)]
    max_jobs = max((len(j) for j in pass2_jobs), default=0)
    for round_i in range(max_jobs):
        pivots = np.array(
            [pass2_jobs[r][round_i][0] if round_i < len(pass2_jobs[r]) else int(qlens[r])
             for r in range(n)], np.int64)
        minis = np.array(
            [pass2_jobs[r][round_i][1] if round_i < len(pass2_jobs[r]) else 1
             for r in range(n)], np.int64)
        eng2 = _DenseSmem(idx, qs, qlens, pivots, minis, True, MAXC, MAXS)
        o2, c2, ov2 = eng2.run()
        overflow |= ov2
        for r in range(n):
            if round_i < len(pass2_jobs[r]) and not overflow[r]:
                for t in range(int(c2[r])):
                    k, l, s, qb, qe = (int(v) for v in o2[r, t])
                    if qe - qb >= opt.min_seed_len:
                        pass2[r].append(SMEM(k=k, l=l, s=s, qb=qb, qe=qe))

    pass3: List[List[SMEM]] = [[] for _ in range(n)]
    if opt.max_mem_intv > 0:
        o3, c3, ov3 = _pass3_dense(idx, qs, qlens, opt.min_seed_len, opt.max_mem_intv, MAXS)
        overflow |= ov3
        for r in range(n):
            if not overflow[r]:
                for t in range(int(c3[r])):
                    k, l, s, qb, qe = (int(v) for v in o3[r, t])
                    pass3[r].append(SMEM(k=k, l=l, s=s, qb=qb, qe=qe))

    out: List[List[SMEM]] = []
    for r in range(n):
        if overflow[r]:
            out.append(collect_seeds(idx, reads[r], opt))
            continue
        mems = pass1[r] + pass2[r] + pass3[r]
        mems.sort(key=lambda m: (m.qb << 32) | m.qe)
        out.append(mems)
    return out
