"""Parity tests: batched local SW and global kernels vs scalar oracles."""

import numpy as np
import pytest

from arachne_tpu.align import ksw
from arachne_tpu.config import MemOptions
from arachne_tpu.ops.sw_global import BatchGlobal
from arachne_tpu.ops.sw_local import BatchLocalSW

OPT = MemOptions()
MAT = OPT.scoring_matrix()


class TestLocalBatch:
    def test_align2_parity_random(self, rng):
        b = BatchLocalSW(OPT, qmax=128, tmax=256)
        probs = []
        for _ in range(40):
            tlen = int(rng.integers(60, 250))
            t = rng.integers(0, 4, tlen).astype(np.uint8)
            off = int(rng.integers(0, tlen - 50))
            q = t[off : off + min(100, tlen - off)].copy()
            for _ in range(int(rng.integers(0, 5))):
                i = int(rng.integers(0, len(q)))
                q[i] = (q[i] + 1) % 4
            minsc = OPT.min_seed_len * OPT.a
            probs.append((q, t, minsc))
            b.submit(q, t, minsc)
        got = b.run_align2()
        for (q, t, minsc), r in zip(probs, got):
            xtra = ksw.KSW_XSUBO | ksw.KSW_XSTART | minsc
            e = ksw.align2(q, t, MAT, 6, 1, 6, 1, xtra)
            assert (r.score, r.te, r.qe, r.score2, r.te2, r.tb, r.qb) == (
                e.score, e.te, e.qe, e.score2, e.te2, e.tb, e.qb
            ), (len(q), len(t))

    def test_second_best_planted(self, rng):
        t = rng.integers(0, 4, 400).astype(np.uint8)
        t[300:330] = t[50:80]
        q = t[50:80].copy()
        b = BatchLocalSW(OPT)
        b.submit(q, t, 19)
        r = b.run_align2()[0]
        e = ksw.align2(q, t, MAT, 6, 1, 6, 1, ksw.KSW_XSUBO | ksw.KSW_XSTART | 19)
        assert (r.score, r.score2, r.te, r.te2) == (e.score, e.score2, e.te, e.te2)


class TestGlobalBatch:
    def test_parity_random(self, rng):
        b = BatchGlobal(OPT, qmax=128, tmax=160)
        probs = []
        for _ in range(30):
            tlen = int(rng.integers(30, 140))
            t = rng.integers(0, 4, tlen).astype(np.uint8)
            s = list(t)
            for _ in range(int(rng.integers(0, 4))):
                i = int(rng.integers(0, len(s)))
                s[i] = (s[i] + 1) % 4
            if rng.integers(0, 2):
                s.insert(int(rng.integers(0, len(s))), int(rng.integers(0, 4)))
            if rng.integers(0, 2):
                del s[int(rng.integers(0, len(s) - 1))]
            q = np.array(s, dtype=np.uint8)
            w = int(rng.integers(5, 60))
            probs.append((q, t, w))
            b.submit(q, t, w)
        got = b.run()
        for (q, t, w), (score, cig) in zip(probs, got):
            e_score, e_cig = ksw.global2(q, t, MAT, 6, 1, 6, 1, w)
            assert score == e_score, (len(q), len(t), w)
            assert cig == e_cig, (len(q), len(t), w)

    def test_perfect_match(self, rng):
        q = rng.integers(0, 4, 80).astype(np.uint8)
        b = BatchGlobal(OPT)
        b.submit(q, q, 50)
        score, cig = b.run()[0]
        assert score == 80 and cig == [(0, 80)]


class TestScore2Scan:
    def test_matches_host_spec(self, rng):
        """score2_scan (device b-array automaton) == _score2_from_rowmax
        (the ksw.c:192-227 host spec) on adversarial row-max patterns:
        plateaus, strict runs, isolated spikes, sub-threshold gaps."""
        import jax.numpy as jnp

        from arachne_tpu.ops.sw_local import _score2_from_rowmax, score2_scan

        tmax, B, max_mat = 96, 64, int(MAT.max())
        row = np.zeros((tmax, B), np.int32)
        tlens = np.zeros(B, np.int32)
        gmax = np.zeros(B, np.int32)
        te = np.zeros(B, np.int32)
        minscs = np.zeros(B, np.int32)
        for i in range(B):
            tlen = int(rng.integers(4, tmax + 1))
            vals = rng.integers(0, 40, tlen).astype(np.int32)
            # inject plateaus and strict ascents to hit every automaton arc
            for _ in range(3):
                s = int(rng.integers(0, tlen))
                ln = int(rng.integers(1, 6))
                v = int(rng.integers(10, 40))
                vals[s : s + ln] = v
            tlens[i] = tlen
            row[:tlen, i] = vals
            gmax[i] = int(vals.max())
            te[i] = int(np.argmax(vals))
            minscs[i] = int(rng.integers(1, 30))
        s2, t2 = score2_scan(
            jnp.asarray(row), jnp.asarray(tlens), jnp.asarray(gmax),
            jnp.asarray(te), jnp.asarray(minscs), max_mat,
        )
        s2 = np.asarray(s2)
        t2 = np.asarray(t2)
        for i in range(B):
            es, et = _score2_from_rowmax(
                row[:, i], int(tlens[i]), int(gmax[i]), int(te[i]),
                int(minscs[i]), max_mat,
            )
            assert (int(s2[i]), int(t2[i])) == (es, et), f"problem {i}"
