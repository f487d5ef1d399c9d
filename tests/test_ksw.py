"""Tests for the scalar DP oracles vs brute-force DP."""

import numpy as np
import pytest

from arachne_tpu.align import ksw
from arachne_tpu.config import MemOptions

OPT = MemOptions()
MAT = OPT.scoring_matrix()


def mutate(rng, seq, n_sub=0, n_ins=0, n_del=0):
    s = list(seq)
    for _ in range(n_sub):
        i = rng.integers(0, len(s))
        s[i] = (s[i] + 1 + rng.integers(0, 3)) % 4
    for _ in range(n_ins):
        i = rng.integers(0, len(s))
        s.insert(i, rng.integers(0, 4))
    for _ in range(n_del):
        i = rng.integers(0, len(s) - 1)
        del s[i]
    return np.array(s, dtype=np.uint8)


class TestGlobal:
    def test_exact_match(self, rng):
        q = rng.integers(0, 4, 50).astype(np.uint8)
        score, cig = ksw.global2(q, q, MAT, 6, 1, 6, 1, 100)
        assert score == 50
        assert cig == [(0, 50)]

    def test_matches_brute_force(self, rng):
        for _ in range(20):
            t = rng.integers(0, 4, int(rng.integers(20, 80))).astype(np.uint8)
            q = mutate(rng, t, n_sub=3, n_ins=1, n_del=1)
            score, cig = ksw.global2(q, t, MAT, 6, 1, 6, 1, 100)
            expect = ksw.brute_global(q, t, MAT, 6, 1, 6, 1)
            assert score == expect
            # cigar consistency: q-consuming == qlen, t-consuming == tlen
            qc = sum(l for op, l in cig if op in (0, 1))
            tc = sum(l for op, l in cig if op in (0, 2))
            assert qc == len(q) and tc == len(t)

    def test_cigar_rescoring(self, rng):
        """Walking the CIGAR over the sequences reproduces the score."""
        for _ in range(10):
            t = rng.integers(0, 4, 60).astype(np.uint8)
            q = mutate(rng, t, n_sub=2, n_ins=1, n_del=1)
            score, cig = ksw.global2(q, t, MAT, 6, 1, 6, 1, 100)
            s, qi, ti = 0, 0, 0
            for op, l in cig:
                if op == 0:
                    for k in range(l):
                        s += MAT[t[ti + k], q[qi + k]]
                    qi += l
                    ti += l
                elif op == 1:
                    s -= 6 + 1 * l
                    qi += l
                else:
                    s -= 6 + 1 * l
                    ti += l
            assert s == score

    def test_band_limits_gaps(self, rng):
        # a 10-base deletion with w=3 cannot be found; w=20 can
        t = rng.integers(0, 4, 80).astype(np.uint8)
        q = np.concatenate([t[:40], t[50:]])
        s_wide, _ = ksw.global2(q, t, MAT, 6, 1, 6, 1, 20)
        s_narrow, _ = ksw.global2(q, t, MAT, 6, 1, 6, 1, 3)
        assert s_wide > s_narrow
        assert s_wide == 70 - 6 - 10  # 70 matches - gap open - 10 extends


class TestLocal:
    def test_matches_brute(self, rng):
        for _ in range(15):
            t = rng.integers(0, 4, int(rng.integers(40, 150))).astype(np.uint8)
            sub = t[10:40]
            q = mutate(rng, sub, n_sub=2, n_ins=1)
            r = ksw.local_sw(q, t, MAT, 6, 1, 6, 1)
            expect, bi, bj = ksw.brute_local_sw(q, t, MAT, 6, 1, 6, 1)
            assert r.score == expect
            assert r.te == bi

    def test_align2_coordinates(self, rng):
        t = rng.integers(0, 4, 200).astype(np.uint8)
        q = t[50:100].copy()
        r = ksw.align2(q, t, MAT, 6, 1, 6, 1, ksw.KSW_XSTART)
        assert r.score == 50
        assert r.tb == 50 and r.te == 99
        assert r.qb == 0 and r.qe == 49

    def test_score2_second_hit(self, rng):
        # plant the same 30-mer twice, far apart
        t = rng.integers(0, 4, 300).astype(np.uint8)
        t[200:230] = t[20:50]
        q = t[20:50].copy()
        r = ksw.local_sw(q, t, MAT, 6, 1, 6, 1, minsc=19)
        assert r.score == 30
        assert r.score2 == 30
        assert {r.te, r.te2} == {49, 229}

    def test_xbyte_cap(self, rng):
        t = rng.integers(0, 4, 400).astype(np.uint8)
        q = t[:300].copy()
        r = ksw.align2(q, t, MAT, 6, 1, 6, 1, ksw.KSW_XBYTE | ksw.KSW_XSTART)
        assert r.score == 255  # saturated


class TestExtend:
    def test_perfect_extension(self, rng):
        ref = rng.integers(0, 4, 200).astype(np.uint8)
        q = ref[:100].copy()
        score, qle, tle, gtle, gscore, max_off = ksw.extend2(
            q, ref, MAT, 6, 1, 6, 1, 100, 5, 100, h0=19
        )
        # extending a 19-score seed across 100 perfect bases: 19 + 100
        assert score == 119
        assert qle == 100 and tle == 100
        assert gscore == 119 and gtle == 100
        assert max_off == 0

    def test_extension_with_mismatches(self, rng):
        ref = rng.integers(0, 4, 150).astype(np.uint8)
        q = ref[:80].copy()
        q[40] = (q[40] + 1) % 4
        score, qle, tle, gtle, gscore, _ = ksw.extend2(q, ref, MAT, 6, 1, 6, 1, 100, 5, 100, h0=19)
        assert score == 19 + 80 - 5  # one mismatch: -4 penalty, +1 lost match
        assert gscore == score and qle == 80

    def test_zdrop_stops_extension(self, rng):
        # query diverges completely after 30 bases
        ref = rng.integers(0, 4, 300).astype(np.uint8)
        q = np.concatenate([ref[:30], (ref[30:160] + 2) % 4]).astype(np.uint8)
        score, qle, tle, _, _, _ = ksw.extend2(q, ref, MAT, 6, 1, 6, 1, 100, 5, 100, h0=19)
        assert score == 19 + 30
        assert qle == 30 and tle == 30

    def test_local_vs_global_choice_data(self, rng):
        """gscore (to-end) < score (local) when the tail diverges."""
        ref = rng.integers(0, 4, 100).astype(np.uint8)
        q = ref[:60].copy()
        q[50:] = (q[50:] + 2) % 4  # last 10 bases mismatch
        score, qle, tle, gtle, gscore, _ = ksw.extend2(q, ref, MAT, 6, 1, 6, 1, 100, 5, 100, h0=19)
        assert score == 19 + 50
        assert qle == 50
        # to-end forced: 19 + 50 - 10*4... (10 mismatches from 50)
        assert gscore <= score - 5  # worse than local minus clip penalty

    def test_banded_equals_brute_extension(self, rng):
        """Against a simple full-DP extension scorer."""
        for _ in range(10):
            ref = rng.integers(0, 4, 120).astype(np.uint8)
            q = mutate(rng, ref[:70], n_sub=3, n_ins=1, n_del=1)
            h0 = 19
            score, qle, tle, gtle, gscore, _ = ksw.extend2(
                q, ref, MAT, 6, 1, 6, 1, 100, 5, 100, h0=h0
            )
            # brute: H(0,0)=h0; local-max semantics with M-zero quirk is hard
            # to write independently, so check invariants instead:
            assert score >= h0  # never below the seed score
            assert 0 <= qle <= len(q) and 0 <= tle <= len(ref)
            if gscore >= 0:
                assert gscore <= score + 0  # to-end never beats local max
