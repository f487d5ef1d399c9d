"""Device-kernel parity tests: batched extension vs the scalar oracle."""

import numpy as np
import pytest

from arachne_tpu.align import align_single, ksw
from arachne_tpu.config import MemOptions
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference, unpack_2bit
from arachne_tpu.ops.sw_extend import BatchExtender, clamp_band
from arachne_tpu.ops.batch import batch_align_single

OPT = MemOptions()
MAT = OPT.scoring_matrix()


def random_problem(rng, qlen, tlen, mutations=0, insertion=0, deletion=0):
    t = rng.integers(0, 4, tlen).astype(np.uint8)
    q = t[: min(qlen, tlen)].copy()
    for _ in range(mutations):
        i = rng.integers(0, len(q))
        q[i] = (q[i] + 1 + rng.integers(0, 3)) % 4
    s = list(q)
    for _ in range(insertion):
        s.insert(int(rng.integers(0, len(s))), int(rng.integers(0, 4)))
    for _ in range(deletion):
        del s[int(rng.integers(0, len(s) - 1))]
    q = np.array(s[:qlen], dtype=np.uint8)
    return q, t


class TestExtendBatchParity:
    def test_against_oracle_random(self, rng):
        be = BatchExtender(OPT, qmax=128, tmax=192)
        problems = []
        for trial in range(60):
            qlen = int(rng.integers(10, 120))
            tlen = int(rng.integers(qlen, 180))
            q, t = random_problem(
                rng, qlen, tlen,
                mutations=int(rng.integers(0, 6)),
                insertion=int(rng.integers(0, 2)),
                deletion=int(rng.integers(0, 2)),
            )
            h0 = int(rng.integers(15, 40))
            eb = 5
            w = 100
            problems.append((q, t, w, eb, h0))
            be.submit(q, t, w, eb, h0)
        got = be.run()
        for (q, t, w, eb, h0), res in zip(problems, got):
            wc = clamp_band(OPT, len(q), w, eb, 1)
            expect = ksw.extend2(
                q, t, MAT, OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins,
                wc, eb, OPT.zdrop, h0,
            )
            assert res == expect, (len(q), len(t), h0, res, expect)

    def test_zdrop_parity(self, rng):
        """Problems engineered to trigger z-drop mid-extension."""
        be = BatchExtender(OPT, qmax=192, tmax=256)
        problems = []
        for trial in range(15):
            t = rng.integers(0, 4, 250).astype(np.uint8)
            q = t[:150].copy()
            cut = int(rng.integers(30, 100))
            q[cut:] = (q[cut:] + 2) % 4  # diverge completely after cut
            h0 = 19
            problems.append((q, t, 100, 5, h0))
            be.submit(q, t, 100, 5, h0)
        for (q, t, w, eb, h0), res in zip(problems, be.run()):
            wc = clamp_band(OPT, len(q), w, eb, 1)
            expect = ksw.extend2(q, t, MAT, 6, 1, 6, 1, wc, eb, OPT.zdrop, h0)
            assert res == expect

    def test_band_retry_widths(self, rng):
        """Same problems at w and 2w (the band-doubling retry pair)."""
        be = BatchExtender(OPT, qmax=160, tmax=320)
        t = rng.integers(0, 4, 300).astype(np.uint8)
        # big deletion: query skips 60 target bases
        q = np.concatenate([t[:70], t[130:200]]).astype(np.uint8)
        for w in (100, 200):
            be.submit(q, t, w, 5, 19)
        r100, r200 = be.run()
        for w, res in [(100, r100), (200, r200)]:
            wc = clamp_band(OPT, len(q), w, 5, 1)
            expect = ksw.extend2(q, t, MAT, 6, 1, 6, 1, wc, 5, OPT.zdrop, 19)
            assert res == expect


class TestBatchAlignSingle:
    @pytest.fixture(scope="class")
    def ref(self, small_reference):
        packed = pack_reference(small_reference)
        fm = build_fmindex(packed)
        idx = FMIndex(packed, fm)
        fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
        return idx, fwd

    def test_identical_to_scalar_engine(self, ref, rng):
        idx, fwd = ref
        reads = []
        for _ in range(12):
            pos = int(rng.integers(0, len(fwd) - 130))
            read = fwd[pos : pos + 120].copy()
            nmut = int(rng.integers(0, 4))
            for _ in range(nmut):
                i = int(rng.integers(0, 120))
                read[i] = (read[i] + 1) % 4
            if rng.integers(0, 2):
                read = (3 - read[::-1]).astype(np.uint8)
            reads.append(read)
        batched = batch_align_single(idx, OPT, reads)
        for read, regs_b in zip(reads, batched):
            regs_s = align_single(idx, OPT, read)
            assert len(regs_b) == len(regs_s)
            for rb, rs in zip(regs_b, regs_s):
                assert (rb.rb, rb.re, rb.qb, rb.qe, rb.score, rb.truesc, rb.w) == (
                    rs.rb, rs.re, rs.qb, rs.qe, rs.score, rs.truesc, rs.w
                )
