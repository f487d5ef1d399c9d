"""Tests for SMEM seeding, chaining, extension and the full single/pair
candidate pipeline against ground-truth reads sampled from the reference."""

import numpy as np
import pytest

from arachne_tpu.align import (
    align_pair_with_rescue,
    align_single,
    collect_seeds,
    mem_chain,
    chain_filter,
    reg2aln,
    seq_to_codes,
)
from arachne_tpu.align.smem import smem1a
from arachne_tpu.config import InsertSizeModel, MemOptions
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference, unpack_2bit

OPT = MemOptions()
PES = InsertSizeModel()


@pytest.fixture(scope="module")
def ref(small_reference):
    packed = pack_reference(small_reference)
    fm = build_fmindex(packed)
    idx = FMIndex(packed, fm)
    fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
    return idx, fwd


def sample_read(rng, fwd, length=100, contig_range=None):
    pos = int(rng.integers(0, len(fwd) - length))
    return pos, fwd[pos : pos + length].copy()


def revcomp(codes):
    return (3 - codes[::-1]).astype(np.uint8)


class TestSMEM:
    def test_smem_covers_position(self, ref, rng):
        idx, fwd = ref
        for _ in range(5):
            pos, read = sample_read(rng, fwd, 80)
            _, mems = smem1a(idx, read, 40, 1)
            assert mems, "a unique read position must yield an SMEM"
            for m in mems:
                assert m.qb <= 40 < m.qe  # SMEMs cover the pivot

    def test_smem_hits_are_real_matches(self, ref, rng):
        idx, fwd = ref
        codes2 = np.concatenate([fwd, revcomp(fwd)])
        pos, read = sample_read(rng, fwd, 90)
        mems = collect_seeds(idx, read, OPT)
        assert mems
        for m in mems[:10]:
            rows = np.arange(m.k, m.k + min(m.s, 5))
            for rbeg in idx.sa(rows):
                assert np.array_equal(codes2[rbeg : rbeg + m.length], read[m.qb : m.qe])

    def test_unique_read_yields_full_length_smem(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 100)
        mems = collect_seeds(idx, read, OPT)
        full = [m for m in mems if m.length == 100]
        if full:  # unique region: whole read is one SMEM
            assert any(m.s >= 1 for m in full)


class TestChain:
    def test_chain_for_clean_read(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 100)
        chains = mem_chain(idx, read, OPT)
        assert chains
        kept = chain_filter(OPT, chains)
        assert kept
        # the top-weight chain should be at the sampled position (fwd strand)
        best = kept[0]
        assert best.w >= 50

    def test_short_query_no_chains(self, ref):
        idx, _ = ref
        assert mem_chain(idx, np.zeros(10, dtype=np.uint8), OPT) == []


class TestAlignSingle:
    def test_perfect_forward_read(self, ref, rng):
        idx, fwd = ref
        for _ in range(5):
            pos, read = sample_read(rng, fwd, 100)
            regs = align_single(idx, OPT, read)
            assert regs
            best = regs[0]
            assert best.score == 100
            assert best.rb == pos and best.re == pos + 100
            assert best.qb == 0 and best.qe == 100

    def test_reverse_read(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 100)
        rc = revcomp(read)
        regs = align_single(idx, OPT, rc)
        assert regs
        best = regs[0]
        assert best.score == 100
        # reverse-strand coordinates map back to [pos, pos+100)
        l2 = idx.l_pac * 2
        assert l2 - best.re == pos
        assert l2 - best.rb == pos + 100

    def test_read_with_mismatches(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 100)
        read[30] = (read[30] + 1) % 4
        read[60] = (read[60] + 2) % 4
        regs = align_single(idx, OPT, read)
        assert regs
        assert regs[0].score == 100 - 2 * 5  # two mismatches: -4 each +1 lost
        assert regs[0].rb == pos

    def test_reg2aln_cigar(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 100)
        regs = align_single(idx, OPT, read)
        aln = reg2aln(idx, OPT, read, regs[0])
        assert aln.cigar == [(0, 100)]
        assert aln.NM == 0
        rid = regs[0].rid
        assert aln.pos == pos - idx.packed.anns[rid].offset
        assert not aln.is_rev

    def test_reg2aln_reverse_with_indel(self, ref, rng):
        idx, fwd = ref
        pos, read = sample_read(rng, fwd, 120)
        # delete 3 bases from the middle of the read
        read_del = np.concatenate([read[:60], read[63:]])
        rc = revcomp(read_del)
        regs = align_single(idx, OPT, rc)
        assert regs
        aln = reg2aln(idx, OPT, rc, regs[0])
        assert aln.is_rev
        ops = [op for op, _ in aln.cigar]
        assert 2 in ops  # deletion present
        assert aln.NM == 3
        # reference span = 120, query span = 117
        ref_span = sum(l for op, l in aln.cigar if op in (0, 2))
        q_span = sum(l for op, l in aln.cigar if op in (0, 1, 3))
        assert ref_span == 120
        assert q_span == 117

    def test_repeat_region_multiple_hits(self, ref, rng):
        idx, fwd = ref
        # conftest plants chr1[400:700] again at chr1[1200:1500]
        read = fwd[450:550].copy()
        regs = align_single(idx, OPT, read)
        assert len(regs) >= 2
        tops = sorted(r.rb for r in regs if r.score == regs[0].score)
        assert len(tops) >= 2


class TestPairRescue:
    def test_proper_pair_alignment(self, ref, rng):
        idx, fwd = ref
        pos, frag = sample_read(rng, fwd, 300)
        r1 = frag[:100].copy()
        r2 = revcomp(frag[200:300])
        a1, a2 = align_pair_with_rescue(idx, OPT, PES, r1, r2)
        assert a1 and a2
        contig_off = idx.packed.anns[a1[0].rid].offset
        assert a1[0].offset == pos - contig_off
        assert not a1[0].reversed_
        assert a2[0].reversed_
        # reverse-hit offset is the rightmost base (bridge convention)
        assert a2[0].offset == pos + 299 - contig_off

    def test_rescue_recovers_mutated_mate(self, ref):
        idx, fwd = ref
        pos, frag = sample_read(np.random.default_rng(7), fwd, 280)
        r1 = frag[:100].copy()
        r2full = revcomp(frag[180:280])
        # heavily mutate r2's seeds: every 12th base, so no 19bp exact seed
        r2 = r2full.copy()
        for i in range(0, 100, 12):
            r2[i] = (r2[i] + 1) % 4
        direct = align_single(idx, OPT, r2)
        a1, a2 = align_pair_with_rescue(idx, OPT, PES, r1, r2)
        # mate rescue must find r2 near r1 even though seeding fails
        assert not direct or max(r.score for r in direct) < 60
        assert a2, "rescue should produce an alignment"
        best2 = a2[0]
        assert best2.reversed_
        # local SW clips mutated edge bases, so allow one mutation period
        contig_off = idx.packed.anns[best2.rid].offset
        assert abs((best2.aend + 1) - (pos + 180 - contig_off)) <= 12


class TestChainNative:
    def test_chain_native_parity(self, ref, rng):
        """Native chain_batch == Python mem_chain+chain_filter chain-for-chain,
        seed-for-seed, including the pre-fetched extension window."""
        from arachne_tpu.align.chain import mem_chain_batch, chain_filter
        from arachne_tpu.align.chain_native import mem_chain_batch_native
        from arachne_tpu.native import chain_available
        from arachne_tpu.ops.batch import _chain_window

        if not chain_available():
            pytest.skip("native chain library unavailable")
        idx, fwd = ref
        reads = []
        r = np.random.default_rng(42)
        for _ in range(60):
            pos, codes = sample_read(r, fwd, int(r.integers(30, 150)))
            codes = codes.copy()
            nmut = int(r.integers(0, 5))
            for m in r.integers(0, len(codes), nmut):
                codes[m] = (codes[m] + 1) % 4
            if r.random() < 0.5:
                codes = revcomp(codes)
            reads.append(codes)
        reads.append(np.zeros(5, np.uint8))  # below min_seed_len
        all_mems = [collect_seeds(idx, q, OPT) for q in reads]
        nat = mem_chain_batch_native(idx, reads, OPT, all_mems)
        py = [chain_filter(OPT, c) for c in mem_chain_batch(idx, reads, OPT, all_mems)]
        assert nat is not None
        for q, cn, cp in zip(reads, nat, py):
            assert len(cn) == len(cp)
            for a, b in zip(cn, cp):
                assert (a.pos, a.rid, a.w, a.kept) == (b.pos, b.rid, b.w, b.kept)
                assert abs(a.frac_rep - b.frac_rep) < 1e-6
                assert [(s.rbeg, s.qbeg, s.len, s.score) for s in a.seeds] == [
                    (s.rbeg, s.qbeg, s.len, s.score) for s in b.seeds
                ]
                ws, w0 = _chain_window(idx, q, b, OPT)
                assert a.win_rmax0 == w0
                assert np.array_equal(a.win_seq, ws)

    def test_filtered_seeds_invalidate_prefetched_window(self, ref, monkeypatch):
        """mem_flt_chained_seeds drops a seed -> the native path's
        pre-fetched rmax window (computed over ALL seeds, like the
        reference computes it AFTER the filter) must be refetched."""
        import arachne_tpu.align.chain as chain_mod
        from arachne_tpu.align.chain import Chain, Seed, filter_chained_seeds
        from arachne_tpu.config import MemOptions

        idx, fwd = ref
        opt = MemOptions(min_chain_weight=1)  # activates the seed filter
        q = fwd[:60].copy()
        c = Chain(
            pos=0, rid=0,
            seeds=[Seed(rbeg=0, qbeg=0, len=30, score=30),
                   Seed(rbeg=1000, qbeg=30, len=30, score=30)],
        )
        c.win_seq = np.zeros(8, np.uint8)
        c.win_rmax0 = 0
        # drop the second seed regardless of its SW score
        monkeypatch.setattr(
            chain_mod, "_seed_sw",
            lambda idx_, q_, s, opt_, mat: 0 if s.rbeg else -1,
        )
        filter_chained_seeds(idx, q, [c], opt)
        assert len(c.seeds) == 1
        assert c.win_seq is None  # stale window cleared
