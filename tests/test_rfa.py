"""Tests for the RFA engine: scoring, molecules, optimizer, mapq, dup, split."""

import numpy as np
import pytest

from arachne_tpu.config import ArachneConfig
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference, unpack_2bit
from arachne_tpu.rfa import (
    FastQRecordView,
    OrderedMap,
    do_rfa_for_one_barcode,
    worth_running_rfa,
)
from arachne_tpu.rfa.scoring import is_pair, score_alignment
from arachne_tpu.rfa.types import Alignment

CFG = ArachneConfig()

BASES = np.array(list("ACGT"))


def to_str(codes):
    return "".join(BASES[codes])


@pytest.fixture(scope="module")
def genome(small_reference):
    packed = pack_reference(small_reference)
    fm = build_fmindex(packed)
    idx = FMIndex(packed, fm)
    fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
    return idx, fwd


def make_pairs(fwd, positions, frag=250, rlen=100, name_prefix="r", barcode=b"A01C23B45D67"):
    """Make proper FR pairs from fragment start positions."""
    recs = []
    for i, pos in enumerate(positions):
        fragment = fwd[pos : pos + frag]
        r1 = fragment[:rlen]
        r2 = (3 - fragment[frag - rlen :][::-1]).astype(np.uint8)
        recs.append(
            FastQRecordView(
                read1=to_str(r1).encode(),
                qual1=b"I" * rlen,
                read2=to_str(r2).encode(),
                qual2=b"I" * rlen,
                barcode=barcode,
                valid=True,
                read_info=f"{name_prefix}{i}",
                read_group="",
            )
        )
    return recs


class TestOrderedMap:
    def test_swap_remove_order(self):
        om = OrderedMap()
        for k in [10, 20, 30, 40]:
            om.set(k, k * 2)
        om.delete(20)
        # swap-remove: last element (40) moved into deleted slot
        assert om.iter_keys() == [10, 40, 30]
        assert om.iter_values() == [20, 80, 60]
        assert om.get(40) == 80
        assert om.get(20) is None
        om.delete(10)
        assert om.iter_keys() == [30, 40]

    def test_set_overwrites(self):
        om = OrderedMap()
        om.set(1, "a")
        om.set(1, "b")
        assert len(om) == 1 and om.get(1) == "b"


class TestScoring:
    def _aln(self, **kw):
        return Alignment(**kw)

    def test_is_pair_window(self):
        f = self._aln(contig="c", pos=1000, reversed_=False)
        r = self._aln(contig="c", pos=1500, reversed_=True)
        assert is_pair(f, r)
        r.pos = 1000 + 750
        assert not is_pair(f, r)  # 750 is exclusive
        r.pos = 1000 - 35
        assert is_pair(f, r)
        r.pos = 1000 - 36
        assert not is_pair(f, r)
        r.reversed_ = False
        r.pos = 1500
        assert not is_pair(f, r)  # same strand

    def test_score_alignment_penalties(self):
        a = self._aln(contig="c", pos=100, mismatches=2, indels=1)
        m = self._aln(contig="c", pos=300, reversed_=True)
        s = score_alignment(a, m, 0.0, -4.0)
        assert s == 2 * -2.0 + 1 * -3.0  # proper pair, no improper penalty
        s_single = score_alignment(a, None, 0.0, -4.0)
        assert s_single == -7.0 - 4.0
        a.soft_clipped = 1
        a.soft_clipped_length = 10
        s2 = score_alignment(a, m, 0.0, -4.0)
        assert s2 == -7.0 - 5.0 - 5.0


class TestWorthRunning:
    def test_gates(self):
        recs = [FastQRecordView(barcode=b"AAA") for _ in range(5)]
        assert worth_running_rfa(recs, True, CFG)
        assert not worth_running_rfa(recs, False, CFG)
        assert not worth_running_rfa(recs[:4], True, CFG)
        assert not worth_running_rfa([], True, CFG)
        strict = CFG.replace(rfa=CFG.rfa.__class__(require_dash_in_barcode=True))
        assert not worth_running_rfa(recs, True, strict)
        dashed = [FastQRecordView(barcode=b"AAA-1") for _ in range(5)]
        assert worth_running_rfa(dashed, True, strict)


class TestEngine:
    def test_single_molecule_barcode(self, genome):
        idx, fwd = genome
        # 6 pairs from one 2kb molecule region on chr1
        positions = [2000, 2200, 2400, 2600, 2800, 3000]
        recs = make_pairs(fwd, positions)
        res = do_rfa_for_one_barcode(idx, CFG, recs, unique_barcode=True)
        assert res.ran_rfa
        assert res.n_molecules >= 1
        # every read must have exactly one active alignment
        for read_id, alist in enumerate(res.alignments):
            actives = [a for a in alist if a.active]
            assert len(actives) == 1, f"read {read_id}"
        # active alignments should be near the truth
        for i, pos in enumerate(positions):
            r1_actives = [a for a in res.alignments[2 * i] if a.active]
            contig_off = 0
            assert abs(r1_actives[0].pos - pos) < 5

    def test_mapq_reasonable_for_unique_reads(self, genome):
        idx, fwd = genome
        positions = [2000, 2200, 2400, 2600, 2800]
        recs = make_pairs(fwd, positions)
        res = do_rfa_for_one_barcode(idx, CFG, recs, unique_barcode=True)
        for alist in res.alignments:
            a = next(x for x in alist if x.active)
            assert a.mapq >= 30, (a.pos, a.mapq, a.contig)

    def test_non_rfa_path(self, genome):
        idx, fwd = genome
        recs = make_pairs(fwd, [1800, 2600])
        res = do_rfa_for_one_barcode(idx, CFG, recs, unique_barcode=True)
        assert not res.ran_rfa  # < 5 read pairs
        for alist in res.alignments:
            assert sum(1 for a in alist if a.active) == 1

    def test_rfa_rescues_repeat_read(self, genome):
        """A read in the planted repeat (chr1 400:700 == 1200:1500) should be
        pulled toward the copy where its barcode's molecule lives."""
        idx, fwd = genome
        # molecule spans 300..900: several unique-flank pairs + one pair
        # whose R1 lies inside the repeat copy at 450
        positions = [300, 350, 500, 550, 600, 650]
        recs = make_pairs(fwd, positions, frag=220, rlen=90)
        res = do_rfa_for_one_barcode(idx, CFG, recs, unique_barcode=True)
        assert res.ran_rfa
        # the pair sampled at 500/550 has R1 inside the 400-700 repeat; RFA
        # should keep it with the molecule (position ~500, not ~1300)
        for i, pos in enumerate(positions):
            actives = [a for a in res.alignments[2 * i] if a.active]
            assert actives
            assert abs(actives[0].pos - pos) < 30, (i, pos, actives[0].pos)

    def test_duplicates_marked(self, genome):
        idx, fwd = genome
        recs = make_pairs(fwd, [2000, 2000, 2300, 2500, 2700])
        res = do_rfa_for_one_barcode(idx, CFG, recs, unique_barcode=True)
        actives = [a for alist in res.alignments for a in alist if a.active]
        dups = [a for a in actives if a.duplicate]
        assert len(dups) == 2  # both sides of the duplicated pair


class TestOptimizerSemantics:
    """Hand-computed fastScore/acceptMove cases (aligner.go:1109-1298)."""

    def _mol(self, mol_id, alns):
        from arachne_tpu.rfa.types import CandidateMolecule, OrderedMap

        m = CandidateMolecule(id=mol_id)
        for a in alns:
            amap = OrderedMap()
            amap.set(a.id, a)
            m.alignments.set(a.read_id, amap)
        return m

    def test_fast_score_alignment_delta(self):
        from arachne_tpu.rfa.optimizer import fast_score
        from arachne_tpu.rfa.types import Alignment, OrderedMap

        # source has one active read with log-prob -6; sink offers -2
        src_aln = Alignment(id=0, read_id=0, mate_id=1, contig="c", pos=100,
                            log_alignment_probability=-6.0)
        sink_aln = Alignment(id=1, read_id=0, mate_id=1, contig="c", pos=900_000,
                             log_alignment_probability=-2.0)
        source = self._mol(0, [src_aln])
        sink = self._mol(1, [sink_aln])
        source.active_alignments = OrderedMap()
        source.active_alignments.set(0, src_aln)
        source.best_alignment_for_read = OrderedMap()
        source.best_alignment_for_read.set(0, src_aln)
        sink.active_alignments = OrderedMap()
        sink.best_alignment_for_read = OrderedMap()
        sink.best_alignment_for_read.set(0, sink_aln)
        change, move = fast_score(source, sink, -4.0)
        # single unpaired read: alignment delta -2 - (-6) = 4; sink was
        # empty so a -3 birth bonus applies; source empties: -(-3)
        assert move.num_moved == 1
        assert change == 4.0 + 3.0 - 3.0
        assert move.to_delete == [0]

    def test_accept_move_transfers_active(self):
        from arachne_tpu.rfa.optimizer import accept_move, fast_score
        from arachne_tpu.rfa.types import Alignment, OrderedMap

        src_aln = Alignment(id=0, read_id=0, mate_id=1, contig="c", pos=1,
                            log_alignment_probability=-9.0, active=True,
                            mismatch_locs=[11, 12])
        sink_aln = Alignment(id=1, read_id=0, mate_id=1, contig="c", pos=2,
                             log_alignment_probability=-1.0, mismatch_locs=[55])
        source = self._mol(0, [src_aln])
        sink = self._mol(1, [sink_aln])
        source.active_alignments = OrderedMap()
        source.active_alignments.set(0, src_aln)
        source.best_alignment_for_read = OrderedMap()
        source.best_alignment_for_read.set(0, src_aln)
        source.mismatch_locs = {11: 1, 12: 1}
        sink.active_alignments = OrderedMap()
        sink.best_alignment_for_read = OrderedMap()
        sink.best_alignment_for_read.set(0, sink_aln)
        _, move = fast_score(source, sink, -4.0)
        accept_move(move)
        assert not src_aln.active and sink_aln.active
        assert len(source.active_alignments) == 0
        assert sink.active_alignments.get(0) is sink_aln
        assert source.mismatch_locs == {11: 0, 12: 0}
        assert sink.mismatch_locs == {55: 1}

    def test_is_active_molecule_thresholds(self):
        from arachne_tpu.rfa.optimizer import is_active_molecule
        from arachne_tpu.rfa.types import Alignment, CandidateMolecule, OrderedMap

        m = CandidateMolecule()
        m.active_alignments = OrderedMap()
        m.best_alignment_for_read = OrderedMap()
        for i in range(5):
            a = Alignment(id=i, read_id=i)
            m.active_alignments.set(i, a)
        for i in range(20):
            m.best_alignment_for_read.set(i, Alignment(id=100 + i, read_id=i))
        # 5 active > 4, density 5/20 = 0.25 >= 0.1 -> active
        assert is_active_molecule(m, 0)
        # removing one -> 4 active, fails the > 4 rule
        assert not is_active_molecule(m, -1)
        # density rule: 5/60 < 0.1 -> inactive
        for i in range(20, 60):
            m.best_alignment_for_read.set(i, Alignment(id=200 + i, read_id=i))
        assert not is_active_molecule(m, 0)


class TestMergeGenerations:
    def test_sam_merge(self, tmp_path):
        from arachne_tpu.io.merge import merge_generations

        d = tmp_path / "out"
        d.mkdir()
        (d / "bc_sorted_bam.sam").write_text("@HD\tVN:1.6\nr1\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tIIII\n")
        (d / "bc_sorted_bam.gen1.sam").write_text("@HD\tVN:1.6\nr2\t0\tc\t9\t60\t4M\t*\t0\t0\tACGT\tIIII\n")
        n = merge_generations(str(d))
        assert n == 1
        text = (d / "bc_sorted_bam.sam").read_text()
        assert "r1\t" in text and "r2\t" in text
        assert text.count("@HD") == 1
        assert not (d / "bc_sorted_bam.gen1.sam").exists()
