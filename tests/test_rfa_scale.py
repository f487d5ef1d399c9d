"""RFA at scale: neighborhood-restricted optimizer equivalence + the
30k-read-barcode wall-time budget (SURVEY.md 7 "hard parts": the
O(n_mol^2 * reads) fastScore blow-up, aligner.go:1065-1237, :697-720).
"""

import time

import numpy as np
import pytest

from arachne_tpu.config import ArachneConfig
from arachne_tpu.rfa.candidates import FastQRecordView
from arachne_tpu.rfa.engine import _finish_barcode
from arachne_tpu.rfa.types import Alignment, MapQData

CFG = ArachneConfig()


def _synthetic_barcode(n_mols, pairs_per_mol, decoy_every=3, contig="chrS"):
    """Build candidate alignment lists shaped like GetAlignments output:
    proper FR pairs along `n_mols` molecule loci 100 kb apart; every
    `decoy_every`-th pair also carries a lower-probability decoy candidate
    at ANOTHER molecule's locus (so molecules share candidate reads and
    the optimizer has real moves to weigh)."""
    alignments = []
    reads = []
    aln_id = 0
    rng = np.random.default_rng(7)
    for m in range(n_mols):
        base = 100_000 * m
        for p in range(pairs_per_mol):
            i = len(alignments)  # read_id of R1; R2 is i+1
            pos1 = base + 40 * p
            pos2 = pos1 + 150
            name = f"r{m}_{p}"
            a1 = Alignment(
                id=aln_id, read_id=i, mate_id=i + 1, read1=True, read_name=name,
                contig=contig, pos=pos1, aend=pos1 + 100, score=100,
                log_alignment_probability=-1.0, mapq_data=MapQData(),
            )
            a2 = Alignment(
                id=aln_id + 1, read_id=i + 1, mate_id=i, read1=False, read_name=name,
                contig=contig, pos=pos2, aend=pos2 + 100, score=100,
                reversed_=True, log_alignment_probability=-1.0, mapq_data=MapQData(),
            )
            aln_id += 2
            l1, l2 = [a1], [a2]
            if p % decoy_every == 0:
                dm = int(rng.integers(0, n_mols))
                dbase = 100_000 * dm + 40 * int(rng.integers(0, pairs_per_mol))
                d1 = Alignment(
                    id=aln_id, read_id=i, mate_id=i + 1, read1=True, read_name=name,
                    contig=contig, pos=dbase, aend=dbase + 100, score=90,
                    mismatches=2, log_alignment_probability=-5.0,
                    mapq_data=MapQData(),
                )
                aln_id += 1
                l1.append(d1)
            alignments.append(l1)
            alignments.append(l2)
            reads.append(
                FastQRecordView(
                    read1=b"A" * 100, qual1=b"I" * 100,
                    read2=b"A" * 100, qual2=b"I" * 100,
                    barcode=b"A01C01B01D01", valid=True,
                    read_info=name, read_group="",
                )
            )
    return alignments, reads


def _snapshot(result):
    out = []
    for alist in result.alignments:
        out.append(
            [
                (a.pos, a.active, a.mapq, a.molecule_id, a.is_proper, a.duplicate)
                for a in alist
            ]
        )
    return out


class TestNeighborhoodEquivalence:
    def test_identical_to_all_pairs_scan(self, monkeypatch):
        """The read-sharing neighborhood restriction must not change ANY
        output: run the full RFA tail twice, once with the neighborhoods
        forced to the all-pairs lists (the reference's literal O(n^2)
        scan), and compare every alignment's state."""
        import arachne_tpu.rfa.optimizer as opt_mod

        alns1, reads = _synthetic_barcode(12, 10)
        res1 = _finish_barcode(None, CFG, reads, True, alns1, [[] for _ in alns1], "BC")

        real = opt_mod.sink_neighborhoods

        def all_pairs(mols):
            return [[j for j in range(len(mols)) if j != i] for i in range(len(mols))]

        monkeypatch.setattr(opt_mod, "sink_neighborhoods", all_pairs)
        alns2, reads2 = _synthetic_barcode(12, 10)
        res2 = _finish_barcode(None, CFG, reads2, True, alns2, [[] for _ in alns2], "BC")
        monkeypatch.setattr(opt_mod, "sink_neighborhoods", real)
        assert _snapshot(res1) == _snapshot(res2)
        assert res1.n_molecules == res2.n_molecules


class TestThirtyKBarcode:
    def test_wall_time_budget(self):
        """A full 30k-read barcode (the reader.go:236 cap) through the RFA
        tail must run in seconds, not minutes."""
        alns, reads = _synthetic_barcode(100, 150)  # 15k pairs = 30k reads
        assert len(alns) == 30_000
        t0 = time.perf_counter()
        res = _finish_barcode(None, CFG, reads, True, alns, [[] for _ in alns], "BC")
        dt = time.perf_counter() - t0
        assert res.ran_rfa
        assert res.n_molecules >= 100
        # every read keeps exactly one active alignment
        for alist in res.alignments:
            assert sum(1 for a in alist if a.active) == 1
        assert dt < 60.0, f"30k-read RFA took {dt:.1f}s"
