"""The decisive RFA fixture: barcode-joint alignment must CHANGE the output.

Round-3 finding: on every fixture tried, RFA-on and RFA-off produced
identical records — paired-end + flank evidence resolved everything
molecule context would have.  This fixture follows that study's
prescription for ambiguity only molecules can break (see
io/simulate.py:make_rfa_decisive_fixture): exact repeat copies > 50 kb
apart, interior pairs with zero flank evidence, an anchored true-copy
molecule, zero coverage at the decoy copy.

Assertions: RFA-off coin-flips the interior pairs between copies at
mapq ~3 (aligner.go:1415-1418 jitter on exact ties); RFA-on places every
interior read at the true copy with high molecule-backed MAPQ
(aligner.go:1201-1228 move model + :697-720 molecule mapq); the two runs'
records genuinely differ.
"""

import os

import pytest

from arachne_tpu.cli import main as cli_main
from arachne_tpu.io.simulate import make_rfa_decisive_fixture


def parse_sam_records(path):
    out = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            f = line.rstrip("\n").split("\t")
            flag = int(f[1])
            if flag & 0x100:  # secondary
                continue
            read = 1 if flag & 0x40 else 2
            out[(f[0], read)] = (int(f[3]), int(f[4]))  # pos (1-based), mapq
    return out


def truth_of(qname):
    # qname = contig_p1_p2_serial (positions 1-based inclusive)
    parts = qname.rsplit("_", 3)
    return int(parts[1]), int(parts[2])


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rfa_decisive")
    fasta = str(tmp / "rfa.fa")
    r1, r2 = str(tmp / "r.R1.fq.gz"), str(tmp / "r.R2.fq.gz")
    geom = make_rfa_decisive_fixture(fasta, r1, r2)
    out_on = str(tmp / "out_on")
    out_off = str(tmp / "out_off")
    cli_main(["align", "--sam", out_on, fasta, r1, r2])
    cli_main(["align", "--sam", "--no-rfa", out_off, fasta, r1, r2])
    recs_on = parse_sam_records(os.path.join(out_on, "bc_sorted_bam.sam"))
    recs_off = parse_sam_records(os.path.join(out_off, "bc_sorted_bam.sam"))
    return geom, recs_on, recs_off


def classify(geom, recs):
    """Split records into interior-read and anchor-read placements."""
    a0, a1 = geom["pos_a"], geom["pos_a"] + geom["unit_len"]
    interior, anchors = [], []
    for (qname, read), (pos, mapq) in recs.items():
        t1, t2 = truth_of(qname)
        is_interior = t1 - 1 >= a0 and t2 <= a1
        # correct iff within the true copy's unit (tolerance via truth pos)
        want = t1 if read == 1 else t2 - 149
        correct = abs(pos - want) <= 20
        (interior if is_interior else anchors).append((qname, read, correct, mapq, pos))
    return interior, anchors


def test_rfa_off_coinflips_interior_reads(fixture):
    geom, _, recs_off = fixture
    interior, anchors = classify(geom, recs_off)
    assert len(interior) == 2 * geom["n_interior_pairs"]
    n_wrong = sum(1 for _q, _r, correct, _m, _p in interior if not correct)
    # exact ties -> md5 jitter picks arbitrarily; some pairs land wrong
    assert n_wrong >= 4, f"expected wrong placements without RFA, got {n_wrong}"
    # ...and the calibration knows it: ties score ~3
    for _q, _r, _c, mapq, _p in interior:
        assert mapq <= 5, (mapq, "interior reads must be low-mapq without RFA")
    # flank-anchored pairs are unambiguous either way
    assert all(c for _q, _r, c, _m, _p in anchors)


def test_rfa_on_places_all_interior_reads_at_true_copy(fixture):
    geom, recs_on, _ = fixture
    interior, anchors = classify(geom, recs_on)
    assert len(interior) == 2 * geom["n_interior_pairs"]
    wrong = [(q, r, p) for q, r, c, _m, p in interior if not c]
    assert not wrong, f"RFA left interior reads at the decoy copy: {wrong}"
    # molecule evidence backs the placement: high MAPQ, not tie-scores
    for _q, _r, _c, mapq, _p in interior:
        assert mapq >= 30, (mapq, "molecule-backed placements must be confident")
    assert all(c for _q, _r, c, _m, _p in anchors)


def test_rfa_changes_output_records(fixture):
    """The headline: RFA-on and RFA-off runs genuinely differ."""
    geom, recs_on, recs_off = fixture
    assert set(recs_on) == set(recs_off)
    moved = [k for k in recs_on if recs_on[k][0] != recs_off[k][0]]
    assert len(moved) >= 4, "RFA must move reads on this fixture"
    # every moved read is an interior read moved A<-B, not collateral
    a0, a1 = geom["pos_a"], geom["pos_a"] + geom["unit_len"]
    for qname, read in moved:
        t1, t2 = truth_of(qname)
        assert t1 - 1 >= a0 and t2 <= a1
