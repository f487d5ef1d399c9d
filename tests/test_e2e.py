"""End-to-end golden tests: FASTA + FASTQ in -> sharded SAM/BAM out."""

import gzip
import os

import numpy as np
import pytest

from arachne_tpu.cli import main as cli_main
from arachne_tpu.index.build import NT4_TABLE
from arachne_tpu.io.bgzf import bgzf_decompress

BASES = np.array(list("ACGT"))


def write_fasta(path, contigs):
    with open(path, "w") as fh:
        for name, comment, seq in contigs:
            fh.write(f">{name} {comment}\n" if comment else f">{name}\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60] + "\n")


def make_fastq(path_r1, path_r2, pairs):
    """pairs: list of (name, barcode, valid, r1_seq, r2_seq)."""
    with gzip.open(path_r1, "wt") as f1, gzip.open(path_r2, "wt") as f2:
        for name, bc, valid, r1, r2 in pairs:
            v = "1" if valid else "0"
            f1.write(f"@{name}/1\tBX:Z:{bc}\tVX:i:{v}\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@{name}/2\tBX:Z:{bc}\tVX:i:{v}\n{r2}\n+\n{'I' * len(r2)}\n")


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def parse_sam(path):
    header, records = [], []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("@"):
                header.append(line)
            elif line:
                records.append(line.split("\t"))
    return header, records


@pytest.fixture(scope="module")
def e2e(tmp_path_factory, small_reference):
    tmp = tmp_path_factory.mktemp("e2e")
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, small_reference)
    chr1 = small_reference[0][2]

    pairs = []
    # barcode 1: 6 pairs tiling a molecule at chr1:2000-3600 (RFA runs)
    for i, pos in enumerate([2000, 2200, 2400, 2600, 2800, 3000]):
        frag = chr1[pos : pos + 260]
        pairs.append((f"mol1_{i}", "A01C02B03D04", True, frag[:100], revcomp_str(frag[160:260])))
    # barcode 2: 2 pairs (no RFA)
    for i, pos in enumerate([1000, 4000]):
        frag = chr1[pos : pos + 250]
        pairs.append((f"solo_{i}", "A05C06B07D08", True, frag[:100], revcomp_str(frag[150:250])))
    r1 = str(tmp / "reads.R1.fq.gz")
    r2 = str(tmp / "reads.R2.fq.gz")
    make_fastq(r1, r2, pairs)
    outdir = str(tmp / "out")
    cli_main(["align", "--sam", outdir, fasta, r1, r2])
    return tmp, outdir, pairs, small_reference


class TestEndToEnd:
    def test_outputs_exist(self, e2e):
        tmp, outdir, pairs, ref = e2e
        files = sorted(os.listdir(outdir))
        assert "bc_sorted_bam.sam" in files
        assert any("pos_bucketed" in f for f in files)
        assert "ZZZ_unmapped_pos_bucketed.sam" in files

    def test_all_reads_emitted(self, e2e):
        tmp, outdir, pairs, ref = e2e
        header, records = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        names = [r[0] for r in records]
        for name, *_ in pairs:
            assert names.count(name) >= 2, f"{name}: both mates must be present"

    def test_header_structure(self, e2e):
        tmp, outdir, pairs, ref = e2e
        header, _ = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        sq = [h for h in header if h.startswith("@SQ")]
        assert len(sq) == 2
        assert "SN:chr1" in sq[0] and "SN:chr2" in sq[1]
        assert any(h.startswith("@RG") for h in header)
        assert any(h.startswith("@PG") and "arachne" in h for h in header)

    def test_positions_and_flags(self, e2e):
        tmp, outdir, pairs, ref = e2e
        _, records = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        by_name = {}
        for r in records:
            by_name.setdefault(r[0], []).append(r)
        for i, pos in enumerate([2000, 2200, 2400, 2600, 2800, 3000]):
            recs = by_name[f"mol1_{i}"]
            r1 = next(r for r in recs if int(r[1]) & 0x40)
            r2 = next(r for r in recs if int(r[1]) & 0x80)
            assert int(r1[3]) == pos + 1  # SAM 1-based
            assert int(r2[3]) == pos + 160 + 1
            f1, f2 = int(r1[1]), int(r2[1])
            assert f1 & 0x1 and f2 & 0x1          # paired
            assert f1 & 0x2 and f2 & 0x2          # proper
            assert not f1 & 0x10 and f2 & 0x10    # strands
            assert f1 & 0x20 and not f2 & 0x20    # mate strands
            assert r1[6] == "=" and int(r1[7]) == int(r2[3])
            assert int(r1[8]) == 260              # TLEN
            assert int(r2[8]) == -260             # -(aend - mate.pos)

    def test_bx_tags_attached(self, e2e):
        tmp, outdir, pairs, ref = e2e
        _, records = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        mol1 = [r for r in records if r[0].startswith("mol1_")]
        for r in mol1:
            tags = {t.split(":")[0]: t for t in r[11:]}
            assert tags.get("BX") == "BX:Z:A01C02B03D04"
            assert tags.get("VX") == "VX:i:1"

    def test_mapq_values(self, e2e):
        tmp, outdir, pairs, ref = e2e
        _, records = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        for r in records:
            mq = int(r[4])
            assert 0 <= mq <= 60
        unique = [r for r in records if r[0].startswith("mol1_")]
        assert all(int(r[4]) >= 30 for r in unique)

    def test_cigar_and_seq(self, e2e):
        tmp, outdir, pairs, ref = e2e
        _, records = parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))
        r = next(x for x in records if x[0] == "mol1_0" and int(x[1]) & 0x40)
        assert r[5] == "100M"
        assert r[9] == pairs[0][3]  # forward read seq verbatim
        r2 = next(x for x in records if x[0] == "mol1_0" and int(x[1]) & 0x80)
        # reverse-strand record stores the revcomp (= reference-forward) seq
        assert r2[9] == revcomp_str(pairs[0][4])

    def test_position_bucketing(self, e2e):
        tmp, outdir, pairs, ref = e2e
        bucketed = [
            f for f in os.listdir(outdir) if "pos_bucketed" in f and not f.startswith("ZZZ")
        ]
        # both small contigs pack into one bucket file (running_size logic)
        assert len(bucketed) == 1
        _, records = parse_sam(os.path.join(outdir, bucketed[0]))
        assert len(records) == len(parse_sam(os.path.join(outdir, "bc_sorted_bam.sam"))[1])


class TestBAMBinary:
    def test_bam_roundtrip(self, tmp_path, small_reference):
        import struct

        fasta = str(tmp_path / "ref.fa")
        write_fasta(fasta, small_reference)
        chr1 = small_reference[0][2]
        pairs = []
        for i, pos in enumerate([2100, 2350]):
            frag = chr1[pos : pos + 240]
            pairs.append((f"p{i}", "A01C02B03D04", True, frag[:100], revcomp_str(frag[140:240])))
        r1 = str(tmp_path / "b.R1.fq.gz")
        r2 = str(tmp_path / "b.R2.fq.gz")
        make_fastq(r1, r2, pairs)
        outdir = str(tmp_path / "bam_out")
        cli_main(["align", outdir, fasta, r1, r2])
        raw = bgzf_decompress(os.path.join(outdir, "bc_sorted_bam.bam"))
        assert raw[:4] == b"BAM\x01"
        (l_text,) = struct.unpack("<i", raw[4:8])
        text = raw[8 : 8 + l_text].decode()
        assert "@SQ\tSN:chr1" in text
        off = 8 + l_text
        (n_ref,) = struct.unpack("<i", raw[off : off + 4])
        assert n_ref == 2
        off += 4
        for name, _, seq in small_reference:
            (l_name,) = struct.unpack("<i", raw[off : off + 4])
            off += 4
            assert raw[off : off + l_name - 1].decode() == name
            off += l_name
            (l_ref,) = struct.unpack("<i", raw[off : off + 4])
            assert l_ref == len(seq)
            off += 4
        # walk alignment records
        n_records = 0
        while off < len(raw):
            (block_size,) = struct.unpack("<i", raw[off : off + 4])
            rec = raw[off + 4 : off + 4 + block_size]
            rid, pos = struct.unpack("<ii", rec[:8])
            assert -1 <= rid < 2
            n_records += 1
            off += 4 + block_size
        assert n_records == 4  # 2 pairs x 2 mates


class TestBAMIndependentParse:
    """Field-complete BAM validation through tests/bam_reader.py — an
    independent SAMv1-spec implementation (own BGZF walk, own record
    decoder) that shares no code or assumptions with arachne_tpu.io.bam.
    The same input is aligned twice (binary BAM and SAM text); every field
    of every record must agree between the two encodings, each parsed by
    its own path (bamwriter.go:283-568 record semantics)."""

    @pytest.fixture(scope="class")
    def both_outputs(self, tmp_path_factory, small_reference):
        tmp = tmp_path_factory.mktemp("bam_cross")
        fasta = str(tmp / "ref.fa")
        write_fasta(fasta, small_reference)
        chr1 = small_reference[0][2]
        pairs = []
        for i, pos in enumerate([2000, 2200, 2400, 2600, 2800]):
            frag = chr1[pos : pos + 260]
            pairs.append(
                (f"m_{i}", "A01C02B03D04", True, frag[:100], revcomp_str(frag[160:260]))
            )
        # one read with a 4-base deletion (forces a D CIGAR op) and one
        # with a 3-base insertion (I op) so gapped records are covered
        frag = chr1[3200:3500]
        del_read = frag[:50] + frag[54:104]
        pairs.append(("del_0", "A01C02B03D04", True, del_read, revcomp_str(frag[200:300])))
        ins_read = frag[:50] + "ACG" + frag[50:97]
        pairs.append(("ins_0", "A01C02B03D04", True, ins_read, revcomp_str(frag[200:300])))
        r1 = str(tmp / "x.R1.fq.gz")
        r2 = str(tmp / "x.R2.fq.gz")
        make_fastq(r1, r2, pairs)
        out_bam = str(tmp / "out_bam")
        out_sam = str(tmp / "out_sam")
        cli_main(["align", out_bam, fasta, r1, r2])
        cli_main(["align", "--sam", out_sam, fasta, r1, r2])
        return out_bam, out_sam

    def test_every_field_roundtrips(self, both_outputs):
        from bam_reader import read_bam, reg2bin, tag_to_sam

        out_bam, out_sam = both_outputs
        bam = read_bam(os.path.join(out_bam, "bc_sorted_bam.bam"))
        _, sam_records = parse_sam(os.path.join(out_sam, "bc_sorted_bam.sam"))
        assert len(bam.records) == len(sam_records) > 0
        gapped = 0
        for rec, row in zip(bam.records, sam_records):
            assert rec.qname == row[0]
            assert rec.flag == int(row[1])
            assert bam.rname(rec.rid) == row[2]
            assert rec.pos + 1 == int(row[3])  # BAM 0-based
            assert rec.mapq == int(row[4])
            assert rec.cigar_str() == row[5]
            rnext = bam.rname(rec.next_rid)
            if rnext != "*" and rnext == bam.rname(rec.rid):
                rnext = "="
            assert rnext == row[6]
            assert rec.next_pos + 1 == int(row[7])
            assert rec.tlen == int(row[8])
            assert rec.seq == row[9]
            assert rec.qual == row[10]
            # tags: same set, same values, rendered per SAM conventions
            assert sorted(
                tag_to_sam(t, ty, v) for t, (ty, v) in rec.tags.items()
            ) == sorted(row[11:])
            # BAI bin number recomputed from the spec's reg2bin
            if rec.pos >= 0 and not (rec.flag & 0x4):
                span = max(rec.ref_span(), 1)
                assert rec.bin == reg2bin(rec.pos, rec.pos + span)
            if any(op in "ID" for op, _ in rec.cigar):
                gapped += 1
        assert gapped >= 2  # the planted del/ins survived to the output

    def test_header_matches(self, both_outputs):
        from bam_reader import read_bam

        out_bam, out_sam = both_outputs
        bam = read_bam(os.path.join(out_bam, "bc_sorted_bam.bam"))
        sam_header, _ = parse_sam(os.path.join(out_sam, "bc_sorted_bam.sam"))
        assert bam.text.rstrip("\n").splitlines() == sam_header
        # binary reference list must agree with the @SQ lines
        sq = [l for l in sam_header if l.startswith("@SQ")]
        assert len(sq) == len(bam.ref_names)
        for line, name, length in zip(sq, bam.ref_names, bam.ref_lengths):
            assert f"SN:{name}" in line and f"LN:{length}" in line

    def test_position_bucketed_shards_parse(self, both_outputs):
        """Every bucketed shard must be independently parseable too."""
        from bam_reader import read_bam

        out_bam, _ = both_outputs
        shards = [
            f for f in os.listdir(out_bam)
            if f.endswith(".bam") and f != "bc_sorted_bam.bam"
        ]
        assert shards
        total = 0
        for f in shards:
            total += len(read_bam(os.path.join(out_bam, f)).records)
        bc = read_bam(os.path.join(out_bam, "bc_sorted_bam.bam"))
        assert total == len(bc.records)


class TestStandardizeThenAlign:
    @pytest.mark.parametrize("fmt", ["stlfr", "tellseq"])
    def test_native_format_through_full_pipeline(self, tmp_path, fmt):
        """stLFR (#x_y_z) and TELLseq (:ACGT) native headers ->
        standardize -> align: the whole conversion+alignment flow the
        reference intended but never shipped (standardize.go does not
        compile, SURVEY.md 2.4)."""
        import gzip

        import numpy as np

        from arachne_tpu.index import parse_fasta
        from arachne_tpu.io.simulate import SimConfig, simulate_linked_reads
        from arachne_tpu.io.standardize import detect_format, standardize

        rng = np.random.default_rng(77)
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60_000)])
        ref = str(tmp_path / "ref.fa")
        with open(ref, "w") as fh:
            fh.write(">chrS\n")
            for i in range(0, len(seq), 70):
                fh.write(seq[i : i + 70] + "\n")
        std1 = str(tmp_path / "std.R1.fq.gz")
        std2 = str(tmp_path / "std.R2.fq.gz")
        simulate_linked_reads(
            parse_fasta(ref), std1, std2,
            SimConfig(n_barcodes=4, molecules_per_barcode=2, pairs_per_molecule=8,
                      seed=5),
        )
        # rewrite standard BX:Z headers in the native format under test
        raw1 = str(tmp_path / "native.R1.fq.gz")
        raw2 = str(tmp_path / "native.R2.fq.gz")
        bases = ["AACCGGTT", "ACGTACGT", "TTGGCCAA", "TGCATGCA"]
        for src_p, dst in ((std1, raw1), (std2, raw2)):
            with gzip.open(src_p, "rt") as fi, gzip.open(dst, "wt") as fo:
                bcmap = {}
                while True:
                    h = fi.readline()
                    if not h:
                        break
                    body = [fi.readline() for _ in range(3)]
                    name, rest = h.rstrip("\n").split("\t", 1)
                    bc = rest.split("BX:Z:")[1].split("\t")[0]
                    if fmt == "stlfr":
                        code = "#" + bcmap.setdefault(
                            bc, f"{len(bcmap)+1}_{len(bcmap)+2}_{len(bcmap)+3}"
                        )
                    else:
                        code = ":" + bcmap.setdefault(bc, bases[len(bcmap) % 4])
                    base = name.split("/")[0]
                    suff = "/" + name.split("/")[1] if "/" in name else ""
                    fo.write(f"{base}{code}{suff}\n" + "".join(body))
        assert detect_format(raw1, raw2) == fmt
        conv1 = str(tmp_path / "conv.R1.fq.gz")
        conv2 = str(tmp_path / "conv.R2.fq.gz")
        standardize(raw1, raw2, conv1, conv2)
        # aligned output of converted input == aligned output of the
        # original standard input, modulo the barcode strings
        out_a = str(tmp_path / "out_std")
        out_b = str(tmp_path / "out_conv")
        cli_main(["align", out_a, ref, std1, std2, "--engine", "oracle", "--sam", "-t", "1"])
        cli_main(["align", out_b, ref, conv1, conv2, "--engine", "oracle", "--sam", "-t", "1"])

        def recs(p, strip_bx=True):
            out = []
            for l in open(p):
                if l.startswith("@"):
                    continue
                f = [x for x in l.rstrip("\n").split("\t") if not x.startswith("BX:Z:")]
                out.append("\t".join(f))
            return sorted(out)

        import os
        a = recs(os.path.join(out_a, "bc_sorted_bam.sam"))
        b = recs(os.path.join(out_b, "bc_sorted_bam.sam"))
        assert a == b and len(a) > 0
