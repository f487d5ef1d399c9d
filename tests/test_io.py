"""Tests for FASTQ reading/barcode grouping, standardization, barcode sort."""

import gzip

import pytest

from arachne_tpu.io.fastq import FastQReader, parse_header
from arachne_tpu.io.preprocess import barcode_sort
from arachne_tpu.io.standardize import detect_format, extract_barcode, standardize


def write_pair(tmp_path, name, entries):
    """entries: list of (header_r1, seq, qual) — r2 mirrors r1."""
    r1 = str(tmp_path / f"{name}.R1.fq.gz")
    r2 = str(tmp_path / f"{name}.R2.fq.gz")
    with gzip.open(r1, "wt") as f1, gzip.open(r2, "wt") as f2:
        for hdr, seq, qual in entries:
            f1.write(f"{hdr}\n{seq}\n+\n{qual}\n")
            f2.write(f"{hdr}\n{seq}\n+\n{qual}\n")
    return r1, r2


class TestParseHeader:
    def test_standard_header(self):
        info, bc, valid = parse_header(b"read1/1\tBX:Z:A01C02B03D04\tVX:i:1\n")
        assert info == "read1"
        assert bc == b"A01C02B03D04"
        assert valid

    def test_invalid_vx(self):
        _, _, valid = parse_header(b"read1/1\tBX:Z:AAA\tVX:i:0\n")
        assert not valid

    def test_missing_bx(self):
        info, bc, valid = parse_header(b"read1/1 some comment\n")
        assert bc == b"" and not valid


class TestBarcodeSets:
    def test_grouping(self, tmp_path):
        entries = []
        for bc, n in [("BC01", 3), ("BC02", 2), ("BC03", 4)]:
            for i in range(n):
                entries.append((f"@r_{bc}_{i}/1\tBX:Z:{bc}\tVX:i:1", "ACGT" * 10, "I" * 40))
        r1, r2 = write_pair(tmp_path, "groups", entries)
        reader = FastQReader(r1, r2)
        sets = []
        while True:
            records, unique = reader.read_barcode_set()
            if records is None:
                break
            sets.append((records[0].barcode, len(records), unique))
        assert sets == [(b"BC01", 3, True), (b"BC02", 2, True), (b"BC03", 4, True)]

    def test_record_fields(self, tmp_path):
        entries = [("@q0/1\tBX:Z:AAAA\tVX:i:1", "ACGTACGTACGTACGTACGT", "IIIIIIIIIIIIIIIIIIII")]
        r1, r2 = write_pair(tmp_path, "fields", entries)
        reader = FastQReader(r1, r2)
        records, unique = reader.read_barcode_set()
        assert len(records) == 1
        rec = records[0]
        assert rec.read1 == b"ACGTACGTACGTACGTACGT"
        assert rec.qual1 == b"IIIIIIIIIIIIIIIIIIII"
        assert rec.read_info == "q0"
        assert rec.valid


class TestStandardize:
    def test_detect_standard(self, tmp_path):
        r1, r2 = write_pair(
            tmp_path, "std", [("@r/1\tBX:Z:AAA\tVX:i:1", "ACGT", "IIII")]
        )
        assert detect_format(r1, r2) == "standard"

    def test_detect_haplotagging(self, tmp_path):
        r1, r2 = write_pair(
            tmp_path, "hap", [("@r/1\tBX:Z:A01C02B03D04", "ACGT", "IIII")]
        )
        assert detect_format(r1, r2) == "haplotagging"

    def test_detect_stlfr(self, tmp_path):
        r1, r2 = write_pair(tmp_path, "stlfr", [("@r#12_34_56 extra", "ACGT", "IIII")])
        assert detect_format(r1, r2) == "stlfr"

    def test_detect_tellseq(self, tmp_path):
        r1, r2 = write_pair(tmp_path, "tell", [("@r:ACGTACGTAC comment", "ACGT", "IIII")])
        assert detect_format(r1, r2) == "tellseq"

    def test_validity_conventions(self):
        bc, v = extract_barcode(b"x#12_0_56 \n", "stlfr")
        assert bc == b"12_0_56" and not v
        bc, v = extract_barcode(b"x#12_34_56 \n", "stlfr")
        assert v
        bc, v = extract_barcode(b"x:ACGNTT rest\n", "tellseq")
        assert bc == b"ACGNTT" and not v
        bc, v = extract_barcode(b"BX:Z:A00C02B03D04 \n", "haplotagging")
        assert not v
        bc, v = extract_barcode(b"BX:Z:A01C02B03D04 \n", "haplotagging")
        assert v

    def test_conversion_roundtrip(self, tmp_path):
        r1, r2 = write_pair(
            tmp_path, "conv", [("@rd#12_34_56 x", "ACGTACGT", "IIIIIIII")]
        )
        o1 = str(tmp_path / "out.R1.fq.gz")
        o2 = str(tmp_path / "out.R2.fq.gz")
        standardize(r1, r2, o1, o2)
        assert detect_format(o1, o2) == "standard"
        with gzip.open(o1, "rt") as fh:
            hdr = fh.readline()
        assert "BX:Z:12_34_56" in hdr and "VX:i:1" in hdr


class TestTruncatedInput:
    """Corrupt input must raise loudly, not masquerade as clean EOF
    (reference logged malformed input, reader.go:156-157)."""

    def test_truncated_record_raises(self, tmp_path):
        from arachne_tpu.io.fastq import TruncatedFastQError

        r1 = str(tmp_path / "t.R1.fq")
        r2 = str(tmp_path / "t.R2.fq")
        good = "@a/1\tBX:Z:AAA\tVX:i:1\nACGT\n+\nIIII\n"
        with open(r1, "w") as fh:
            fh.write(good + "@b/1\tBX:Z:AAA\tVX:i:1\nACGT\n")  # cut mid-record
        with open(r2, "w") as fh:
            fh.write(good + "@b/2\tBX:Z:AAA\tVX:i:1\nACGT\n+\nIIII\n")
        reader = FastQReader(r1, r2)
        assert reader.read_one() is not None
        with pytest.raises(TruncatedFastQError):
            reader.read_one()

    def test_r2_shorter_raises(self, tmp_path):
        from arachne_tpu.io.fastq import TruncatedFastQError

        good = "@a/1\tBX:Z:AAA\tVX:i:1\nACGT\n+\nIIII\n"
        r1 = str(tmp_path / "m.R1.fq")
        r2 = str(tmp_path / "m.R2.fq")
        with open(r1, "w") as fh:
            fh.write(good * 2)
        with open(r2, "w") as fh:
            fh.write(good)
        reader = FastQReader(r1, r2)
        assert reader.read_one() is not None
        with pytest.raises(TruncatedFastQError):
            reader.read_one()

    def test_seq_qual_mismatch_raises(self, tmp_path):
        from arachne_tpu.io.fastq import TruncatedFastQError

        bad = "@a/1\tBX:Z:AAA\tVX:i:1\nACGTACGT\n+\nIII\n"
        r1 = str(tmp_path / "q.R1.fq")
        r2 = str(tmp_path / "q.R2.fq")
        for p in (r1, r2):
            with open(p, "w") as fh:
                fh.write(bad)
        reader = FastQReader(r1, r2)
        with pytest.raises(TruncatedFastQError):
            reader.read_one()


class TestBarcodeSort:
    def test_sorts_by_barcode(self, tmp_path):
        entries = [
            ("@a/1\tBX:Z:ZZZ\tVX:i:1", "AAAA", "IIII"),
            ("@b/1\tBX:Z:AAA\tVX:i:1", "CCCC", "IIII"),
            ("@c/1\tBX:Z:MMM\tVX:i:1", "GGGG", "IIII"),
            ("@d/1\tBX:Z:AAA\tVX:i:1", "TTTT", "IIII"),
        ]
        r1, r2 = write_pair(tmp_path, "unsorted", entries)
        o1 = str(tmp_path / "s.R1.fq.gz")
        o2 = str(tmp_path / "s.R2.fq.gz")
        barcode_sort(r1, r2, o1, o2, chunk_records=2)  # force external merge
        with gzip.open(o1, "rt") as fh:
            names = [l.split("\t")[0] for i, l in enumerate(fh) if i % 4 == 0]
        assert names == ["@b/1", "@d/1", "@c/1", "@a/1"]  # stable within AAA


class TestCheckpointResume:
    def test_resume_skips_and_generations(self, tmp_path):
        from arachne_tpu.runtime.checkpoint import Checkpoint, CheckpointedStream

        entries = []
        for bc in ["B1", "B2", "B3", "B4"]:
            for i in range(2):
                entries.append((f"@{bc}_{i}/1\tBX:Z:{bc}\tVX:i:1", "ACGT" * 8, "I" * 32))
        r1, r2 = write_pair(tmp_path, "ck", entries)
        ck = str(tmp_path / "ck.json")
        s1 = CheckpointedStream(r1, r2, ck)
        it = iter(s1)
        a, _ = next(it)
        s1.mark_done(1, len(a))
        b, _ = next(it)
        s1.mark_done(1, len(b))
        s1.finish()
        assert a[0].barcode == b"B1" and b[0].barcode == b"B2"
        # resume: should see B3 then B4
        s2 = CheckpointedStream(r1, r2, ck)
        assert s2.skip == 2
        assert s2.generation == 1
        rest = [recs[0].barcode for recs, _ in s2]
        assert rest == [b"B3", b"B4"]


class TestCheckpointDurability:
    def test_flush_precedes_manifest_save(self, tmp_path):
        """Crash-resume: every barcode set the manifest claims must be on
        disk (flush before save), and resume skips exactly those — no lost
        and no duplicated records across generations."""
        from arachne_tpu.runtime.checkpoint import CheckpointedStream

        entries = []
        barcodes = ["B1", "B2", "B3", "B4", "B5"]
        for bc in barcodes:
            entries.append((f"@{bc}_0/1\tBX:Z:{bc}\tVX:i:1", "ACGT" * 8, "I" * 32))
        r1, r2 = write_pair(tmp_path, "dur", entries)
        ck = str(tmp_path / "ck.json")
        out = tmp_path / "emitted.txt"

        class BufferedSink:
            """Stand-in for the BAM writers: buffers until flushed."""

            def __init__(self):
                self.fh = open(out, "a")

            def emit(self, bc):
                self.fh.write(bc.decode() + "\n")

            def flush(self):
                self.fh.flush()

        sink = BufferedSink()
        s1 = CheckpointedStream(r1, r2, ck, save_every=1, flush_fn=sink.flush)
        it = iter(s1)
        for _ in range(3):
            recs, _ = next(it)
            sink.emit(recs[0].barcode)
            s1.mark_done(1, len(recs))
        # simulate crash: no close(), buffers for anything unflushed are lost
        del it, s1

        durable = out.read_text().split()
        assert durable == ["B1", "B2", "B3"]  # flushed before each save

        s2 = CheckpointedStream(r1, r2, ck)
        assert s2.skip == 3
        sink2 = BufferedSink()
        for recs, _ in s2:
            sink2.emit(recs[0].barcode)
        sink2.flush()
        s2.finish()
        assert sorted(out.read_text().split()) == barcodes  # union, no dups


class TestAccuracy:
    def test_mapq_csv(self, tmp_path):
        from arachne_tpu.runtime.accuracy import evaluate_sam

        sam = tmp_path / "x.sam"
        sam.write_text(
            "@HD\tVN:1.6\n"
            "chr1_100_300_0/1\t99\tchr1\t101\t60\t50M\t=\t251\t200\tACGT\tIIII\n"
            "chr1_100_300_0/2\t147\tchr1\t251\t60\t50M\t=\t101\t-200\tACGT\tIIII\n"
            "chr2_500_700_1/1\t0\tchr1\t900\t3\t50M\t*\t0\t0\tACGT\tIIII\n"
        )
        stats = evaluate_sam(str(sam))
        assert stats.total == 3
        assert stats.correct == 2
        assert stats.total_mapq10 == 2 and stats.correct_mapq10 == 2
        csv = stats.as_csv()
        assert "all,3,2" in csv


class TestStatusCommand:
    def test_status_reports_claims_and_staleness(self, tmp_path, capsys):
        import os
        import time as _time

        from arachne_tpu.cli import run_status
        from arachne_tpu.runtime.checkpoint import Checkpoint, Claim

        base = str(tmp_path / "fleet.ckpt")
        Checkpoint(r1="a", r2="b", claims=[Claim(0, 0, 2, 5)]).save(base + ".host000")
        Checkpoint(r1="a", r2="b", claims=[Claim(0, 1, 2, 3)]).save(base + ".host001")
        # host001 saved long ago
        old = _time.time() - 10_000
        os.utime(base + ".host001", (old, old))
        rc = run_status(base, stale_after=300)
        out = capsys.readouterr().out
        assert rc == 1
        assert "g0 h0/2: 5 sets" in out
        assert "STALE" in out
        # everything fresh -> rc 0
        os.utime(base + ".host001", None)
        assert run_status(base, stale_after=300) == 0
