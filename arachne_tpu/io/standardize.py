"""Linked-read FASTQ format standardization.

Implements the *intent* of src/preprocess/standardize.go (which does not
compile in the reference; SURVEY.md 2.4): detect whether paired FASTQ input
is already in standard BX:Z/VX:i form or in haplotagging / stLFR / TELLseq
native form, and rewrite to standard gzipped FASTQ.

Detection regexes (standardize.go:17-25) and validity conventions:
  * haplotagging: BX:Z:AxxCxxBxxDxx; invalid iff the barcode contains "00"
    (standardize.go:138 — note the reference inverts this; we implement
    the documented convention: 00 segments mean a missing beadTag);
  * stLFR: read id suffix #x_y_z; invalid iff any segment is 0;
  * TELLseq: read id suffix :ACGT...; invalid iff the barcode contains N.
"""

from __future__ import annotations

import gzip
import re
from typing import IO, Iterable, Optional, Tuple

from .fastq import FastQReader, open_maybe_gzip

BX_RE = re.compile(rb"BX:Z:(\S+)\s")
VX_RE = re.compile(rb"VX:i:([01])\s")
HAPLOTAGGING_RE = re.compile(rb"BX:Z:(A\d{2}C\d{2}B\d{2}D\d{2})\s")
# real stLFR read ids carry the pair suffix AFTER the barcode
# (@name#512_796_1404/1), so the terminator is whitespace OR /1 / /2
STLFR_RE = re.compile(rb"#([0-9]+_[0-9]+_[0-9]+)(?:/[12])?\s")
STLFR_INVALID_RE = re.compile(r"^0_|_0_|_0$")
TELLSEQ_RE = re.compile(rb":([ATCGN]+)(?:/[12])?\s")


def detect_format(r1_path: str, r2_path: str, n_probe: int = 200) -> str:
    """findFastqFormat (standardize.go:102-127): probe the first records."""
    f1 = open_maybe_gzip(r1_path)
    try:
        for _ in range(n_probe):
            header = f1.readline()
            if not header:
                break
            if not header.startswith(b"@"):
                continue
            line = header[1:]
            if BX_RE.search(line) and VX_RE.search(line):
                return "standard"
            if HAPLOTAGGING_RE.search(line):
                return "haplotagging"
            if STLFR_RE.search(line):
                return "stlfr"
            if TELLSEQ_RE.search(line):
                return "tellseq"
            # skip seq, +, qual
            for _ in range(3):
                f1.readline()
    finally:
        try:
            f1.close()
        except Exception:
            pass
    return "unknown"


def extract_barcode(header: bytes, fmt: str) -> Tuple[bytes, bool]:
    """Barcode + validity for one header line in the given format."""
    if fmt == "standard":
        m = BX_RE.search(header)
        bc = m.group(1) if m else b""
        vm = VX_RE.search(header)
        valid = bool(vm and vm.group(1) == b"1")
        return bc, valid
    if fmt == "haplotagging":
        m = HAPLOTAGGING_RE.search(header)
        bc = m.group(1) if m else b""
        return bc, b"00" not in bc
    if fmt == "stlfr":
        m = STLFR_RE.search(header)
        bc = m.group(1) if m else b""
        return bc, not STLFR_INVALID_RE.search(bc.decode()) if bc else False
    if fmt == "tellseq":
        m = TELLSEQ_RE.search(header)
        bc = m.group(1) if m else b""
        return bc, (b"N" not in bc) if bc else False
    return b"", False


def _iter_fastq(fh: IO[bytes]):
    while True:
        header = fh.readline()
        if not header:
            return
        if not header.startswith(b"@"):
            continue
        seq = fh.readline().rstrip(b"\n")
        fh.readline()
        qual = fh.readline().rstrip(b"\n")
        yield header.rstrip(b"\n"), seq, qual


def standardize(
    r1_path: str,
    r2_path: str,
    out_r1: str = "standard.R1.fq.gz",
    out_r2: str = "standard.R2.fq.gz",
    fmt: Optional[str] = None,
) -> Tuple[str, str]:
    """fastqStandardize (standardize.go:188-297, repaired): rewrite to
    standard BX:Z/VX:i FASTQ.  Returns the (possibly unchanged) paths."""
    if fmt is None:
        fmt = detect_format(r1_path, r2_path)
    if fmt == "standard":
        return r1_path, r2_path
    if fmt == "unknown":
        raise ValueError("could not detect linked-read FASTQ format")
    f1 = open_maybe_gzip(r1_path)
    f2 = open_maybe_gzip(r2_path)
    o1 = gzip.open(out_r1, "wb")
    o2 = gzip.open(out_r2, "wb")
    try:
        for (h1, s1, q1), (h2, s2, q2) in zip(_iter_fastq(f1), _iter_fastq(f2)):
            bc, valid = extract_barcode(h1 + b"\n", fmt)
            base = h1[1:].split()[0]
            # strip format-specific suffixes from the name
            if fmt == "stlfr":
                base = base.split(b"#")[0]
            elif fmt == "tellseq":
                base = base.rsplit(b":", 1)[0]
            if base.endswith(b"/1") or base.endswith(b"/2"):
                base = base[:-2]
            vx = b"1" if valid else b"0"
            o1.write(b"@" + base + b"/1\tBX:Z:" + bc + b"\tVX:i:" + vx + b"\n")
            o1.write(s1 + b"\n+\n" + q1 + b"\n")
            o2.write(b"@" + base + b"/2\tBX:Z:" + bc + b"\tVX:i:" + vx + b"\n")
            o2.write(s2 + b"\n+\n" + q2 + b"\n")
    finally:
        for f in (f1, f2, o1, o2):
            try:
                f.close()
            except Exception:
                pass
    return out_r1, out_r2
