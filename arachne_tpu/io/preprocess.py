"""Barcode-sorting of paired FASTQ input.

The reference shells out to ``samtools import | sort -t BX | fastq``
(preprocess.go:42-114); samtools is not a dependency here, so we sort
natively: stream records, sort by (barcode, input order) — a stable sort so
record order within a barcode is preserved — and rewrite gzipped FASTQ.
For inputs larger than memory an external merge sort over temporary chunks
is used.
"""

from __future__ import annotations

import gzip
import heapq
import os
import tempfile
from typing import IO, List, Tuple

from .fastq import open_maybe_gzip
from .standardize import BX_RE, _iter_fastq


def _records(path: str):
    fh = open_maybe_gzip(path)
    try:
        yield from _iter_fastq(fh)
    finally:
        try:
            fh.close()
        except Exception:
            pass


def barcode_sort(
    r1_path: str,
    r2_path: str,
    out_r1: str = "bc_sorted.R1.fq.gz",
    out_r2: str = "bc_sorted.R2.fq.gz",
    chunk_records: int = 2_000_000,
) -> Tuple[str, str]:
    """Sort paired FASTQ by the BX:Z barcode tag (stable)."""
    chunks: List[str] = []
    buf: List[Tuple[bytes, int, bytes]] = []
    order = 0

    def flush():
        nonlocal buf
        if not buf:
            return
        buf.sort(key=lambda t: (t[0], t[1]))
        tmp = tempfile.NamedTemporaryFile(delete=False, suffix=".chunk")
        for bc, o, blob in buf:
            tmp.write(len(bc).to_bytes(4, "little") + bc)
            tmp.write(o.to_bytes(8, "little"))
            tmp.write(len(blob).to_bytes(4, "little") + blob)
        tmp.close()
        chunks.append(tmp.name)
        buf = []

    for (h1, s1, q1), (h2, s2, q2) in zip(_records(r1_path), _records(r2_path)):
        m = BX_RE.search(h1 + b"\n")
        bc = m.group(1) if m else b""
        blob = b"\x00".join([h1, s1, q1, h2, s2, q2])
        buf.append((bc, order, blob))
        order += 1
        if len(buf) >= chunk_records:
            flush()
    flush()

    def read_chunk(path: str):
        with open(path, "rb") as fh:
            while True:
                lb = fh.read(4)
                if not lb:
                    break
                bc = fh.read(int.from_bytes(lb, "little"))
                o = int.from_bytes(fh.read(8), "little")
                blob = fh.read(int.from_bytes(fh.read(4), "little"))
                yield (bc, o, blob)

    o1 = gzip.open(out_r1, "wb")
    o2 = gzip.open(out_r2, "wb")
    try:
        merged = heapq.merge(*(read_chunk(c) for c in chunks), key=lambda t: (t[0], t[1]))
        for bc, o, blob in merged:
            h1, s1, q1, h2, s2, q2 = blob.split(b"\x00")
            o1.write(h1 + b"\n" + s1 + b"\n+\n" + q1 + b"\n")
            o2.write(h2 + b"\n" + s2 + b"\n+\n" + q2 + b"\n")
    finally:
        o1.close()
        o2.close()
        for c in chunks:
            os.unlink(c)
    return out_r1, out_r2
