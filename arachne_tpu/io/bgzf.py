"""BGZF block compression (the BAM container format).

Pure-Python writer/reader using zlib.  Each block is a gzip member with a
BC extra subfield carrying the compressed block size; files end with the
fixed 28-byte EOF marker.  Replaces the reference's dependency on
biogo/hts's bgzf (bamwriter.go imports github.com/biogo/hts/bam).
"""

from __future__ import annotations

import struct
import zlib
from typing import IO

MAX_BLOCK = 0xFF00  # uncompressed payload per block

EOF_MARKER = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _compress_block(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    payload = c.compress(data) + c.flush()
    bsize = len(payload) + 25  # header(18) + payload + crc(4) + isize(4), minus 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 0x08, 0x04,  # gzip magic, deflate, FEXTRA
        0,                        # mtime
        0, 0xFF,                  # XFL, OS
        6,                        # XLEN
        0x42, 0x43,               # 'B' 'C'
        2,                        # subfield length
        bsize,                    # BSIZE-1
    )
    footer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF)
    return header + payload + footer


class BGZFWriter:
    def __init__(self, fh: IO[bytes]):
        self.fh = fh
        self.buf = bytearray()

    def write(self, data: bytes) -> None:
        self.buf += data
        while len(self.buf) >= MAX_BLOCK:
            chunk = bytes(self.buf[:MAX_BLOCK])
            del self.buf[:MAX_BLOCK]
            self.fh.write(_compress_block(chunk))

    def flush(self) -> None:
        if self.buf:
            self.fh.write(_compress_block(bytes(self.buf)))
            self.buf.clear()
        self.fh.flush()

    def close(self) -> None:
        self.flush()
        self.fh.write(EOF_MARKER)
        self.fh.close()


def bgzf_decompress(path: str) -> bytes:
    """Read an entire BGZF file (for tests)."""
    out = bytearray()
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip magic")
        xlen = struct.unpack("<H", data[pos + 10 : pos + 12])[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2, slen = extra[epos], extra[epos + 1], struct.unpack("<H", extra[epos + 2 : epos + 4])[0]
            if si1 == 0x42 and si2 == 0x43:
                bsize = struct.unpack("<H", extra[epos + 4 : epos + 6])[0] + 1
            epos += 4 + slen
        if bsize is None:
            raise ValueError("missing BC subfield")
        payload = data[pos + 12 + xlen : pos + bsize - 8]
        out += zlib.decompress(payload, -15)
        pos += bsize
    return bytes(out)
