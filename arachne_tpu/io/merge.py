"""Merge resume-generation output shards.

After a checkpointed resume, each output file exists as ``name.bam`` plus
``name.genN.bam`` pieces (io/bam.py shard_suffix).  BAM pieces concatenate
at the BGZF level after stripping the continuation's header blocks; SAM
pieces concatenate skipping header lines.  The merged stream replaces the
base file and the generation pieces are removed.
"""

from __future__ import annotations

import os
import re
import struct
import zlib
from collections import defaultdict
from typing import Dict, List

from .bgzf import BGZFWriter, bgzf_decompress

_GEN_RE = re.compile(r"^(?P<base>.+)\.gen(?P<gen>\d+)\.(?P<ext>bam|sam)$")


def _bam_records_offset(raw: bytes) -> int:
    """Byte offset of the first alignment record in decompressed BAM."""
    (l_text,) = struct.unpack("<i", raw[4:8])
    off = 8 + l_text
    (n_ref,) = struct.unpack("<i", raw[off : off + 4])
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", raw[off : off + 4])
        off += 4 + l_name + 4
    return off


def merge_generations(output_dir: str) -> int:
    pieces: Dict[str, List[tuple]] = defaultdict(list)
    for fn in os.listdir(output_dir):
        m = _GEN_RE.match(fn)
        if m:
            pieces[m.group("base") + "." + m.group("ext")].append(
                (int(m.group("gen")), fn)
            )
    merged = 0
    for base, gens in sorted(pieces.items()):
        base_path = os.path.join(output_dir, base)
        gens.sort()
        if base.endswith(".sam"):
            with open(base_path, "a") as out:
                for _, fn in gens:
                    with open(os.path.join(output_dir, fn)) as fh:
                        for line in fh:
                            if not line.startswith("@"):
                                out.write(line)
                    os.unlink(os.path.join(output_dir, fn))
        else:
            raw0 = bgzf_decompress(base_path) if os.path.exists(base_path) else b""
            parts = [raw0]
            for _, fn in gens:
                raw = bgzf_decompress(os.path.join(output_dir, fn))
                parts.append(raw[_bam_records_offset(raw):])
                os.unlink(os.path.join(output_dir, fn))
            with open(base_path, "wb") as fh:
                w = BGZFWriter(fh)
                for p in parts:
                    w.write(p)
                w.close()
        merged += 1
    return merged
