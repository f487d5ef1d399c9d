"""BWA index disk-format compatibility (.bwt/.sa/.pac/.ann/.amb).

The reference consumes prebuilt ``bwa index`` output (gobwa.go:128-147;
SURVEY.md §2.3: "bwa index output is Arachne's required input format").
This module reads that format into our planar in-memory layout and writes
our indexes back out in it, so existing bwa indexes work directly and our
indexes interoperate with bwa-based tooling.

Formats (from the reference source):
  .pac  — 2-bit packed forward reference; file length l_pac/4+2 with the
          trailing byte holding l_pac%4 (bntseq.c:300-320)
  .ann  — text: l_pac n_seqs seed; per contig: gi name [anno]; offset len
          n_ambs (bntseq.c dump)
  .amb  — text: l_pac n_holes seed; per hole: offset len char
  .bwt  — primary, L2[1..4], interleaved occ/bwt words: per 128 bases,
          4 x uint64 counts then 8 x uint32 packed chars (bwt.c:385-394,
          bwt.h:72-78)
  .sa   — primary, L2[1..4], sa_intv, seq_len, then sa[1..n_sa-1]
          (bwt.c:396-407)
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from .build import (
    AmbHole,
    ContigAnn,
    FMIndexData,
    OCC_INTERVAL,
    PackedReference,
)


def write_pac(path: str, packed: PackedReference) -> None:
    with open(path, "wb") as fh:
        fh.write(packed.pac.tobytes())
        if packed.l_pac % 4 == 0:
            fh.write(b"\x00")
        fh.write(bytes([packed.l_pac % 4]))


def read_pac(path: str) -> Tuple[np.ndarray, int]:
    data = np.fromfile(path, dtype=np.uint8)
    rem = int(data[-1])
    body = data[:-1]
    if rem == 0:
        body = body[:-1]
        l_pac = len(body) * 4
    else:
        l_pac = (len(body) - 1) * 4 + rem
    return body, l_pac


def write_ann_amb(prefix: str, packed: PackedReference) -> None:
    with open(prefix + ".ann", "w") as fh:
        fh.write(f"{packed.l_pac} {packed.n_seqs} {11}\n")
        for a in packed.anns:
            anno = a.anno if a.anno else "(null)"
            fh.write(f"0 {a.name} {anno}\n")
            fh.write(f"{a.offset} {a.length} {a.n_ambs}\n")
    with open(prefix + ".amb", "w") as fh:
        fh.write(f"{packed.l_pac} {len(packed.ambs)} {11}\n")
        for h in packed.ambs:
            fh.write(f"{h.offset} {h.length} {h.amb}\n")


def read_ann_amb(prefix: str) -> Tuple[List[ContigAnn], List[AmbHole], int]:
    anns: List[ContigAnn] = []
    with open(prefix + ".ann") as fh:
        l_pac, n_seqs, _seed = (int(x) for x in fh.readline().split())
        for _ in range(n_seqs):
            parts = fh.readline().rstrip("\n").split(" ", 2)
            name = parts[1]
            anno = parts[2] if len(parts) > 2 else "(null)"
            off, length, n_ambs = (int(x) for x in fh.readline().split())
            anns.append(
                ContigAnn(name=name, offset=off, length=length, n_ambs=n_ambs, anno=anno)
            )
    ambs: List[AmbHole] = []
    amb_path = prefix + ".amb"
    if os.path.exists(amb_path):
        with open(amb_path) as fh:
            _, n_holes, _ = (int(x) for x in fh.readline().split())
            for _ in range(n_holes):
                off_s, len_s, ch = fh.readline().split()
                ambs.append(AmbHole(offset=int(off_s), length=int(len_s), amb=ch))
    return anns, ambs, l_pac


def write_bwt(path: str, fm: FMIndexData) -> None:
    """Interleave our planar occ/bwt arrays into the bwa .bwt layout."""
    n_blocks = fm.occ.shape[0]
    interleaved = np.zeros(n_blocks * 16, dtype=np.uint32)
    occ64 = fm.occ.astype(np.uint64)  # (n_blocks, 4)
    # counts stored as native-endian uint64 occupying 2 uint32 slots each
    occ_view = occ64.view(np.uint32).reshape(n_blocks, 8)
    interleaved.reshape(n_blocks, 16)[:, :8] = occ_view
    words = fm.bwt_words
    pad = n_blocks * 8 - len(words)
    if pad > 0:
        words = np.concatenate([words, np.zeros(pad, np.uint32)])
    interleaved.reshape(n_blocks, 16)[:, 8:] = words.reshape(n_blocks, 8)
    with open(path, "wb") as fh:
        np.array([fm.primary], dtype=np.uint64).tofile(fh)
        fm.L2[1:5].astype(np.uint64).tofile(fh)
        interleaved.tofile(fh)


def read_bwt(path: str) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray, int]:
    """Returns (primary, L2, occ, bwt_words, seq_len)."""
    with open(path, "rb") as fh:
        primary = int(np.fromfile(fh, dtype=np.uint64, count=1)[0])
        l2 = np.fromfile(fh, dtype=np.uint64, count=4)
        body = np.fromfile(fh, dtype=np.uint32)
    L2 = np.zeros(5, dtype=np.int64)
    L2[1:5] = l2.astype(np.int64)
    seq_len = int(L2[4])
    n_blocks = len(body) // 16
    mat = body[: n_blocks * 16].reshape(n_blocks, 16)
    occ = mat[:, :8].copy().view(np.uint64).reshape(n_blocks, 4).astype(np.int64)
    # trim padding words beyond the packed BWT length (extra checkpoint row)
    n_words = ((seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL) * (OCC_INTERVAL // 16)
    words = mat[:, 8:].reshape(-1)[:n_words].copy()
    return primary, L2, occ, words, seq_len


def write_sa(path: str, fm: FMIndexData) -> None:
    if fm.sa_sampled is None:
        raise ValueError("sampled SA required to write .sa")
    with open(path, "wb") as fh:
        np.array([fm.primary], dtype=np.uint64).tofile(fh)
        fm.L2[1:5].astype(np.uint64).tofile(fh)
        np.array([fm.sa_intv], dtype=np.uint64).tofile(fh)
        np.array([fm.seq_len], dtype=np.uint64).tofile(fh)
        fm.sa_sampled[1:].astype(np.uint64).tofile(fh)


def read_sa(path: str, expect_primary: int, expect_len: int) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as fh:
        primary = int(np.fromfile(fh, dtype=np.uint64, count=1)[0])
        assert primary == expect_primary, "SA-BWT inconsistency: primary"
        _ = np.fromfile(fh, dtype=np.uint64, count=4)
        sa_intv = int(np.fromfile(fh, dtype=np.uint64, count=1)[0])
        seq_len = int(np.fromfile(fh, dtype=np.uint64, count=1)[0])
        assert seq_len == expect_len, "SA-BWT inconsistency: seq_len"
        rest = np.fromfile(fh, dtype=np.uint64)
    n_sa = (seq_len + sa_intv) // sa_intv
    sampled = np.empty(n_sa, dtype=np.int64)
    sampled[0] = -1  # bwt.c:437 sentinel
    sampled[1:] = rest[: n_sa - 1].astype(np.int64)
    return sampled, sa_intv


def save_bwa_index(prefix: str, packed: PackedReference, fm: FMIndexData) -> None:
    """Write the full bwa index file set for ``prefix``."""
    write_pac(prefix + ".pac", packed)
    write_ann_amb(prefix, packed)
    write_bwt(prefix + ".bwt", fm)
    write_sa(prefix + ".sa", fm)


def load_bwa_index(prefix: str) -> Tuple[PackedReference, FMIndexData]:
    """Load a ``bwa index`` file set (bwa_idx_load semantics, bwa.c:262-295)."""
    pac, l_pac = read_pac(prefix + ".pac")
    anns, ambs, l_pac2 = read_ann_amb(prefix)
    assert l_pac == l_pac2, "pac/ann length mismatch"
    packed = PackedReference(pac=pac, l_pac=l_pac, anns=anns, ambs=ambs)
    primary, L2, occ, words, seq_len = read_bwt(prefix + ".bwt")
    sampled, sa_intv = read_sa(prefix + ".sa", primary, seq_len)
    fm = FMIndexData(
        seq_len=seq_len,
        primary=primary,
        L2=L2,
        bwt_words=words,
        occ=occ,
        sa=None,
        sa_sampled=sampled,
        sa_intv=sa_intv,
    )
    return packed, fm
