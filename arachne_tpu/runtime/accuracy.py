"""Alignment accuracy evaluation (the Lariat-lineage "mapq.csv" stats).

The reference carries vestigial RFAStats counters
(total/correct/correct_mapq10/..., aligner.go:217-229) from Lariat's
simulation validation: reads whose names encode their true origin are
scored for placement correctness stratified by MAPQ.  This module makes
that real: parse truth from read names (``<anything>_<contig>_<pos>`` or
wgsim-style ``<contig>_<pos1>_<pos2>_...``), compare to emitted records,
and report a mapq-stratified accuracy table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

_TRUTH_RE = re.compile(r"^(?P<contig>\S+?)[_:](?P<p1>\d+)(?:[_:](?P<p2>\d+))?")


def parse_truth(name: str) -> Optional[Tuple[str, int, Optional[int]]]:
    m = _TRUTH_RE.match(name)
    if not m:
        return None
    return (
        m.group("contig"),
        int(m.group("p1")),
        int(m.group("p2")) if m.group("p2") else None,
    )


@dataclass
class AccuracyStats:
    total: int = 0
    correct: int = 0
    total_mapq10: int = 0
    correct_mapq10: int = 0
    by_mapq: Dict[int, List[int]] = field(default_factory=dict)  # bucket -> [total, correct]
    by_exact_mapq: Dict[int, List[int]] = field(default_factory=dict)  # q -> [total, correct]

    def note(
        self,
        contig: str,
        pos: int,
        mapq: int,
        truth,
        tolerance: int = 20,
        aln_len: int = 0,
    ) -> None:
        if truth is None:
            return
        t_contig, p1, p2 = truth
        end = pos + aln_len
        ok = contig == t_contig and (
            abs(pos - p1) <= tolerance
            or (p2 is not None and abs(pos - p2) <= tolerance)
            or (p2 is not None and abs(end - p2) <= tolerance)
            or abs(end - p1) <= tolerance
        )
        self.total += 1
        self.correct += int(ok)
        if mapq >= 10:
            self.total_mapq10 += 1
            self.correct_mapq10 += int(ok)
        bucket = min(mapq // 10 * 10, 60)
        row = self.by_mapq.setdefault(bucket, [0, 0])
        row[0] += 1
        row[1] += int(ok)
        row = self.by_exact_mapq.setdefault(min(mapq, 60), [0, 0])
        row[0] += 1
        row[1] += int(ok)

    def as_csv(self) -> str:
        """The "mapq.csv" style table."""
        lines = ["mapq_bucket,total,correct,accuracy"]
        for bucket in sorted(self.by_mapq):
            t, c = self.by_mapq[bucket]
            lines.append(f"{bucket},{t},{c},{c / t:.4f}")
        lines.append(f"all,{self.total},{self.correct},"
                     f"{(self.correct / self.total) if self.total else 0:.4f}")
        return "\n".join(lines) + "\n"

    def calibration_rows(self, min_n: int = 20) -> List[Dict]:
        """MAPQ calibration: per exact reported q (pooled into the 10-wide
        bucket when a q value has < min_n records), the empirical error
        rate vs the error the q value CLAIMS (10^(-q/10)).  This is the
        living version of the mapq.csv the reference's RFAStats vestige
        intended (aligner.go:217-229, 797-922)."""
        pooled: Dict[int, List[int]] = {}
        for q, (t, c) in self.by_exact_mapq.items():
            key = q if t >= min_n else min(q // 10 * 10, 60)
            row = pooled.setdefault(key, [0, 0, 0])
            row[0] += t
            row[1] += c
            row[2] += t * (10.0 ** (-q / 10.0))
        out = []
        for q in sorted(pooled):
            t, c, pred = pooled[q]
            out.append(
                {
                    "mapq": q,
                    "n": t,
                    "empirical_err": round((t - c) / t, 5) if t else 0.0,
                    "claimed_err": round(pred / t, 5) if t else 0.0,
                }
            )
        return out

    def expected_calibration_error(self) -> float:
        """Record-weighted |empirical - claimed| over the calibration rows
        (lower is better calibrated); the bench's scalar guard."""
        rows = self.calibration_rows()
        n = sum(r["n"] for r in rows)
        if not n:
            return 0.0
        return sum(
            r["n"] * abs(r["empirical_err"] - r["claimed_err"]) for r in rows
        ) / n


def evaluate_sam(path: str, tolerance: int = 20) -> AccuracyStats:
    """Score a SAM file whose read names encode truth positions."""
    stats = AccuracyStats()
    with open(path) as fh:
        for line in fh:
            if line.startswith("@") or not line.strip():
                continue
            f = line.split("\t")
            flags = int(f[1])
            if flags & (0x100 | 0x800):  # secondary/supplementary
                continue
            if flags & 0x4:
                continue
            aln_len = 0
            num = ""
            for ch in f[5]:
                if ch.isdigit():
                    num += ch
                else:
                    if ch in "MDN=X" and num:
                        aln_len += int(num)
                    num = ""
            stats.note(
                f[2], int(f[3]) - 1, int(f[4]), parse_truth(f[0]), tolerance, aln_len
            )
    return stats
