"""Run statistics / observability.

The reference's RFAStats (aligner.go:217-229) is vestigial (fields reset,
never reported; SURVEY.md 5).  We keep structured per-run counters that are
actually aggregated and reported: reads, barcodes, RFA runs, molecules,
mapq histogram, throughput.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict


@dataclass
class RunStats:
    reads: int = 0
    barcodes: int = 0
    rfa_barcodes: int = 0
    molecules: int = 0
    mapq_hist: Dict[int, int] = field(default_factory=dict)
    duplicates: int = 0
    unmapped: int = 0
    elapsed: float = 0.0

    def note_barcode(self, result) -> None:
        self.barcodes += 1
        self.reads += len(result.reads)
        if result.ran_rfa:
            self.rfa_barcodes += 1
            self.molecules += result.n_molecules
        for alist in result.alignments:
            for a in alist:
                if a.active:
                    bucket = min(a.mapq // 10 * 10, 60)
                    self.mapq_hist[bucket] = self.mapq_hist.get(bucket, 0) + 1
                    if a.duplicate:
                        self.duplicates += 1
                    if a.is_unmapped():
                        self.unmapped += 1

    def finish(self, elapsed: float) -> None:
        self.elapsed = elapsed

    # -- multi-host aggregation: fixed-width int vector for the allreduce
    _MAPQ_BUCKETS = (0, 10, 20, 30, 40, 50, 60)

    def to_vector(self):
        import numpy as np

        v = [self.reads, self.barcodes, self.rfa_barcodes, self.molecules,
             self.duplicates, self.unmapped]
        v += [self.mapq_hist.get(b, 0) for b in self._MAPQ_BUCKETS]
        return np.asarray(v, dtype=np.int64)

    @classmethod
    def from_vector(cls, v) -> "RunStats":
        s = cls(
            reads=int(v[0]), barcodes=int(v[1]), rfa_barcodes=int(v[2]),
            molecules=int(v[3]), duplicates=int(v[4]), unmapped=int(v[5]),
        )
        for i, b in enumerate(cls._MAPQ_BUCKETS):
            if int(v[6 + i]):
                s.mapq_hist[b] = int(v[6 + i])
        return s

    def as_dict(self) -> Dict:
        return {
            "reads": self.reads,
            "barcodes": self.barcodes,
            "rfa_barcodes": self.rfa_barcodes,
            "molecules": self.molecules,
            "mapq_hist": dict(sorted(self.mapq_hist.items())),
            "duplicates": self.duplicates,
            "unmapped": self.unmapped,
            "elapsed_s": self.elapsed,
            "pairs_per_s": self.reads / self.elapsed if self.elapsed else 0.0,
        }
