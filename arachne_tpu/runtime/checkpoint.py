"""Barcode-stream checkpoint/resume.

The reference has no resume: a killed run restarts from FASTQ byte 0
(SURVEY.md 5).  Barcode sets are independent work units, so resume is
cheap: we persist a manifest (JSON) recording how many barcode sets have
been fully emitted plus the output shard generation; on resume the reader
skips that many sets (sequential decompress-and-skip — no alignment work)
and writers open a new shard generation (`.gen<N>` suffix before the
extension).  BGZF streams concatenate, so downstream tooling can cat the
generations (or use `arachne_tpu merge`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Checkpoint:
    barcode_sets_done: int = 0
    reads_done: int = 0
    generation: int = 0
    r1: str = ""
    r2: str = ""

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "barcode_sets_done": self.barcode_sets_done,
                    "reads_done": self.reads_done,
                    "generation": self.generation,
                    "r1": self.r1,
                    "r2": self.r2,
                },
                fh,
            )
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> Optional["Checkpoint"]:
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            d = json.load(fh)
        return Checkpoint(
            barcode_sets_done=d.get("barcode_sets_done", 0),
            reads_done=d.get("reads_done", 0),
            generation=d.get("generation", 0),
            r1=d.get("r1", ""),
            r2=d.get("r2", ""),
        )


class CheckpointedStream:
    """Wraps iter_barcode_sets with skip-ahead resume + periodic saves."""

    def __init__(
        self,
        r1: str,
        r2: str,
        ckpt_path: Optional[str],
        save_every: int = 50,
        flush_fn=None,
    ):
        self.ckpt_path = ckpt_path
        self.save_every = save_every
        # called before each manifest save so output buffers (BGZF blocks,
        # file buffers) are durably on disk before the manifest claims their
        # barcode sets as emitted
        self.flush_fn = flush_fn
        self.ckpt = Checkpoint(r1=r1, r2=r2)
        self.skip = 0
        if ckpt_path:
            prev = Checkpoint.load(ckpt_path)
            if prev is not None and prev.r1 == r1 and prev.r2 == r2:
                self.skip = prev.barcode_sets_done
                self.ckpt = prev
                self.ckpt.generation += 1
        self._since_save = 0

    @property
    def generation(self) -> int:
        return self.ckpt.generation

    def __iter__(self):
        from ..io.fastq import iter_barcode_sets

        n = 0
        for records, unique in iter_barcode_sets(self.ckpt.r1, self.ckpt.r2):
            n += 1
            if n <= self.skip:
                continue
            yield records, unique

    def mark_done(self, n_sets: int, n_reads: int) -> None:
        """Call after the output for n_sets barcode sets has been handed to
        the writers; buffers are flushed before any manifest save so the
        manifest never claims records that are not on disk."""
        self.ckpt.barcode_sets_done += n_sets
        self.ckpt.reads_done += n_reads
        self._since_save += n_sets
        if self.ckpt_path and self._since_save >= self.save_every:
            if self.flush_fn is not None:
                self.flush_fn()
            self.ckpt.save(self.ckpt_path)
            self._since_save = 0

    def finish(self) -> None:
        if self.ckpt_path:
            if self.flush_fn is not None:
                self.flush_fn()
            self.ckpt.save(self.ckpt_path)
