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
    # durable byte offset per output shard file at the last flush; resume
    # truncates the shards back to these so records written after the
    # manifest save are discarded (exactly-once across crashes)
    offsets: dict = field(default_factory=dict)

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
                    "offsets": self.offsets,
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
            offsets=d.get("offsets", {}),
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
        process_index: int = 0,
        process_count: int = 1,
    ):
        import os as _os

        self.ckpt_path = ckpt_path
        self.save_every = int(
            _os.environ.get("ARACHNE_CHECKPOINT_EVERY", save_every)
        )
        # called before each manifest save so output buffers (BGZF blocks,
        # file buffers) are durably on disk before the manifest claims their
        # barcode sets as emitted; may return a {shard_file: byte_offset}
        # dict which is persisted for truncate-on-resume
        self.flush_fn = flush_fn
        # multi-host: this process handles barcode sets whose global index
        # i satisfies i % process_count == process_index (round-robin —
        # barcodes are independent work units, SURVEY.md 5)
        self.process_index = process_index
        self.process_count = max(1, process_count)
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

    @property
    def resume_offsets(self) -> dict:
        """Shard-file byte offsets from the previous generation's last
        manifest (empty on a fresh run)."""
        return self.ckpt.offsets if self.skip or self.ckpt.offsets else {}

    def __iter__(self):
        from ..io.fastq import iter_barcode_sets

        n = 0
        for i, (records, unique) in enumerate(
            iter_barcode_sets(self.ckpt.r1, self.ckpt.r2)
        ):
            if i % self.process_count != self.process_index:
                continue
            n += 1
            if n <= self.skip:
                continue
            yield records, unique

    def _save(self) -> None:
        if self.flush_fn is not None:
            offs = self.flush_fn()
            if offs:
                self.ckpt.offsets = offs
        self.ckpt.save(self.ckpt_path)

    def mark_done(self, n_sets: int, n_reads: int) -> None:
        """Call after the output for n_sets barcode sets has been handed to
        the writers; buffers are flushed before any manifest save so the
        manifest never claims records that are not on disk."""
        self.ckpt.barcode_sets_done += n_sets
        self.ckpt.reads_done += n_reads
        self._since_save += n_sets
        if self.ckpt_path and self._since_save >= self.save_every:
            self._save()
            self._since_save = 0

    def save_initial(self) -> None:
        """Record the post-header shard offsets before any work so a crash
        before the first periodic save still resumes exactly-once."""
        if self.ckpt_path:
            self._save()

    def finish(self) -> None:
        if self.ckpt_path:
            self._save()
