"""Barcode-stream checkpoint/resume, topology-change safe.

The reference has no resume: a killed run restarts from FASTQ byte 0
(SURVEY.md 5).  Barcode sets are independent work units, so resume is
cheap: manifests record which global barcode sets are fully emitted; on
resume the reader skips those (sequential decompress-and-skip — no
alignment work) and writers open a new shard generation (`.gen<N>` suffix
before the extension).  BGZF streams concatenate, so downstream tooling
can cat the generations (or use `arachne_tpu merge`).

Topology independence: completed work is persisted as **claims**
``(generation g, host h, processes P, count n)`` — "the first ``n``
barcode sets of generation ``g``'s residual stream whose residual index
is ``h (mod P)``".  Generation ``g``'s residual stream is every set not
covered by claims of generations ``< g``.  A resume with ANY process
count globs every sibling manifest (``<base>`` and ``<base>.host*``),
unions their claims, replays them generation by generation, and
partitions the residue under the NEW topology as generation
``max(g)+1``.  So a 2-process run killed mid-flight resumes correctly
with 1 process (or 4), with no lost and no duplicated sets; mismatched
process counts WITHIN one generation fail loudly.

Exactly-once across crashes: output buffers are flushed before every
manifest save, the manifest carries each shard file's durable byte
offset, and resume truncates all known shards back to those offsets so
records written after the last save are discarded and their sets re-run.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class Claim:
    g: int   # generation (resume epoch)
    h: int   # host (process index) within that generation's fleet
    P: int   # process count of that generation's fleet
    n: int   # completed sets: the first n of this claim's residual slice


@dataclass
class Checkpoint:
    r1: str = ""
    r2: str = ""
    claims: List[Claim] = field(default_factory=list)
    # observed seconds between the last two manifest saves (0 before the
    # second save); `status` scales its staleness threshold from this
    # instead of guessing a flat timeout
    save_interval: float = 0.0
    # durable byte offset per output shard file at the last flush; resume
    # truncates the shards back to these so records written after the
    # manifest save are discarded (exactly-once across crashes)
    offsets: dict = field(default_factory=dict)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": 2,
                    "r1": self.r1,
                    "r2": self.r2,
                    "claims": [
                        {"g": c.g, "h": c.h, "P": c.P, "n": c.n} for c in self.claims
                    ],
                    "offsets": self.offsets,
                    "save_interval": self.save_interval,
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
        if d.get("version") != 2:
            raise RuntimeError(
                f"checkpoint manifest {path} uses an unsupported format "
                f"(version {d.get('version', 1)}): resuming it silently "
                f"would re-run everything while its .genN output shards "
                f"survive and later merge as duplicates. Delete the old "
                f"manifest and generation shards, or finish that run with "
                f"the code that wrote it."
            )
        return Checkpoint(
            r1=d.get("r1", ""),
            r2=d.get("r2", ""),
            claims=[Claim(c["g"], c["h"], c["P"], c["n"]) for c in d.get("claims", [])],
            offsets=d.get("offsets", {}),
            save_interval=float(d.get("save_interval", 0.0)),
        )


class CheckpointedStream:
    """Wraps iter_barcode_sets with claim-replay resume + periodic saves."""

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
        self.ckpt_path = ckpt_path
        self.save_every = int(os.environ.get("ARACHNE_CHECKPOINT_EVERY", save_every))
        # called before each manifest save so output buffers (BGZF blocks,
        # file buffers) are durably on disk before the manifest claims their
        # barcode sets as emitted; may return a {shard_file: byte_offset}
        # dict which is persisted for truncate-on-resume
        self.flush_fn = flush_fn
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self.r1, self.r2 = r1, r2

        merged: Dict[Tuple[int, int, int], int] = {}   # (g,h,P) -> max n
        self._offsets_union: dict = {}
        if ckpt_path:
            base = re.sub(r"\.host\d+$", "", ckpt_path)
            paths = sorted(set(_glob.glob(base) + _glob.glob(base + ".host*")))
            for p in paths:
                if p.endswith(".tmp"):
                    continue
                prev = Checkpoint.load(p)
                if prev is None or prev.r1 != r1 or prev.r2 != r2:
                    continue
                for c in prev.claims:
                    key = (c.g, c.h, c.P)
                    merged[key] = max(merged.get(key, 0), c.n)
                self._offsets_union.update(prev.offsets)
        self.prior_claims = [
            Claim(g, h, P, n) for (g, h, P), n in sorted(merged.items())
        ]
        # fail loudly on mismatched process counts within one generation —
        # such manifests cannot have partitioned the stream consistently
        byg: Dict[int, int] = {}
        for c in self.prior_claims:
            if byg.setdefault(c.g, c.P) != c.P:
                raise RuntimeError(
                    f"checkpoint manifests disagree on process count within "
                    f"generation {c.g}: {byg[c.g]} vs {c.P}"
                )
        self.generation = (
            max((c.g for c in self.prior_claims), default=-1) + 1
        )
        self.skip = sum(c.n for c in self.prior_claims)
        self.own = Claim(self.generation, process_index, self.process_count, 0)
        self.ckpt = Checkpoint(
            r1=r1, r2=r2, claims=self.prior_claims + [self.own],
            offsets=dict(self._offsets_union),
        )
        self._since_save = 0

    def agree_generation(self, gen: int) -> None:
        """Re-key this run's claim to the fleet-agreed generation.

        Multi-process launches agree via an allreduce-max BEFORE any
        manifest is written (parallel.distributed.allreduce_max_int): a
        slow host could otherwise glob a fast peer's fresh manifest and
        compute generation max+1, splitting the fleet across generations
        (whose claims would then overlap on replay).  Must be called
        before save_initial / iteration."""
        if gen < self.generation:
            raise RuntimeError(
                f"agreed generation {gen} behind local {self.generation}"
            )
        self.generation = gen
        self.own.g = gen

    def claims_digest(self) -> int:
        """Stable 63-bit digest of the merged prior-claim union.

        Allgathered alongside generation agreement (cli.py): if any
        resuming host's manifest glob missed a sibling's claims (NFS
        visibility lag, non-shared path), its digest differs and the fleet
        aborts BEFORE re-running — and duplicating — that host's completed
        sets.  The generation allreduce alone only agrees on the
        generation number, not the claim set."""
        import hashlib

        h = hashlib.md5()
        for c in self.prior_claims:
            h.update(f"{c.g}:{c.h}:{c.P}:{c.n};".encode())
        return int.from_bytes(h.digest()[:8], "big") >> 1

    @property
    def resume_offsets(self) -> dict:
        """Shard-file byte offsets from every prior manifest (empty on a
        fresh run); ALL of them are truncated, including other hosts'."""
        return self._offsets_union

    def __iter__(self):
        from ..io.fastq import iter_barcode_sets

        gens = sorted({c.g for c in self.prior_claims})
        by_gen: Dict[int, Dict[int, Claim]] = {}
        for c in self.prior_claims:
            by_gen.setdefault(c.g, {})[c.h] = c
        resid_cnt = {g: 0 for g in gens}
        taken: Dict[Tuple[int, int], int] = {(c.g, c.h): 0 for c in self.prior_claims}
        own_resid = 0
        for records, unique in iter_barcode_sets(self.r1, self.r2):
            claimed = False
            for g in gens:
                r = resid_cnt[g]
                resid_cnt[g] += 1
                cmap = by_gen[g]
                P = next(iter(cmap.values())).P
                c = cmap.get(r % P)
                if c is not None and taken[(c.g, c.h)] < c.n:
                    taken[(c.g, c.h)] += 1
                    claimed = True
                    break
            if claimed:
                continue
            mine = own_resid % self.process_count == self.process_index
            own_resid += 1
            if mine:
                yield records, unique

    def _save(self) -> None:
        import time as _time

        now = _time.time()
        if getattr(self, "_last_save_t", None) is not None:
            self.ckpt.save_interval = now - self._last_save_t
        self._last_save_t = now
        if self.flush_fn is not None:
            offs = self.flush_fn()
            if offs:
                self.ckpt.offsets = {**self._offsets_union, **offs}
        self.ckpt.save(self.ckpt_path)

    def mark_done(self, n_sets: int, n_reads: int) -> None:
        """Call after the output for n_sets barcode sets has been handed to
        the writers; buffers are flushed before any manifest save so the
        manifest never claims records that are not on disk."""
        self.own.n += n_sets
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
