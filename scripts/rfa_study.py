"""Runnable RFA-disambiguation study (rounds 3-4).

Two experiments, each aligning the same reads with and without barcode-joint
(RFA) alignment and comparing placements/MAPQ:

  1. `spaced-repeats` — the round-3 study fixture: 99.9%-identity repeat
     families spaced >= 95 kb on a 4 Mbp genome, uniform simulated
     coverage.  Finding (reproduced here): RFA-on/off outputs are
     IDENTICAL — paired-end + flank evidence already resolves what
     molecule context would, because uniform coverage anchors every
     molecule and near-identity copies still differ within a fragment.

  2. `decisive` — the fixture the round-3 diagnosis prescribed
     (io/simulate.py:make_rfa_decisive_fixture): EXACT copies >= 2x
     fragment length apart by > 50 kb, interior pairs with zero flank
     evidence, skewed coverage.  Finding: RFA-off coin-flips interior
     pairs at mapq ~3; RFA-on moves them all to the anchored molecule's
     copy at high MAPQ.  This is the value proposition of
     barcode-joint alignment (README.md:20-22) made measurable.

Usage: python scripts/rfa_study.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arachne_tpu.cli import main as cli_main  # noqa: E402
from arachne_tpu.io.simulate import (  # noqa: E402
    SimConfig,
    make_rfa_decisive_fixture,
    make_repeat_genome,
    simulate_linked_reads,
)


def parse_records(path):
    out = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            f = line.rstrip("\n").split("\t")
            flag = int(f[1])
            if flag & 0x100:
                continue
            read = 1 if flag & 0x40 else 2
            out[(f[0], read)] = (int(f[3]), int(f[4]))
    return out


def accuracy(recs):
    ok = tot = 0
    for (qname, read), (pos, _mapq) in recs.items():
        parts = qname.rsplit("_", 3)
        t1, t2 = int(parts[1]), int(parts[2])
        want = t1 if read == 1 else t2 - 149
        tot += 1
        ok += abs(pos - want) <= 20
    return ok / max(1, tot), tot


def run_pair(tag, workdir, fasta, r1, r2):
    on, off = os.path.join(workdir, f"{tag}_on"), os.path.join(workdir, f"{tag}_off")
    cli_main(["align", "--sam", on, fasta, r1, r2])
    cli_main(["align", "--sam", "--no-rfa", off, fasta, r1, r2])
    recs_on = parse_records(os.path.join(on, "bc_sorted_bam.sam"))
    recs_off = parse_records(os.path.join(off, "bc_sorted_bam.sam"))
    moved = [k for k in recs_on if k in recs_off and recs_on[k][0] != recs_off[k][0]]
    acc_on, tot = accuracy(recs_on)
    acc_off, _ = accuracy(recs_off)
    print(f"[{tag}] reads={tot}  accuracy RFA-on={acc_on:.4f}  RFA-off={acc_off:.4f}  "
          f"records moved by RFA={len(moved)}")
    return recs_on, recs_off, moved


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rfa_study"
    os.makedirs(workdir, exist_ok=True)

    # --- experiment 1: round-3 spaced-repeat fixture ---------------------
    fasta1 = os.path.join(workdir, "spaced.fa")
    genome = make_repeat_genome(
        4_000_000, n_families=5, copies=8, unit_len=2500, identity=0.999, seed=12
    )
    with open(fasta1, "w") as fh:
        fh.write(">chrT\n")
        for i in range(0, len(genome), 70):
            fh.write(genome[i : i + 70] + "\n")
    r1 = os.path.join(workdir, "spaced.R1.fq.gz")
    r2 = os.path.join(workdir, "spaced.R2.fq.gz")
    simulate_linked_reads(
        [("chrT", "", genome)], r1, r2,
        SimConfig(n_barcodes=40, molecules_per_barcode=3, molecule_len=30_000,
                  pairs_per_molecule=14, seed=9),
    )
    run_pair("spaced-repeats", workdir, fasta1, r1, r2)

    # --- experiment 2: the decisive fixture ------------------------------
    fasta2 = os.path.join(workdir, "decisive.fa")
    r1d = os.path.join(workdir, "decisive.R1.fq.gz")
    r2d = os.path.join(workdir, "decisive.R2.fq.gz")
    geom = make_rfa_decisive_fixture(fasta2, r1d, r2d)
    recs_on, recs_off, moved = run_pair("decisive", workdir, fasta2, r1d, r2d)
    a0, a1 = geom["pos_a"], geom["pos_a"] + geom["unit_len"]
    int_on = [(k, v) for k, v in recs_on.items()
              if (lambda p: int(p[1]) - 1 >= a0 and int(p[2]) <= a1)(k[0].rsplit("_", 3))]
    int_off = [(k, recs_off[k]) for k, _ in int_on]
    mq_on = sorted(v[1] for _, v in int_on)
    mq_off = sorted(v[1] for _, v in int_off)
    print(f"[decisive] interior reads: {len(int_on)}  "
          f"mapq RFA-on min/max={mq_on[0]}/{mq_on[-1]}  "
          f"RFA-off min/max={mq_off[0]}/{mq_off[-1]}")


if __name__ == "__main__":
    main()
