"""Linked-read simulation: molecules -> barcoded read pairs with truth.

Generates haplotagging-style data for the benchmark configs (BASELINE.md)
and accuracy validation: each barcode covers a few long molecules; read
pairs sample fragments from the molecules with sequencing errors.  Read
names encode the truth (`<contig>_<p1>_<p2>_<serial>`) so
runtime/accuracy.py can score placements.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}


@dataclass
class SimConfig:
    n_barcodes: int = 50
    molecules_per_barcode: int = 3
    molecule_len: int = 40_000
    pairs_per_molecule: int = 12
    read_len: int = 150
    fragment_mean: int = 350
    fragment_std: int = 50
    error_rate: float = 0.002
    # per-read probability of one sequencing indel (a skipped or inserted
    # base mid-read); read length stays read_len because the template
    # carries one spare base.  Default 0 keeps legacy fixtures byte-stable.
    indel_rate: float = 0.0
    vary_quals: bool = False      # per-base phred 20-40 instead of flat 'I'
    seed: int = 0
    # hard-path knobs: skewed barcode sizes + invalid barcodes exercise
    # the paths RFA exists for (max_occ subsampling, chain filtering,
    # 30k-read sets, BX/VX gating — bwamem.c:265-315, reader.go:236)
    pair_counts: Optional[List[int]] = None   # explicit pairs per barcode
    invalid_every: int = 0                    # every k-th barcode gets VX:i:0


def skewed_pair_counts(
    rng: np.random.Generator,
    n_barcodes: int,
    mean_pairs: int,
    sigma: float = 1.0,
    big_barcode_pairs: int = 0,
) -> List[int]:
    """Lognormal pairs-per-barcode (real linked-read libraries are heavily
    skewed), optionally with one giant barcode planted at the front."""
    raw = rng.lognormal(mean=0.0, sigma=sigma, size=n_barcodes)
    counts = np.maximum(1, (raw / raw.mean() * mean_pairs).astype(int)).tolist()
    if big_barcode_pairs:
        counts[0] = big_barcode_pairs
    return counts


def make_repeat_genome(
    length: int,
    n_families: int = 8,
    copies: int = 12,
    unit_len: int = 800,
    identity: float = 0.95,
    seed: int = 0,
) -> str:
    """Random genome with planted repeat families: each family is one
    random unit pasted at ``copies`` locations, each copy independently
    mutated to the target identity.  Exercises the reference's repeat
    machinery: max_occ=500 seed subsampling (bwamem.c:278-279), frac_rep
    (:265-272), chain filtering under overlap load, and RFA molecule
    disambiguation (the reason barcode-joint alignment exists)."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, length).astype(np.uint8)
    for _f in range(n_families):
        unit = rng.integers(0, 4, unit_len).astype(np.uint8)
        for _c in range(copies):
            at = int(rng.integers(0, length - unit_len))
            copy = unit.copy()
            n_mut = rng.binomial(unit_len, 1.0 - identity)
            sites = rng.integers(0, unit_len, n_mut)
            copy[sites] = (copy[sites] + rng.integers(1, 4, n_mut)) % 4
            g[at : at + unit_len] = copy
    return "".join("ACGT"[c] for c in g)


def make_rfa_decisive_fixture(
    out_fasta: str,
    out_r1: str,
    out_r2: str,
    genome_len: int = 400_000,
    unit_len: int = 4_000,
    pos_a: int = 100_000,
    pos_b: int = 260_000,
    read_len: int = 150,
    frag: int = 350,
    n_anchor_pairs: int = 16,
    n_interior_pairs: int = 12,
    n_background_barcodes: int = 2,
    seed: int = 33,
) -> dict:
    """The fixture where barcode-joint (RFA) alignment is *decisive*.

    Constructed to the round-3 study's prescription of what plain
    paired-end + flank evidence cannot resolve (BASELINE.md round-3 row):

      * one repeat unit of ``unit_len`` >= 2x fragment length, copied
        EXACTLY (100% identity) at two loci > 50 kb apart (so the copies
        cannot merge into one molecule, aligner.go:1306) — interior read
        pairs lie fully inside the unit and tie *exactly* between copies;
      * one molecule covering copy A plus unique flanks, anchored by
        anchor pairs in the flanks (unambiguous, > 4 actives, so the true
        molecule is active, aligner.go:1239-1249);
      * zero coverage at copy B (skewed coverage) and zero sequencing
        errors (keeps the tie exact).

    Without molecule evidence the interior pairs are coin-flipped between
    copies by the md5 jitter (aligner.go:1415-1418) at mapq ~3; with RFA
    the wrong-copy cluster's reads all have candidates inside the true
    molecule, so migrating them empties the wrong-copy molecule for a
    strictly positive Δ (+3 death bonus + 0.5/read prior refund,
    aligner.go:1201-1228) while the reverse move cannot fire (the anchors
    have no candidates at copy B).  Returns the fixture geometry for
    assertions."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, genome_len).astype(np.uint8)
    g[pos_b : pos_b + unit_len] = g[pos_a : pos_a + unit_len]
    genome = "".join("ACGT"[c] for c in g)
    contigs = [("chrR", "", genome)]
    with open(out_fasta, "w") as fh:
        fh.write(">chrR\n")
        for i in range(0, genome_len, 70):
            fh.write(genome[i : i + 70] + "\n")

    serial = 0

    def emit(f1, f2, bc: str, pos: int, flen: int) -> None:
        nonlocal serial
        fragment = genome[pos : pos + flen]
        r1 = fragment[:read_len]
        r2 = revcomp_str(fragment[-read_len:])
        qname = f"chrR_{pos + 1}_{pos + flen}_{serial}"
        serial += 1
        hdr = f"BX:Z:{bc}\tVX:i:1"
        f1.write(f"@{qname}/1\t{hdr}\n{r1}\n+\n{'I' * read_len}\n")
        f2.write(f"@{qname}/2\t{hdr}\n{r2}\n+\n{'I' * read_len}\n")

    interior_lo = pos_a + 60
    interior_hi = pos_a + unit_len - frag - 60
    with gzip.open(out_r1, "wt") as f1, gzip.open(out_r2, "wt") as f2:
        bc = _barcode(0)
        half = n_anchor_pairs // 2
        # left-flank anchors (fully in unique sequence)
        for i in range(half):
            start = pos_a - 3800 + i * (3300 - frag) // max(1, half - 1)
            emit(f1, f2, bc, start, frag)
        # right-flank anchors
        for i in range(n_anchor_pairs - half):
            start = pos_a + unit_len + 50 + i * (3200 - frag) // max(1, half - 1)
            emit(f1, f2, bc, start, frag)
        # interior pairs: fragments fully inside the repeat unit
        for i in range(n_interior_pairs):
            start = interior_lo + i * (interior_hi - interior_lo) // max(
                1, n_interior_pairs - 1
            )
            emit(f1, f2, bc, start, frag)
        # background barcodes in unique territory
        for b in range(n_background_barcodes):
            bcb = _barcode(b + 1)
            base = 170_000 + b * 60_000
            for i in range(8):
                emit(f1, f2, bcb, base + i * 900, frag)
    return {
        "contig": "chrR",
        "pos_a": pos_a,
        "pos_b": pos_b,
        "unit_len": unit_len,
        "n_interior_pairs": n_interior_pairs,
        "n_pairs": serial,
    }


def _barcode(i: int) -> str:
    a, rest = divmod(i, 96 * 96 * 96)
    c, rest = divmod(rest, 96 * 96)
    b, d = divmod(rest, 96)
    return f"A{a % 96 + 1:02d}C{c + 1:02d}B{b + 1:02d}D{d + 1:02d}"


def revcomp_str(s: str) -> str:
    return s.translate(str.maketrans("ACGTN", "TGCAN"))[::-1]


def _apply_read_errors(template: str, cfg: "SimConfig", rng) -> List[str]:
    """Substitution + optional single-indel sequencing errors.

    ``template`` is read_len+1 bases of the true fragment (one spare base)
    so a deletion error pulls the next true base in and an insertion
    truncates — the emitted read is always exactly read_len long, but its
    alignment to the reference genuinely contains an I or D op."""
    L = cfg.read_len
    r = list(template[:L])
    n_err = rng.poisson(cfg.error_rate * L)
    for _ in range(n_err):
        j = int(rng.integers(0, L))
        r[j] = "ACGT"[int(rng.integers(0, 4))]
    if cfg.indel_rate and rng.random() < cfg.indel_rate:
        j = int(rng.integers(8, L - 8))
        if rng.random() < 0.5 and len(template) > L:
            # deletion: sequencer skipped base j; read covers one extra ref base
            r = r[:j] + list(template[j + 1 : L + 1])
        else:
            # insertion: spurious base at j; read covers one fewer ref base
            r = r[:j] + ["ACGT"[int(rng.integers(0, 4))]] + r[j : L - 1]
    return r


def _qual_string(cfg: "SimConfig", rng) -> str:
    if not cfg.vary_quals:
        return "I" * cfg.read_len
    phreds = rng.integers(20, 41, cfg.read_len)
    return "".join(chr(33 + int(q)) for q in phreds)


def simulate_linked_reads(
    contigs: List[Tuple[str, str, str]],
    out_r1: str,
    out_r2: str,
    cfg: Optional[SimConfig] = None,
) -> int:
    """Write barcode-sorted standard-format gzipped FASTQ; returns #pairs."""
    cfg = cfg or SimConfig()
    rng = np.random.default_rng(cfg.seed)
    total = 0
    serial = 0
    with gzip.open(out_r1, "wt") as f1, gzip.open(out_r2, "wt") as f2:
        for bi in range(cfg.n_barcodes):
            bc = _barcode(bi)
            valid = 1
            if cfg.invalid_every and (bi + 1) % cfg.invalid_every == 0:
                valid = 0
            if cfg.pair_counts is not None:
                want = cfg.pair_counts[bi]
                n_mols = -(-want // cfg.pairs_per_molecule)
            else:
                want = cfg.molecules_per_barcode * cfg.pairs_per_molecule
                n_mols = cfg.molecules_per_barcode
            emitted = 0
            for _mi in range(n_mols):
                if emitted >= want:
                    break
                ci = int(rng.integers(0, len(contigs)))
                name, _, seq = contigs[ci]
                if len(seq) <= cfg.molecule_len + cfg.fragment_mean:
                    mol_start = 0
                    mol_len = len(seq)
                else:
                    mol_start = int(rng.integers(0, len(seq) - cfg.molecule_len))
                    mol_len = cfg.molecule_len
                for _p in range(min(cfg.pairs_per_molecule, want - emitted)):
                    frag = int(
                        np.clip(
                            rng.normal(cfg.fragment_mean, cfg.fragment_std),
                            2 * cfg.read_len,
                            mol_len,
                        )
                    )
                    pos = mol_start + int(rng.integers(0, max(mol_len - frag, 1)))
                    fragment = seq[pos : pos + frag]
                    if len(fragment) < 2 * cfg.read_len:
                        continue
                    # templates carry one spare base so an indel error can
                    # keep the emitted read at read_len
                    t1 = fragment[: cfg.read_len + 1]
                    t2 = revcomp_str(fragment[-(cfg.read_len + 1):])
                    r1 = _apply_read_errors(t1, cfg, rng)
                    r2 = _apply_read_errors(t2, cfg, rng)
                    qname = f"{name}_{pos + 1}_{pos + frag}_{serial}"
                    serial += 1
                    hdr = f"BX:Z:{bc}\tVX:i:{valid}"
                    q1 = _qual_string(cfg, rng)
                    q2 = _qual_string(cfg, rng)
                    f1.write(f"@{qname}/1\t{hdr}\n{''.join(r1)}\n+\n{q1}\n")
                    f2.write(f"@{qname}/2\t{hdr}\n{''.join(r2)}\n+\n{q2}\n")
                    total += 1
                    emitted += 1
    return total
