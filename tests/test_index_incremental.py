"""Parity tests for the memory-proportional incremental index build.

The incremental path (native/ropebwt.cpp dynamic-BWT + sa_sample_walk)
must produce bit-identical FMIndexData to the suffix-array route
(bwt_from_sa), mirroring how the reference's ropebwt2 path
(bwtindex.c:271, rope.c) and its IS path agree on the .bwt file.
"""

import numpy as np
import pytest

from arachne_tpu.index.build import (
    build_fmindex,
    build_fmindex_incremental,
    bwt_from_sa,
    codes2_packed,
    pack_2bit,
    pack_bwt_words,
    occ_checkpoints,
    pack_reference,
    suffix_array,
    unpack_2bit,
)
from arachne_tpu.native import (
    rb_bwt_build_native,
    ropebwt_available,
    sa_sample_walk_native,
)

pytestmark = pytest.mark.skipif(
    not ropebwt_available(), reason="native toolchain unavailable"
)


def test_incremental_bwt_matches_sa_route_random_strings():
    rng = np.random.default_rng(0)
    for _ in range(12):
        n = int(rng.integers(1, 4000))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sa = suffix_array(codes)
        want_bwt, want_primary = bwt_from_sa(codes, sa)
        got_pac2, got_primary = rb_bwt_build_native(pack_2bit(codes), n)
        assert got_primary == want_primary
        assert np.array_equal(unpack_2bit(got_pac2, 0, n), want_bwt)


def test_incremental_bwt_leaf_split_stress():
    # long run-heavy string forces skewed insert positions and many splits
    rng = np.random.default_rng(1)
    codes = np.repeat(
        rng.integers(0, 4, 3000).astype(np.uint8), rng.integers(1, 40, 3000)
    )
    n = len(codes)
    sa = suffix_array(codes)
    want_bwt, want_primary = bwt_from_sa(codes, sa)
    got_pac2, got_primary = rb_bwt_build_native(pack_2bit(codes), n)
    assert got_primary == want_primary
    assert np.array_equal(unpack_2bit(got_pac2, 0, n), want_bwt)


def test_sa_sample_walk_matches_direct_sampling():
    rng = np.random.default_rng(2)
    n = 4096
    codes = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(codes)
    bwt, primary = bwt_from_sa(codes, sa)
    words = pack_bwt_words(bwt)
    occ = occ_checkpoints(bwt)
    L2 = np.zeros(5, dtype=np.int64)
    np.cumsum(np.bincount(codes, minlength=4).astype(np.int64), out=L2[1:])
    want = sa[np.arange(0, n + 1, 32)].astype(np.int64)
    want[0] = -1
    got = sa_sample_walk_native(words, occ, L2, primary, n, 32)
    assert np.array_equal(got, want)


def test_parallel_anchored_walk_matches_serial():
    """sa_sample_walk_par (chunked walks from backward-searched anchor
    rows, the round-5 parallel path) against the serial single-chain walk
    AND direct SA sampling, over a text with planted repeats (anchor
    windows must skip over non-unique regions)."""
    from arachne_tpu.index.build import pack_2bit

    rng = np.random.default_rng(7)
    n = 200_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    unit = codes[1000:3000].copy()
    for at in (50_000, 90_000, 130_000):   # exact 2 kb repeats
        codes[at : at + 2000] = unit
    sa = suffix_array(codes)
    bwt, primary = bwt_from_sa(codes, sa)
    words = pack_bwt_words(bwt)
    occ = occ_checkpoints(bwt)
    L2 = np.zeros(5, dtype=np.int64)
    np.cumsum(np.bincount(codes, minlength=4).astype(np.int64), out=L2[1:])
    want = sa[np.arange(0, n + 1, 32)].astype(np.int64)
    want[0] = -1
    serial = sa_sample_walk_native(words, occ, L2, primary, n, 32)
    for n_chunks in (1, 7, 64):
        par = sa_sample_walk_native(
            words, occ, L2, primary, n, 32,
            pac2=pack_2bit(codes), n_chunks=n_chunks,
        )
        assert np.array_equal(par, want), f"n_chunks={n_chunks}"
    assert np.array_equal(serial, want)


def _random_contigs(rng, sizes):
    out = []
    for i, size in enumerate(sizes):
        s = rng.choice(list("ACGT"), size)
        idx = rng.integers(0, size, size // 100)
        s[idx] = "N"
        out.append((f"c{i}", "", "".join(s)))
    return out


def test_full_fmindex_parity_with_contigs_and_ns():
    rng = np.random.default_rng(3)
    packed = pack_reference(_random_contigs(rng, [40_000, 25_000]))
    fm_a = build_fmindex(packed, keep_full_sa=False)
    fm_b = build_fmindex_incremental(packed)
    assert fm_a.seq_len == fm_b.seq_len
    assert fm_a.primary == fm_b.primary
    assert np.array_equal(fm_a.L2, fm_b.L2)
    assert np.array_equal(fm_a.bwt_words, fm_b.bwt_words)
    assert np.array_equal(fm_a.occ, fm_b.occ)
    assert np.array_equal(fm_a.sa_sampled, fm_b.sa_sampled)


def test_codes2_packed_matches_dense_construction():
    rng = np.random.default_rng(4)
    packed = pack_reference(_random_contigs(rng, [10_003]))  # odd length
    fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
    rev = (3 - fwd[::-1]).astype(np.uint8)
    want = np.concatenate([fwd, rev])
    pac2, counts = codes2_packed(packed, chunk=4096)
    assert np.array_equal(unpack_2bit(pac2, 0, 2 * packed.l_pac), want)
    assert np.array_equal(counts, np.bincount(want, minlength=4))


def test_align_against_incremental_index(tmp_path):
    """Full pipeline e2e on an index built by the incremental path: the
    on-disk artifact, not just the in-memory arrays, must be equivalent
    (load -> simulate -> align -> perfect accuracy)."""
    import os

    import numpy as np

    from arachne_tpu.cli import main as cli_main
    from arachne_tpu.index.build import build_index_files
    from arachne_tpu.io.simulate import SimConfig, simulate_linked_reads
    from arachne_tpu.runtime.accuracy import evaluate_sam

    rng = np.random.default_rng(8)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 400_000))
    fasta = str(tmp_path / "inc.fa")
    with open(fasta, "w") as fh:
        fh.write(">chrZ\n")
        for i in range(0, len(genome), 70):
            fh.write(genome[i : i + 70] + "\n")
    build_index_files(fasta, build_mode="incremental")
    r1, r2 = str(tmp_path / "i.R1.fq.gz"), str(tmp_path / "i.R2.fq.gz")
    n = simulate_linked_reads(
        [("chrZ", "", genome)], r1, r2,
        SimConfig(n_barcodes=4, molecules_per_barcode=2, molecule_len=9000,
                  pairs_per_molecule=8, indel_rate=0.2, seed=5),
    )
    out = str(tmp_path / "out")
    cli_main(["align", "--sam", out, fasta, r1, r2])
    stats = evaluate_sam(os.path.join(out, "bc_sorted_bam.sam"))
    assert stats.total == 2 * n
    assert stats.correct / stats.total >= 0.99
