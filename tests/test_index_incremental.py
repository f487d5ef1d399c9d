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
