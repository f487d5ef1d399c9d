"""Unit tests for index construction + FM-index queries vs brute force."""

import numpy as np
import pytest

from arachne_tpu.index import (
    FMIndex,
    build_fmindex,
    pack_reference,
    suffix_array,
    unpack_2bit,
)
from arachne_tpu.index.build import NT4_TABLE, pack_2bit
from arachne_tpu.utils.rng import Lrand48, hash_64


def codes_of(s):
    return NT4_TABLE[np.frombuffer(s.encode(), dtype=np.uint8)]


def brute_suffix_array(s):
    n = len(s)
    suffixes = sorted(range(n + 1), key=lambda i: s[i:])
    return np.array(suffixes, dtype=np.int64)


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        codes = rng.integers(0, 4, size=1001).astype(np.uint8)
        pac = pack_2bit(codes)
        assert np.array_equal(unpack_2bit(pac, 0, 1001), codes)
        assert np.array_equal(unpack_2bit(pac, 17, 250), codes[17:250])

    def test_pack_reference_anns_and_ambs(self, small_reference):
        packed = pack_reference(small_reference)
        assert packed.n_seqs == 2
        assert packed.anns[0].offset == 0
        assert packed.anns[1].offset == packed.anns[0].length
        assert packed.l_pac == sum(a.length for a in packed.anns)
        # the N-run in chr2 is recorded as one hole
        assert len(packed.ambs) == 1
        assert packed.ambs[0].length == 25
        assert packed.ambs[0].amb == "N"

    def test_n_randomization_is_lrand48(self):
        # replicate add1: srand48(11), lrand48()&3 per ambiguous base
        seq = "ACGTNNNNACGT"
        packed = pack_reference([("c", "", seq)])
        rng = Lrand48(11)
        expect = [rng.lrand48() & 3 for _ in range(4)]
        got = unpack_2bit(packed.pac, 4, 8).tolist()
        assert got == expect


class TestSuffixArray:
    @pytest.mark.parametrize("s", ["ACGT", "AAAA", "ACGTACGTACGT", "GATTACA" * 9])
    def test_matches_brute_force(self, s):
        codes = codes_of(s)
        got = suffix_array(codes)
        # brute force with $ smallest: use chr(0) sentinel on 1-shifted codes
        shifted = "".join(chr(c + 1) for c in codes)
        expect = brute_suffix_array(shifted)
        assert np.array_equal(got, expect)

    def test_random(self, rng):
        codes = rng.integers(0, 4, size=500).astype(np.uint8)
        shifted = "".join(chr(c + 1) for c in codes)
        assert np.array_equal(suffix_array(codes), brute_suffix_array(shifted))

    def test_sais_lean_parity(self, rng):
        """The memory-lean production SA-IS (sais_u8_i64) against the
        straightforward implementation kept as oracle (sais_ref_u8_i64),
        over adversarial shapes: random, periodic, constant, long runs."""
        import ctypes

        from arachne_tpu.native import get_lib

        lib = get_lib()
        if lib is None or not hasattr(lib, "sais_ref_u8_i64"):
            pytest.skip("native library unavailable")
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)

        def run(fn, s):
            sa = np.empty(len(s), dtype=np.int64)
            assert fn(s.ctypes.data_as(u8p), sa.ctypes.data_as(i64p),
                      np.int64(len(s)), np.int64(6)) == 0
            return sa

        cases = [
            rng.integers(1, 5, size=4097).astype(np.uint8),
            np.tile(np.array([1, 2, 3], np.uint8), 500),
            np.full(1000, 2, np.uint8),
            np.repeat(rng.integers(1, 5, size=40).astype(np.uint8), 53),
        ]
        for codes in cases:
            s = np.concatenate([codes, np.zeros(1, np.uint8)])
            assert np.array_equal(
                run(lib.sais_u8_i64, s), run(lib.sais_ref_u8_i64, s)
            )


class TestFMIndex:
    @pytest.fixture(scope="class")
    def fixture(self, small_reference):
        packed = pack_reference(small_reference)
        fm = build_fmindex(packed)
        fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
        codes2 = np.concatenate([fwd, (3 - fwd[::-1]).astype(np.uint8)])
        return FMIndex(packed, fm), codes2

    def test_occ_vs_brute(self, fixture, rng):
        idx, codes2 = fixture
        n = idx.seq_len
        # brute-force occ: rank of char c among BWT chars of rows <= k
        sa = idx.fm.sa
        bwt_full = np.where(sa > 0, codes2[sa - 1], 255)  # 255 marks $ row
        ks = np.concatenate(
            [rng.integers(0, n, size=300), np.array([-1, 0, 1, n, idx.primary, idx.primary - 1])]
        ).astype(np.int64)
        for c in range(4):
            got = idx.occ(ks, c)
            for k, g in zip(ks, got):
                if k == -1:
                    e = 0
                elif k == n:
                    e = int(idx.L2[c + 1] - idx.L2[c])
                else:
                    e = int((bwt_full[: k + 1] == c).sum())
                assert g == e, (k, c, g, e)

    def test_occ4_matches_occ(self, fixture, rng):
        idx, _ = fixture
        ks = rng.integers(-1, idx.seq_len + 1, size=200).astype(np.int64)
        o4 = idx.occ4(ks)
        for c in range(4):
            assert np.array_equal(o4[:, c], idx.occ(ks, c))

    def test_backward_search_counts(self, fixture, rng):
        """Exact-match interval size == naive substring occurrence count."""
        idx, codes2 = fixture
        n = idx.seq_len
        text = codes2
        for trial in range(25):
            pos = int(rng.integers(0, n - 40))
            pat = text[pos : pos + 20]
            # backward search (bwt_match_exact semantics, bwt.c:222-239)
            k, l = 0, n
            for c in pat[::-1]:
                ok = idx.occ(np.array([k - 1]), int(c))[0]
                ol = idx.occ(np.array([l]), int(c))[0]
                k = int(idx.L2[c] + ok + 1)
                l = int(idx.L2[c] + ol)
                if k > l:
                    break
            count = max(0, l - k + 1)
            # naive count
            naive = 0
            pl = len(pat)
            for i in range(n - pl + 1):
                if np.array_equal(text[i : i + pl], pat):
                    naive += 1
            assert count == naive, (trial, pos, count, naive)

    def test_sa_full_vs_walk(self, fixture, rng):
        idx, _ = fixture
        ks = rng.integers(1, idx.seq_len + 1, size=150).astype(np.int64)
        full = idx.sa(ks)
        # force the sampled-walk path
        fm2 = idx.fm
        saved = fm2.sa
        fm2.sa = None
        try:
            walked = idx.sa(ks)
        finally:
            fm2.sa = saved
        assert np.array_equal(full, walked)

    def test_extend_matches_search(self, fixture, rng):
        """bwt_extend backward step == direct backward search step."""
        idx, codes2 = fixture
        n = idx.seq_len
        for _ in range(10):
            pos = int(rng.integers(0, n - 30))
            pat = codes2[pos : pos + 12]
            c0 = int(pat[-1])
            x0, x1, x2 = idx.set_intv(np.array([c0]))
            for c in pat[-2::-1]:
                o0, o1, osz = idx.extend(x0, x1, x2, is_back=True)
                nx0, nx1, nx2 = o0[:, c], o1[:, c], osz[:, c]
                # compare against plain backward search: rows [x0, x0+x2-1]
                ok = idx.occ(np.array([x0[0] - 1]), int(c))[0]
                ol = idx.occ(np.array([x0[0] - 1 + x2[0]]), int(c))[0]
                assert nx0[0] == idx.L2[c] + ok + 1
                assert nx2[0] == ol - ok
                x0, x1, x2 = nx0, nx1, nx2
                if x2[0] <= 0:
                    break

    def test_sa_positions_are_matches(self, fixture, rng):
        idx, codes2 = fixture
        n = idx.seq_len
        pos = int(rng.integers(0, n - 40))
        pat = codes2[pos : pos + 25]
        k, l = 0, n
        for c in pat[::-1]:
            ok = idx.occ(np.array([k - 1]), int(c))[0]
            ol = idx.occ(np.array([l]), int(c))[0]
            k = int(idx.L2[c] + ok + 1)
            l = int(idx.L2[c] + ol)
        assert k <= l
        rows = np.arange(k, l + 1)
        hits = idx.sa(rows)
        for h in hits:
            assert np.array_equal(codes2[h : h + 25], pat)

    def test_coordinate_functions(self, fixture):
        idx, _ = fixture
        l1 = idx.packed.anns[0].length
        fpos, is_rev = idx.depos(np.array([5, idx.seq_len - 6], dtype=np.int64))
        assert fpos[0] == 5 and not is_rev[0]
        assert fpos[1] == 5 and is_rev[1]
        assert idx.pos2rid(np.array([0, l1 - 1, l1], dtype=np.int64)).tolist() == [0, 0, 1]
        # get_seq reverse strand equals revcomp of forward
        f = idx.get_seq(100, 150)
        r = idx.get_seq(idx.seq_len - 150, idx.seq_len - 100)
        assert np.array_equal(r, (3 - f[::-1]))

    def test_get_contig_seq(self, fixture, small_reference):
        idx, _ = fixture
        expect = codes_of(small_reference[0][2][200:260])
        assert np.array_equal(idx.get_contig_seq("chr1", 200, 260), expect)
        rc = (3 - expect[::-1]).astype(np.uint8)
        assert np.array_equal(idx.get_contig_seq("chr1", 200, 260, reversed_=True), rc)


def test_hash64_known_values():
    # invariance check: deterministic and 64-bit
    assert hash_64(0) == hash_64(0)
    assert hash_64(1) != hash_64(2)
    assert 0 <= hash_64(12345) < (1 << 64)


class TestBwaDiskFormat:
    def test_roundtrip(self, small_reference, tmp_path, rng):
        from arachne_tpu.index.bwaio import load_bwa_index, save_bwa_index
        from arachne_tpu.index import build_fmindex, pack_reference, FMIndex

        packed = pack_reference(small_reference)
        fm = build_fmindex(packed)
        prefix = str(tmp_path / "ref.fa")
        save_bwa_index(prefix, packed, fm)
        for ext in (".pac", ".ann", ".amb", ".bwt", ".sa"):
            assert (tmp_path / ("ref.fa" + ext)).exists()
        packed2, fm2 = load_bwa_index(prefix)
        assert packed2.l_pac == packed.l_pac
        assert np.array_equal(packed2.pac, packed.pac)
        assert [a.name for a in packed2.anns] == [a.name for a in packed.anns]
        assert [(h.offset, h.length) for h in packed2.ambs] == [
            (h.offset, h.length) for h in packed.ambs
        ]
        assert fm2.primary == fm.primary
        assert np.array_equal(fm2.L2, fm.L2)
        assert np.array_equal(fm2.occ, fm.occ)
        assert np.array_equal(fm2.bwt_words, fm.bwt_words)
        # loaded index answers queries identically (sampled-SA walk path)
        idx1 = FMIndex(packed, fm)
        idx2 = FMIndex(packed2, fm2)
        ks = rng.integers(1, fm.seq_len, 100).astype(np.int64)
        assert np.array_equal(idx1.sa(ks), idx2.sa(ks))
        for c in range(4):
            assert np.array_equal(idx1.occ(ks, c), idx2.occ(ks, c))


class TestNativeSA:
    def test_native_sa_walk_matches_numpy(self, rng):
        """sa_batch (native/smem.cpp) == the numpy inverse-Psi walk on a
        sampled-SA index, including edge rows."""
        from arachne_tpu.index import FMIndex, build_fmindex, pack_reference
        from arachne_tpu.native import get_lib

        if get_lib() is None or not hasattr(get_lib(), "sa_batch"):
            pytest.skip("native sa_batch unavailable")
        seq = "".join(
            np.array(list("ACGT"))[rng.integers(0, 4, 50_000)]
        )
        packed = pack_reference([("c1", "", seq)])
        fm = build_fmindex(packed, keep_full_sa=False)
        assert fm.sa is None
        idx = FMIndex(packed, fm)
        rows = np.concatenate(
            [rng.integers(0, idx.seq_len + 1, 5000),
             [0, 1, idx.seq_len, idx.primary, idx.primary + 1]]
        ).astype(np.int64)
        native = idx._sa_native(rows)
        assert native is not None
        import arachne_tpu.index.fmindex as F

        orig = F.FMIndex._sa_native
        F.FMIndex._sa_native = lambda self, k: None
        try:
            ref = idx.sa(rows)
        finally:
            F.FMIndex._sa_native = orig
        assert np.array_equal(native, ref)
