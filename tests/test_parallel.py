"""Mesh / sharded-index tests on the virtual CPU mesh."""

import numpy as np
import pytest

from arachne_tpu.config import MemOptions
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference
from arachne_tpu.parallel.mesh import make_mesh, sharded_extend, sharded_occ4

OPT = MemOptions()


@pytest.fixture(scope="module")
def idx(small_reference):
    packed = pack_reference(small_reference)
    fm = build_fmindex(packed)
    return FMIndex(packed, fm)


class TestShardedIndex:
    def test_sharded_occ4_matches_host(self, idx, rng):
        import jax

        mesh = make_mesh(min(8, len(jax.devices())))
        ks = rng.integers(0, idx.seq_len, 300).astype(np.int64)
        got = sharded_occ4(
            mesh, idx.fm.occ, idx.fm.bwt_words, idx.fm.L2,
            idx.primary, idx.seq_len, ks,
        )
        exp = idx.occ4(ks)
        assert np.array_equal(got, exp)


class TestShardedExtend:
    def test_matches_scalar(self, idx, rng):
        import jax

        from arachne_tpu.align import ksw
        from arachne_tpu.ops.sw_extend import clamp_band

        mesh = make_mesh(min(8, len(jax.devices())))
        B = 16
        qlen, tlen = 64, 96
        ts = rng.integers(0, 4, (B, tlen)).astype(np.int8)
        qs = np.full((B, qlen), 4, np.int8)
        qs[:, :50] = ts[:, :50]
        out = sharded_extend(
            mesh, OPT, qs, ts,
            np.full(B, 50, np.int32), np.full(B, tlen, np.int32),
            np.full(B, clamp_band(OPT, 50, 100, 5, 1), np.int32),
            np.full(B, 19, np.int32),
        )
        mat = OPT.scoring_matrix()
        for i in range(B):
            exp = ksw.extend2(
                qs[i, :50].astype(np.uint8), ts[i].astype(np.uint8), mat,
                6, 1, 6, 1, clamp_band(OPT, 50, 100, 5, 1), 5, 100, 19,
            )
            assert tuple(int(o[i]) for o in out) == exp
