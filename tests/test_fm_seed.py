"""Device seeding parity: collect_seeds_device == host collector."""

import numpy as np
import pytest

from arachne_tpu.align.smem import collect_seeds
from arachne_tpu.config import MemOptions
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference, unpack_2bit
from arachne_tpu.ops.fm_rank import DeviceFMIndex, occ4_device
from arachne_tpu.ops.fm_seed import collect_seeds_device

OPT = MemOptions()


@pytest.fixture(scope="module")
def ref(small_reference):
    packed = pack_reference(small_reference)
    fm = build_fmindex(packed)
    idx = FMIndex(packed, fm)
    fwd = unpack_2bit(packed.pac, 0, packed.l_pac)
    return idx, fwd


def same_smems(a, b):
    if len(a) != len(b):
        return False
    return all(
        (x.k, x.l, x.s, x.qb, x.qe) == (y.k, y.l, y.s, y.qb, y.qe)
        for x, y in zip(a, b)
    )


class TestDeviceSeeding:
    def test_occ4_device_parity(self, ref, rng):
        import jax.numpy as jnp

        idx, _ = ref
        dfm = DeviceFMIndex.from_host(idx)
        ks = np.concatenate(
            [rng.integers(-1, idx.seq_len + 1, 400),
             [-1, 0, idx.seq_len, idx.primary, idx.primary - 1]]
        ).astype(np.int32)
        got = np.asarray(occ4_device(dfm, jnp.asarray(ks)))
        exp = idx.occ4(ks.astype(np.int64))
        assert np.array_equal(got, exp)

    def test_clean_reads(self, ref, rng):
        idx, fwd = ref
        reads = []
        for _ in range(20):
            pos = int(rng.integers(0, len(fwd) - 130))
            r = fwd[pos : pos + 120].copy()
            if rng.integers(0, 2):
                r = (3 - r[::-1]).astype(np.uint8)
            reads.append(r)
        got = collect_seeds_device(idx, reads, OPT)
        for r, g in zip(reads, got):
            assert same_smems(g, collect_seeds(idx, r, OPT))

    def test_mutated_and_n_reads(self, ref, rng):
        idx, fwd = ref
        reads = []
        for _ in range(25):
            pos = int(rng.integers(0, len(fwd) - 160))
            r = fwd[pos : pos + 150].copy()
            for _ in range(int(rng.integers(0, 8))):
                j = int(rng.integers(0, 150))
                r[j] = (r[j] + 1) % 4
            if rng.integers(0, 3) == 0:
                r[int(rng.integers(0, 150))] = 4  # N
            reads.append(r)
        got = collect_seeds_device(idx, reads, OPT)
        for i, (r, g) in enumerate(zip(reads, got)):
            assert same_smems(g, collect_seeds(idx, r, OPT)), i

    def test_repeat_region_reads(self, ref, rng):
        """Reads in the planted repeat have multi-occurrence SMEMs which
        trigger the pass-2 re-seeding path."""
        idx, fwd = ref
        reads = [fwd[400 + 30 * i : 400 + 30 * i + 100].copy() for i in range(8)]
        got = collect_seeds_device(idx, reads, OPT)
        for i, (r, g) in enumerate(zip(reads, got)):
            assert same_smems(g, collect_seeds(idx, r, OPT)), i

    def test_short_and_edge_reads(self, ref, rng):
        idx, fwd = ref
        reads = [
            fwd[:25].copy(),                       # shorter than seed len? (25>19)
            fwd[-40:].copy(),                      # at the end of the genome
            np.full(30, 4, dtype=np.uint8),        # all N
            fwd[100:119].copy(),                   # exactly min_seed_len
        ]
        got = collect_seeds_device(idx, reads, OPT)
        for i, (r, g) in enumerate(zip(reads, got)):
            assert same_smems(g, collect_seeds(idx, r, OPT)), i


class TestDenseSeeding:
    """The dense numpy host engine must also match the scalar collector."""

    def test_random_reads(self, ref, rng):
        from arachne_tpu.align.smem_dense import collect_seeds_dense

        idx, fwd = ref
        reads = []
        for _ in range(30):
            pos = int(rng.integers(0, len(fwd) - 160))
            r = fwd[pos : pos + 140].copy()
            for _ in range(int(rng.integers(0, 7))):
                j = int(rng.integers(0, 140))
                r[j] = (r[j] + 1) % 4
            if rng.integers(0, 3) == 0:
                r[int(rng.integers(0, 140))] = 4
            reads.append(r)
        reads.append(np.full(30, 4, dtype=np.uint8))  # all-N
        reads.append(fwd[:19].copy())                 # min length
        got = collect_seeds_dense(idx, reads, OPT)
        for i, (r, g) in enumerate(zip(reads, got)):
            assert same_smems(g, collect_seeds(idx, r, OPT)), i


class TestNativeSeeding:
    """The C++ collector (the production host seeding engine) must match
    the scalar collector read-for-read."""

    def test_random_mutated_n_and_edge_reads(self, ref, rng):
        from arachne_tpu.align.smem_native import (
            collect_seeds_native,
            smem_available,
        )

        if not smem_available():
            pytest.skip("native smem library unavailable")
        idx, fwd = ref
        reads = []
        for _ in range(40):
            pos = int(rng.integers(0, len(fwd) - 160))
            r = fwd[pos : pos + 140].copy()
            for _ in range(int(rng.integers(0, 7))):
                j = int(rng.integers(0, 140))
                r[j] = (r[j] + 1) % 4
            if rng.integers(0, 3) == 0:
                r[int(rng.integers(0, 140))] = 4
            reads.append(r)
        # repeat-region reads exercise the pass-2 re-seed path
        reads += [fwd[400 + 30 * i : 400 + 30 * i + 100].copy() for i in range(8)]
        reads.append(np.full(30, 4, dtype=np.uint8))  # all-N
        reads.append(fwd[:19].copy())                 # min length
        reads.append(fwd[-40:].copy())                # genome end
        got = collect_seeds_native(idx, reads, OPT)
        for i, (r, g) in enumerate(zip(reads, got)):
            assert same_smems(g, collect_seeds(idx, r, OPT)), i


class TestWideRankPath:
    """int64 ("wide") device tables for genomes >= 2^31 rows: same jitted
    programs, int64 row coordinates/counters.  Verified against the host
    path on a small genome (a >2^31-row fixture would not fit CI); the
    engine auto-selects wide from seq_len (ops/engine.py)."""

    def test_occ4_wide_parity(self, ref, rng):
        import jax
        import jax.numpy as jnp

        idx, _ = ref
        try:
            dfm = DeviceFMIndex.from_host(idx, wide=True)
            assert dfm.idt == jnp.int64
            ks = np.concatenate(
                [rng.integers(-1, idx.seq_len + 1, 300),
                 [-1, 0, idx.seq_len, idx.primary, idx.primary - 1]]
            ).astype(np.int64)
            got = np.asarray(occ4_device(dfm, jnp.asarray(ks)))
            exp = idx.occ4(ks)
            assert np.array_equal(got, exp)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_narrow_kernels_unchanged_under_x64(self, ref, rng):
        """Wide tables flip jax_enable_x64 process-wide (fm_rank.py).  The
        narrow-path kernels pin explicit dtypes, so their outputs must be
        bit-identical (and stay int32) with the flag on — guards against a
        weakly-typed op sneaking into a compute path."""
        import jax
        import jax.numpy as jnp

        idx, _ = ref
        ks = np.concatenate(
            [rng.integers(-1, idx.seq_len + 1, 200),
             [-1, 0, idx.seq_len, idx.primary]]
        ).astype(np.int64)
        dfm32 = DeviceFMIndex.from_host(idx, wide=False)
        before = np.asarray(occ4_device(dfm32, jnp.asarray(ks, jnp.int32)))
        try:
            jax.config.update("jax_enable_x64", True)
            dfm32b = DeviceFMIndex.from_host(idx, wide=False)
            assert dfm32b.idt == jnp.int32
            after = occ4_device(dfm32b, jnp.asarray(ks).astype(jnp.int32))
            assert after.dtype == before.dtype
            assert np.array_equal(np.asarray(after), before)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_seeding_wide_parity(self, ref, rng):
        import jax

        idx, fwd = ref
        try:
            dfm = DeviceFMIndex.from_host(idx, wide=True)
            reads = []
            for _ in range(16):
                pos = int(rng.integers(0, len(fwd) - 110))
                r = fwd[pos : pos + 100].copy()
                for m in rng.integers(0, 100, int(rng.integers(0, 4))):
                    r[m] = (r[m] + 1) % 4
                if rng.integers(0, 2):
                    r = (3 - r[::-1]).astype(np.uint8)
                reads.append(r)
            got = collect_seeds_device(idx, reads, OPT, dfm=dfm)
            for r, g in zip(reads, got):
                assert same_smems(g, collect_seeds(idx, r, OPT))
        finally:
            jax.config.update("jax_enable_x64", False)
