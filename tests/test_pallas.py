"""Parity tests for the Pallas TPU kernels against the XLA formulations.

On the CPU test platform the Pallas kernels run in interpret mode; on a
real TPU the same tests exercise the compiled Mosaic path.  Both must be
bit-identical to the XLA kernels (which are themselves tested against the
scalar ksw oracles in test_ops.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arachne_tpu.config import MemOptions
from arachne_tpu.ops.sw_extend import clamp_band, extend_batch_kernel
from arachne_tpu.ops.pallas_extend import extend_batch_pallas

INTERPRET = jax.default_backend() != "tpu"


def _random_problems(seed, B, qmax, tmax, opt):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 5, (B, tmax)).astype(np.int8)
    qs = np.full((B, qmax), 4, np.int8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    ws = np.zeros(B, np.int32)
    h0s = np.zeros(B, np.int32)
    for i in range(B):
        ql = int(rng.integers(15, qmax + 1))
        tl = int(rng.integers(20, tmax + 1))
        q = ts[i, : ql].copy()
        nmut = int(rng.integers(0, 10))
        idx = rng.integers(0, ql, nmut)
        q[idx] = rng.integers(0, 5, nmut)
        qs[i, :ql] = q
        qlens[i] = ql
        tlens[i] = tl
        ws[i] = clamp_band(opt, ql, int(rng.integers(5, 120)), opt.pen_clip5, 1)
        h0s[i] = int(rng.integers(1, 50))
    return qs, ts, qlens, tlens, ws, h0s


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_extend_matches_xla(seed):
    opt = MemOptions()
    B, qmax, tmax = 64, 128, 192
    qs, ts, qlens, tlens, ws, h0s = _random_problems(seed, B, qmax, tmax, opt)
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = [jnp.asarray(x) for x in (qs, ts, qlens, tlens, ws, h0s)]
    kw = dict(
        qmax=qmax, tmax=tmax, o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
    )
    ref = extend_batch_kernel(*args, mat, **kw)
    got = extend_batch_pallas(
        *args, a=opt.a, b=opt.b, **kw, b_tile=64, interpret=INTERPRET
    )
    for name, r, g in zip(
        ("score", "qle", "tle", "gtle", "gscore", "max_off"), ref, got
    ):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g), err_msg=name)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_local_sw_matches_xla(seed):
    from arachne_tpu.ops.sw_local import local_sw_batch_kernel
    from arachne_tpu.ops.pallas_local import local_sw_batch_pallas

    opt = MemOptions()
    rng = np.random.default_rng(seed)
    B, qmax, tmax = 64, 96, 192
    ts = rng.integers(0, 5, (B, tmax)).astype(np.int8)
    qs = np.full((B, qmax), 4, np.int8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    ends = np.full(B, 0x10000, np.int32)
    for i in range(B):
        ql = int(rng.integers(15, qmax + 1))
        tl = int(rng.integers(20, tmax + 1))
        q = ts[i, 5 : 5 + ql].copy()
        nm = int(rng.integers(0, 8))
        idx = rng.integers(0, ql, nm)
        q[idx] = rng.integers(0, 5, nm)
        qs[i, :ql] = q
        qlens[i] = ql
        tlens[i] = tl
        if i % 3 == 0:
            ends[i] = int(rng.integers(10, 60))  # exercise early stop
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = [jnp.asarray(x) for x in (qs, ts, qlens, tlens, ends)]
    ref = local_sw_batch_kernel(
        *args, mat, qmax, tmax, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins
    )
    got = local_sw_batch_pallas(
        *args, qmax=qmax, tmax=tmax, a=opt.a, b=opt.b,
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        b_tile=64, interpret=INTERPRET,
    )
    for name, r, g in zip(("gmax", "te", "qe", "row_max"), ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g), err_msg=name)


@pytest.mark.parametrize("want_z", [False, True])
def test_pallas_global_matches_xla(want_z):
    from arachne_tpu.ops.sw_global import global_batch_kernel
    from arachne_tpu.ops.pallas_global import global_batch_pallas

    opt = MemOptions()
    rng = np.random.default_rng(4)
    B, qmax, tmax = 32, 96, 160
    ts = rng.integers(0, 5, (B, tmax)).astype(np.int8)
    qs = np.full((B, qmax), 4, np.int8)
    qlens = np.ones(B, np.int32)
    tlens = np.ones(B, np.int32)
    ws = np.ones(B, np.int32)
    for i in range(B):
        ql = int(rng.integers(15, qmax + 1))
        tl = max(1, min(tmax, ql + int(rng.integers(-10, 11))))
        q = ts[i, :ql].copy()
        nm = int(rng.integers(0, 8))
        idx = rng.integers(0, ql, nm)
        q[idx] = rng.integers(0, 5, nm)
        qs[i, :ql] = q
        qlens[i] = ql
        tlens[i] = tl
        ws[i] = int(rng.integers(3, 100))
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = [jnp.asarray(x) for x in (qs, ts, qlens, tlens, ws)]
    ref_s, ref_z = global_batch_kernel(
        *args, mat, qmax, tmax, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        want_z=want_z,
    )
    got_s, got_z = global_batch_pallas(
        *args, qmax=qmax, tmax=tmax, a=opt.a, b=opt.b,
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        want_z=want_z, b_tile=32, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
    if want_z:
        np.testing.assert_array_equal(np.asarray(ref_z), np.asarray(got_z))


def test_pallas_extend_zdrop_disabled():
    opt = MemOptions(zdrop=0)
    B, qmax, tmax = 64, 64, 128
    qs, ts, qlens, tlens, ws, h0s = _random_problems(7, B, qmax, tmax, opt)
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = [jnp.asarray(x) for x in (qs, ts, qlens, tlens, ws, h0s)]
    kw = dict(
        qmax=qmax, tmax=tmax, o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=0,
    )
    ref = extend_batch_kernel(*args, mat, **kw)
    got = extend_batch_pallas(
        *args, a=opt.a, b=opt.b, **kw, b_tile=64, interpret=INTERPRET
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        from arachne_tpu.ops.packing import pack_codes, unpack_codes

        arr = rng.integers(0, 5, (16, 128)).astype(np.int8)
        p, n = pack_codes(arr)
        assert p.shape == (16, 32) and n.shape == (16, 16)
        back = np.asarray(unpack_codes(jnp.asarray(p), jnp.asarray(n), 128))
        assert np.array_equal(back, arr)

    def test_packed_entry_matches_raw(self, rng):
        """The packed jit entry must match the raw pallas entry bit-for-bit
        (interpret mode on CPU)."""
        from arachne_tpu.config import MemOptions
        from arachne_tpu.ops.packing import pack_codes
        from arachne_tpu.ops.pallas_extend import (
            extend_batch_pallas,
            extend_batch_pallas_packed,
        )

        opt = MemOptions()
        B, qmax, tmax = 8, 64, 128
        qs = rng.integers(0, 5, (B, qmax)).astype(np.int8)
        ts = rng.integers(0, 5, (B, tmax)).astype(np.int8)
        qlens = np.full(B, 48, np.int32)
        tlens = np.full(B, 100, np.int32)
        ws = np.full(B, 100, np.int32)
        h0s = np.full(B, 19, np.int32)
        kw = dict(
            qmax=qmax, tmax=tmax, a=opt.a, b=opt.b, o_del=opt.o_del,
            e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
            zdrop=opt.zdrop, b_tile=8, interpret=True,
        )
        raw = extend_batch_pallas(
            jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens),
            jnp.asarray(tlens), jnp.asarray(ws), jnp.asarray(h0s), **kw
        )
        qp, qn = pack_codes(qs)
        tp, tn = pack_codes(ts)
        packed = extend_batch_pallas_packed(
            jnp.asarray(qp), jnp.asarray(qn), jnp.asarray(tp), jnp.asarray(tn),
            jnp.asarray(qlens), jnp.asarray(tlens), jnp.asarray(ws),
            jnp.asarray(h0s), **kw
        )
        for r, p in zip(raw, packed):
            assert np.array_equal(np.asarray(r), np.asarray(p))


def test_bundled_entry_matches_raw():
    """The single-buffer (2-upload/1-fetch) extend entry is bit-identical
    to the raw-array entry: bundle_seqs/unbundle_seqs round the codes and
    the (4, B) meta stack through one uint8 buffer."""
    opt = MemOptions()
    B, qmax, tmax = 64, 128, 192
    qs, ts, qlens, tlens, ws, h0s = _random_problems(7, B, qmax, tmax, opt)
    from arachne_tpu.ops.packing import bundle_seqs
    from arachne_tpu.ops.pallas_extend import extend_batch_pallas_bundled

    kw = dict(
        qmax=qmax, tmax=tmax, a=opt.a, b=opt.b, o_del=opt.o_del,
        e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
    )
    ref = extend_batch_pallas(
        *[jnp.asarray(x) for x in (qs, ts, qlens, tlens, ws, h0s)],
        **kw, b_tile=64, interpret=INTERPRET,
    )
    u8 = bundle_seqs(qs, ts)
    meta = np.stack([qlens, tlens, ws, h0s]).astype(np.int32)
    got = extend_batch_pallas_bundled(
        jnp.asarray(u8), jnp.asarray(meta), **kw, b_tile=64,
        interpret=INTERPRET,
    )
    got = np.asarray(got)
    for j, (name, r) in enumerate(
        zip(("score", "qle", "tle", "gtle", "gscore", "max_off"), ref)
    ):
        np.testing.assert_array_equal(np.asarray(r), got[j], err_msg=name)


def test_bundled_local_full_matches_parts():
    """local_sw_full_pallas_bundled == pallas local kernel + score2_scan."""
    opt = MemOptions()
    rng = np.random.default_rng(3)
    B, qmax, tmax = 32, 64, 128
    ts = rng.integers(0, 4, (B, tmax)).astype(np.int8)
    qs = np.full((B, qmax), 4, np.int8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for i in range(B):
        ql = int(rng.integers(20, qmax + 1))
        off = int(rng.integers(0, tmax - ql))
        qs[i, :ql] = ts[i, off : off + ql]
        qlens[i] = ql
        tlens[i] = int(rng.integers(ql, tmax + 1))
    ends = np.full(B, 0x10000, np.int32)
    mins = np.full(B, opt.min_seed_len * opt.a, np.int32)
    from arachne_tpu.ops.packing import bundle_seqs
    from arachne_tpu.ops.pallas_local import local_sw_batch_pallas
    from arachne_tpu.ops.sw_local import local_sw_full_pallas_bundled, score2_scan

    max_mat = int(MemOptions().scoring_matrix().max())
    gmax, te, qe, row_max = local_sw_batch_pallas(
        *[jnp.asarray(x) for x in (qs, ts, qlens, tlens, ends)],
        qmax=qmax, tmax=tmax, a=opt.a, b=opt.b, o_del=opt.o_del,
        e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        b_tile=32, interpret=INTERPRET,
    )
    s2, t2 = score2_scan(
        row_max, jnp.asarray(tlens), gmax, te, jnp.asarray(mins), max_mat
    )
    u8 = bundle_seqs(qs, ts)
    meta = np.stack([qlens, tlens, ends, mins]).astype(np.int32)
    got = np.asarray(
        local_sw_full_pallas_bundled(
            jnp.asarray(u8), jnp.asarray(meta),
            qmax=qmax, tmax=tmax, a=opt.a, b=opt.b, o_del=opt.o_del,
            e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
            max_mat=max_mat, b_tile=32, interpret=INTERPRET,
        )
    )
    for j, (name, r) in enumerate(
        zip(("gmax", "te", "qe", "s2", "t2"), (gmax, te, qe, s2, t2))
    ):
        np.testing.assert_array_equal(np.asarray(r), got[j], err_msg=name)


@pytest.mark.parametrize("seed", [3, 4])
def test_pallas_extend_int16_state_matches_xla(seed):
    """wide_state=False (int16 DP state) is bit-identical to the XLA
    reference — same integer recurrences, narrower lanes."""
    opt = MemOptions()
    B, qmax, tmax = 64, 128, 192
    qs, ts, qlens, tlens, ws, h0s = _random_problems(seed, B, qmax, tmax, opt)
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = [jnp.asarray(x) for x in (qs, ts, qlens, tlens, ws, h0s)]
    kw = dict(
        qmax=qmax, tmax=tmax, o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
    )
    ref = extend_batch_kernel(*args, mat, **kw)
    got = extend_batch_pallas(
        *args, a=opt.a, b=opt.b, **kw, b_tile=64, interpret=INTERPRET,
        wide_state=False,
    )
    for name, r, g in zip(
        ("score", "qle", "tle", "gtle", "gscore", "max_off"), ref, got
    ):
        assert np.array_equal(np.asarray(r), np.asarray(g)), name
