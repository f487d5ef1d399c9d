"""Drive the wide (int64) device rank path against a GENUINELY wide index.

Round-3 gap: the wide path was only ever forced onto tiny tables
(tests/test_fm_seed.py).  This script loads a real >= 2^31-row index
(build one with scripts/make_scale_genome.py + `index --build-mode auto`),
uploads the wide tables to the device, and cross-checks

  * occ4_device (wide dtype) vs the host occ layer on random rows
    spanning the full >2^31 row range (including rows > 2^31), and
  * the device seeding state machine vs host SMEM collection on reads
    sampled from the genome,

then reports the measured wide rank throughput.

Usage: python scripts/wide_device_check.py /path/genome.fa.arx.npz
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    arx = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/genome1200.fa.arx.npz"
    from arachne_tpu.index import FMIndex, load_index, unpack_2bit

    t0 = time.time()
    packed, fm = load_index(arx)
    idx = FMIndex(packed, fm)
    print(f"index loaded in {time.time() - t0:.0f}s: seq_len={idx.seq_len:,} "
          f"(2^31={1 << 31:,}) wide={idx.seq_len >= (1 << 31)}")
    assert idx.seq_len >= (1 << 31), "not a wide index — nothing to prove"

    import jax
    import jax.numpy as jnp

    from arachne_tpu.ops.fm_rank import DeviceFMIndex, occ4_device

    dfm = DeviceFMIndex.from_host(idx)   # auto-selects wide from seq_len
    assert dfm.idt == jnp.int64
    print(f"device tables uploaded: occ {fm.occ.nbytes >> 20} MiB int64, "
          f"words {fm.bwt_words.nbytes >> 20} MiB")

    rng = np.random.default_rng(5)
    # rows across the whole range, half of them ABOVE 2^31
    ks = np.concatenate([
        rng.integers(0, idx.seq_len, 2048),
        rng.integers(1 << 31, idx.seq_len, 2048),
        [-1, 0, idx.seq_len, idx.primary, (1 << 31) - 1, 1 << 31],
    ]).astype(np.int64)
    got = np.asarray(occ4_device(dfm, jnp.asarray(ks)))
    exp = idx.occ4(ks)
    assert np.array_equal(got, exp), "wide occ4 mismatch on real index"
    print(f"occ4 wide parity OK on {len(ks)} rows (incl. {np.sum(ks >= (1 << 31))} rows >= 2^31)")

    # device seeding vs host on real reads
    from arachne_tpu.align.smem import collect_seeds
    from arachne_tpu.config import MemOptions
    from arachne_tpu.ops.fm_seed import collect_seeds_device

    opt = MemOptions()
    reads = []
    for _ in range(8):
        pos = int(rng.integers(0, idx.l_pac - 200))
        r = unpack_2bit(packed.pac, pos, pos + 120).copy()
        for m in rng.integers(0, 120, 2):
            r[m] = (r[m] + 1) % 4
        reads.append(r)
    t0 = time.time()
    got_seeds = collect_seeds_device(idx, reads, opt, dfm=dfm)
    dt = time.time() - t0
    for r, g in zip(reads, got_seeds):
        e = collect_seeds(idx, r, opt)
        assert [(m.k, m.l, m.s, m.qb, m.qe) for m in g] == [
            (m.k, m.l, m.s, m.qb, m.qe) for m in e
        ], "wide device seeding mismatch"
    print(f"device seeding wide parity OK on {len(reads)} reads ({dt:.1f}s incl. compile)")

    # throughput of the wide rank layer
    ks_big = rng.integers(0, idx.seq_len, 65536).astype(np.int64)
    kj = jnp.asarray(ks_big)
    np.asarray(occ4_device(dfm, kj))  # warm
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = occ4_device(dfm, kj)
    np.asarray(out)
    dt = time.time() - t0
    print(f"wide occ4 throughput: {reps * len(ks_big) / dt / 1e6:.1f} M rank-queries/s "
          f"(batch 65536, {reps} reps)")


if __name__ == "__main__":
    main()
