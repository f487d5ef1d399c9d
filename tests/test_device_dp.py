"""Production multi-device data parallelism (ops/devicepool.py).

The production batchers round-robin their fixed-size chunks over
jax.local_devices(); on this 8-virtual-device CPU mesh every chunked
dispatch genuinely lands on multiple devices.  Outputs must be
byte-identical to the single-device dispatch in submission order.
"""

import os

import numpy as np
import pytest

import jax

from arachne_tpu.config import MemOptions
from arachne_tpu.ops import devicepool
from arachne_tpu.ops.sw_extend import BatchExtender
from arachne_tpu.ops.sw_global import BatchGlobal


@pytest.fixture(autouse=True)
def _reset_pool():
    devicepool.reset_cache()
    yield
    os.environ.pop("ARACHNE_DEVICE_DP", None)
    devicepool.reset_cache()


def _problems(rng, n):
    out = []
    for _ in range(n):
        t = rng.integers(0, 4, int(rng.integers(80, 200))).astype(np.int8)
        q = t[10 : 10 + int(rng.integers(40, 70))].copy()
        if len(q) > 5:
            q[int(rng.integers(0, len(q)))] ^= 1
        out.append((q, t))
    return out


def test_pool_sees_the_virtual_mesh():
    assert len(jax.local_devices()) == 8
    devs = devicepool.dispatch_devices()
    assert len(devs) == 8


def _run_extender(problems, small_chunk):
    opt = MemOptions()
    be = BatchExtender(opt)
    be.CHUNK = small_chunk  # force many chunks so round-robin spreads
    for q, t in problems:
        be.submit(q, t, opt.w, opt.pen_clip5, len(q))
    return be.run()


def test_extender_identical_across_devices(rng):
    problems = _problems(rng, 300)
    os.environ["ARACHNE_DEVICE_DP"] = "0"
    devicepool.reset_cache()
    single = _run_extender(problems, 64)
    assert devicepool.dispatch_devices() == [None]
    os.environ["ARACHNE_DEVICE_DP"] = "auto"
    devicepool.reset_cache()
    multi = _run_extender(problems, 64)
    assert len(devicepool.dispatch_devices()) == 8
    assert single == multi


def test_global_identical_across_devices(rng):
    problems = _problems(rng, 200)
    opt = MemOptions()

    def run():
        bg = BatchGlobal(opt)
        bg.CHUNK = 32
        bg.CHUNK_Z = 32
        for q, t in problems:
            bg.submit(q, t, opt.w)
        return bg.run()

    os.environ["ARACHNE_DEVICE_DP"] = "0"
    devicepool.reset_cache()
    single = run()
    os.environ["ARACHNE_DEVICE_DP"] = "auto"
    devicepool.reset_cache()
    multi = run()
    assert single == multi
