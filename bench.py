"""Benchmark: batched seed-extension DP throughput on the accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: DP GCUPS (banded Smith-Waterman extension cell updates per second)
of the batched TPU kernel — the hot inner loop of the aligner (SURVEY.md
3.5; the reference's equivalent is single-thread SSE2 ksw_extend2/ksw_u8 at
~1 GCUPS).  vs_baseline compares against this repo's exact scalar oracle
(the reference-semantics implementation) measured on the same host,
cell-for-cell on the same problem set.

Timing methodology: through the axon tunnel, dispatch is asynchronous and
`block_until_ready` does not wait for remote completion, so each timed
execution is forced to completion by fetching its (tiny) result arrays;
the per-execution time is the slope between k=1 and k=4 chained
executions, which cancels the fixed tunnel round-trip latency.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from arachne_tpu.align import ksw
from arachne_tpu.cli import enable_compilation_cache
from arachne_tpu.config import MemOptions

enable_compilation_cache()
from arachne_tpu.ops.sw_extend import BatchExtender, clamp_band, extend_batch_kernel

import jax
import jax.numpy as jnp


def make_problems(rng, B, qlen, tlen):
    ts = rng.integers(0, 4, (B, tlen)).astype(np.int8)
    qs = np.full((B, qlen), 4, np.int8)
    for i in range(B):
        q = ts[i, 40 : 40 + qlen].copy()
        nmut = rng.integers(0, 6)
        idxs = rng.integers(0, qlen, nmut)
        q[idxs] = (q[idxs] + 1) % 4
        qs[i] = q
    return qs, ts


def timed(fn, ks=(1, 4)):
    """Per-execution seconds: slope between k chained executions, each run
    forced to completion by fetching the result."""
    times = {}
    for k in ks:
        for _pass in range(2):  # first pass warms compile + transfer caches
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            np.asarray(out[0])
            times[k] = time.perf_counter() - t0
    return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])


def main():
    B, qlen, tlen = 4096, 100, 250
    opt = MemOptions()
    rng = np.random.default_rng(0)
    qs, ts = make_problems(rng, B, qlen, tlen)
    w = clamp_band(opt, qlen, opt.w, opt.pen_clip5, 1)
    qlens = np.full(B, qlen, np.int32)
    tlens = np.full(B, tlen, np.int32)
    ws = np.full(B, w, np.int32)
    h0s = np.full(B, 19, np.int32)
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    args = (
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens), jnp.asarray(tlens),
        jnp.asarray(ws), jnp.asarray(h0s),
    )
    kw = dict(
        qmax=qlen, tmax=tlen, o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
    )

    use_pallas = BatchExtender(opt).use_pallas
    if use_pallas:
        from arachne_tpu.ops.pallas_extend import extend_batch_pallas

        # pallas lane tiles want a 128-multiple batch; qmax/tmax stay exact
        def run():
            return extend_batch_pallas(
                *args, a=opt.a, b=opt.b, **kw, b_tile=256
            )

    else:

        def run():
            return extend_batch_kernel(*args, mat, **kw)

    dt = timed(run)

    # in-band cells per problem (what the scalar kernel computes)
    cells_per = 0
    for i in range(tlen):
        beg = max(0, i - w)
        end = min(qlen, i + w + 1)
        cells_per += max(0, end - beg)
    total_cells = cells_per * B
    gcups = total_cells / dt / 1e9

    # scalar-oracle baseline on a sample of the same problems
    n_base = 32
    t0 = time.perf_counter()
    for i in range(n_base):
        ksw.extend2(
            qs[i].astype(np.uint8), ts[i].astype(np.uint8), opt.scoring_matrix(),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, w, opt.pen_clip5,
            opt.zdrop, 19,
        )
    base_dt = (time.perf_counter() - t0) / n_base
    base_gcups = cells_per / base_dt / 1e9

    result = {
        "metric": "seed_extension_DP_GCUPS",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / base_gcups, 1),
        "detail": {
            "batch": B,
            "qlen": qlen,
            "tlen": tlen,
            "band": w,
            "kernel": "pallas" if use_pallas else "xla",
            "device": str(jax.devices()[0]),
            "batch_ms": round(dt * 1e3, 3),
            "baseline_gcups_scalar_oracle": round(base_gcups, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
