"""Chunk-level data parallelism across local devices.

The production batchers (BatchExtender / BatchLocalSW / BatchGlobal)
dispatch fixed-size chunks and fetch results only after every chunk is in
flight.  On a multi-chip host, round-robining those chunks over
`jax.local_devices()` makes the in-flight window execute concurrently on
all chips — committed input placement routes each jitted/Pallas call to
its chunk's device, so no kernel change, resharding, or collective is
needed, and outputs remain byte-identical in submission order.

This is the single-process multi-chip mode (one process per HOST).  The
alternative deployment — one process per chip with
`--num-processes`/`--process-id` and data-parallel barcode partitioning —
remains available (parallel/distributed.py); this in-process mode keeps
the barcode stream, RFA host stage, and writers unified.

Enable/disable with ARACHNE_DEVICE_DP (auto: on when >1 local device).
"""

from __future__ import annotations

import os
from typing import List, Optional

_cached: Optional[list] = None


def dispatch_devices() -> List[Optional[object]]:
    """Devices to round-robin production chunks over.

    ``[None]`` means "default device only" (single-device hosts, or
    ARACHNE_DEVICE_DP=0): the batchers then behave exactly as before."""
    global _cached
    if _cached is None:
        if os.environ.get("ARACHNE_DEVICE_DP", "auto") == "0":
            _cached = [None]
        else:
            try:
                import jax

                devs = jax.local_devices()
                _cached = list(devs) if len(devs) > 1 else [None]
            except Exception:
                _cached = [None]
    return _cached


def reset_cache() -> None:
    """Testing hook: re-evaluate the device list (e.g. after flipping
    ARACHNE_DEVICE_DP)."""
    global _cached
    _cached = None


def put(x, dev):
    """Upload ``x`` committed to ``dev`` (default device when None)."""
    import jax
    import jax.numpy as jnp

    if dev is None:
        return jnp.asarray(x)
    return jax.device_put(x, dev)
