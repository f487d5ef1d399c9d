"""Device mesh + sharded execution of the alignment compute.

The scaling model (SURVEY.md 5, BASELINE.md): barcode buckets/read batches
are data-parallel across the mesh's ``data`` axis; the FM-index tables are
either replicated (small genomes) or sharded across the ``index`` axis with
collective gathers.  No NCCL/MPI translation — XLA collectives over ICI via
jax.sharding + jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MemOptions
from ..ops.sw_extend import extend_batch_kernel


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_to_multiple(x: np.ndarray, multiple: int, fill) -> np.ndarray:
    b = x.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return x
    pad = np.full((rem,) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


def sharded_extend(
    mesh: Mesh,
    opt: MemOptions,
    qs: np.ndarray,
    ts: np.ndarray,
    qlens: np.ndarray,
    tlens: np.ndarray,
    ws: np.ndarray,
    h0s: np.ndarray,
) -> Tuple[np.ndarray, ...]:
    """Run the extension batch data-parallel across the mesh.

    Problems are padded to a multiple of the mesh size and sharded on the
    batch axis; the scoring matrix is replicated.  Returns host arrays
    trimmed to the original batch size."""
    n = mesh.devices.size
    B = qs.shape[0]
    qs_p = pad_to_multiple(qs, n, 4)
    ts_p = pad_to_multiple(ts, n, 4)
    ql_p = pad_to_multiple(qlens, n, 1)
    tl_p = pad_to_multiple(tlens, n, 0)
    ws_p = pad_to_multiple(ws, n, 1)
    h0_p = pad_to_multiple(h0s, n, 1)
    mat = jnp.asarray(opt.scoring_matrix(), jnp.int32)
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    args = [
        jax.device_put(jnp.asarray(a), batch_sharding)
        for a in (qs_p, ts_p, ql_p, tl_p, ws_p, h0_p)
    ]
    mat_d = jax.device_put(mat, repl)
    out = extend_batch_kernel(
        args[0], args[1], args[2], args[3], args[4], args[5], mat_d,
        qs_p.shape[1], ts_p.shape[1],
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop,
    )
    return tuple(np.asarray(o)[:B] for o in out)


def replicated_index_arrays(mesh: Mesh, fm_occ: np.ndarray, fm_words: np.ndarray):
    """Replicate FM-index tables across the mesh (small-genome mode)."""
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(jnp.asarray(fm_occ), repl),
        jax.device_put(jnp.asarray(fm_words), repl),
    )


def sharded_index_arrays(mesh: Mesh, fm_occ: np.ndarray, fm_words: np.ndarray):
    """Shard FM-index tables across the mesh on the block axis.

    Rank queries route to the owning shard; lookups become collective
    gathers (all_gather of requested blocks).  Large-genome mode."""
    n = mesh.devices.size
    blocks = fm_occ.shape[0]
    pad_blocks = (-blocks) % n
    if pad_blocks:
        fm_occ = np.concatenate([fm_occ, np.zeros((pad_blocks, 4), fm_occ.dtype)])
        fm_words = np.concatenate(
            [fm_words, np.zeros(pad_blocks * 8, fm_words.dtype)]
        )
    shard = NamedSharding(mesh, P("data"))
    return (
        jax.device_put(jnp.asarray(fm_occ), shard),
        jax.device_put(jnp.asarray(fm_words.reshape(-1, 8)), shard),
    )
