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
    total_words = fm_occ.shape[0] * 8
    if len(fm_words) < total_words:
        fm_words = np.concatenate(
            [fm_words, np.zeros(total_words - len(fm_words), fm_words.dtype)]
        )
    shard = NamedSharding(mesh, P("data"))
    return (
        jax.device_put(jnp.asarray(fm_occ), shard),
        jax.device_put(jnp.asarray(fm_words.reshape(-1, 8)), shard),
    )


def sharded_occ4(
    mesh: Mesh,
    idx_occ: np.ndarray,
    idx_words: np.ndarray,
    L2: np.ndarray,
    primary: int,
    seq_len: int,
    ks: np.ndarray,
) -> np.ndarray:
    """Rank queries against an FM-index block-sharded across the mesh.

    Each device holds a contiguous range of 128-base occ blocks (rows keep
    their *global* cumulative counts, so an owning shard answers a query
    completely); every device computes occ4 for the queries whose block it
    owns (others contribute zero) and a psum over the mesh assembles the
    answers — lookup-as-collective, the large-genome mode of SURVEY.md §5.
    The k==-1 / k==seq_len edge rows are the caller's job (they need no
    table access)."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.fm_rank import DeviceFMIndex, occ4_device

    n = mesh.devices.size
    blocks = idx_occ.shape[0]
    per = -(-blocks // n)
    pad_blocks = per * n - blocks
    occ_p = np.concatenate([idx_occ, np.zeros((pad_blocks, 4), idx_occ.dtype)])
    words = idx_words
    need = per * n * 8
    if len(words) < need:
        words = np.concatenate([words, np.zeros(need - len(words), words.dtype)])
    occ_d = jnp.asarray(occ_p.astype(np.int32)).reshape(n, per, 4)
    words_d = jnp.asarray(words).reshape(n, per * 8)
    ks_d = jnp.asarray(ks.astype(np.int32))
    L2_d = jnp.asarray(L2.astype(np.int32))

    def shard_fn(occ_s, words_s, ks_all):
        me = jax.lax.axis_index("data")
        lo = me * per
        kk = ks_all - (ks_all >= primary).astype(jnp.int32)
        block = jnp.clip(kk, 0, seq_len - 1) >> 7
        mine = (block >= lo) & (block < lo + per) & (ks_all >= 0) & (ks_all < seq_len)
        # shard-local view; primary pushed out of range because kk is
        # already primary-adjusted
        local = DeviceFMIndex(
            occ=occ_s[0], words=words_s[0], L2=L2_d,
            primary=per * 128 + 1, seq_len=per * 128, l_pac=0,
        )
        vals = occ4_device(local, jnp.where(mine, kk - lo * 128, 0))
        return jax.lax.psum(jnp.where(mine[:, None], vals, 0), "data")

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),
    )
    return np.asarray(fn(occ_d, words_d, ks_d))
