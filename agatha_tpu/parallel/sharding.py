"""Multi-chip / multi-host data-parallel dispatch.

The reference is strictly single-process single-GPU (gasal_set_device,
interfaces.cpp:86-116; no NCCL/MPI anywhere).  Scaling here is the
TPU-native story the reference lacks (SURVEY.md §2.3): alignment pairs
are embarrassingly parallel, so the batch dimension is sharded over a
1-D ``pairs`` mesh with `shard_map`; every device runs the same Pallas
kernel on its shard and the (score, q_end, t_end, diags) rows come back
sharded (XLA inserts the gather on host fetch).  Cross-host runs use the
same code after `jax.distributed.initialize()` — the mesh then spans
DCN, and because each pair's compute is independent the only cross-host
traffic is the result gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.kernel import (
    B_PAIRS,
    _align_bucket_jit,
    int16_safe,
    n_waves_for_width,
    window_width,
)


def make_pairs_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) local devices, axis name 'pairs'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("pairs",))


@functools.partial(
    jax.jit, static_argnames=("cfg", "w", "qf", "mesh", "interpret")
)
def _align_sharded_jit(meta, tcodes, qfwd, *, cfg, w, qf, mesh, interpret):
    spec = P("pairs", None)
    safe16 = int16_safe(cfg, max_len=w + qf)
    windowed = w > window_width(cfg)

    def local(m, t, q):
        # waves hide shuffle latency only on real hardware; the
        # interpreter would just trace a bigger body (see align_bucket)
        nw = 1 if interpret else n_waves_for_width(w, windowed)
        return _align_bucket_jit(
            m, t, q, cfg=cfg, w=w, qf=qf, safe16=safe16,
            interpret=interpret, windowed=windowed, n_waves=nw,
        )

    # check_vma=False: pallas_call's out_shape carries no vma metadata.
    f = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(meta, tcodes, qfwd)


def align_bucket_sharded(
    meta,
    tcodes,
    qfwd,
    cfg: AlignConfig,
    mesh: Mesh,
    *,
    interpret: bool = False,
):
    """Shard one bucket's pairs over the mesh and align.

    GB must be divisible by n_devices * B_PAIRS (pad with dummy pairs).
    """
    n_dev = mesh.devices.size
    gb = int(tcodes.shape[0])
    assert gb % (n_dev * B_PAIRS) == 0, (
        f"bucket rows {gb} not divisible by {n_dev} devices x {B_PAIRS}"
    )
    tcodes = np.asarray(tcodes)
    qfwd = np.asarray(qfwd)
    w = int(tcodes.shape[1]) * (2 if tcodes.dtype == np.uint8 else 1)
    qf = int(qfwd.shape[1]) * (2 if qfwd.dtype == np.uint8 else 1)
    spec = NamedSharding(mesh, P("pairs", None))
    meta = jax.device_put(jnp.asarray(meta, jnp.int32), spec)
    tcodes = jax.device_put(jnp.asarray(tcodes), spec)
    qfwd = jax.device_put(jnp.asarray(qfwd), spec)
    return _align_sharded_jit(
        meta, tcodes, qfwd, cfg=cfg, w=w, qf=qf, mesh=mesh,
        interpret=interpret,
    )


def pad_rows(arr: np.ndarray, rows: int, fill=1) -> np.ndarray:
    """Pad array along axis 0 to `rows` rows.

    The default fill of 1 keeps padded meta rows on align_bucket's
    documented dummy-pair contract (qlen = rlen = 1); a fill of 1 in
    code arrays is a harmless base code.
    """
    if arr.shape[0] == rows:
        return arr
    pad = np.full((rows - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)
