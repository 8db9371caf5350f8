"""Device mesh & sharding helpers.

The reference has no parallelism (SURVEY.md §2.6: single process, single GPU,
dormant horovod env var at src/main.py:165). The TPU build makes the mesh a
first-class runtime object: axis "data" for data parallelism, axis "model" for
row-sharding the item-embedding/softmax tables, with XLA collectives over
ICI/DCN doing the NCCL-equivalent work.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from easydgl_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model[, seq]) mesh over all (or given) devices.

    dp/mp of -1 are resolved so dp*mp*cp == len(devices), preferring to grow
    the data axis (dense towers are replicated; table shards ride the model
    axis). cp > 1 appends a third SEQUENCE axis (context parallelism —
    ring attention, dist/context.py); 2-axis consumers keep working since
    data/model stay axis_names[0]/[1].
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, mp, cp = cfg.dp, cfg.mp, cfg.cp
    assert cp >= 1 and n % cp == 0, f"{n} devices not divisible by cp={cp}"
    nn = n // cp
    if mp == -1 and dp == -1:
        dp, mp = nn, 1
    elif dp == -1:
        assert nn % mp == 0, f"{nn} devices not divisible by mp={mp}"
        dp = nn // mp
    elif mp == -1:
        assert nn % dp == 0, f"{nn} devices not divisible by dp={dp}"
        mp = nn // dp
    assert dp * mp * cp == n, f"dp*mp*cp={dp*mp*cp} != {n} devices"
    if cp > 1:
        arr = np.asarray(devices).reshape(dp, mp, cp)
        return Mesh(arr, (cfg.data_axis, cfg.model_axis, cfg.seq_axis))
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def seq_axis_info(mesh):
    """(axis_name, size) of the mesh's context-parallel (sequence) axis,
    or (None, 1) when the mesh is None / 2-axis / cp == 1."""
    if mesh is not None and len(mesh.axis_names) >= 3:
        name = mesh.axis_names[2]
        size = mesh.shape[name]
        if size > 1:
            return name, size
    return None, 1


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded along the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded embedding / softmax table: vocab dim over the model axis."""
    return NamedSharding(mesh, P(mesh.axis_names[1], None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(dp=1, mp=1), devices=jax.devices()[:1])


# ---------------------------------------------------------------------------
# Trace-time SPMD mesh context. The sharded train/eval steps activate it
# while their bodies trace, so mesh-agnostic code (compute_loss, the MAU
# module's fused-kernel branch) can wrap Pallas kernels in shard_map —
# XLA's auto-partitioner cannot split a custom call, so an unwrapped kernel
# under a mesh would force a full replication/gather.
# ---------------------------------------------------------------------------
import contextlib
import contextvars

_SPMD_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "spmd_mesh", default=None)


def spmd_mesh():
    """The mesh a sharded step is currently tracing under, or None."""
    return _SPMD_MESH.get()


@contextlib.contextmanager
def use_spmd_mesh(mesh):
    token = _SPMD_MESH.set(mesh)
    try:
        yield
    finally:
        _SPMD_MESH.reset(token)
