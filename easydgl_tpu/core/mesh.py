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
    """Build a (data, model[, seq][, pipe]) mesh over all (or given)
    devices.

    dp/mp of -1 are resolved so dp*mp*cp*pp == len(devices), preferring to
    grow the data axis (dense towers are replicated; table shards ride the
    model axis). cp > 1 appends a SEQUENCE axis (context parallelism —
    ring attention, dist/context.py); pp > 1 appends a PIPE axis (GPipe
    stages, dist/pipeline.py + train/pp.py). 2-axis consumers keep working
    since data/model stay axis_names[0]/[1]; the optional axes are found
    by NAME (seq_axis_info / pipe_axis_info), never by position.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, mp, cp, pp = cfg.dp, cfg.mp, cfg.cp, cfg.pp
    assert cp >= 1 and pp >= 1 and n % (cp * pp) == 0, \
        f"{n} devices not divisible by cp*pp={cp * pp}"
    nn = n // (cp * pp)
    if mp == -1 and dp == -1:
        dp, mp = nn, 1
    elif dp == -1:
        assert nn % mp == 0, f"{nn} devices not divisible by mp={mp}"
        dp = nn // mp
    elif mp == -1:
        assert nn % dp == 0, f"{nn} devices not divisible by dp={dp}"
        mp = nn // dp
    assert dp * mp * cp * pp == n, \
        f"dp*mp*cp*pp={dp * mp * cp * pp} != {n} devices"
    shape, names = [dp, mp], [cfg.data_axis, cfg.model_axis]
    if cp > 1:
        shape.append(cp)
        names.append(cfg.seq_axis)
    if pp > 1:
        shape.append(pp)
        names.append(cfg.pipe_axis)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(names))


def _axis_info(mesh, name):
    if mesh is not None and name in mesh.axis_names:
        size = mesh.shape[name]
        if size > 1:
            return name, size
    return None, 1


def seq_axis_info(mesh, name: str = "seq"):
    """(axis_name, size) of the mesh's context-parallel (sequence) axis,
    or (None, 1) when the mesh is None / has no seq axis / cp == 1."""
    return _axis_info(mesh, name)


def pipe_axis_info(mesh, name: str = "pipe"):
    """(axis_name, size) of the mesh's pipeline axis, or (None, 1)."""
    return _axis_info(mesh, name)


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
