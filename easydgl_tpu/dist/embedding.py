"""Vocab-sharded catalog scoring over the "model" mesh axis.

The reference keeps the 17771 x 512 item table on one GPU; here the table is
row-sharded across the model axis (train/sharded.py) and each shard scores
its slice of the catalog locally — XLA collectives over ICI instead of NCCL.

The input-side embedding *lookup* under mp>1 deliberately has NO hand-written
shard_map here: the HLO audit (scripts/hlo_embedding_audit.py, locked by
tests/test_sharding.py::test_no_table_all_gather_in_sharded_step) shows the
auto-partitioner already serves it with the identical gather-psum pattern
(local clamped gather + masked zero + all-reduce of the (B/dp, L+1, C)
partials, ~1 MB/step at the flagship vs ~36 MB for a table all-gather), so a
round-2-era shard_map duplicate of that pattern was deleted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_tied_logits(hidden: jnp.ndarray, table: jnp.ndarray,
                        bias: jnp.ndarray, mesh: Mesh, *,
                        model_axis: str = "model",
                        data_axis: str = "data") -> jnp.ndarray:
    """(N, C) @ (V, C)^T + bias with the table row-sharded -> logits
    column-sharded over the model axis (each shard scores its slice of the
    catalog locally; no collective needed until loss/top-k)."""
    def local(h, t, b):
        return jnp.einsum("nc,vc->nv", h, t,
                          preferred_element_type=jnp.float32) + b

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(model_axis)),
        out_specs=P(data_axis, model_axis))(hidden, table, bias)
