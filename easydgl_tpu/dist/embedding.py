"""Row-sharded embedding lookup over the "model" mesh axis.

The reference keeps the 17771 x 512 item table on one GPU; here the table is
row-sharded across the model axis and sequence lookups are served by a
gather-psum inside ``shard_map``: each shard gathers the ids that live in its
row range (clamped local gather + mask) and the partial results are summed
over ICI — the all-to-all-style pattern from BASELINE.json's north star,
with XLA collectives instead of NCCL.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                             mesh: Mesh, *, model_axis: str = "model",
                             data_axis: str = "data") -> jnp.ndarray:
    """table: (V, C) row-sharded on ``model_axis``; ids: (B, T) sharded on
    ``data_axis``. Returns (B, T, C) embeddings sharded on ``data_axis``.

    Inside each shard: local_rows = table_shard[clip(ids - offset)], zeroed
    where the id belongs to another shard, then psum over the model axis.
    """
    n_shards = mesh.shape[model_axis]
    v = table.shape[0]
    assert v % n_shards == 0, f"vocab {v} not divisible by {n_shards} shards"
    rows_per = v // n_shards

    def local(table_shard, ids_shard):
        shard_idx = jax.lax.axis_index(model_axis)
        offset = shard_idx * rows_per
        local_ids = ids_shard - offset
        in_range = (local_ids >= 0) & (local_ids < rows_per)
        gathered = jnp.take(table_shard,
                            jnp.clip(local_ids, 0, rows_per - 1), axis=0)
        gathered = jnp.where(in_range[..., None], gathered, 0.0)
        return jax.lax.psum(gathered, model_axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis, None)),
        out_specs=P(data_axis, None, None))(table, ids)


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
