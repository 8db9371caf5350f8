"""Distributed full-catalog top-k and loss over vocab-sharded logits.

Mirrors the single-device eval semantics (reference src/model/Base.py:164-201)
on logits whose vocab dim is sharded over the "model" axis:

* top-k: per-shard local top-k with GLOBAL item indices, all_gather of the
  (values, indices) candidates over the model axis, then a final top-k of
  the n_shards*k candidates — exact, and moves only O(n_shards*k) per row
  over ICI instead of the full catalog.
* softmax-CE pieces: logsumexp via shard-local max/sum + psum; the label
  logit via a masked local gather + psum.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def distributed_top_k(logits: jnp.ndarray, k: int, mesh: Mesh, *,
                      model_axis: str = "model", data_axis: str = "data"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: (N, V) with V sharded over model_axis. Returns (values,
    GLOBAL indices), each (N, k), replicated over the model axis."""
    n_shards = mesh.shape[model_axis]
    v = logits.shape[-1]
    shard_v = v // n_shards
    # per-shard candidates: enough that the merged pool of
    # n_shards * k_local always contains the true global top-k
    k_local = min(k, shard_v)
    assert n_shards * k_local >= min(k, v), "catalog too small for k"

    def local(lg):
        vals, idx = jax.lax.top_k(lg, k_local)                 # local top
        offset = jax.lax.axis_index(model_axis) * shard_v
        gidx = idx + offset
        # gather all shards' candidates: (n, n_shards * k_local)
        cat_vals = jax.lax.all_gather(vals, model_axis, axis=1, tiled=True)
        cat_idx = jax.lax.all_gather(gidx, model_axis, axis=1, tiled=True)
        fv, fi = jax.lax.top_k(cat_vals, min(k, cat_vals.shape[-1]))
        return fv, jnp.take_along_axis(cat_idx, fi, axis=1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(data_axis, model_axis),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        check_vma=False)(logits)


def distributed_label_nll(logits: jnp.ndarray, labels: jnp.ndarray,
                          mesh: Mesh, *, model_axis: str = "model",
                          data_axis: str = "data") -> jnp.ndarray:
    """Per-row (logsumexp - label_logit) over vocab-sharded logits.

    Exact logsumexp: global max by psum-max, then psum of shifted sumexp.
    """
    n_shards = mesh.shape[model_axis]
    shard_v = logits.shape[-1] // n_shards

    def local(lg, lb):
        gmax = jax.lax.pmax(jnp.max(lg, axis=-1), model_axis)      # (n,)
        sumexp = jax.lax.psum(
            jnp.sum(jnp.exp(lg - gmax[:, None]), axis=-1), model_axis)
        lse = gmax + jnp.log(sumexp)
        offset = jax.lax.axis_index(model_axis) * shard_v
        local_lb = lb - offset
        in_range = (local_lb >= 0) & (local_lb < shard_v)
        picked = jnp.take_along_axis(
            lg, jnp.clip(local_lb, 0, shard_v - 1)[:, None], axis=1)[:, 0]
        label_logit = jax.lax.psum(
            jnp.where(in_range, picked, 0.0), model_axis)
        return lse - label_logit

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(data_axis)),
        out_specs=P(data_axis))(logits, labels)


def distributed_mask_seen(logits: jnp.ndarray, seen_ids: jnp.ndarray,
                          mesh: Mesh, *, model_axis: str = "model",
                          data_axis: str = "data",
                          neg: float = -1.0e30) -> jnp.ndarray:
    """Shard-local -inf scatter of the seen item ids (Base.py:156-163),
    applied BEFORE the distributed top-k merge."""
    n_shards = mesh.shape[model_axis]
    shard_v = logits.shape[-1] // n_shards

    def local(lg, ids):
        offset = jax.lax.axis_index(model_axis) * shard_v
        local_ids = ids - offset
        in_range = (local_ids >= 0) & (local_ids < shard_v)
        safe = jnp.where(in_range, local_ids, 0)
        rows = jnp.arange(lg.shape[0])[:, None]
        neg_upd = jnp.where(in_range, neg, 0.0)
        return lg.at[rows, safe].add(neg_upd)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(data_axis, None)),
        out_specs=P(data_axis, model_axis))(logits, seen_ids)
