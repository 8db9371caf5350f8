"""Distributed full-catalog evaluation over a (data, model) mesh.

The first-class distributed-eval component (SURVEY.md §2.6): on a
vocab-sharded mesh the per-position hidden states are scored shard-locally
against each table shard (``sharded_tied_logits``), ``mask_seen`` is a
shard-local scatter, the top-100 is an exact distributed merge
(local top-k -> all_gather(values, GLOBAL ids) -> final top-k), and HR/NDCG
come from the merged indices — only O(shards * 100) values per row cross
ICI instead of the 17k-wide catalog row. Mirrors Base.py:150-207 semantics
exactly (verified against the single-device step in tests).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from easydgl_tpu.dist.embedding import sharded_tied_logits
from easydgl_tpu.dist.topk import distributed_mask_seen, distributed_top_k
from easydgl_tpu.eval.metrics import MAX_K, TOPK
from easydgl_tpu.models.base import SCORING, SequentialModel


def metric_sums_from_topk(top_idx: jnp.ndarray, true_items: jnp.ndarray,
                          valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """HR/NDCG sums from precomputed top-k GLOBAL indices (B, >=max k)."""
    hit = (top_idx == true_items[:, None]).astype(jnp.float32)
    v = valid.astype(jnp.float32)
    gain = jnp.asarray((1.0 / np.log2(np.arange(2, MAX_K + 2))
                        ).astype(np.float32))
    out = {"count": jnp.sum(v)}
    for k in TOPK:
        kk = min(k, top_idx.shape[-1])
        out[f"H{k}"] = jnp.sum(jnp.sign(jnp.sum(hit[:, :kk], -1)) * v)
        out[f"N{k}"] = jnp.sum(jnp.sum(hit[:, :kk] * gain[:kk], -1) * v)
    return out


def build_distributed_eval_step(model: SequentialModel, mesh: Mesh,
                                mark_table=None):
    """jitted (params, features, labels, valid) -> metric sums with the
    catalog scored shard-locally and top-k merged across the model axis.

    Requires the model to expose SCORING aux (all tied-logits models do);
    vocab must divide the model-axis size.
    """
    cfg = model.cfg
    mask_seen = cfg.mask_seen
    model_axis = mesh.axis_names[1]
    data_axis = mesh.axis_names[0]
    mp = mesh.shape[model_axis]
    mt = None if mark_table is None else jnp.asarray(mark_table)

    def step(params, features, labels, valid):
        from easydgl_tpu.core.mesh import use_spmd_mesh
        from easydgl_tpu.nn.layers import use_compute_dtype
        from easydgl_tpu.train.steps import device_marks
        with use_compute_dtype(cfg.matmul_dtype), use_spmd_mesh(mesh):
            features = device_marks(features, labels, mt,
                                    is_training=False)
            _, aux = model.apply(params, features, is_training=False)
        hidden, table, bias = aux[SCORING]
        # the model's own dense logits einsum is unused -> DCE'd by XLA
        logits = sharded_tied_logits(hidden, table, bias, mesh,
                                     model_axis=model_axis,
                                     data_axis=data_axis)
        if mask_seen:
            logits = distributed_mask_seen(logits, features["seqs_i"], mesh,
                                           model_axis=model_axis,
                                           data_axis=data_axis)
        k = min(MAX_K, table.shape[0])
        _, idx = distributed_top_k(logits, k, mesh,
                                   model_axis=model_axis,
                                   data_axis=data_axis)
        return metric_sums_from_topk(idx, labels[:, -1], valid)

    return jax.jit(step)
