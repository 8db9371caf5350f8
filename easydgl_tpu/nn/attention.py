"""Sequence attention modules (time-independent family).

Parity notes vs reference ``src/module/sequential.py``:

* ``MultiHeadAttention`` (sequential.py:16-83) — Q from queries, K/V from
  keys; key mask derived from the raw key tensor ``sign(|sum_c keys|)``
  (``:50``); mask value ``-2**32+1`` (``:54``); optional causal tril
  (``:58-63``); softmax -> dropout -> PV; residual adds
  ``queries[:, :, :num_units]`` (``:78`` — queries may be wider than C when
  position codings were concatenated upstream).
* ``BERTAttention`` (sequential.py:86-137) — same core, truncated-normal(0.02)
  projections, attention mask passed in, NO residual.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.nn.layers import (mxu_einsum,
                                   Dense, NEG_INF_LOGIT, merge_heads,
                                   split_heads, truncated_normal)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, *,
                    bias: Optional[jnp.ndarray] = None,
                    key_mask: Optional[jnp.ndarray] = None,
                    causal: bool = False,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Masked, scaled softmax attention probabilities.

    q: (B, H, Tq, D), k: (B, H, Tk, D); key_mask: (B, Tk) float/bool;
    bias: additive logits (B, H, Tq, Tk), added BEFORE scaling (the reference
    adds interval/position biases pre-scale, temporal.py:55-62).
    """
    d = q.shape[-1]
    logits = mxu_einsum("bhqd,bhkd->bhqk", q, k)
    if bias is not None:
        logits = logits + bias
    logits = logits * (scale if scale is not None else 1.0 / (d ** 0.5))
    if key_mask is not None:
        km = key_mask.astype(bool)[:, None, None, :]
        logits = jnp.where(km, logits, NEG_INF_LOGIT)
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        tril = jnp.tril(jnp.ones((tq, tk), bool))
        logits = jnp.where(tril[None, None], logits, NEG_INF_LOGIT)
    return jax.nn.softmax(logits, axis=-1)


class MultiHeadAttention(nn.Module):
    """Vanilla MHA with residual (reference sequential.py:16-83).

    ``impl`` selects the attention core:

    * ``"xla"`` — materialized (T, T) probs, the reference semantics
      verbatim (right for L=30).
    * ``"flash"`` — the blockwise Pallas kernel
      (kernels/flash_attention.py): O(T) memory for long-context configs.
      The kernel zeroes fully-masked rows; this wrapper patches those rows
      back to the XLA path's uniform-fallback value (mean over ALL values
      — the finite -2^32+1 mask constant softmaxes a dead row to uniform),
      so the module output matches "xla" on EVERY row at dropout 0. Under
      a (data, model) mesh the kernel shard_maps itself
      (kernels/spmd.py::flash_attention_spmd).
    * any impl — when the active SPMD mesh carries a cp>1 SEQUENCE axis
      (core/mesh.py::seq_axis_info), the context-parallel path takes over
      (dist/context.py): ``cp_impl`` picks ring (K/V rotate over ICI) or
      ulysses (all_to_all seq<->head re-sharding; needs H % cp == 0).

    Dropout placement is identical everywhere (normalize, then drop +
    rescale); the flash/ring PRNG streams differ from nn.Dropout's, so
    exact-parity tests pin rate 0.
    """
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0
    impl: str = "xla"
    cp_impl: str = "ring"  # ring | ulysses (under a cp>1 mesh)

    def _seed(self, rate: float):
        if rate <= 0.0:
            return jnp.zeros((), jnp.int32)
        return jax.random.randint(self.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)

    @nn.compact
    def __call__(self, queries, keys, *, deterministic: bool, causality: bool):
        from easydgl_tpu.core.mesh import spmd_mesh, seq_axis_info
        q = split_heads(Dense(self.num_units, name="q")(queries), self.num_heads)
        k = split_heads(Dense(self.num_units, name="k")(keys), self.num_heads)
        v = split_heads(Dense(self.num_units, name="v")(keys), self.num_heads)

        # sign(|sum_c keys|) over the RAW key tensor (sequential.py:50)
        key_mask = jnp.sign(jnp.abs(jnp.sum(keys, axis=-1)))
        residual = queries[:, :, :self.num_units]
        rate = 0.0 if deterministic else float(self.dropout_rate)
        mesh = spmd_mesh()
        seq_ax, _ = seq_axis_info(mesh)

        if seq_ax is not None:
            from easydgl_tpu.dist.context import (ring_attention_spmd,
                                                  ulysses_attention_spmd)
            cp_fn = (ulysses_attention_spmd if self.cp_impl == "ulysses"
                     else ring_attention_spmd)
            ctx = cp_fn(
                q, k, v, key_mask, mesh, seq_axis=seq_ax,
                data_axis=mesh.axis_names[0], causal=causality,
                dropout_rate=rate, seed=self._seed(rate))
            return merge_heads(ctx) + residual

        if self.impl == "flash":
            seed = self._seed(rate)
            if mesh is not None:
                from easydgl_tpu.kernels.spmd import flash_attention_spmd
                ctx = flash_attention_spmd(q, k, v, key_mask, mesh,
                                           causal=causality,
                                           dropout_rate=rate, seed=seed)
            else:
                from easydgl_tpu.kernels.flash_attention import \
                    flash_attention
                ctx = flash_attention(q, k, v, key_mask, causal=causality,
                                      dropout_rate=rate, seed=seed)
            # uniform-fallback patch for fully-masked rows (see docstring)
            if causality:
                vis = jnp.cumsum(key_mask, axis=1) > 0  # (B, Tq)
            else:
                vis = jnp.broadcast_to(
                    jnp.any(key_mask > 0, axis=1, keepdims=True),
                    key_mask.shape)
            mean_v = jnp.mean(v, axis=2, keepdims=True)  # (B, H, 1, D)
            ctx = jnp.where(vis[:, None, :, None], ctx, mean_v)
            return merge_heads(ctx) + residual

        probs = attention_probs(q, k, key_mask=key_mask, causal=causality)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        ctx = merge_heads(mxu_einsum("bhqk,bhkd->bhqd", probs, v))
        return ctx + residual


class BERTAttention(nn.Module):
    """BERT-style attention, no residual (reference sequential.py:86-137).

    ``impl``/CP dispatch mirror MultiHeadAttention but require the caller
    to pass ``key_mask`` (B, Tk): the flash kernel and the ring path
    consume per-key masks, not the materialized (B, Tq, Tk) tensor. When
    the 2-D mask is given (BERT4REC's is an exact key-mask broadcast,
    reference BERT4REC.py:74-79), the flash/ring outputs match the dense
    path on every row (same uniform-fallback patch as
    MultiHeadAttention)."""
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0
    initializer_range: float = 0.02
    impl: str = "xla"
    cp_impl: str = "ring"  # ring | ulysses (under a cp>1 mesh)

    @nn.compact
    def __call__(self, queries, keys, attention_mask, *,
                 deterministic: bool, key_mask=None):
        """attention_mask: (B, Tq, Tk) or (B, 1, Tq, Tk); nonzero == attend."""
        from easydgl_tpu.core.mesh import spmd_mesh, seq_axis_info
        init = truncated_normal(self.initializer_range)
        q = split_heads(Dense(self.num_units, kernel_init=init, name="q")(queries),
                        self.num_heads)
        k = split_heads(Dense(self.num_units, kernel_init=init, name="k")(keys),
                        self.num_heads)
        v = split_heads(Dense(self.num_units, kernel_init=init, name="v")(keys),
                        self.num_heads)
        d = q.shape[-1]
        rate = 0.0 if deterministic else float(self.dropout_rate)
        mesh = spmd_mesh()
        seq_ax, _ = seq_axis_info(mesh)

        if key_mask is not None and (seq_ax is not None or
                                     self.impl == "flash"):
            key_mask = key_mask.astype(jnp.float32)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            if seq_ax is not None:
                from easydgl_tpu.dist.context import (
                    ring_attention_spmd, ulysses_attention_spmd)
                cp_fn = (ulysses_attention_spmd
                         if self.cp_impl == "ulysses"
                         else ring_attention_spmd)
                ctx = cp_fn(
                    q, k, v, key_mask, mesh, seq_axis=seq_ax,
                    data_axis=mesh.axis_names[0], causal=False,
                    dropout_rate=rate, seed=seed)
            else:
                if mesh is not None:
                    from easydgl_tpu.kernels.spmd import flash_attention_spmd
                    ctx = flash_attention_spmd(q, k, v, key_mask, mesh,
                                               causal=False,
                                               dropout_rate=rate, seed=seed)
                else:
                    from easydgl_tpu.kernels.flash_attention import \
                        flash_attention
                    ctx = flash_attention(q, k, v, key_mask, causal=False,
                                          dropout_rate=rate, seed=seed)
                vis = jnp.any(key_mask > 0, axis=1)[:, None, None, None]
                mean_v = jnp.mean(v, axis=2, keepdims=True)
                ctx = jnp.where(vis, ctx, mean_v)
            return merge_heads(ctx)

        logits = mxu_einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        mask = attention_mask if attention_mask.ndim == 4 \
            else attention_mask[:, None]
        logits = jnp.where(mask != 0, logits, NEG_INF_LOGIT)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        ctx = mxu_einsum("bhqk,bhkd->bhqd", probs, v)
        return merge_heads(ctx)
