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
    """Vanilla MHA with residual (reference sequential.py:16-83)."""
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, queries, keys, *, deterministic: bool, causality: bool):
        q = split_heads(Dense(self.num_units, name="q")(queries), self.num_heads)
        k = split_heads(Dense(self.num_units, name="k")(keys), self.num_heads)
        v = split_heads(Dense(self.num_units, name="v")(keys), self.num_heads)

        # sign(|sum_c keys|) over the RAW key tensor (sequential.py:50)
        key_mask = jnp.sign(jnp.abs(jnp.sum(keys, axis=-1)))
        probs = attention_probs(q, k, key_mask=key_mask, causal=causality)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        ctx = merge_heads(mxu_einsum("bhqk,bhkd->bhqd", probs, v))
        return ctx + queries[:, :, :self.num_units]


class BERTAttention(nn.Module):
    """BERT-style attention, no residual (reference sequential.py:86-137)."""
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, queries, keys, attention_mask, *, deterministic: bool):
        """attention_mask: (B, Tq, Tk) or (B, 1, Tq, Tk); nonzero == attend."""
        init = truncated_normal(self.initializer_range)
        q = split_heads(Dense(self.num_units, kernel_init=init, name="q")(queries),
                        self.num_heads)
        k = split_heads(Dense(self.num_units, kernel_init=init, name="k")(keys),
                        self.num_heads)
        v = split_heads(Dense(self.num_units, kernel_init=init, name="v")(keys),
                        self.num_heads)
        d = q.shape[-1]
        logits = mxu_einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        mask = attention_mask if attention_mask.ndim == 4 \
            else attention_mask[:, None]
        logits = jnp.where(mask != 0, logits, NEG_INF_LOGIT)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        ctx = mxu_einsum("bhqk,bhkd->bhqd", probs, v)
        return merge_heads(ctx)
