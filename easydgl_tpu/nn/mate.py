"""TimelyREC encoders.

* ``MATEncoder`` — multi-aspect time encoder: user-conditioned attention over
  candidate time-slot embeddings (reference src/module/sequential.py:210-237).
* ``TAHEncoder`` — time-aware history encoder: normalized-cosine
  ``(1 + cos)/2`` causal history mixing (reference sequential.py:240-265);
  the causal mask MULTIPLIES (zeroes), it is not a -inf softmax mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.nn.layers import mxu_einsum, Dense


class MATEncoder(nn.Module):
    @nn.compact
    def __call__(self, queries, keys, users):
        """queries: (B, S, 1, H); keys: (B, S, W, H); users: (B, S, H)."""
        h = queries.shape[-1]
        u = Dense(h, use_bias=False, name="user_proj")(users)[:, :, None, :]
        q = queries * u                       # (B, S, 1, H)
        k = keys * u                          # (B, S, W, H)
        logits = mxu_einsum("bsoh,bswh->bsow", q, k)
        logits = logits / jnp.sqrt(jnp.float32(h))
        probs = jax.nn.softmax(logits, axis=-1)
        out = mxu_einsum("bsow,bswh->bsoh", probs, k)
        return out[:, :, 0, :]                # (B, S, H)


class TAHEncoder(nn.Module):
    @nn.compact
    def __call__(self, queries, keys, histories):
        """queries/keys: (B, S, H) (identical in practice);
        histories: (B, S, H)."""
        qn = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        kn = keys / jnp.maximum(
            jnp.linalg.norm(keys, axis=-1, keepdims=True), 1e-12)
        cos = mxu_einsum("bqh,bkh->bqk", qn, kn)
        w = (1.0 + cos) / 2.0
        s = w.shape[-1]
        w = w * jnp.tril(jnp.ones((s, s), w.dtype))[None]
        return mxu_einsum("bqk,bkh->bqh", w, histories)
