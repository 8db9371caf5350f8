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


def _l2_normalize(x, eps: float = 1e-12):
    """tf.nn.l2_normalize semantics: x * rsqrt(max(sum(x^2), eps)).

    GRADIENT-SAFE at exactly-zero rows, which the previous
    ``x / maximum(norm(x), eps)`` form was NOT: jnp.linalg.norm's backward
    is x/norm = 0/0 = NaN at a zero row, and maximum() cannot block it
    (0 * NaN = NaN). A zero period_outs row arises in real TimelyREC
    training (harness-parity seed 7 NaN'd at step 1 through exactly this
    path); the reference never hits it because l2_normalize thresholds
    the SUM OF SQUARES before the rsqrt."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


class TAHEncoder(nn.Module):
    @nn.compact
    def __call__(self, queries, keys, histories):
        """queries/keys: (B, S, H) (identical in practice);
        histories: (B, S, H)."""
        qn = _l2_normalize(queries)
        kn = _l2_normalize(keys)
        cos = mxu_einsum("bqh,bkh->bqk", qn, kn)
        w = (1.0 + cos) / 2.0
        s = w.shape[-1]
        w = w * jnp.tril(jnp.ones((s, s), w.dtype))[None]
        return mxu_einsum("bqk,bkh->bqh", w, histories)
