"""Core NN building blocks.

Parity notes vs the reference:

* ``ContribLayerNorm`` reproduces ``src/model/Base.py:12-67``: moments are
  taken over ALL axes except batch (TF-contrib ``begin_norm_axis=1``) while
  the beta/gamma parameters cover only the last axis; eps = 1e-12 for fp32.
  This is NOT a standard last-axis LayerNorm — SASREC/BERT4REC/CTSMA/EasyDGL
  all normalize over (T, C) jointly via this function.
* ``LastAxisLayerNorm`` reproduces ``src/module/normalize.py:9-19``:
  last-axis moments, eps = 1e-8 (used by MaskedCNN and TgMultiHeadAttention).
* ``FeedForward`` reproduces ``src/model/Base.py:70-87``: two width-1 convs
  (== dense layers) with relu/none activations, dropout after each, residual.
* Dense layers default to glorot-uniform kernels / zero bias (the TF1
  ``tf.layers.dense`` defaults), not flax's lecun-normal.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# TF1 tf.layers.dense / tf.get_variable defaults.
glorot = nn.initializers.glorot_uniform
truncated_normal = nn.initializers.truncated_normal

# ---------------------------------------------------------------------------
# Mixed precision: a trace-time compute dtype consulted by every Dense layer
# and heavy einsum. Params stay fp32; matmul operands are cast (bf16 hits the
# MXU's fast path with fp32 accumulation via preferred_element_type).
# LayerNorm / softmax / losses always compute in fp32.
# ---------------------------------------------------------------------------
_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "compute_dtype", default=None)


def compute_dtype():
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def use_compute_dtype(dtype):
    """Trace-time context: dtype=None (fp32 everywhere) or jnp.bfloat16."""
    token = _COMPUTE_DTYPE.set(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)


def mxu_einsum(eq: str, *ops) -> jnp.ndarray:
    """einsum whose operands are cast to the active compute dtype, with
    fp32 accumulation — the MXU-friendly form of every attention/score
    contraction in this framework."""
    dt = compute_dtype()
    if dt is not None:
        ops = [o.astype(dt) for o in ops]
    return jnp.einsum(eq, *ops, preferred_element_type=jnp.float32)


def Dense(features: int, use_bias: bool = True, kernel_init=None,
          name: Optional[str] = None, dtype="ctx") -> nn.Dense:
    """tf.layers.dense equivalent (glorot-uniform kernel, zero bias).
    dtype="ctx" resolves the active compute dtype (mixed precision)."""
    if dtype == "ctx":
        dtype = compute_dtype()
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=kernel_init or glorot(),
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def gelu_exact(x):
    """Erf-based GELU (reference: src/model/BERT4REC.py:12-24)."""
    return jax.nn.gelu(x, approximate=False)


def to_compute(x: jnp.ndarray) -> jnp.ndarray:
    """Cast an activation to the active compute dtype (no-op in fp32 mode).
    Used on wide intermediates whose only consumers are compute-dtype
    matmuls/adds, so the cast changes HBM traffic, not results."""
    dt = compute_dtype()
    return x.astype(dt) if dt is not None else x


def gelu_tanh(x):
    """Tanh-approximate GELU (reference: src/model/GREC.py:14-26)."""
    return jax.nn.gelu(x, approximate=True)


class ContribLayerNorm(nn.Module):
    """TF-contrib-style LN: moments over all non-batch axes, params on last.

    Reference: src/model/Base.py:12-67 (begin_norm_axis=1,
    begin_params_axis=-1, variance_epsilon=1e-12 for fp32).
    """
    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        # mixed-precision policy: moments in fp32, output stored in the
        # compute dtype (its consumers — matmuls — would cast it anyway;
        # this halves the LN read/write passes, a measured hot spot)
        cdt = compute_dtype()
        xf = x.astype(jnp.float32)
        norm_axes = tuple(range(1, x.ndim))
        mean = jnp.mean(xf, axis=norm_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=norm_axes, keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # tf.nn.batch_normalization: (x - mean) * inv * gamma + beta
        out = (xf - mean) * inv * gamma + beta
        return out.astype(cdt) if cdt is not None else out


class LastAxisLayerNorm(nn.Module):
    """Simple last-axis LN (reference: src/module/normalize.py:9-19, eps 1e-8)."""
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.epsilon)
        return gamma * x + beta


class FeedForward(nn.Module):
    """Two width-1 convs (== Dense) + dropout + residual.

    Reference: src/model/Base.py:70-87.
    """
    num_units: Sequence[int]
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        h = Dense(self.num_units[0], name="inner")(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = Dense(self.num_units[1], name="readout")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return h + x


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, C) -> (B, H, T, C/H).

    Matches the reference's concat-on-batch head split
    (src/module/sequential.py:39-41): head h sees channel block
    [h*C/H : (h+1)*C/H].
    """
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, D) -> (B, T, H*D), inverse of split_heads."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


NEG_INF_LOGIT = -(2.0 ** 32) + 1.0  # reference mask value (sequential.py:54)
