"""Embedding & time-coding modules.

Parity notes vs reference ``src/module/coding.py``:

* ``Embedding`` — lookup table with optional zero row 0 (``coding.py:56-57``),
  optional sqrt(d) scaling (``coding.py:62-63``). L2 regularization is NOT
  applied here; the training loss adds ``l2_reg * 0.5 * sum(w^2)`` over every
  parameter named ``lookup_table`` (mirroring the regularizer hook at
  ``coding.py:48``, which the reference attaches to every Embedding it builds
  with a non-zero ``l2_reg``).
* ``PositionCoding`` — learned absolute positions; ``__call__`` CONCATS the
  coding onto the input (doubling the width — this is load-bearing for
  SASREC/S2PNM/CTSMA whose first block consumes 2C-wide inputs and residuals
  take ``queries[:, :, :C]``); ``code`` returns the raw coding
  (``coding.py:67-79``).
* ``TimeIntervalCoding`` — embedding over clipped integer interval buckets
  (``coding.py:82-94``, TiSASREC).
* ``TimeFunctionCoding`` — learnable Bochner features ``cos(t*w + phi)`` with
  ``w`` init ``linspace(0, 9, d)`` (``coding.py:97-122``, TGAT/TGREC).
* ``TimeSinusoidCoding`` — fixed interleaved sin/cos with ``10000^(2i/d)``
  scaling (``coding.py:125-149``, TimelyREC/EasyDGL).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from easydgl_tpu.nn.layers import glorot


class Embedding(nn.Module):
    vocab_size: int
    num_units: int
    zero_pad: bool = True
    scale: bool = True
    emb_init: Optional[object] = None  # default: glorot (TF get_variable)

    def setup(self):
        self.lookup_table = self.param(
            "lookup_table", self.emb_init or glorot(),
            (self.vocab_size, self.num_units))

    def table(self) -> jnp.ndarray:
        """The (optionally zero-padded) table used for lookups AND tied
        softmax scoring (reference zeroes row 0 of the tensor, not the
        variable: coding.py:56-57)."""
        t = self.lookup_table
        if self.zero_pad:
            row_mask = (jnp.arange(self.vocab_size) != 0).astype(t.dtype)
            t = t * row_mask[:, None]
        return t

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        # mode="clip": out-of-range ids clamp to the last row (the TF-GPU
        # gather behavior the reference relies on for TiSASREC's edge bucket
        # == timelen, TiSASREC.py:59)
        out = jnp.take(self.table(), ids, axis=0, mode="clip")
        if self.scale:
            out = out * (self.num_units ** 0.5)
        return out


class PositionCoding(nn.Module):
    """Learned absolute position embeddings (reference coding.py:67-79)."""
    vocab_size: int   # max sequence length
    num_units: int

    def setup(self):
        self.pembs = Embedding(self.vocab_size, self.num_units,
                               zero_pad=False, scale=False, name="pembs")

    def code(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (B, T, ...) — only B and T are used.

        The indices are always ``iota(T)``, so the lookup is a STATIC
        slice + broadcast rather than a gather: the cotangent is then a
        batch-dim reduce instead of a (B*T)-row scatter-add into the tiny
        (T, C) table (the scatter cost 0.24 ms/step of the flagship's
        18 ms — scripts/roofline.py)."""
        b, t = inputs.shape[0], inputs.shape[1]
        return jnp.broadcast_to(self.pembs.table()[None, :t],
                                (b, t, self.num_units))

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([inputs, self.code(inputs)], axis=-1)


class TimeIntervalCoding(nn.Module):
    """Embedding over integer Δt buckets (reference coding.py:82-94).

    TiSASREC clips buckets to [0, timelen] INCLUSIVE while this table has
    ``timelen`` rows (TiSASREC.py:59 vs :31-32), so the edge bucket is an
    out-of-range gather. The reference's published numbers come from a GPU,
    where TF gather stores ZEROS for out-of-bound indices (CPU TF raises);
    that zero-vector semantic is reproduced here exactly — and mirrored for
    the CPU-run reference by parity/refbridge._patch_gpu_gather_semantics.
    """
    vocab_size: int
    num_units: int

    def setup(self):
        self.pembs = Embedding(self.vocab_size, self.num_units,
                               zero_pad=False, scale=False, name="pembs")

    def code(self, inputs: jnp.ndarray) -> jnp.ndarray:
        ok = (inputs >= 0) & (inputs < self.vocab_size)
        out = self.pembs(inputs)
        return out * ok[..., None].astype(out.dtype)

    def table_extended(self) -> jnp.ndarray:
        """(vocab_size + 1, C) table whose LAST row is zero — the factored
        interval-attention path (nn/temporal.py) indexes it with raw
        clipped buckets in [0, vocab_size], so the out-of-range edge
        bucket hits the zero row: exactly ``code``'s GPU-gather
        zero-vector semantics, without materializing any (Tq, Tk, C)
        tensor."""
        t = self.pembs.table()
        return jnp.concatenate([t, jnp.zeros((1, t.shape[1]), t.dtype)])


class TimeFunctionCoding(nn.Module):
    """Learnable Bochner time features cos(t*w + phi) (coding.py:97-122)."""
    num_units: int

    def setup(self):
        d = self.num_units
        self.basis_freq = self.param(
            "basis_freq",
            lambda key, shape: jnp.asarray(np.linspace(0, 9, d), jnp.float32),
            (d,))
        self.phase = self.param("phase", nn.initializers.zeros, (d,))

    def code(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (B, T) or (B, Tq, Tk) -> (..., num_units)."""
        x = inputs.astype(jnp.float32)
        if x.ndim == 2:
            x = x[:, :, None]  # (B, T, 1) — reference reshapes to (B,T,-1)
        return jnp.cos(x[..., None] * self.basis_freq + self.phase)

    def factors(self, q_times: jnp.ndarray, k_times: jnp.ndarray):
        """Per-position factorization of the pairwise Bochner features:

        ``cos(w*(tq - tk) + phi) = cos(w*tq + phi)*cos(w*tk)
                                 + sin(w*tq + phi)*sin(w*tk)``

        (angle addition), so every per-PAIR feature is a rank-2 product of
        per-POSITION features — O(L*C) memory instead of the reference's
        O(L^2*C) coded tensor (coding.py:97-122 gathered per (q, k)).
        Exactly equal to ``code(tq - tk)`` wherever tq >= tk; the callers'
        clamp ``(tq - tk)+`` (TGAT.py:51-54) is inactive on every unmasked
        causal entry because event times are nondecreasing, so the
        factored attention matches the dense path bit-for-bit there
        (tests/test_factored_time.py).

        q_times/k_times: (B, T) scaled timestamps. Returns (cq, sq, ck,
        sk), each (B, T, num_units); the phase rides the query side.

        Times are CENTERED per row (t - max_t) before the trig: the
        identity only involves tq - tk, so any per-row shift is exact —
        but it moves the f32 cos arguments from w*t_absolute (~1e4 rad,
        whose argument-reduction ulp is ~1e-2) down to w*span, the same
        magnitude class the dense path's cos(w*(tq-tk)) sees, keeping
        factored == dense to float noise instead of trig-reduction noise.
        """
        t0 = jnp.max(q_times.astype(jnp.float32), axis=-1, keepdims=True)
        aq = (q_times.astype(jnp.float32) - t0)[..., None] \
            * self.basis_freq + self.phase
        ak = (k_times.astype(jnp.float32) - t0)[..., None] * self.basis_freq
        return jnp.cos(aq), jnp.sin(aq), jnp.cos(ak), jnp.sin(ak)


class TimeSinusoidCoding(nn.Module):
    """Fixed interleaved sin/cos coding (coding.py:125-149); no params."""
    num_units: int

    def code(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (B, T) float -> (B, T, num_units)."""
        d = self.num_units
        scale = np.power(10000.0, np.arange(0, d, 2) / d).astype(np.float32)
        x = inputs.astype(jnp.float32)[:, :, None] / scale  # (B, T, d//2)
        code = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1)  # (B, T, d//2, 2)
        return code.reshape(inputs.shape[0], inputs.shape[1], d)
