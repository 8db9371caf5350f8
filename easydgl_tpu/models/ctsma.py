"""CTSMA: continuous-time self-modulating attention (ICML'21).

Parity with reference src/model/CTSMA.py:
* per-item event-mark table (the reference pickles a scipy CSR,
  CTSMA.py:24-25; the loader supplies the dense multi-hot rows as
  ``features['seqs_marks']`` (B, T, E));
* Δt spans = diff of scaled timestamps, unclipped (CTSMA.py:50);
* 2C-wide first block input (position-coding concat), N causal MAU blocks
  collecting per-layer intensities — the reference's "LLE_PP" collection
  (CTSMA.py:76-77) is returned via aux["intensities"];
* TPP biased-likelihood regularizer with head-tiled marks/spans
  (CTSMA.py:97-110) implemented by ``tpp_regularizer``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (INTENSITIES, SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding, PositionCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, FeedForward
from easydgl_tpu.nn.temporal import MAU


class CTSMA(SequentialModel):
    data_mode: str = "regressive_entire"
    loss_mode: str = "softmax_eps"
    uses_tpp: bool = True

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        ts = features["seqs_t"] / cfg.time_scale          # (B, L+1)
        spans = ts[:, 1:] - ts[:, :-1]                    # (B, L)
        marks = features["seqs_marks"]                    # (B, L, E)
        det = not is_training

        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)
        x = PositionCoding(cfg.seqslen, cfg.num_units, name="pcoding")(x)
        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        key_mask = (ids != 0).astype(jnp.float32)

        intensities = []
        for i in range(cfg.num_blocks):
            from easydgl_tpu.models.base import mau_impl
            attn = MAU(cfg.num_units, cfg.num_heads, cfg.num_events,
                       cfg.attention_probs_dropout_rate,
                       intensity_impl=mau_impl(cfg),
                       blocked_block_k=cfg.mau_block_k,
                       name=f"block{i}_mau")
            ffn = FeedForward((cfg.num_units, cfg.num_units),
                              cfg.hidden_dropout_rate, name=f"block{i}_ffn")
            x, intny = attn(ContribLayerNorm(name=f"block{i}_ln0")(x), x,
                            key_mask, spans, marks,
                            deterministic=det, causality=True)
            x = ffn(ContribLayerNorm(name=f"block{i}_ln1")(x),
                    deterministic=det)
            intensities.append(intny)

        x = ContribLayerNorm(name="out_ln")(x)
        hidden = prediction_rows(x, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {INTENSITIES: tuple(intensities),
               SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux

    def tpp_regularizer(self, aux, features, labels, next_marks):
        """ct_reg * sum over blocks of the biased TPP likelihood
        (reference CTSMA.py:97-110): spans/marks are broadcast across heads
        (the reference tiles them)."""
        cfg = self.cfg
        ts = features["seqs_t"]
        spans = (ts[:, 1:] - ts[:, :-1])[:, None, :]      # (B, 1, L)
        onehot = next_marks.astype(jnp.float32)[:, None]  # (B, 1, L, E)
        h = cfg.num_heads
        spans = jnp.broadcast_to(spans, (spans.shape[0], h, spans.shape[2]))
        onehot = jnp.broadcast_to(
            onehot, (onehot.shape[0], h) + onehot.shape[2:])
        reg = 0.0
        for intny in aux[INTENSITIES]:
            reg = reg + cfg.ct_reg * MAU.biased_likelihood(
                intny, onehot, spans)
        return reg
