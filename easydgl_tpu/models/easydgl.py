"""EasyDGL: BERT-style masked training with TPP-modulated attention (BiMAU).

Parity with reference src/model/EasyDGL.py:
* seqslen+1 positions, vocab num_items+1 (MASK id = original num_items,
  EasyDGL.py:38-41);
* spans = clip(Δ scaled ts, 0, 100), first interval duplicated
  (EasyDGL.py:72-74);
* mark rows looked up with the MASK id mapped to 0 (EasyDGL.py:76-77) —
  supplied by the loader as ``features['seqs_marks']``;
* input = concat([item_emb*sqrt(d) + sinusoid-time, position codes,
  summed mark embeddings], -1) -> 3C wide (EasyDGL.py:79-89). NOTE the
  reference looks up ``mark_embs`` with the 0/1 indicator VALUES as indices
  (EasyDGL.py:87), so the summed "mark embedding" is
  (#active marks) * mark_embs[1] — reproduced faithfully here (set
  ``mark_codes_matmul=True`` on the class for the presumably-intended
  multi-hot matmul variant);
* BERT-style blocks with BiMAU (bidirectional, diag-reset intensity);
  residual of the attention sublayer takes layer_inputs[:, :, :C]
  (EasyDGL.py:112-118);
* GELU transform head; train gathers masked positions; TPP regularizer over
  masked positions with per-head tiling and a final /num_heads
  (EasyDGL.py:158-175).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (INTENSITIES, SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding, PositionCoding, TimeSinusoidCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, Dense, gelu_exact
from easydgl_tpu.nn.temporal import MAU, BiMAU


def _clip_spans(ts):
    """clip(Δt, 0, 100) with the first interval duplicated
    (EasyDGL.py:15-16, 72-74)."""
    spans = jnp.clip(ts[:, 1:] - ts[:, :-1], 0.0, 100.0)
    return jnp.concatenate([spans[:, :1], spans], axis=-1)


class EasyDGL(SequentialModel):
    data_mode: str = "mau"
    loss_mode: str = "softmax_eps"
    uses_tpp: bool = True
    mark_codes_matmul: bool = False

    @property
    def vocab_size(self) -> int:
        return self.cfg.num_items + 1

    @property
    def model_seqslen(self) -> int:
        return self.cfg.seqslen + 1

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        ts = features["seqs_t"] / cfg.time_scale
        spans = _clip_spans(ts)                       # (B, L+1)
        marks = features["seqs_marks"]                # (B, L+1, E)
        det = not is_training

        item_embs = Embedding(self.vocab_size, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        mark_embs = Embedding(cfg.num_events, cfg.num_units, zero_pad=True,
                              scale=False, name="mark_embs")

        tcodes = TimeSinusoidCoding(cfg.num_units, name="tcoding").code(ts)
        units = item_embs(ids) + tcodes
        pos = PositionCoding(self.model_seqslen, cfg.num_units,
                             name="pcoding").code(units)
        if self.mark_codes_matmul:
            mcodes = jnp.einsum("bte,ec->btc", marks.astype(jnp.float32),
                                mark_embs.table(),
                                preferred_element_type=jnp.float32)
        else:
            # faithful indicator-as-index lookup (EasyDGL.py:87):
            # sum_e emb[marks[...,e]] = (#active) * emb[1] (row 0 is zero)
            counts = jnp.sum(marks.astype(jnp.float32), axis=-1,
                             keepdims=True)
            mcodes = counts * mark_embs.table()[1][None, None, :]
        x = jnp.concatenate([units, pos, mcodes], axis=-1)   # (B, L+1, 3C)

        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        key_mask = (ids != 0).astype(jnp.float32)

        intensities = []
        for i in range(cfg.num_blocks):
            from easydgl_tpu.models.base import kernel_enabled
            attn = BiMAU(cfg.num_units, cfg.num_heads, cfg.num_events,
                         cfg.attention_probs_dropout_rate,
                         intensity_impl=("fused" if kernel_enabled(cfg)
                                         else "xla"),
                         name=f"block{i}_bimau")
            a, intny = attn(x, x, key_mask, spans, marks, deterministic=det)
            a = Dense(cfg.num_units, name=f"block{i}_attn_out")(a)
            a = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(a)
            a = ContribLayerNorm(name=f"block{i}_ln0")(
                a + x[:, :, :cfg.num_units])
            m = gelu_exact(Dense(2 * cfg.num_units, name=f"block{i}_inter")(a))
            o = Dense(cfg.num_units, name=f"block{i}_out")(m)
            o = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(o)
            x = ContribLayerNorm(name=f"block{i}_ln1")(o + a)
            intensities.append(intny)

        x = gelu_exact(Dense(cfg.num_units, name="transform")(x))
        x = ContribLayerNorm(name="transform_ln")(x)

        hidden = prediction_rows(x, is_training,
                                 features.get("masked_positions"))
        bias = OutputBias(self.vocab_size, name="out_bias")()
        table = item_embs.table()
        aux = {INTENSITIES: tuple(intensities),
               SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux

    def tpp_regularizer(self, aux, features, labels, next_marks):
        """ct_reg/num_heads * per-block biased likelihood over the MASKED
        positions (reference EasyDGL.py:158-175); spans from RAW (unscaled)
        timestamps, clipped to [0, 100]."""
        cfg = self.cfg
        pos = features["masked_positions"].astype(jnp.int32)  # (B, M)
        spans = jnp.take_along_axis(_clip_spans(features["seqs_t"]), pos,
                                    axis=1)                   # (B, M)
        h = cfg.num_heads
        spans = jnp.broadcast_to(spans[:, None], (spans.shape[0], h,
                                                  spans.shape[1]))
        onehot = next_marks.astype(jnp.float32)[:, None]      # (B, 1, M, E)
        onehot = jnp.broadcast_to(
            onehot, (onehot.shape[0], h) + onehot.shape[2:])
        reg = 0.0
        for intny in aux[INTENSITIES]:
            gathered = jnp.take_along_axis(
                intny, pos[:, None, :, None], axis=2)         # (B, H, M, E)
            reg = reg + cfg.ct_reg * MAU.biased_likelihood(
                gathered, onehot, spans) / h
        return reg
