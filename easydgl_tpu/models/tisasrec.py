"""TiSASRec: time-interval-aware self-attention (WSDM'20).

Parity with reference src/model/TiSASREC.py:
* interval matrix Δ[q,k] = ts[q+1] - ts[k], clipped to [0, timelen] and
  bucketized (TiSASREC.py:56-59); the reference's bucket `timelen` lands out
  of range of the `timelen`-row table — TF GPU gathers clamp, and jnp.take
  in clip mode reproduces exactly that;
* shared K/V position tables + K/V interval tables across blocks
  (TiSASREC.py:29-32) — codes are computed once and fed to every block;
* block structure identical to SASREC (pre-LN, FFN, re-mask).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding, PositionCoding, TimeIntervalCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, FeedForward
from easydgl_tpu.nn.temporal import TiMultiHeadAttention


class TiSASREC(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        ts = features["seqs_t"] / cfg.time_scale     # (B, L+1)
        det = not is_training

        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)

        # Δ[q,k] = ts[q+1] - ts[k], clip [0, timelen] (TiSASREC.py:56-59)
        spans = ts[:, 1:, None] - ts[:, None, :-1]
        spans = jnp.clip(spans, 0.0, float(cfg.timelen)).astype(jnp.int32)

        pcoding_k = PositionCoding(cfg.timelen, cfg.num_units, name="pcoding_k")
        pcoding_v = PositionCoding(cfg.timelen, cfg.num_units, name="pcoding_v")
        tcoding_k = TimeIntervalCoding(cfg.timelen, cfg.num_units,
                                       name="tcoding_k")
        tcoding_v = TimeIntervalCoding(cfg.timelen, cfg.num_units,
                                       name="tcoding_v")
        k_pos, v_pos = pcoding_k.code(x), pcoding_v.code(x)
        if cfg.attention_impl == "factored":
            # long-context mode: no (B, Tq, Tk, C) interval tensors — the
            # attention consumes raw buckets + the extended tables (see
            # nn/temporal.py::TiMultiHeadAttention docstring)
            k_int = v_int = None
            factored = dict(interval_buckets=spans,
                            interval_tables=(tcoding_k.table_extended(),
                                             tcoding_v.table_extended()))
        else:
            k_int, v_int = tcoding_k.code(spans), tcoding_v.code(spans)
            factored = {}

        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        mask = (ids != 0).astype(x.dtype)[:, :, None]
        x = x * mask

        for i in range(cfg.num_blocks):
            attn = TiMultiHeadAttention(cfg.num_units, cfg.num_heads,
                                        cfg.attention_probs_dropout_rate,
                                        name=f"block{i}_attn")
            ffn = FeedForward((cfg.num_units, cfg.num_units),
                              cfg.hidden_dropout_rate, name=f"block{i}_ffn")
            x = attn(ContribLayerNorm(name=f"block{i}_ln0")(x), x,
                     k_pos, v_pos, k_int, v_int,
                     deterministic=det, causality=True, **factored)
            x = ffn(ContribLayerNorm(name=f"block{i}_ln1")(x),
                    deterministic=det)
            x = x * mask

        x = ContribLayerNorm(name="out_ln")(x)
        hidden = prediction_rows(x, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
