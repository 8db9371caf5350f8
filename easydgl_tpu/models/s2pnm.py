"""S2PNM: dynamic preference via dictionary learning (TKDE'21).

Parity with reference src/model/S2PNM.py: scaled item embeddings -> dropout
-> 1-layer cuDNN-variant GRU -> position-coding CONCAT (2C) + mask -> causal
MHA + FFN -> dictionary combine ``LN([g, h, g-h, g*h])`` -> sigmoid dense 2C
-> dense C -> residual with the RAW item embeddings (S2PNM.py:46-66).
Optimizer: Adam(beta2=.98, eps=1e-9) + clip 5 via preset.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.attention import MultiHeadAttention
from easydgl_tpu.nn.coding import Embedding, PositionCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, Dense, FeedForward
from easydgl_tpu.nn.rnn import CudnnGRU


class S2PNM(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        det = not is_training

        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        inputs = item_embs(ids)
        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(inputs)
        mask = (ids != 0).astype(x.dtype)[:, :, None]

        h, _ = CudnnGRU(1, cfg.num_units, name="gru")(x)

        x = PositionCoding(cfg.seqslen, cfg.num_units, name="pcoding")(h)
        x = x * mask

        x = MultiHeadAttention(cfg.num_units, cfg.num_heads,
                               cfg.attention_probs_dropout_rate,
                               impl=cfg.attention_impl,
                               cp_impl=cfg.cp_impl,
                               name="attn")(
            ContribLayerNorm(name="attn_ln")(x), x,
            deterministic=det, causality=True)
        g = FeedForward((cfg.num_units, cfg.num_units),
                        cfg.hidden_dropout_rate, name="ffn")(
            ContribLayerNorm(name="ffn_ln")(x), deterministic=det)

        d = jnp.concatenate([g, h, g - h, g * h], axis=-1)
        d = ContribLayerNorm(name="dict_ln")(d)
        d = nn.sigmoid(Dense(2 * cfg.num_units, name="dict0")(d))
        d = Dense(cfg.num_units, name="dict1")(d)
        out = d + inputs

        hidden = prediction_rows(out, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
