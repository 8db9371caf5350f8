"""TGAT: functional time encoding attention (ICLR'20).

Parity with reference src/model/TGAT.py: pairwise Δt = (ts[q+1] - ts[k])+
(TGAT.py:51-54), learnable Bochner cos features added to attention logits via
TfMultiHeadAttention; otherwise SASREC-style blocks.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding, PositionCoding, TimeFunctionCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, FeedForward
from easydgl_tpu.nn.temporal import TfMultiHeadAttention


class TGAT(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        ts = features["seqs_t"] / cfg.time_scale
        det = not is_training

        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)

        pcoding_k = PositionCoding(cfg.seqslen, cfg.num_units, name="pcoding_k")
        tcoding_k = TimeFunctionCoding(cfg.num_units, name="tcoding_k")
        k_pos = pcoding_k.code(x)
        if cfg.attention_impl in ("factored", "flash"):
            # long-context mode: the (B, Tq, Tk, C) coded tensor never
            # exists — the Bochner features factor into per-position
            # cos/sin products (nn/coding.py::TimeFunctionCoding.factors);
            # "flash" additionally streams the augmented q/k through the
            # blockwise kernel for O(T) memory.
            k_int = None
            factors = tcoding_k.factors(ts[:, 1:], ts[:, :-1])
        else:
            spans = jnp.maximum(ts[:, 1:, None] - ts[:, None, :-1], 0.0)
            k_int = tcoding_k.code(spans)
            factors = None

        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        mask = (ids != 0).astype(x.dtype)[:, :, None]
        x = x * mask

        for i in range(cfg.num_blocks):
            attn = TfMultiHeadAttention(cfg.num_units, cfg.num_heads,
                                        cfg.attention_probs_dropout_rate,
                                        impl=cfg.attention_impl,
                                        cp_impl=cfg.cp_impl,
                                        name=f"block{i}_attn")
            ffn = FeedForward((cfg.num_units, cfg.num_units),
                              cfg.hidden_dropout_rate, name=f"block{i}_ffn")
            x = attn(ContribLayerNorm(name=f"block{i}_ln0")(x), x,
                     k_pos, k_int, deterministic=det, causality=True,
                     time_factors=factors)
            x = ffn(ContribLayerNorm(name=f"block{i}_ln1")(x),
                    deterministic=det)
            x = x * mask

        x = ContribLayerNorm(name="out_ln")(x)
        hidden = prediction_rows(x, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
