"""TGREC: temporal graph collaborative transformer (CIKM'21).

Parity with reference src/model/TGREC.py: unscaled item embeddings + added
position codes; TgMultiHeadAttention over time-concatenated keys; merge layer
``dense(relu(dense(concat([attn, x]))))`` (TGREC.py:66-68).

Note: the reference computes the interval matrix from the full (L+1)-length
timestamp vector against a (L)-length model sequence (TGREC.py:48-51), shapes
that cannot broadcast — TGREC is absent from runme.sh and unrunnable as
shipped. We use Δ[q,k] = (ts[q+1] - ts[k])+, the TGAT convention
(TGAT.py:51-54), which matches the paper's "time since k at prediction time".
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding, PositionCoding, TimeFunctionCoding
from easydgl_tpu.nn.layers import Dense
from easydgl_tpu.nn.temporal import TgMultiHeadAttention


class TGREC(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        ts = features["seqs_t"] / cfg.time_scale
        det = not is_training

        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=False, name="item_embs")
        x = item_embs(ids)
        x = x + PositionCoding(cfg.seqslen, cfg.num_units,
                               name="pcoding").code(x)

        tcoding = TimeFunctionCoding(cfg.num_units, name="tcoding")
        b, t = ids.shape
        q_time = tcoding.code(jnp.zeros((b, t, 1), jnp.float32))
        if cfg.attention_impl in ("factored", "flash"):
            # long-context mode: the (B, Tq, Tk, C) coded tensor — the
            # zoo's heaviest O(L^2*C) object — never exists; the Bochner
            # features factor per position and the Dense over the concat
            # key splits by linearity (nn/temporal.py::TgMultiHeadAttention
            # docstring). "flash" additionally streams the augmented
            # q/k/v blockwise for O(T) memory.
            k_time = None
            factors = tcoding.factors(ts[:, 1:], ts[:, :-1])
        else:
            spans = jnp.maximum(ts[:, 1:, None] - ts[:, None, :-1], 0.0)
            k_time = tcoding.code(spans)
            factors = None

        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        key_mask = (ids != 0).astype(jnp.float32)

        for i in range(cfg.num_blocks):
            attn = TgMultiHeadAttention(cfg.num_units, cfg.num_heads,
                                        cfg.attention_probs_dropout_rate,
                                        impl=cfg.attention_impl,
                                        name=f"block{i}_attn")
            a = attn(x, x, key_mask, q_time, k_time,
                     deterministic=det, causality=True,
                     time_factors=factors)                    # (B, T, 2C)
            a = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(a)
            m = jnp.concatenate([a, x], axis=-1)               # (B, T, 3C)
            m = nn.relu(Dense(cfg.num_units, name=f"block{i}_inter")(m))
            x = Dense(cfg.num_units, name=f"block{i}_out")(m)

        hidden = prediction_rows(x, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
