"""TimelyREC: heterogeneous temporal patterns (WWW'21).

Parity with reference src/model/TimelyREC.py:
* inductive user embeddings via a causal attention tower
  (TimelyREC.py:79-101);
* four MATEncoders over month/day/weekday/hour with ``timeslot`` window
  smoothing (TimelyREC.py:57-77). NOTE: the reference's running-window
  cumsum is over axis=1 — the SEQUENCE axis of the (B, S, W, H) tensor, not
  the window axis (TimelyREC.py:70); the published numbers come from that
  code, so it is reproduced verbatim;
* sigmoid-attention combine over the four granularities (:126-136);
* TAHE cosine history mixing with sinusoid time codes folded in via
  te_weight (:138-148);
* dictionary-learning combine (:149-155); train-time sinusoid logit bias via
  the distributive law (:158-172).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias, SequentialModel,
                                     tied_logits)
from easydgl_tpu.nn.attention import MultiHeadAttention
from easydgl_tpu.nn.coding import Embedding, PositionCoding, TimeSinusoidCoding
from easydgl_tpu.nn.layers import mxu_einsum, ContribLayerNorm, Dense, FeedForward
from easydgl_tpu.nn.mate import MATEncoder, TAHEncoder


class TimelyREC(SequentialModel):
    data_mode: str = "regressive_datetime"
    loss_mode: str = "softmax_eps"

    def _timeslot(self, feature, maxrange, embedding):
        """Window-smoothed periodic codes (reference TimelyREC.py:57-77)."""
        cfg = self.cfg
        w = max(int(maxrange * cfg.window_ratio + 0.5), 1) + 1
        delta = jnp.concatenate([jnp.arange(1, w + 1), -jnp.arange(1, w + 1)])
        feature_3d = embedding(feature)[:, :, None, :]         # (B, S, 1, H)
        slots = jnp.mod(feature[:, :, None] + delta[None, None, :], maxrange)
        slots = embedding(slots.reshape(-1, cfg.seqslen, 2, w))  # (B,S,2,W,H)
        slots = jnp.sum(slots, axis=2)                          # (B, S, W, H)
        # reference cumsum axis=1 == sequence axis (TimelyREC.py:70)
        slots = jnp.cumsum(slots, axis=1)
        denom = (jnp.arange(1, w + 1, dtype=jnp.float32) * 2.0 + 1.0)
        outs = (feature_3d + slots) / denom[None, None, :, None]
        keys = jnp.concatenate([feature_3d, outs], axis=2)      # (B,S,W+1,H)
        return feature_3d, keys

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        det = not is_training
        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=False, name="item_embs")
        te_weight = self.param("te_weight", nn.initializers.ones, ())

        # ---- inductive user embeddings (TimelyREC.py:79-101)
        x = item_embs(ids)
        x = PositionCoding(cfg.seqslen, cfg.num_units, name="pcoding")(x)
        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)
        mask = (ids != 0).astype(x.dtype)[:, :, None]
        x = x * mask
        x = MultiHeadAttention(cfg.num_units, cfg.num_heads,
                               cfg.attention_probs_dropout_rate,
                               impl=cfg.attention_impl,
                               cp_impl=cfg.cp_impl,
                               name="user_attn")(
            ContribLayerNorm(name="user_attn_ln")(x), x,
            deterministic=det, causality=True)
        x = FeedForward((cfg.num_units, cfg.num_units),
                        cfg.hidden_dropout_rate, name="user_ffn")(
            ContribLayerNorm(name="user_ffn_ln")(x), deterministic=det)
        x = x * mask
        user_outs = ContribLayerNorm(name="user_out_ln")(x)    # (B, S, H)

        # ---- MATE over the four granularities (TimelyREC.py:108-124)
        month_embs = Embedding(12, cfg.num_units, zero_pad=False, scale=False,
                               name="month_embs")
        day_embs = Embedding(31, cfg.num_units, zero_pad=False, scale=False,
                             name="day_embs")
        weekday_embs = Embedding(7, cfg.num_units, zero_pad=False,
                                 scale=False, name="weekday_embs")
        hour_embs = Embedding(24, cfg.num_units, zero_pad=False, scale=False,
                              name="hour_embs")

        q_m, k_m = self._timeslot(features["seqs_month"] - 1, 12, month_embs)
        p_month = MATEncoder(name="month_mate")(q_m, k_m, user_outs)
        q_d, k_d = self._timeslot(features["seqs_day"] - 1, 31, day_embs)
        p_day = MATEncoder(name="day_mate")(q_d, k_d, user_outs)
        q_w, k_w = self._timeslot(features["seqs_weekday"], 7, weekday_embs)
        p_weekday = MATEncoder(name="weekday_mate")(q_w, k_w, user_outs)
        q_h, k_h = self._timeslot(features["seqs_hour"], 24, hour_embs)
        p_hour = MATEncoder(name="hour_mate")(q_h, k_h, user_outs)

        # combine (TimelyREC.py:126-136)
        pq = Dense(cfg.num_units, use_bias=False, name="period_q")(user_outs)
        pq = pq[:, :, None, :]                                  # (B, S, 1, H)
        pk = jnp.stack([p_month, p_day, p_weekday, p_hour], axis=2)
        pw = nn.sigmoid(mxu_einsum("bsoh,bsgh->bsog", pq, pk))
        period_outs = mxu_einsum("bsog,bsgh->bsh", pw, pk)

        # ---- TAHE (TimelyREC.py:138-148)
        seqs_inputs = item_embs(ids)
        tcodes = TimeSinusoidCoding(cfg.num_units, name="tcoding").code(
            features["seqs_t"][:, :-1] / cfg.time_scale)
        seqs_inputs = seqs_inputs + te_weight * tcodes
        seqs_inputs = seqs_inputs * mask
        history_outs = TAHEncoder(name="tahe")(period_outs, period_outs,
                                               seqs_inputs)

        # ---- prediction (TimelyREC.py:150-155)
        out = jnp.concatenate([user_outs, history_outs, period_outs], axis=-1)
        out = nn.sigmoid(Dense(2 * cfg.num_units, name="dict0")(out))
        out = Dense(cfg.num_units, name="dict1")(out)

        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {}
        if is_training:
            # distributive-law sinusoid bias (TimelyREC.py:158-168)
            bias_t = jnp.sum(out * tcodes, axis=-1).reshape(-1, 1)
            hidden = out.reshape(-1, cfg.num_units)
            logits = tied_logits(hidden, table, bias)
            logits = logits + bias_t * te_weight
            # the per-row bias_t shifts every logit equally -> the softmax
            # NLL is invariant to it, so the fused kernel skips it
            aux[SCORING] = (hidden, table, bias)
        else:
            hidden = out[:, -1, :]
            logits = tied_logits(hidden, table, bias)
            aux[SCORING] = (hidden, table, bias)
        return logits, aux
