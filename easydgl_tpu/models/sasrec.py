"""SASRec: self-attentive sequential recommendation (ICDM'18).

Parity with reference src/model/SASREC.py:
* item embedding (zero-pad, sqrt(d) scale) + CONCAT position coding -> the
  first block consumes 2C-wide inputs (SASREC.py:43-44);
* N pre-LN blocks: ``x = MHA(LN(x), x, causal)`` then ``x = FFN(LN(x))``
  followed by the padding re-mask (SASREC.py:53-60);
* the LNs are the contrib variant normalizing over (T, C) jointly
  (Base.py:12-67);
* final LN, last-position rows at eval, tied-softmax logits + biased item 0.
"""
from __future__ import annotations

from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.attention import MultiHeadAttention
from easydgl_tpu.nn.coding import Embedding, PositionCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, FeedForward


class SASRECBlock(nn.Module):
    """One SASREC encoder block as a STANDALONE module — the pipeline
    stage body (train/pp.py). Child names ``attn/ffn/ln0/ln1`` map 1:1 to
    the sequential model's top-level ``block{i}_attn/...`` groups
    (train/pp.py::pp_partition rekeys them), so the same trained
    parameters drive both layouts; the PP-vs-sequential equality test
    (tests/test_pp.py) is the drift guard between this module and the
    inline block in ``SASREC.__call__``."""
    cfg: object

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        cfg = self.cfg
        attn = MultiHeadAttention(cfg.num_units, cfg.num_heads,
                                  cfg.attention_probs_dropout_rate,
                                  impl=cfg.attention_impl,
                                  cp_impl=cfg.cp_impl, name="attn")
        ffn = FeedForward((cfg.num_units, cfg.num_units),
                          cfg.hidden_dropout_rate, name="ffn")
        x = attn(ContribLayerNorm(name="ln0")(x), x,
                 deterministic=deterministic, causality=True)
        x = ffn(ContribLayerNorm(name="ln1")(x), deterministic=deterministic)
        return x * mask


class SASREC(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)
        x = PositionCoding(cfg.seqslen, cfg.num_units, name="pcoding")(x)
        x = nn.Dropout(cfg.hidden_dropout_rate,
                       deterministic=not is_training)(x)
        mask = (ids != 0).astype(x.dtype)[:, :, None]
        x = x * mask

        for i in range(cfg.num_blocks):
            def block(mdl, x, mask, i=i):
                cfg = mdl.cfg
                attn = MultiHeadAttention(cfg.num_units, cfg.num_heads,
                                          cfg.attention_probs_dropout_rate,
                                          impl=cfg.attention_impl,
                                          cp_impl=cfg.cp_impl,
                                          name=f"block{i}_attn")
                ffn = FeedForward((cfg.num_units, cfg.num_units),
                                  cfg.hidden_dropout_rate,
                                  name=f"block{i}_ffn")
                x = attn(ContribLayerNorm(name=f"block{i}_ln0")(x), x,
                         deterministic=not is_training, causality=True)
                x = ffn(ContribLayerNorm(name=f"block{i}_ln1")(x),
                        deterministic=not is_training)
                return x * mask

            # nn.remat keeps the module scope, so param names (and hence
            # checkpoints/fixtures) are identical with remat on or off
            x = (nn.remat(block) if cfg.remat else block)(self, x, mask)

        x = ContribLayerNorm(name="out_ln")(x)
        hidden = prediction_rows(x, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
