"""BERT4Rec: bidirectional masked-item transformer (CIKM'19).

Parity with reference src/model/BERT4REC.py:
* seqslen+1 positions, vocab num_items+2 (MASK id = num_items,
  BERT4REC.py:43-45);
* scaled embeddings + ADDED position codes + LN + dropout (:61-70);
* post-LN BERT blocks (attention -> dense+dropout+LN(residual) ->
  2C GELU intermediate -> dense+dropout+LN(residual), :84-111);
* GELU transform head + LN (:114-117);
* train gathers masked positions (:120-121); sparse-softmax CE loss
  (:131-149) — loss_mode "sparse_ce".
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.attention import BERTAttention
from easydgl_tpu.nn.coding import Embedding, PositionCoding
from easydgl_tpu.nn.layers import ContribLayerNorm, Dense, gelu_exact


class BERT4REC(SequentialModel):
    data_mode: str = "masked"
    loss_mode: str = "sparse_ce"

    @property
    def vocab_size(self) -> int:
        return self.cfg.num_items + 2

    @property
    def model_seqslen(self) -> int:
        return self.cfg.seqslen + 1

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        det = not is_training
        # reference uses Embedding's default scale=True (sqrt(d) scaling,
        # BERT4REC.py:43 passes no scale argument -> coding.py:47 default)
        item_embs = Embedding(self.vocab_size, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)
        x = x + PositionCoding(self.model_seqslen, cfg.num_units,
                               name="pcoding").code(x)
        x = ContribLayerNorm(name="emb_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_rate, deterministic=det)(x)

        # (B, Tq, Tk) attention mask (BERT4REC.py:74-79)
        attn_mask = jnp.ones_like(ids, jnp.float32)[:, :, None] * \
            (ids != 0).astype(jnp.float32)[:, None, :]

        key_mask = (ids != 0).astype(jnp.float32)
        for i in range(cfg.num_blocks):
            def block(mdl, x, attn_mask, key_mask, i=i):
                cfg = mdl.cfg
                a = BERTAttention(cfg.num_units, cfg.num_heads,
                                  cfg.attention_probs_dropout_rate,
                                  impl=cfg.attention_impl,
                                  cp_impl=cfg.cp_impl,
                                  name=f"block{i}_attn")(
                    x, x, attn_mask, deterministic=det, key_mask=key_mask)
                a = Dense(cfg.num_units, name=f"block{i}_attn_out")(a)
                a = nn.Dropout(cfg.hidden_dropout_rate,
                               deterministic=det)(a)
                a = ContribLayerNorm(name=f"block{i}_ln0")(a + x)
                m = Dense(2 * cfg.num_units, name=f"block{i}_inter")(a)
                m = gelu_exact(m)
                o = Dense(cfg.num_units, name=f"block{i}_out")(m)
                o = nn.Dropout(cfg.hidden_dropout_rate,
                               deterministic=det)(o)
                return ContribLayerNorm(name=f"block{i}_ln1")(o + a)

            # nn.remat keeps the module scope: identical param names
            x = (nn.remat(block) if cfg.remat else block)(
                self, x, attn_mask, key_mask)

        x = gelu_exact(Dense(cfg.num_units, name="transform")(x))
        x = ContribLayerNorm(name="transform_ln")(x)

        hidden = prediction_rows(x, is_training,
                                 features.get("masked_positions"))
        bias = OutputBias(self.vocab_size, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
