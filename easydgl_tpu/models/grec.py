"""GREC: masked dilated-CNN encoder-decoder (WWW'20).

Parity with reference src/model/GREC.py:
* separate encoder/decoder embedding tables, truncated-normal(0.02), no
  zero-pad, no scale (GREC.py:44-47); vocab num_items+2 (MASK id);
* encoder: non-causal MaskedCNN stack over the MASKED sequence; projector
  ``x + dec_embs`` -> 2C tanh-GELU -> C + residual; decoder: causal
  MaskedCNN stack (GREC.py:67-84);
* dense (untied) softmax head of width num_items+2 after relu; at eval the
  id-0 and MASK columns are forced to -1000 (GREC.py:95-103);
* loss: MEAN sparse CE (no label-weighting) + 0.001 * mean over variables of
  l2_loss(v) (GREC.py:110-116) — loss_mode "grec".
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.models.base import SCORING, SequentialModel, prediction_rows
from easydgl_tpu.nn.cnn import MaskedCNN
from easydgl_tpu.nn.coding import Embedding
from easydgl_tpu.nn.layers import Dense, gelu_tanh, glorot, truncated_normal


class GREC(SequentialModel):
    data_mode: str = "grec"
    loss_mode: str = "grec"

    @property
    def vocab_size(self) -> int:
        return self.cfg.num_items + 2

    @property
    def model_seqslen(self) -> int:
        return self.cfg.seqslen + 1

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        if is_training:
            ids_enc, ids_dec = features["seqs_m"], features["seqs_i"]
        else:
            ids_enc = ids_dec = features["seqs_i"]

        init = truncated_normal(0.02)
        embs_enc = Embedding(self.vocab_size, cfg.num_units, zero_pad=False,
                             scale=False, emb_init=init, name="enc_embs")
        embs_dec = Embedding(self.vocab_size, cfg.num_units, zero_pad=False,
                             scale=False, emb_init=init, name="dec_embs")

        x = embs_enc(ids_enc)
        for i, dilation in enumerate(cfg.dilations):
            x = MaskedCNN(cfg.filter_width, cfg.num_units, dilation,
                          causality=False, name=f"regu_cnn{i}")(x)

        inp = x + embs_dec(ids_dec)
        h = gelu_tanh(Dense(2 * cfg.num_units, name="proj0")(inp))
        h = Dense(cfg.num_units, name="proj1")(h)
        x = h + inp

        for i, dilation in enumerate(cfg.dilations):
            x = MaskedCNN(cfg.filter_width, cfg.num_units, dilation,
                          causality=True, name=f"mask_cnn{i}")(x)

        hidden = prediction_rows(x, is_training,
                                 features.get("masked_positions"))
        hidden = nn.relu(hidden)
        head_w = self.param("head_kernel", glorot(),
                            (cfg.num_units, self.vocab_size))
        head_b = self.param("head_bias", nn.initializers.zeros,
                            (self.vocab_size,))
        from easydgl_tpu.nn.layers import mxu_einsum
        logits = mxu_einsum("nc,cv->nv", hidden, head_w) + head_b

        aux = {}
        if is_training:
            aux[SCORING] = (hidden, head_w.T, head_b)
        else:  # mask id-0 and MASK columns (GREC.py:100-102)
            neg = jnp.full_like(logits[:, :1], -1000.0)
            logits = jnp.concatenate([neg, logits[:, 1:-1], neg], axis=-1)
        return logits, aux
