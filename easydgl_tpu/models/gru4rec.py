"""GRU4REC: session-based RNN recommendation (ICLR'16).

Parity with reference src/model/GRU4REC.py: item embedding (scaled, zero-pad)
-> dropout -> multi-layer cuDNN-variant GRU -> padding mask -> tied-softmax
logits. Optimizer: Adam(beta2=0.98, eps=1e-9) + global-norm clip 5
(GRU4REC.py:60-71) — configured via the preset, applied by the harness.
"""
from __future__ import annotations

from flax import linen as nn

from easydgl_tpu.models.base import (SCORING, OutputBias,
                                     SequentialModel, prediction_rows,
                                     tied_logits)
from easydgl_tpu.nn.coding import Embedding
from easydgl_tpu.nn.rnn import CudnnGRU


class GRU4REC(SequentialModel):
    data_mode: str = "regressive"
    loss_mode: str = "softmax_eps"

    @nn.compact
    def __call__(self, features, *, is_training: bool):
        cfg = self.cfg
        ids = features["seqs_i"]
        item_embs = Embedding(cfg.num_items, cfg.num_units, zero_pad=True,
                              scale=True, name="item_embs")
        x = item_embs(ids)
        x = nn.Dropout(cfg.hidden_dropout_rate,
                       deterministic=not is_training)(x)
        h, _ = CudnnGRU(cfg.num_blocks, cfg.num_units, name="gru")(x)
        mask = (ids != 0).astype(h.dtype)[:, :, None]
        h = h * mask
        hidden = prediction_rows(h, is_training)
        bias = OutputBias(cfg.num_items, name="out_bias")()
        table = item_embs.table()
        aux = {SCORING: (hidden, table, bias)}
        return tied_logits(hidden, table, bias), aux
