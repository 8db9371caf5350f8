"""Serving: batched top-k recommendation from a trained checkpoint.

The reference has no serving layer (its eval CLI only streams metrics);
this is the production path the TPU build adds: a jitted scorer that maps a
batch of user histories to top-k item ids + scores, with the same eval-time
semantics the metrics use (mask-last masking for BERT-style models,
mask_seen, -1000 pad bias).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from easydgl_tpu.config import Config
from easydgl_tpu.data.masking import make_protocol
from easydgl_tpu.eval.metrics import mask_seen_logits
from easydgl_tpu.models.base import SequentialModel
from easydgl_tpu.models.registry import build_model


class Recommender:
    """Wraps (model, params) into a batched top-k recommendation function.

    ``recommend(seqs_i, seqs_t=None, ..., k=50)`` takes raw (unmasked)
    right-aligned histories of length seqslen+1 — the packed-dataset layout
    — applies the model's eval-time masking protocol, scores the catalog,
    optionally suppresses already-seen items, and returns (ids, scores).
    """

    def __init__(self, cfg: Config, params,
                 mark_table: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.params = params
        self.mark_table = mark_table
        self.protocol = make_protocol(
            self.model.data_mode, masklen=cfg.masklen,
            mask_id=cfg.num_items)
        self._score = jax.jit(self._score_fn, static_argnames=("k",))

    def _score_fn(self, params, features, seen_ids, *, k: int):
        from easydgl_tpu.nn.layers import use_compute_dtype
        with use_compute_dtype(self.cfg.matmul_dtype):
            logits, _ = self.model.apply(params, features,
                                         is_training=False)
        if self.cfg.mask_seen:
            logits = mask_seen_logits(logits, seen_ids)
        return jax.lax.top_k(logits, k)

    def recommend(self, arrays: Dict[str, np.ndarray], k: int = 50
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """arrays: packed-layout batch (seqs_i (B, L+1), seqs_t, ...).
        Returns (item_ids (B, k), scores (B, k))."""
        features, _ = self.protocol(arrays, False, None)
        if self.model.uses_tpp and self.mark_table is not None:
            ids = features["seqs_i"]
            safe = np.where(ids >= self.mark_table.shape[0], 0, ids)
            features["seqs_marks"] = \
                self.mark_table[safe].astype(np.float32)
        feats = {kk: jnp.asarray(v) for kk, v in features.items()}
        scores, idx = self._score(self.params, feats,
                                  feats["seqs_i"], k=k)
        return np.asarray(idx), np.asarray(scores)

    @classmethod
    def from_checkpoint(cls, cfg: Config, ckpt_dir: str,
                        sample_arrays: Dict[str, np.ndarray],
                        mark_table: Optional[np.ndarray] = None
                        ) -> "Recommender":
        """Single template build + restore; the template matches the
        TRAINING state layout (checkpoints store params + opt state)."""
        from easydgl_tpu.train.checkpoint import Checkpointer
        rec = cls(cfg, None, mark_table)
        template = init_state_for_restore(rec.model, sample_arrays,
                                          rec.mark_table, cfg)
        state = Checkpointer(ckpt_dir).restore(template)
        rec.params = state.params
        return rec


def init_state_for_restore(model: SequentialModel, sample_arrays,
                           mark_table, cfg: Config):
    """Build a restore template matching the TRAINING state layout."""
    from easydgl_tpu.data.loader import PackedDataset, BatchLoader
    from easydgl_tpu.train.steps import init_state
    ds = PackedDataset({k: np.asarray(v) for k, v in sample_arrays.items()},
                       cfg.num_items)
    loader = BatchLoader(ds, data_mode=model.data_mode,
                         batch_size=ds.num_rows, masklen=cfg.masklen,
                         is_training=True, mark_table=mark_table,
                         needs_marks=model.uses_tpp)
    features, _, _ = next(loader.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    return init_state(model, feats, cfg.seed)
