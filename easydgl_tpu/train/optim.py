"""Optimizers.

* ``adam`` — the reference default (tf.train.AdamOptimizer,
  Base.py:142-144); GRU models configure beta2=0.98, eps=1e-9 plus
  global-norm clip 5.0 (GRU4REC.py:60-71, compat/extender.py:25-59).
* ``adamw_warmup`` — linear-decay LR with linear warmup + AdamW whose
  decoupled weight decay skips LayerNorm and bias params, global-norm clip
  5.0 (reference src/optimization.py:27-84,87-174; unused by the reference's
  default path but part of its surface).
"""
from __future__ import annotations

import optax

from easydgl_tpu.config import OptimConfig


def _decay_mask(params):
    """Exclude LayerNorm params and biases from weight decay
    (optimization.py:145-146: no decay for 'LayerNorm'/'layer_norm'/'bias')."""
    def mask(path, _):
        names = {getattr(p, "key", str(p)) for p in path}
        if "bias" in names or "beta" in names or "gamma" in names:
            return False
        return True
    import jax
    return jax.tree_util.tree_map_with_path(mask, params)


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.name == "adam":
        tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                        eps=cfg.eps)
        if cfg.clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
        return tx
    if cfg.name == "adamw_warmup":
        # linear warmup to lr, then linear decay to 0 over num_train_steps
        # (optimization.py:35-57)
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   cfg.num_warmup_steps),
             optax.linear_schedule(
                 cfg.learning_rate, 0.0,
                 max(cfg.num_train_steps - cfg.num_warmup_steps, 1))],
            [cfg.num_warmup_steps])
        return optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-6,
                        weight_decay=cfg.weight_decay, mask=_decay_mask))
    raise ValueError(f"unknown optimizer {cfg.name}")
