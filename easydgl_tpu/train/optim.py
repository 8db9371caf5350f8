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

import jax
import jax.numpy as jnp
import optax

from easydgl_tpu.config import OptimConfig


def _scale_by_tf_adam(b1: float, b2: float,
                      eps: float) -> optax.GradientTransformation:
    """Adam with tf.train.AdamOptimizer's EXACT update semantics.

    TF applies the bias corrections as a scalar on the learning rate
    (``lr_t = lr*sqrt(1-b2^t)/(1-b1^t)``) and adds eps to the UNcorrected
    ``sqrt(v_t)`` — i.e. the effective epsilon is ``eps/sqrt(1-b2^t)``,
    ~32x larger than optax.adam's at t=1. For ordinary gradients the two
    are indistinguishable, but parameters whose only gradient is a tiny
    regularizer term (|g| ~ eps_eff — e.g. GREC's mean-l2 over ALL
    tensors, GREC.py:115) see up to ~30% different first updates, which
    the differential trajectory tests against the reference catch.
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        corr = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree.map(lambda m, v: corr * m / (jnp.sqrt(v) + eps),
                           mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
        tx = optax.chain(
            _scale_by_tf_adam(cfg.beta1, cfg.beta2, cfg.eps),
            optax.scale(-cfg.learning_rate))
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
