"""Step-level attribution: time the flagship train step with pieces removed.

Variants:
  full     — production train step (grads + Adam + dropout + TPP + L2)
  fwdloss  — forward + loss only (no backward, no optimizer)
  sgd      — backward but plain SGD update (isolates Adam's HBM cost)
  nodrop   — full step with dropout rates zeroed
  notpp    — full step with ct_reg=0 (TPP regularizer off)

Timing-only (variants are not numerically meaningful training).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

STEPS = 25


def setup(cfg):
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import init_state
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * cfg.batch_size,
                         num_items=cfg.num_items, seqslen=cfg.seqslen, seed=0)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
    loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                         masklen=cfg.masklen, is_training=True,
                         mark_table=table, needs_marks=True)
    features, labels, _ = next(loader.epoch(0))
    feats = {k: jax.device_put(jnp.asarray(v)) for k, v in features.items()}
    labels = jax.device_put(jnp.asarray(labels))
    state = init_state(model, feats, seed=0)
    return model, state, feats, labels


def _sync(out):
    """Host transfer — the only airtight completion barrier over the axon
    relay (block_until_ready alone returns early there)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def time_fn(fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(STEPS):
            out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main():
    from easydgl_tpu.config import preset
    from easydgl_tpu.train.steps import build_train_step, compute_loss
    which = sys.argv[1:] or ["full", "fwdloss", "sgd", "nodrop", "notpp"]

    base = preset("EasyDGL").replace(num_events=64,
                                     compute_dtype="bfloat16",
                                     use_pallas=True)

    for name in which:
        cfg = base
        if name == "nodrop":
            cfg = base.replace(hidden_dropout_rate=0.0,
                               attention_probs_dropout_rate=0.0)
        if name == "notpp":
            cfg = base.replace(ct_reg=0.0)
        model, state, feats, labels = setup(cfg)
        rng = jax.random.key(0)

        if name == "fwdloss":
            @jax.jit
            def fn(params, feats, labels):
                return compute_loss(model, params, feats, labels,
                                    {"dropout": jax.random.key(1)})
            ms = time_fn(fn, state.params, feats, labels)
        elif name == "sgd":
            tx = optax.sgd(1e-3)
            opt_state = tx.init(state.params)

            @jax.jit
            def fn(params, opt_state, feats, labels):
                loss, grads = jax.value_and_grad(
                    lambda p: compute_loss(model, p, feats, labels,
                                           {"dropout": jax.random.key(1)})
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            _sync(fn(state.params, opt_state, feats, labels)[2])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                p, o = state.params, opt_state
                for _ in range(STEPS):
                    p, o, loss = fn(p, o, feats, labels)
                _sync(loss)
                best = min(best, time.perf_counter() - t0)
            ms = best / STEPS * 1e3
        else:
            step = build_train_step(model, donate=False)
            s = state
            _sync(step(s, feats, labels, rng)[1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                s2 = s
                for _ in range(STEPS):
                    s2, loss = step(s2, feats, labels, rng)
                _sync(loss)
                best = min(best, time.perf_counter() - t0)
            ms = best / STEPS * 1e3
        print(f"{name:8s}: {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
