"""Measure the K-step scan trainer (train/steps.py build_multi_step) on the
chip vs the single-step path at the flagship EasyDGL config.

Usage: python scripts/multistep_bench.py [K] — prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import (build_multi_step, build_train_step,
                                         init_state, stack_batches)

    cfg = preset("EasyDGL").replace(num_events=64, compute_dtype="bfloat16",
                                    use_pallas=True)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=k * cfg.batch_size,
                         num_items=cfg.num_items, seqslen=cfg.seqslen, seed=0)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
    loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                         masklen=cfg.masklen, is_training=True,
                         mark_table=table, needs_marks=True)
    batches = []
    for features, labels, _ in loader.epoch(0):
        feats = {kk: jax.device_put(jnp.asarray(v))
                 for kk, v in features.items()}
        batches.append((feats, jax.device_put(jnp.asarray(labels))))
    batches = batches[:k]
    stacked = stack_batches(batches)

    state = init_state(model, batches[0][0], seed=0)
    rng = jax.random.key(0)

    single = build_train_step(model, donate=False)
    state, loss = single(state, *batches[0], rng)
    float(loss)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for fb, lb in batches:
            state, loss = single(state, fb, lb, rng)
    float(loss)
    single_ms = (time.perf_counter() - t0) / (reps * k) * 1e3

    multi = build_multi_step(model, donate=False)
    state, losses = multi(state, *stacked, rng)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = multi(state, *stacked, rng)
    float(losses[-1])
    multi_ms = (time.perf_counter() - t0) / (reps * k) * 1e3

    print(json.dumps({
        "metric": "multistep_vs_single_ms_per_step",
        "k": k,
        "single_ms": round(single_ms, 2),
        "multi_ms": round(multi_ms, 2),
        "speedup": round(single_ms / multi_ms, 3)}))


if __name__ == "__main__":
    main()
