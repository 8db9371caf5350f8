"""Throughput benchmark: flagship EasyDGL full train step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's published EasyDGL Netflix run (runme.sh:15-23):
num_units 512, 1 block, 8 heads, batch 512, seqslen 30(+1), catalog 17771,
masked objective (masklen 6) + TPP regularizer — i.e. the full forward +
backward + Adam update, including the (B*masklen) x 512 x 17772 tied-softmax
matmul.

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
BASELINE_EXAMPLES_PER_SEC below is our running estimate of the TF1 reference
on its single GPU (TF 1.15-compat graph mode, V100-class): ~4 steps/s at
batch 512. Treated as provisional until a measured TF baseline exists;
recorded so vs_baseline is comparable across rounds.
"""
from __future__ import annotations

import json
import time

BASELINE_EXAMPLES_PER_SEC = 2000.0
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(num_events=64)
    model = build_model(cfg)

    ds = synthetic_split(num_rows=4 * cfg.batch_size, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=0)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
    loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                         masklen=cfg.masklen, is_training=True,
                         mark_table=table, needs_marks=True)
    batches = []
    for i, (features, labels, _) in enumerate(loader.epoch(0)):
        feats = {k: jax.device_put(jnp.asarray(v))
                 for k, v in features.items()}
        batches.append((feats, jax.device_put(jnp.asarray(labels))))

    state = init_state(model, batches[0][0], seed=0)
    step = build_train_step(model)
    rng = jax.random.key(0)

    # warmup / compile
    state, loss = step(state, *batches[0], rng)
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(STEPS):
        feats, labels = batches[i % len(batches)]
        state, loss = step(state, feats, labels, rng)
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    ex_per_sec = STEPS * cfg.batch_size / dt
    print(json.dumps({
        "metric": "easydgl_train_examples_per_sec_per_chip",
        "value": round(ex_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
