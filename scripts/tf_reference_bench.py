"""Measured throughput of the REFERENCE TF implementation (CPU).

The reference publishes no throughput numbers (SURVEY.md §6) and this image
has no GPU, so the honest measurable anchor is the reference graph itself,
built by parity/refbridge at the flagship EasyDGL config (runme.sh:15-23)
and stepped on this host's CPU. This is a FLOOR for the reference (its
original hardware was a single V100-class GPU, plausibly ~10-50x this CPU
number); BASELINE.md keeps the fixed 2,000 ex/s GPU estimate for
cross-round comparability and records this measured CPU floor beside it.

Usage: python scripts/tf_reference_bench.py [steps] [batch]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from easydgl_tpu.config import preset
    from easydgl_tpu.data.synthetic import synthetic_mark_table
    from easydgl_tpu.parity.refbridge import (RefModel, load_ref,
                                              write_mark_pickle)

    cfg = preset("EasyDGL").replace(num_events=64, batch_size=batch)
    mark = synthetic_mark_table(cfg.num_items, 64, seed=0).astype(np.int64)
    mark_file = write_mark_pickle(mark, "/tmp/ref_bench_mark.pkl")

    tf, _ = load_ref()
    L = cfg.seqslen + 1
    specs = {"seqs_i": ((L,), "int32"), "seqs_t": ((L,), "float32"),
             "masked_positions": ((cfg.masklen,), "int32")}

    # RefModel patches trainOp to identity (raw loss tensor); attach the
    # reference's default optimizer (plain Adam, Base.py:142-144) here
    ref = RefModel("EasyDGL", cfg, specs, mark_file=mark_file)
    with ref.session.graph.as_default():
        opt = tf.train.AdamOptimizer(cfg.optim.learning_rate)
        train_op = opt.minimize(ref._loss_t)
    ref.session.run(tf.global_variables_initializer())

    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.num_items, (batch, L)).astype(np.int32)
    pos = np.sort(rng.randint(1, L, (batch, cfg.masklen)), 1).astype(np.int32)
    lab = np.take_along_axis(ids, pos, 1)
    masked = ids.copy()
    np.put_along_axis(masked, pos, cfg.num_items, 1)
    ts = np.sort(rng.uniform(1e9, 1.01e9, (batch, L)), 1).astype(np.float32)
    feed = {ref._placeholders["seqs_i"]: masked,
            ref._placeholders["seqs_t"]: ts,
            ref._placeholders["masked_positions"]: pos,
            ref._labels_ph: lab}

    ref.session.run(train_op, feed)  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        ref.session.run(train_op, feed)
    dt = time.perf_counter() - t0
    ex_s = steps * batch / dt
    print(json.dumps({
        "metric": "tf_reference_train_examples_per_sec_cpu",
        "value": round(ex_s, 1), "unit": "examples/s",
        "ms_per_step": round(dt / steps * 1e3, 1)}))


if __name__ == "__main__":
    main()
