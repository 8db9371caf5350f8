"""Interpretation CLI (replaces reference src/analytics.py): restore a
checkpoint, run test-set eval, and dump per-batch logits (the reference's
"ANALYTICS" collection, Base.py:154) to a pickle.
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint directory")
    p.add_argument("--model", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--mark")
    p.add_argument("--out", default="res", help="output pickle path")
    p.add_argument("--num_items", type=int)
    p.add_argument("--num_units", type=int)
    p.add_argument("--num_heads", type=int)
    p.add_argument("--num_blocks", type=int)
    p.add_argument("--num_events", type=int)
    p.add_argument("--seqslen", type=int)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--attention_impl",
                   choices=["xla", "flash", "factored"],
                   help="must match training when it changes param shapes "
                        "(it doesn't — all impls share one param tree); "
                        "pick the memory-appropriate one for the restore")
    p.add_argument("--mask_seen", action="store_true", default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader, PackedDataset
    from easydgl_tpu.eval.metrics import MetricAccumulator
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.checkpoint import Checkpointer
    from easydgl_tpu.train.steps import build_analytics_step, init_state

    overrides = {k: getattr(args, k) for k in
                 ("num_items", "num_units", "num_heads", "num_blocks",
                  "num_events", "seqslen", "batch_size", "mask_seen",
                  "attention_impl")
                 if getattr(args, k) is not None}
    cfg = preset(args.model, **overrides)
    mark = np.load(args.mark) if args.mark else None
    if mark is not None and not cfg.num_events:
        cfg = cfg.replace(num_events=mark.shape[-1])

    test = PackedDataset.load(os.path.join(args.data_dir, "test.npz"))
    model = build_model(cfg)
    loader = BatchLoader(test, data_mode=model.data_mode,
                         batch_size=cfg.batch_size, masklen=cfg.masklen,
                         is_training=False, mark_table=mark,
                         needs_marks=model.uses_tpp)

    features, labels, _ = next(loader.epoch())
    sample = {k: jnp.asarray(v) for k, v in features.items()}
    template = init_state(model, sample, cfg.seed)
    state = Checkpointer(args.ckpt).restore(template)

    step = build_analytics_step(model)
    acc = MetricAccumulator()
    all_logits = []
    for features, labels, valid in loader.epoch():
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        logits, sums = step(state.params, feats, jnp.asarray(labels),
                            jnp.asarray(valid))
        acc.update(sums)
        all_logits.append(np.asarray(logits)[np.asarray(valid)])
    res = acc.result()
    logging.info("TEST: %s", {k: f"{v:.5f}" for k, v in res.items()})
    with open(args.out, "wb") as f:
        pickle.dump(all_logits, f)
    logging.info("wrote %d logit batches to %s", len(all_logits), args.out)
    return res


if __name__ == "__main__":
    main()
