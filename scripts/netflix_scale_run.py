"""Netflix-scale end-to-end training demonstration on real TPU hardware.

The Netflix dataset itself is not in this image, so this runs the FULL
production path — vectorized synthetic data at the reference benchmark's
exact scale and config (catalog 17,771, seqslen 30, batch 512, 512 units,
8 heads, marks + TPP regularizer, mask_seen eval, early stopping
patience 10) — through `train_model` on the real chip: loader with
per-epoch host-side masking, bf16 + Pallas kernels, per-epoch full-catalog
eval over the validation AND test splits, best-checkpoint selection.

This is a systems demonstration (sustained throughput, epoch cadence,
eval cadence, early-stop behavior at production scale), NOT a quality
claim — the synthetic markov-ish data has its own learnable structure and
its metric levels say nothing about Netflix HR@50.

Usage: python scripts/netflix_scale_run.py [--rows 400000] [--epochs 15]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--eval_rows", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--ckpt_dir", default="/tmp/netflix_scale_ckpt")
    args = ap.parse_args()

    from easydgl_tpu.config import preset
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split_vectorized)
    from easydgl_tpu.train.loop import train_model

    cfg = preset("EasyDGL").replace(num_events=64,
                                    compute_dtype="bfloat16",
                                    use_pallas=True,
                                    num_epochs=args.epochs)
    t0 = time.time()
    tr = synthetic_split_vectorized(num_rows=args.rows,
                                    num_items=cfg.num_items,
                                    seqslen=cfg.seqslen, seed=7)
    vl = synthetic_split_vectorized(num_rows=args.eval_rows,
                                    num_items=cfg.num_items,
                                    seqslen=cfg.seqslen, seed=8)
    te = synthetic_split_vectorized(num_rows=args.eval_rows,
                                    num_items=cfg.num_items,
                                    seqslen=cfg.seqslen, seed=9)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=4)
    print(f"data: {args.rows:,} train / {args.eval_rows:,}x2 eval rows "
          f"in {time.time() - t0:.1f}s", flush=True)

    t1 = time.time()
    state, summary = train_model(cfg, tr, vl, te, table,
                                 ckpt_dir=args.ckpt_dir)
    wall = time.time() - t1
    steps = int(state.step)
    print(json.dumps({
        "summary": {k: round(float(v), 5) for k, v in summary.items()},
        "train_rows": args.rows,
        "optimizer_steps": steps,
        "wall_s": round(wall, 1),
        "sustained_examples_per_sec": round(steps * cfg.batch_size / wall,
                                            1),
    }), flush=True)


if __name__ == "__main__":
    main()
