"""Quality delta of the gather_queries fast path (VERDICT r2 Next #7).

The fast path computes the final block's attention for ONLY the prediction
rows (+60% train throughput at the flagship). It is NOT reference-exact:
the reference's ContribLayerNorm takes moments over ALL (T, C) positions
(Base.py:50-52), so dropping rows changes the normalization statistics.
This script measures what that costs: full early-stopped training runs on
the harness-parity synthetic dataset (dropout ON), faithful vs fast, same
seeds, and prints the per-metric deltas.

Usage: python scripts/fastpath_quality.py [--epochs 30] [--seeds a,b,c]
       [--keep WORKDIR]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.harness_parity import (METRICS, NUM_ITEMS, gen_csvs,
                                    model_flags, our_etl)


def run(model, npz_dir, epochs, seed, mark_npy, fast):
    from easydgl_tpu.cli import train as train_cli
    flags = model_flags(model, epochs)
    argv = ["--model", model, "--data_dir", npz_dir, "--platform", "cpu",
            "--seed", str(seed), "--mark", mark_npy]
    if fast:
        argv.append("--gather_queries")
    for k, v in flags.items():
        if k == "mask_seen":
            argv.append("--mask_seen")
        else:
            argv.extend([f"--{k}", str(v)])
    return train_cli.main(argv)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", default="9876,1234,555")
    ap.add_argument("--keep")
    args = ap.parse_args(argv)

    tmp = args.keep or tempfile.mkdtemp(prefix="fastpath_quality_")
    csv_dir, npz_dir = os.path.join(tmp, "csv"), os.path.join(tmp, "npz")
    print(f"workdir: {tmp}", flush=True)
    if not os.path.exists(os.path.join(npz_dir, "train.npz")):
        gen_csvs(csv_dir)
        our_etl(csv_dir, npz_dir)
    from easydgl_tpu.data.synthetic import synthetic_mark_table
    mark_npy = os.path.join(tmp, "mark.npy")
    np.save(mark_npy, synthetic_mark_table(NUM_ITEMS, 8, seed=4))

    seeds = [int(s) for s in args.seeds.split(",")]
    rows = {False: [], True: []}
    for fast in (False, True):
        for seed in seeds:
            s = run("EasyDGL", npz_dir, args.epochs, seed, mark_npy, fast)
            rows[fast].append(s)
            print(f"[{'fast' if fast else 'faithful'}] seed={seed}: "
                  f"{ {k: round(v, 5) for k, v in s.items()} }", flush=True)

    print("\n| metric | faithful mean (3 seeds) | fast mean | delta |")
    print("|---|---|---|---|")
    for k in METRICS:
        a = float(np.mean([s[k] for s in rows[False]]))
        b = float(np.mean([s[k] for s in rows[True]]))
        print(f"| {k} | {a:.5f} | {b:.5f} | {b - a:+.5f} |")


if __name__ == "__main__":
    main()
