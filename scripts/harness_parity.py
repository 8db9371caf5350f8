"""Harness-level end-to-end parity vs the reference CLI (VERDICT r2 Next #2).

Covers the last untested layer: the epoch loop x eval cadence x patience x
checkpoint-selection interaction, WITH dropout on and each side's own RNG
streams. Flow:

1. generate a small raw dataset (split CSVs with uid,sid,time + datetime
   columns, the layout the reference's prepared Netflix CSVs use,
   linkpred.py:255-274);
2. reference ETL: the reference's OWN TripletDataset.tfrecord
   (/root/reference/data/linkpred.py:126-191) -> train*.tfrec etc.;
3. our ETL: easydgl_tpu.data.etl.prepare -> train.npz etc. from the SAME
   CSVs;
4. run the reference's own CLI loop verbatim (scripts/ref_main_runner.py ->
   src/main.py:78-151 + util.py EarlyStopping) to early stop / epoch cap;
5. run python -m easydgl_tpu.cli.train on the .npz data with the same
   hyperparameters, for several seeds;
6. compare the EarlyStopping SUMMARY metrics: the reference number must sit
   within the run-variance band of our seeds (dropout + RNG differ by
   construction, so exactness is impossible at the harness level — the
   per-step exactness story is scripts/full_run_parity.py).

Usage:
    python scripts/harness_parity.py [--models GRU4REC,EasyDGL]
        [--epochs 30] [--keep WORKDIR]

Prints a per-model table (also suitable for docs/PARITY.md) and exits
nonzero if any reference metric falls outside [min - tol, max + tol] of our
seed band.
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REF_ROOT = os.environ.get("EASYDGL_REFERENCE_ROOT", "/root/reference")
NUM_ITEMS = 201          # sids 1..200, mask id 201 (reference convention:
                         # --num_items=17771 with sids 1..17770)
SEQSLEN = 30
METRICS = ("H10", "H50", "H100", "N10", "N50", "N100")


# ---------------------------------------------------------------------------
# 1. raw dataset
# ---------------------------------------------------------------------------

def gen_csvs(out_dir: str, seed: int = 20260818) -> None:
    """Split CSVs in the reference's prepared layout. Sequences follow the
    synthetic_split generator's learnable markov-ish structure so early
    stopping has an actual learning curve to act on."""
    import pandas as pd
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, NUM_ITEMS)
    probs = 1.0 / ranks ** 0.8
    probs /= probs.sum()

    def user_rows(uid: int):
        n = int(rng.integers(4, 42))  # some users exceed seqslen+1
        items = np.empty(n, np.int64)
        items[0] = rng.choice(ranks, p=probs)
        for j in range(1, n):
            if rng.random() < 0.6:
                items[j] = (items[j - 1] % (NUM_ITEMS - 1)) + 1
            else:
                items[j] = rng.choice(ranks, p=probs)
        t0 = 1.1e9 + float(rng.integers(0, 10_000_000))
        times = t0 + np.cumsum(rng.exponential(86400.0, n))
        return pd.DataFrame({"uid": uid, "sid": items,
                             "time": times.astype(np.int64)})

    def with_datetime(df):
        dt = pd.to_datetime(df["time"].values.astype(np.int64), unit="s")
        df["month"] = dt.month
        df["day"] = dt.day
        df["weekday"] = dt.weekday
        df["hour"] = dt.hour
        return df

    uid = 0
    frames = {"train": [], "valid": [], "test": []}
    # eval-split sizes set the comparison's noise floor: H@k on n rows has
    # binomial sigma ~ sqrt(p(1-p)/n) ~ 0.02 at n=384 — tol 0.03 is then a
    # ~1.5-sigma band instead of <1 sigma at the original 96 rows
    for split, n_users in (("train", 960), ("valid", 384), ("test", 384)):
        for _ in range(n_users):
            frames[split].append(user_rows(uid))
            uid += 1
    os.makedirs(out_dir, exist_ok=True)
    with_datetime(pd.concat(frames["train"])).to_csv(
        os.path.join(out_dir, "train.csv"), index=False)
    for split, name in (("valid", "validation"), ("test", "test")):
        full = with_datetime(pd.concat(frames[split]))
        # the reference's prepared CSVs hold the last event per user in
        # the _te file (linkpred.py:93-112); both ETLs re-concat them
        last = full.groupby("uid").tail(1)
        head = full.drop(last.index)
        head.to_csv(os.path.join(out_dir, f"{name}_tr.csv"), index=False)
        last.to_csv(os.path.join(out_dir, f"{name}_te.csv"), index=False)


# ---------------------------------------------------------------------------
# 2+3. both ETLs
# ---------------------------------------------------------------------------

def ref_etl(csv_dir: str, out_dir: str) -> None:
    """Run the reference's own TFRecord writer on the CSVs."""
    import importlib.util

    import pandas as pd
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    spec = importlib.util.spec_from_file_location(
        "ref_linkpred", os.path.join(REF_ROOT, "data", "linkpred.py"))
    linkpred = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(linkpred)

    def read(*names):
        df = pd.concat([pd.read_csv(os.path.join(csv_dir, f"{n}.csv"))
                        for n in names])
        df.sort_values(by=["uid", "time"], ascending=True, inplace=True)
        return df

    os.makedirs(out_dir, exist_ok=True)
    linkpred.TripletDataset.tfrecord(
        read("train"), read("validation_tr", "validation_te"),
        read("test_tr", "test_te"), out_dir, SEQSLEN, n_shards=2)


def our_etl(csv_dir: str, out_dir: str) -> None:
    from easydgl_tpu.data.etl import prepare
    prepare(csv_dir, out_dir, seqslen=SEQSLEN, num_items=NUM_ITEMS)


# ---------------------------------------------------------------------------
# 4. reference CLI run
# ---------------------------------------------------------------------------

def model_flags(model: str, epochs: int) -> dict:
    # mask_seen on for every model, as runme.sh does (runme.sh:23-115);
    # our presets default it on for the same reason, so BOTH CLIs must
    # receive it explicitly or the eval protocols diverge
    flags = {"num_units": 32, "num_blocks": 1, "batch_size": 64,
             "num_epochs": epochs, "learning_rate": 5e-4, "l2_reg": 1e-4,
             "hidden_dropout_rate": 0.1, "num_items": NUM_ITEMS,
             "seqslen": SEQSLEN, "mask_seen": True}
    if model == "EasyDGL":
        flags.update(num_heads=2, masklen=3, ct_reg=1e-7,
                     time_scale=86400.0,
                     attention_probs_dropout_rate=0.1)
    elif model == "TiSASREC":
        # runme.sh:TiSASREC block: interval buckets + daily time scale
        flags.update(num_heads=2, timelen=64, time_scale=86400.0,
                     attention_probs_dropout_rate=0.1)
    elif model == "BERT4REC":
        flags.update(num_heads=2, masklen=3,
                     attention_probs_dropout_rate=0.1)
    elif model == "CTSMA":
        flags.update(num_heads=2, ct_reg=1e-7, time_scale=86400.0,
                     attention_probs_dropout_rate=0.1)
    elif model == "SASREC":
        flags.update(num_heads=2, attention_probs_dropout_rate=0.1)
    elif model == "S2PNM":
        # GRU + position coding + causal attention + dictionary combine;
        # the CPU CudnnGRU swap (parity/refbridge.py) covers its RNN too
        flags.update(num_heads=1, attention_probs_dropout_rate=0.1)
    elif model == "GREC":
        # masked dilated-CNN encoder-decoder; pass the schedule explicitly
        # (our GREC preset carries runme.sh's 1,4,1,4 while the reference
        # CLI default is 1,2,2,4 — both sides must see the same value)
        flags.update(masklen=3, dilations="1,2,2,4", filter_width=3)
    elif model == "TGAT":
        flags.update(num_heads=1, time_scale=86400.0,
                     attention_probs_dropout_rate=0.1)
    elif model == "TGREC":
        flags.update(num_heads=1, time_scale=86400.0,
                     attention_probs_dropout_rate=0.1)
    elif model == "TimelyREC":
        flags.update(num_heads=2, time_scale=86400.0, window_ratio=0.2,
                     attention_probs_dropout_rate=0.1)
    return flags


def run_reference(model: str, workdir: str, tfrec_dir: str, epochs: int,
                  mark_pkl: str | None) -> dict:
    flags = model_flags(model, epochs)
    argv = [sys.executable, os.path.join(REPO, "scripts",
                                         "ref_main_runner.py"), workdir,
            "--train", os.path.join(tfrec_dir, "train*.tfrec"),
            "--valid", os.path.join(tfrec_dir, "validation.tfrec"),
            "--test", os.path.join(tfrec_dir, "test.tfrec"),
            "--model", model]
    for k, v in flags.items():
        if k == "mask_seen":
            if v:
                argv.append("--mask_seen")
        else:
            argv.append(f"--{k}={v}")
    if mark_pkl:
        argv.append(f"--mark={mark_pkl}")
    res = subprocess.run(argv, capture_output=True, text=True,
                         timeout=7200)
    if res.returncode != 0:
        raise RuntimeError(
            f"reference main.py failed rc={res.returncode}:\n"
            + res.stderr[-3000:])
    with open(os.path.join(workdir, "model.log")) as f:
        log = f.read()
    m = re.findall(r"SUMMARY: (\{.*\})", log)
    assert m, f"no SUMMARY in reference log:\n{log[-2000:]}"
    return {k: float(v) for k, v in ast.literal_eval(m[-1]).items()}


# ---------------------------------------------------------------------------
# 5. our CLI run
# ---------------------------------------------------------------------------

def run_ours(model: str, npz_dir: str, epochs: int, seed: int,
             mark_npy: str | None) -> dict:
    from easydgl_tpu.cli import train as train_cli
    flags = model_flags(model, epochs)
    argv = ["--model", model, "--data_dir", npz_dir, "--platform", "cpu",
            "--seed", str(seed)]
    for k, v in flags.items():
        if k == "mask_seen":
            if v:
                argv.append("--mask_seen")
        else:
            argv.extend([f"--{k}", str(v)])
    if mark_npy:
        argv.extend(["--mark", mark_npy])
    return train_cli.main(argv)


# ---------------------------------------------------------------------------
# 6. compare
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# PRE-REGISTERED PROTOCOL (committed 2026-08-20, BEFORE the round-5 rerun of
# SASREC and TGAT — git history is the timestamp). The round-4 verdict flagged
# a forking-paths pattern: SASREC's band was widened (3 seeds/25 ep -> 5/30)
# and TGAT's dataset was re-drawn (data_seed 777) AFTER each first band
# missed. This block fixes one uniform protocol for EVERY model, in advance:
#
#   seeds      = (9876, 1234, 555, 42, 7)   five model seeds per model
#   epochs     = 30                          runme.sh's horizon
#   band       = [min - 0.03, max + 0.03] over the 5 seeds
#   data_seed  = 20260818                    the ORIGINAL draw (not 777)
#
# Statistical note, fixed in advance: the reference contributes ONE
# fixed-model-seed sample (src/main.py:157 hardcodes its seed) against our
# 5-seed band; with 384 eval rows the binomial sigma of an H@k metric is
# ~0.020-0.025, so +-0.03 beyond the seed min/max is a ~1.5-sigma guard and
# a per-metric false-miss probability of roughly 5-15% is EXPECTED by
# chance across a 6-metric row. Commitment: a miss under this protocol is
# REPORTED AS A MISS (with its margin), never re-drawn or re-banded; the
# honest summary is then the count of misses vs the count expected by
# chance. Changing any constant below requires re-running every model.
PROTOCOL = {
    "seeds": "9876,1234,555,42,7",
    "epochs": 30,
    "tol": 0.03,
    "data_seed": 20260818,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", default="GRU4REC,EasyDGL")
    p.add_argument("--epochs", type=int, default=PROTOCOL["epochs"])
    p.add_argument("--seeds", default=PROTOCOL["seeds"])
    p.add_argument("--tol", type=float, default=PROTOCOL["tol"],
                   help="slack added around our seed band (metric units)")
    p.add_argument("--keep", help="persist intermediate files here")
    p.add_argument("--data_seed", type=int, default=PROTOCOL["data_seed"],
                   help="dataset draw (pre-registered; overriding it "
                        "leaves the pre-registered protocol and must be "
                        "reported as exploratory)")
    args = p.parse_args(argv)
    off_protocol = (args.epochs != PROTOCOL["epochs"]
                    or args.seeds != PROTOCOL["seeds"]
                    or args.tol != PROTOCOL["tol"]
                    or args.data_seed != PROTOCOL["data_seed"])
    if off_protocol:
        print("NOTE: flags differ from the pre-registered PROTOCOL — "
              "this run is exploratory, not a parity claim.", flush=True)

    tmp = args.keep or tempfile.mkdtemp(prefix="harness_parity_")
    csv_dir = os.path.join(tmp, "csv")
    tfrec_dir = os.path.join(tmp, "tfrec")
    npz_dir = os.path.join(tmp, "npz")
    print(f"workdir: {tmp}", flush=True)

    gen_csvs(csv_dir, seed=args.data_seed)
    ref_etl(csv_dir, tfrec_dir)
    our_etl(csv_dir, npz_dir)

    # shared synthetic mark table for EasyDGL, in each side's format
    from easydgl_tpu.data.synthetic import synthetic_mark_table
    from easydgl_tpu.parity.refbridge import write_mark_pickle
    table = synthetic_mark_table(NUM_ITEMS, 8, seed=4)
    mark_pkl = write_mark_pickle(table, os.path.join(tmp, "mark.pkl"))
    mark_npy = os.path.join(tmp, "mark.npy")
    np.save(mark_npy, table)

    seeds = [int(s) for s in args.seeds.split(",")]
    failures = []
    rows = []
    for model in args.models.split(","):
        is_mau = model in ("EasyDGL", "CTSMA")
        workdir = os.path.join(tmp, f"ref_{model}")
        os.makedirs(workdir, exist_ok=True)
        ref = run_reference(model, workdir, tfrec_dir, args.epochs,
                            mark_pkl if is_mau else None)
        print(f"[{model}] reference: "
              f"{ {k: round(v, 5) for k, v in ref.items()} }", flush=True)
        ours = []
        for seed in seeds:
            s = run_ours(model, npz_dir, args.epochs, seed,
                         mark_npy if is_mau else None)
            ours.append(s)
            print(f"[{model}] ours seed={seed}: "
                  f"{ {k: round(v, 5) for k, v in s.items()} }", flush=True)
        # an empty summary == the faithful NaN-loss abort (util.py:29-30
        # semantics). Count it as a FAILURE row rather than crashing the
        # whole comparison — this is exactly how the TimelyREC seed-7 NaN
        # was caught.
        aborted = [seed for seed, s in zip(seeds, ours) if not s]
        if aborted:
            failures.append((model, "NAN_ABORT", float("nan"), aborted))
            print(f"[{model}] seeds {aborted} aborted (NaN loss)",
                  flush=True)
            ours = [s for s in ours if s]
            if not ours:
                continue
        for k in METRICS:
            vals = [s[k] for s in ours]
            lo, hi = min(vals) - args.tol, max(vals) + args.tol
            ok = lo <= ref[k] <= hi
            rows.append((model, k, ref[k], np.mean(vals), min(vals),
                         max(vals), ok))
            if not ok:
                failures.append((model, k, ref[k], vals))

    print("\n| model | metric | reference | ours mean | ours min..max "
          f"(seeds {args.seeds}) | within band±{args.tol} |")
    print("|---|---|---|---|---|---|")
    for model, k, rv, mean, lo, hi, ok in rows:
        print(f"| {model} | {k} | {rv:.5f} | {mean:.5f} | "
              f"{lo:.5f}..{hi:.5f} | {'yes' if ok else 'NO'} |")
    summary = {"failures": len(failures), "rows": len(rows), "tmp": tmp,
               "protocol": "pre-registered" if not off_protocol
               else "exploratory"}
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
