"""Capture a jax.profiler trace of the flagship train step and print the
top self-time ops (parsed locally from the xplane proto via
tensorboard_plugin_profile — no TensorBoard UI needed).

Usage: python scripts/profile_step.py [outdir]
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def capture(outdir, longctx=False):
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

    if longctx:  # --lc: the SASREC-LC long-context step
        cfg = preset("SASREC-LC").replace(use_pallas=True)
    else:
        cfg = preset("EasyDGL").replace(num_events=64,
                                        compute_dtype="bfloat16",
                                        use_pallas=True)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=cfg.batch_size, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=0)
    if longctx:
        loader = BatchLoader(ds, data_mode="regressive",
                             batch_size=cfg.batch_size,
                             masklen=cfg.masklen, is_training=True)
    else:
        table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
        loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                             masklen=cfg.masklen, is_training=True,
                             mark_table=table, needs_marks=True)
    features, labels, _ = next(loader.epoch(0))
    feats = {k: jax.device_put(jnp.asarray(v)) for k, v in features.items()}
    labels = jax.device_put(jnp.asarray(labels))
    state = init_state(model, feats, seed=0)
    step = build_train_step(model, donate=False)
    rng = jax.random.key(0)
    state, loss = step(state, feats, labels, rng)
    float(loss)  # compile + barrier

    with jax.profiler.trace(outdir):
        for _ in range(5):
            state, loss = step(state, feats, labels, rng)
        float(loss)


def parse(outdir):
    """Print top-30 device ops by self time, aggregated from the captured
    trace.json.gz (self-contained — the tensorboard_plugin_profile xplane
    converters break across protobuf/TF versions in this image)."""
    import collections
    import gzip
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print("no trace captured", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pname = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        nm_p = pname.get(e.get("pid"), "")
        if "TPU" not in nm_p and "Device" not in nm_p:
            continue
        agg[e.get("name", "")] += float(e.get("dur", 0))
        cnt[e.get("name", "")] += 1
    # drop the enclosing span events (jit_<fn> and the bare step indices)
    ops = {k: v for k, v in agg.items()
           if not k.startswith("jit_") and not k.isdigit()}
    total = sum(ops.values())
    print(f"{'self us':>12}  {'%':>6}  {'n':>5}  op")
    for nm, us in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        frac = 100.0 * us / total if total else 0
        print(f"{us:12.0f}  {frac:6.2f}  {cnt[nm]:>5}  {nm[:90]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--lc"]
    outdir = args[0] if args else "/tmp/jaxprof"
    os.makedirs(outdir, exist_ok=True)
    capture(outdir, longctx="--lc" in sys.argv)
    parse(outdir)
