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


def capture(outdir):
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(num_events=64, compute_dtype="bfloat16",
                                    use_pallas=True)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=cfg.batch_size, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=0)
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
    """Print top-30 ops by self time from the captured xplane."""
    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {"tqx": "out:json;"})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    # gviz table: rows of [rank?, host/device, type, name, #occ, total, avg,
    # total_self, ...] — column layout per tool version; find by labels
    cols = [c.get("label", c.get("id", "")) for c in tbl["table"]["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in tbl["table"]["rows"]]

    def col(label):
        for i, c in enumerate(cols):
            if label.lower() in str(c).lower():
                return i
        return None

    i_name = col("name") or col("operation")
    i_self = col("total self")
    i_occ = col("occurr")
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f"{'self us':>12}  {'%':>6}  {'n':>5}  op")
    for r in rows[:30]:
        frac = 100.0 * (r[i_self] or 0) / total if total else 0
        print(f"{r[i_self]:12.0f}  {frac:6.2f}  "
              f"{r[i_occ] if i_occ else '':>5}  {str(r[i_name])[:90]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    os.makedirs(outdir, exist_ok=True)
    capture(outdir)
    parse(outdir)
