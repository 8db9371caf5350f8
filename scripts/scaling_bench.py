"""DP/TP scaling measurement over a (data, model) mesh.

On real multi-chip hardware this measures examples/s at each mesh size and
reports scaling efficiency vs the single-device run (the BASELINE.md
``>= 0.85 efficiency`` target). On a single-chip/dev box, run with
``--force_cpu N`` to validate the full sharded path functionally over N
virtual CPU devices (numbers are then NOT performance-meaningful).

Usage:
    python scripts/scaling_bench.py [--force_cpu 8] [--mp 1] [--cp 1]
                                    [--steps 20]

--cp N additionally shards the SEQUENCE over a third mesh axis (ring
attention, dist/context.py) using the long-context SASREC-LC config —
the CP-scaling row for when multi-chip hardware exists.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force_cpu", type=int, default=0)
    ap.add_argument("--mp", type=int, default=1)
    ap.add_argument("--cp", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch_per_replica", type=int, default=512)
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.force_cpu}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from easydgl_tpu.config import MeshConfig, preset
    from easydgl_tpu.core.mesh import make_mesh
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import init_state

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    tiny = args.force_cpu > 0
    results = {}
    for nd in sizes:
        cp = args.cp if nd % max(args.cp * args.mp, 1) == 0 else 1
        mp = args.mp if nd % max(args.mp, 1) == 0 else 1
        dp = nd // (mp * cp)
        # catalog must divide by mp; the bench keeps the real catalog when
        # mp==1 and pads to a divisible size otherwise
        num_items = (255 if tiny else 17771)
        if mp > 1:
            num_items = ((num_items + 1 + mp - 1) // mp) * mp - 1
        if cp > 1:
            # long-context CP row: SASREC-LC, sequence ring-sharded
            cfg = preset("SASREC-LC").replace(
                num_items=num_items,
                num_units=32 if tiny else 512,
                num_heads=2 if tiny else 8,
                batch_size=(8 if tiny else 64) * dp,
                seqslen=8 * max(cp, 2) if tiny else 2048,
                compute_dtype="float32" if tiny else "bfloat16",
                hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0,
                # flash needs a real TPU; the CPU functional run keeps the
                # ring path (cp>1) but swaps the local core to XLA
                attention_impl="xla" if tiny else "flash",
                mesh=MeshConfig(dp=dp, mp=mp, cp=cp))
        else:
            cfg = preset("EasyDGL").replace(
                num_items=num_items, num_events=16 if tiny else 64,
                num_units=32 if tiny else 512,
                num_heads=2 if tiny else 8,
                batch_size=(8 if tiny else args.batch_per_replica) * dp,
                seqslen=8 if tiny else 30,
                compute_dtype="float32" if tiny else "bfloat16",
                mesh=MeshConfig(dp=dp, mp=mp))
        model = build_model(cfg)
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:nd])

        ds = synthetic_split(num_rows=2 * cfg.batch_size,
                             num_items=cfg.num_items, seqslen=cfg.seqslen,
                             seed=0)
        if cp > 1:
            loader = BatchLoader(ds, data_mode="regressive",
                                 batch_size=cfg.batch_size,
                                 masklen=cfg.masklen, is_training=True)
        else:
            table = synthetic_mark_table(cfg.num_items, cfg.num_events,
                                         seed=0)
            loader = BatchLoader(ds, data_mode="mau",
                                 batch_size=cfg.batch_size,
                                 masklen=cfg.masklen, is_training=True,
                                 mark_table=table, needs_marks=True)
        features, labels, _ = next(loader.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        labels = jnp.asarray(labels)
        state = shard_state(init_state(model, feats, 0), mesh)
        b_sh = batch_shardings((feats, labels), mesh)
        feats = jax.tree.map(jax.device_put, feats, b_sh[0])
        labels = jax.device_put(labels, b_sh[1])
        step = build_sharded_train_step(model, mesh, (feats, labels))
        rng = jax.random.key(0)

        state, loss = step(state, feats, labels, rng)
        _ = float(loss)
        t0 = time.perf_counter()
        for _i in range(args.steps):
            state, loss = step(state, feats, labels, rng)
        _ = float(loss)
        dt = time.perf_counter() - t0
        eps = args.steps * cfg.batch_size / dt
        results[nd] = eps
        eff = eps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(json.dumps({"devices": nd,
                          "mesh": f"{dp}x{mp}" + (f"x{cp}" if cp > 1
                                                  else ""),
                          "examples_per_sec": round(eps, 1),
                          "scaling_efficiency": round(eff, 3)}))

    # the exact BASELINE.md target-table rows, ready to paste the moment
    # multi-chip hardware exists (the >=0.85 efficiency target row)
    print("\n| devices | examples/s | scaling efficiency (vs 1-device) |")
    print("|---|---|---|")
    for nd, eps in results.items():
        eff = eps / (results[1] * nd) if nd > 1 else 1.0
        note = " (functional CPU run — not perf)" if tiny else ""
        print(f"| {nd} | {eps:,.0f}{note} | {eff:.3f} |")


if __name__ == "__main__":
    main()
