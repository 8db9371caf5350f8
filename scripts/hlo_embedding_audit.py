"""Audit the compiled HLO of the sharded train step for per-step table
all-gathers (VERDICT r2 Next #3).

The item table is row-sharded over the "model" axis (train/sharded.py); the
question is what the auto-partitioner does with the input-side embedding
*lookup*: an all-gather of the (V, C) table would cost V*C*4 bytes of ICI
per step (17772x512x4 ~ 36 MB at the flagship).

Verdict (flagship shape, 4x2 mesh, 2026-08-18): the partitioner already
serves the lookup with the gather-psum pattern — each shard gathers its
local rows and the partials are all-reduced as f32[B/dp, L+1, C] (1.0 MB),
identical in structure AND communication volume to the hand-written
shard_map lookup this repo used to carry in dist/embedding.py (deleted on
the strength of this audit). The only all-gathers in the step are three
(V,)-shaped bias vectors (71 KB each); the 54 MB variadic all-reduce is the
DP gradient bundle for the replicated dense tower. tests/test_sharding.py::
test_no_table_all_gather_in_sharded_step keeps this locked.

Usage: python scripts/hlo_embedding_audit.py [--vocab 17772] [--units 512]
Prints each collective op with the byte-size of its result, flags any
all-gather whose result is (V, C)-shaped, and exits 1 if one is found in
the steady-state step.
"""
from __future__ import annotations

import argparse
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:  # no-ops under pytest, where conftest.py already configured the
    jax.config.update("jax_platforms", "cpu")       # 8-device CPU platform
    jax.config.update("jax_num_cpu_devices", 8)     # before backend init
except RuntimeError:
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


_COLL_RE = re.compile(
    r"^\s*(?:ROOT )?%?[\w.\-]+ = (\([^)]*\)|[\w\[\],{}\s]+?) "
    r"(all-gather|all-reduce|reduce-scatter|all-to-all|"
    r"collective-permute)\(", re.M)


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for m in re.finditer(r"(f32|f64|s32|u32|bf16|f16|s64|u64|pred|s8|u8)"
                         r"\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        sz = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4,
              "u32": 4, "bf16": 2, "f16": 2, "pred": 1, "s8": 1,
              "u8": 1}[dt]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sz
    return total


def collect_collectives(hlo: str):
    """(op, result-shape-string, result-bytes) for every collective, tuple
    (variadic) result shapes included."""
    rows = []
    for m in _COLL_RE.finditer(hlo):
        shape_str, op = m.group(1), m.group(2)
        rows.append((op, shape_str.strip(), _shape_bytes(shape_str)))
    return rows


def find_table_gathers(hlo: str, vocab: int):
    """all-gather results shaped (V, *) — a materialized full table."""
    hits = []
    for op, shape_str, nbytes in collect_collectives(hlo):
        if op != "all-gather":
            continue
        for dm in re.finditer(r"\[([\d,]+)\]", shape_str):
            dims = [int(d) for d in dm.group(1).split(",")]
            if dims and dims[0] == vocab and len(dims) >= 2:
                hits.append((shape_str, nbytes))
    return hits


def compile_sharded_step_hlo(vocab=17772, units=512, batch=64, dp=4, mp=2,
                             seqslen=30, num_heads=8):
    """Compile the flagship's sharded train step on a (dp, mp) mesh and
    return its post-partitioning HLO text."""
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

    masklen = max(2, seqslen // 5)
    cfg = preset("EasyDGL").replace(
        num_items=vocab - 1, seqslen=seqslen, num_units=units,
        num_heads=num_heads, num_blocks=1, num_events=8, masklen=masklen,
        batch_size=batch)
    model = build_model(cfg)
    assert model.vocab_size % mp == 0

    ds = synthetic_split(num_rows=batch * 2, num_items=cfg.num_items,
                         seqslen=seqslen, seed=5)
    table = synthetic_mark_table(cfg.num_items, 8, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=batch, masklen=masklen,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(x) for k, x in features.items()}
    labels = jnp.asarray(labels)

    mesh = make_mesh(MeshConfig(dp=dp, mp=mp))
    state = init_state(model, feats, seed=0)
    sh_state = shard_state(state, mesh)
    b_sh = batch_shardings((feats, labels), mesh)
    feats_sh = jax.tree.map(jax.device_put, feats, b_sh[0])
    labels_sh = jax.device_put(labels, b_sh[1])

    step = build_sharded_train_step(model, mesh, (feats, labels))
    return step.lower(sh_state, feats_sh, labels_sh,
                      jax.random.key(0)).compile().as_text()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=17772)
    p.add_argument("--units", type=int, default=512)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dp", type=int, default=4)
    p.add_argument("--mp", type=int, default=2)
    p.add_argument("--dump", help="write full HLO text here")
    args = p.parse_args(argv)

    hlo = compile_sharded_step_hlo(args.vocab, args.units, args.batch,
                                   args.dp, args.mp)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    rows = sorted(collect_collectives(hlo), key=lambda r: -r[2])
    print(f"mesh dp={args.dp} mp={args.mp}  vocab={args.vocab} "
          f"units={args.units} batch={args.batch}")
    print(f"{len(rows)} collectives in the compiled step "
          f"(top 15 by bytes):")
    for op, shape, nbytes in rows[:15]:
        print(f"  {nbytes/1e6:9.3f} MB  {op:20s} {shape[:90]}")

    table_gather = find_table_gathers(hlo, args.vocab)
    if table_gather:
        print("\nFOUND per-step all-gather of a table-shaped operand:")
        for shape, nbytes in table_gather:
            print(f"  {nbytes/1e6:.3f} MB  {shape[:120]}")
        return 1
    print("\nOK: no all-gather materializes the full (V, C) table "
          "in the steady-state step.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
