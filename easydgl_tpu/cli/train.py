"""Train CLI (replaces reference src/main.py).

Usage:
    python -m easydgl_tpu.cli.train --model EasyDGL --data_dir DATA \\
        [--mark DATA/mark.npy] [--ckpt_dir ckpt/EasyDGL] [overrides...]

``--data_dir`` must hold train.npz / validation.npz / test.npz produced by
``easydgl_tpu.cli.prep`` (or ``--synthetic`` for a smoke run). Hyperparameter
defaults come from the per-model presets (runme.sh parity); any field of
Config can be overridden from the command line.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--data_dir")
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated data (smoke/benchmark)")
    p.add_argument("--synthetic_rows", type=int, default=2048)
    p.add_argument("--mark", help=".npy multi-hot mark table (CTSMA/EasyDGL)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt_dir")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--mp", type=int, default=1,
                   help="model-parallel (table row-shard) mesh size")
    p.add_argument("--cp", type=int, default=1,
                   help="context-parallel degree: shards the sequence over "
                        "a third mesh axis; attention runs as a ring "
                        "(dist/context.py) — for long-context configs")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel degree: splits the block stack "
                        "into GPipe stages over a pipe mesh axis "
                        "(train/pp.py); needs (num_blocks-1) %% pp == 0")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="GPipe microbatch count (default: auto, >=4*pp "
                        "when batch_size divides)")
    p.add_argument("--attention_impl", default=None,
                   choices=["xla", "flash", "factored"],
                   help="attention core: 'flash' = blockwise Pallas kernel "
                        "(SASREC family, O(T) memory); 'factored' = "
                        "TiSASREC's interval terms via bucket projections "
                        "+ segment-sum (no (T,T,C) tensors)")
    p.add_argument("--cp_impl", default=None, choices=["ring", "ulysses"],
                   help="context-parallel attention algorithm under --cp")
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize encoder blocks in the backward "
                        "(jax.checkpoint) — the long-context memory lever")
    p.add_argument("--num_items", type=int)
    p.add_argument("--seqslen", type=int)
    p.add_argument("--num_units", type=int)
    p.add_argument("--num_heads", type=int)
    p.add_argument("--num_blocks", type=int)
    p.add_argument("--num_epochs", type=int)
    p.add_argument("--num_events", type=int)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--masklen", type=int)
    p.add_argument("--timelen", type=int)
    p.add_argument("--filter_width", type=int,
                   help="GREC CNN filter width (reference --filter_width)")
    p.add_argument("--dilations", default=None,
                   help="GREC dilation schedule, comma ints (reference "
                        "--dilations, e.g. 1,4,1,4)")
    p.add_argument("--window_ratio", type=float,
                   help="TimelyREC smoothing window (reference "
                        "--window_ratio)")
    p.add_argument("--time_scale", type=float)
    p.add_argument("--learning_rate", type=float)
    p.add_argument("--l2_reg", type=float)
    p.add_argument("--ct_reg", type=float)
    p.add_argument("--hidden_dropout_rate", type=float)
    p.add_argument("--attention_probs_dropout_rate", type=float)
    p.add_argument("--mask_seen", action="store_true", default=None)
    p.add_argument("--gather_queries", action="store_true", default=None,
                   help="EasyDGL fast path: final-block attention for only "
                        "the prediction rows (~1.6x train throughput; NOT "
                        "reference-exact — see models/easydgl.py)")
    p.add_argument("--seed", type=int)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu); the JAX_PLATFORMS "
                        "env var is unreliable under preconfigured backends")
    # multi-host (DCN) launch: pass all three on every process, or none
    # (TPU pods auto-discover via the cluster environment)
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def build_config(args):
    from easydgl_tpu.config import preset
    overrides = {}
    for k in ("num_items", "seqslen", "num_units", "num_heads", "num_blocks",
              "num_epochs", "num_events", "batch_size", "masklen", "timelen",
              "time_scale", "l2_reg", "ct_reg", "hidden_dropout_rate",
              "attention_probs_dropout_rate", "mask_seen", "seed",
              "gather_queries", "attention_impl", "remat", "cp_impl",
              "pp_microbatches", "filter_width", "window_ratio"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.dilations is not None:
        overrides["dilations"] = tuple(
            int(d) for d in str(args.dilations).split(","))
    cfg = preset(args.model, **overrides)
    if args.learning_rate is not None:
        import dataclasses
        cfg = cfg.replace(optim=dataclasses.replace(
            cfg.optim, learning_rate=args.learning_rate))
    return cfg


def load_data(args, cfg):
    from easydgl_tpu.data.loader import PackedDataset
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    if args.synthetic:
        mk = dict(num_items=cfg.num_items, seqslen=cfg.seqslen,
                  with_datetime=True)
        splits = (synthetic_split(num_rows=args.synthetic_rows, seed=1, **mk),
                  synthetic_split(num_rows=args.synthetic_rows // 8,
                                  seed=2, **mk),
                  synthetic_split(num_rows=args.synthetic_rows // 8,
                                  seed=3, **mk))
        n_events = cfg.num_events or 64
        mark = synthetic_mark_table(cfg.num_items, n_events, seed=4)
        return splits, mark, cfg.replace(num_events=n_events)
    splits = tuple(
        PackedDataset.load(os.path.join(args.data_dir, f"{s}.npz"))
        for s in ("train", "validation", "test"))
    mark = np.load(args.mark) if args.mark else None
    if mark is not None and not cfg.num_events:
        cfg = cfg.replace(num_events=mark.shape[-1])
    return splits, mark, cfg


def main(argv=None):
    # console + ./model.log, mirroring the reference's conf/logging.conf
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler("model.log")])
    args = parse_args(argv)
    try:  # persistent compile cache: repeated runs skip XLA compilation
        import jax
        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        # The cache config is PROCESS-GLOBAL and outlives this call — the
        # test suite must stay cache-free (numerics would depend on the
        # mutable ~/.jax_cache contents: CPU executables compiled with
        # machine features the host lacks load with "may miscompute"
        # warnings and perturb trained-metric fixtures), so conftest sets
        # EASYDGL_NO_COMPILE_CACHE before any test invokes this main().
        if not os.environ.get("EASYDGL_NO_COMPILE_CACHE"):
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.num_processes and args.num_processes > 1:
        from easydgl_tpu.core.runtime import init_distributed
        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
    cfg = build_config(args)
    (train, valid, test), mark, cfg = load_data(args, cfg)
    logging.info("config: %s", cfg)

    mesh = None
    if args.dp or args.mp > 1 or args.cp > 1 or args.pp > 1:
        from easydgl_tpu.config import MeshConfig
        from easydgl_tpu.core.mesh import make_mesh
        mesh = make_mesh(MeshConfig(dp=args.dp or -1, mp=args.mp,
                                    cp=args.cp, pp=args.pp))
        logging.info("mesh: %s", dict(mesh.shape))
    if cfg.use_pallas is None:
        # accelerator backends get the fused Pallas kernels; under a mesh
        # they run inside shard_map (vocab-sharded NLL, data-sharded MAU
        # attention — kernels/spmd.py)
        import jax
        if jax.default_backend() != "cpu":
            cfg = cfg.replace(use_pallas=True)
            logging.info("fused Pallas kernels enabled%s",
                         " (SPMD via shard_map)" if mesh is not None else "")

    from easydgl_tpu.train.loop import train_model
    state, summary = train_model(cfg, train, valid, test, mark_table=mark,
                                 ckpt_dir=args.ckpt_dir, resume=args.resume,
                                 mesh=mesh)
    return summary


if __name__ == "__main__":
    main()
