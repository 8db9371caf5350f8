"""Self-modulating-family LC probe: one (batch_size, mau_block_k) point
of EasyDGL-LC (default) or CTSMA-LC (pass the preset name as argv[4]).

Run ONE config per process (the axon relay's ~4 GB per-process grant makes
in-process sweeps measure a contaminated allocator — BASELINE.md round-5
note); sweep by looping in the shell:

    for b in 8 16 32; do for k in 512 1024; do
        timeout 900 python scripts/easydgl_lc_tune.py $b $k; done; done

Prints one JSON line {"B": .., "mau_block_k": .., "ms_per_step": ..,
"examples_per_sec": ..} or {"B": .., "mau_block_k": .., "error": ..}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 5
REPS = 2


def main() -> int:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    block_k = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nodrop = "nodrop" in sys.argv[3:]
    name = next((a for a in sys.argv[3:] if a.endswith("-LC")),
                "EasyDGL-LC")
    out = {"preset": name, "B": b, "mau_block_k": block_k,
           "dropout": not nodrop}
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        import jax.numpy as jnp
        from easydgl_tpu.config import preset
        from easydgl_tpu.data.loader import BatchLoader
        from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                                synthetic_split)
        from easydgl_tpu.models.registry import build_model
        from easydgl_tpu.train.steps import build_train_step, init_state

        cfg = preset(name).replace(num_events=64, use_pallas=True,
                                   batch_size=b, mau_block_k=block_k)
        if nodrop:  # attribution: isolate dropout-PRNG cost
            cfg = cfg.replace(hidden_dropout_rate=0.0,
                              attention_probs_dropout_rate=0.0)
        model = build_model(cfg)
        ds = synthetic_split(num_rows=cfg.batch_size,
                             num_items=cfg.num_items,
                             seqslen=cfg.seqslen, seed=0)
        table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
        loader = BatchLoader(ds, data_mode=model.data_mode,
                             batch_size=cfg.batch_size,
                             masklen=cfg.masklen, is_training=True,
                             mark_table=table, needs_marks=True)
        fr, lr, _ = next(loader.epoch(0))
        feats = {k: jax.device_put(jnp.asarray(v)) for k, v in fr.items()}
        labels = jax.device_put(jnp.asarray(lr))
        state = init_state(model, feats, seed=0)
        step = build_train_step(model, donate=False)
        rng = jax.random.key(0, impl=cfg.resolved_prng_impl())
        state, loss = step(state, feats, labels, rng)
        assert float(loss) == float(loss), "NaN loss"
        box = [state]

        def chain():
            s_, l_ = box[0], None
            for _ in range(STEPS):
                s_, l_ = step(s_, feats, labels, rng)
            box[0] = s_
            return l_

        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            val = float(chain())
            assert val == val
            best = min(best, time.perf_counter() - t0)
        ms = best / STEPS * 1e3
        out.update(ms_per_step=round(ms, 2),
                   examples_per_sec=round(b / (ms / 1e3), 1))
    except Exception as e:  # noqa: BLE001 — sweep point, report and move on
        out["error"] = f"{type(e).__name__}: {e}"[:160]
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
