"""Throughput benchmark: flagship EasyDGL full train step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's published EasyDGL Netflix run (runme.sh:15-23):
num_units 512, 1 block, 8 heads, batch 512, seqslen 30(+1), catalog 17771,
masked objective (masklen 6, dropout on) + TPP regularizer — the full
forward + backward + Adam update, including the (B*masklen) x 512 x 17772
tied-softmax scoring. Compute: bf16 matmuls / fp32 accumulation (the
production mixed-precision mode; fp32 numbers are recorded in BASELINE.md).

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
BASELINE_EXAMPLES_PER_SEC is our running estimate of the TF1 reference on
its single GPU (TF 1.15-compat graph mode, V100-class, ~4 steps/s at batch
512), kept fixed so vs_baseline is comparable across rounds. A MEASURED
anchor exists since round 2: the reference graph on this host's CPU does
25.6 ex/s (scripts/tf_reference_bench.py, BASELINE.md "Measured
TF-reference anchor") — the 2,000 estimate sits well inside the
CPU-floor..GPU bracket.

Measured history (v5e-1, this repo):
  round 1: fp32 XLA 59.2 ms/step (8,652 ex/s); bf16 XLA 39.8 ms/step
           (12,851 ex/s); bf16 + Pallas kernels (fused catalog NLL + fused
           intensity head) 21.7 ms/step (23,565 ex/s).
"""
from __future__ import annotations

import json
import time

BASELINE_EXAMPLES_PER_SEC = 2000.0
STEPS = 25


def best_of_chains(run_chain, reps: int = 3) -> float:
    """Fastest of ``reps`` timed chains. ``run_chain()`` executes one chain
    and returns a device scalar; converting it to a host float closes the
    timed region — the only airtight completion barrier across remote
    backends. Best-of counters transient host load (the remote-execution
    relay shares the host CPU), so the minimum reflects device throughput.
    """
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        out = float(run_chain())
        assert out == out, "NaN in benchmark chain"
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    # persistent compile cache: repeated bench runs skip the ~60s compile
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

    import os
    cfg = preset("EasyDGL").replace(
        num_events=64, compute_dtype="bfloat16",
        # fused Pallas kernels: 1.83x over the XLA path on v5e. Set
        # BENCH_XLA_ONLY=1 to fall back (e.g. cold compile caches on the
        # slow remote-AOT setup).
        use_pallas=not os.environ.get("BENCH_XLA_ONLY"))
    model = build_model(cfg)

    ds = synthetic_split(num_rows=4 * cfg.batch_size, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=0)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
    loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                         masklen=cfg.masklen, is_training=True,
                         mark_table=table, needs_marks=True)
    batches = []
    for features, labels, _ in loader.epoch(0):
        feats = {k: jax.device_put(jnp.asarray(v))
                 for k, v in features.items()}
        batches.append((feats, jax.device_put(jnp.asarray(labels))))

    state = init_state(model, batches[0][0], seed=0)
    step = build_train_step(model, donate=False)
    rng = jax.random.key(0, impl=cfg.resolved_prng_impl())

    # warmup / compile
    state, loss = step(state, *batches[0], rng)
    assert float(loss) == float(loss), "NaN loss in benchmark"

    def train_chain(st, stepfn):
        def chain():
            s_, l_ = st[0], None
            for i in range(STEPS):
                feats, labels = batches[i % len(batches)]
                s_, l_ = stepfn(s_, feats, labels, rng)
            st[0] = s_
            return l_
        return chain

    box = [state]
    best_dt = best_of_chains(train_chain(box, step))
    state = box[0]

    ex_per_sec = STEPS * cfg.batch_size / best_dt
    ms_per_step = best_dt / STEPS * 1e3

    # MFU vs the chip's bf16 peak; FLOPs from the compiled step when the
    # backend exposes cost analysis, else the analytic ~800 GFLOP estimate
    # (BASELINE.md round-1 notes)
    step_flops = 800e9
    try:
        ca = step.lower(state, *batches[0], rng).compile().cost_analysis()
        if ca and ca.get("flops"):
            step_flops = float(ca["flops"])
    except Exception:
        pass
    peak = 197e12  # v5e bf16
    mfu = step_flops / (best_dt / STEPS) / peak

    # opt-in production fast path (models/easydgl.py gather_queries=True):
    # the final block computes attention/intensities for ONLY the masklen
    # prediction rows. NOT reference-exact (the per-example ContribLayerNorm
    # moments see only those rows — documented there), so it is reported as
    # a SEPARATE number and never mixed into the headline metric.
    fast_model = build_model(cfg.replace(gather_queries=True))
    fast_step = build_train_step(fast_model, donate=False)
    fstate = init_state(fast_model, batches[0][0], seed=0)
    fstate, floss = fast_step(fstate, *batches[0], rng)
    assert float(floss) == float(floss), "NaN loss in fast-path benchmark"
    fast_dt = best_of_chains(train_chain([fstate], fast_step))
    fast_ex_per_sec = STEPS * cfg.batch_size / fast_dt

    # full-catalog eval throughput (mask_seen + top-100 path)
    from easydgl_tpu.train.steps import build_eval_step
    eval_step = build_eval_step(model)
    eloader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                          masklen=cfg.masklen, is_training=False,
                          mark_table=table, needs_marks=True)
    ef, el, ev = next(eloader.epoch(0))
    efeats = {k: jax.device_put(jnp.asarray(v)) for k, v in ef.items()}
    el, ev = jnp.asarray(el), jnp.asarray(ev)
    sums = eval_step(state.params, efeats, el, ev)
    float(sums["count"])  # compile + barrier

    def eval_chain():
        for _ in range(10):
            sums = eval_step(state.params, efeats, el, ev)
        return sums["count"]

    eval_seqs = 10 * cfg.batch_size / best_of_chains(eval_chain)

    print(json.dumps({
        "metric": "easydgl_train_examples_per_sec_per_chip",
        "value": round(ex_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
        "ms_per_step": round(ms_per_step, 2),
        "mfu": round(mfu, 4),
        "eval_seqs_per_sec": round(eval_seqs, 1),
        "fastpath_examples_per_sec": round(fast_ex_per_sec, 1),
        "fastpath_ms_per_step": round(fast_dt / STEPS * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
