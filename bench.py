"""Throughput benchmark: flagship EasyDGL full train step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The line is emitted even when the backend is unavailable or the run dies
mid-measurement — then it carries {"error": ..., "phase": ...} plus any
phase results captured before the failure, so the driver never records a
bare traceback / null parse again (round-2 postmortem: the axon TPU tunnel
wedged at capture time and bench.py hung at backend init).

Structure (three processes, all this file):
  orchestrator (default)   probe backend in a subprocess with a hard
                           timeout, retrying with backoff inside a bounded
                           window; then run `bench.py --measure` as a child
                           with a global timeout, merging its per-phase
                           partial lines; print exactly one JSON line.
  --probe PLATFORM         child: init the backend + one tiny matmul with a
                           host-transfer barrier; prints device info JSON.
  --measure                child: the actual measurement; prints
                           "PHASE {...}" partial lines then "RESULT {...}".

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
           (12,851 ex/s); bf16 + Pallas kernels 21.7 ms/step (23,565 ex/s).
  round 2: fused MAU chain kernel 18.6 ms/step (27.5k ex/s); fast path
           11.5 ms (44.4k ex/s); rank-counting eval 66.3k seqs/s
           (self-reported only — driver capture flaked; see above).

Env knobs: BENCH_XLA_ONLY=1 (skip Pallas kernels), BENCH_PROBE_PLATFORM
(point the probe at a specific backend — a dead one exercises the
error-JSON path), BENCH_PROBE_WINDOW / BENCH_PROBE_TIMEOUT /
BENCH_TIMEOUT (seconds).
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_EXAMPLES_PER_SEC = 2000.0
STEPS = 25
CACHE_DIR = "/root/.jax_cache"

METRIC = {
    "metric": "easydgl_train_examples_per_sec_per_chip",
    "unit": "examples/s",
}

# bf16 MXU peak by device kind (substring match, jax device_kind strings);
# the mfu field is explicitly labeled with the peak it used.
BF16_PEAKS = (
    ("v6", 918e12),       # v6e Trillium
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e reports "TPU v5 lite"
    ("v5e", 197e12),
    ("v5", 459e12),       # plain "TPU v5" == v5p
    ("v4", 275e12),
)


def _peak_for(device_kind: str) -> tuple[float, str]:
    kind = device_kind.lower()
    for sub, peak in BF16_PEAKS:
        if sub in kind:
            return peak, device_kind
    return 197e12, f"{device_kind} (unknown kind; v5e peak assumed)"


# --------------------------------------------------------------------------
# probe child: init backend, run one tiny matmul, print device info
# --------------------------------------------------------------------------

def _probe_child(platform: str) -> None:
    import jax
    if platform:
        # in-process override — the JAX_PLATFORMS env var is unreliable in
        # this image (the axon plugin still grabs the backend)
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    import jax.numpy as jnp
    devs = jax.devices()
    x = jnp.ones((128, 128), jnp.bfloat16)
    s = float(jnp.asarray(x @ x, jnp.float32).sum())  # host barrier
    print(json.dumps({
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "num_devices": len(devs),
        "matmul_sum": s,
    }))


def probe_backend(platform: str = "",
                  window_s: float = 300.0,
                  attempt_timeout_s: float = 90.0):
    """Bounded backend probe: subprocess attempts with a hard timeout,
    backing off inside ``window_s``. Returns (ok, info_or_error_dict).
    A wedged tunnel hangs every in-process device op, so the probe MUST
    live in a killable subprocess."""
    deadline = time.monotonic() + window_s
    backoffs = [10.0, 30.0, 60.0, 60.0]
    attempt = 0
    last_err = "no probe attempt ran"
    while True:
        attempt += 1
        budget = deadline - time.monotonic()
        if budget <= 1.0:
            break
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--probe", platform],
                capture_output=True, text=True,
                timeout=min(attempt_timeout_s, budget))
        except subprocess.TimeoutExpired:
            last_err = (f"probe attempt {attempt} hung "
                        f">{attempt_timeout_s:.0f}s (backend init wedge)")
        else:
            if res.returncode == 0:
                try:
                    info = json.loads(res.stdout.strip().splitlines()[-1])
                    info["probe_attempts"] = attempt
                    return True, info
                except (json.JSONDecodeError, IndexError):
                    last_err = f"probe printed no JSON: {res.stdout[-200:]!r}"
            else:
                tail = (res.stderr or res.stdout).strip().splitlines()
                last_err = (f"probe attempt {attempt} rc={res.returncode}: "
                            + " | ".join(tail[-3:]))
        wait = backoffs[min(attempt - 1, len(backoffs) - 1)]
        if time.monotonic() + wait >= deadline:
            break
        time.sleep(wait)
    return False, {"error": last_err, "probe_attempts": attempt}


# --------------------------------------------------------------------------
# measurement child
# --------------------------------------------------------------------------

# long-context variants: key -> (preset name, config overrides, data_mode).
# Each runs in its OWN subprocess (fresh backend grant): the axon relay
# grants ~4 GB of the chip's 16 per process, and the main measure process
# already holds the faithful/fastpath states and executables by longctx
# time — in-process, xla_remat/easydgl_lc/bert4rec_lc ResourceExhausted
# even though each fits standalone (observed 2026-08-20).
LONGCTX_VARIANTS = {
    "flash": ("SASREC-LC", {"use_pallas": True}, "regressive"),
    "xla": ("SASREC-LC",
            {"attention_impl": "xla", "use_pallas": True}, "regressive"),
    "xla_remat": ("SASREC-LC",
                  {"attention_impl": "xla", "remat": True,
                   "use_pallas": True}, "regressive"),
    "easydgl_lc": ("EasyDGL-LC",
                   {"num_events": 64, "use_pallas": True}, "mau"),
    "ctsma_lc": ("CTSMA-LC",
                 {"num_events": 64, "use_pallas": True},
                 "regressive_entire"),
    "bert4rec_lc": ("BERT4REC-LC", {"use_pallas": True}, "masked"),
}


def _longctx_child(key: str, steps: int = 5) -> None:
    """Child mode: measure ONE long-context variant in a fresh process and
    print a single JSON line ({"ms_per_step": X} or {"error": "..."})."""
    preset_name, overrides, data_mode = LONGCTX_VARIANTS[key]
    try:
        import jax
        platform = os.environ.get("BENCH_PROBE_PLATFORM", "")
        if platform:
            jax.config.update("jax_platforms", platform)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        import jax.numpy as jnp
        from easydgl_tpu.config import preset
        from easydgl_tpu.data.loader import BatchLoader
        from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                                synthetic_split)
        from easydgl_tpu.models.registry import build_model
        from easydgl_tpu.train.steps import build_train_step, init_state

        lcfg = preset(preset_name).replace(**overrides)
        lmodel = build_model(lcfg)
        lds = synthetic_split(num_rows=lcfg.batch_size,
                              num_items=lcfg.num_items,
                              seqslen=lcfg.seqslen, seed=0)
        needs_marks = lmodel.uses_tpp
        ltable = (synthetic_mark_table(lcfg.num_items, lcfg.num_events,
                                       seed=0) if needs_marks else None)
        ll = BatchLoader(lds, data_mode=data_mode,
                         batch_size=lcfg.batch_size,
                         masklen=lcfg.masklen, is_training=True,
                         mark_table=ltable, needs_marks=needs_marks)
        lfr, lbr, _ = next(ll.epoch(0))
        lfeats = {k: jax.device_put(jnp.asarray(v)) for k, v in lfr.items()}
        lb = jax.device_put(jnp.asarray(lbr))
        lstate = init_state(lmodel, lfeats, seed=0)
        lstep = build_train_step(lmodel, donate=False)
        rng = jax.random.key(0, impl=lcfg.resolved_prng_impl())
        lstate, lloss = lstep(lstate, lfeats, lb, rng)
        assert float(lloss) == float(lloss), "NaN loss"
        lbox = [lstate]

        def lchain():
            s_, l_ = lbox[0], None
            for _ in range(steps):
                s_, l_ = lstep(s_, lfeats, lb, rng)
            lbox[0] = s_
            return l_

        ldt = best_of_chains(lchain, reps=2)
        print(json.dumps({"ms_per_step": round(ldt / steps * 1e3, 2)}),
              flush=True)
    except Exception as e:  # noqa: BLE001 — the parent wants one JSON line
        print(json.dumps({"error": f"{type(e).__name__}: {e}"[:160]}),
              flush=True)


def _emit_phase(name: str, payload: dict) -> None:
    """Stream a phase's results so the parent keeps them even if a later
    phase hangs or crashes."""
    print("PHASE " + json.dumps({"phase": name, **payload}), flush=True)


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


def measure() -> None:
    import jax
    platform = os.environ.get("BENCH_PROBE_PLATFORM", "")
    if platform:  # keep the measurement on the platform the probe validated
        jax.config.update("jax_platforms", platform)
    # persistent compile cache: repeated bench runs skip the ~60s compile
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

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

    # warmup / compile (also warms the persistent cache for future runs)
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

    # MFU vs the chip's bf16 MXU peak (by device kind — ADVICE r2); FLOPs
    # from the compiled step when the backend exposes cost analysis, else
    # the analytic ~800 GFLOP estimate (BASELINE.md round-1 notes)
    step_flops = 800e9
    try:
        ca = step.lower(state, *batches[0], rng).compile().cost_analysis()
        if ca and ca.get("flops"):
            step_flops = float(ca["flops"])
    except Exception:
        pass
    peak, peak_kind = _peak_for(jax.devices()[0].device_kind)
    mfu = step_flops / (best_dt / STEPS) / peak
    _emit_phase("train_faithful", {
        "value": round(ex_per_sec, 1),
        "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
        "ms_per_step": round(ms_per_step, 2),
        "mfu": round(mfu, 4),
        "mfu_peak": f"{peak/1e12:.0f}T bf16 ({peak_kind})",
    })

    # opt-in production fast path (models/easydgl.py gather_queries=True):
    # the final block computes attention/intensities for ONLY the masklen
    # prediction rows. NOT reference-exact (the per-example ContribLayerNorm
    # moments see only those rows — quality delta measured in BASELINE.md),
    # so it is reported as a SEPARATE number and never mixed into the
    # headline metric.
    fast_model = build_model(cfg.replace(gather_queries=True))
    fast_step = build_train_step(fast_model, donate=False)
    fstate = init_state(fast_model, batches[0][0], seed=0)
    fstate, floss = fast_step(fstate, *batches[0], rng)
    assert float(floss) == float(floss), "NaN loss in fast-path benchmark"
    fast_dt = best_of_chains(train_chain([fstate], fast_step))
    _emit_phase("fastpath", {
        "fastpath_examples_per_sec": round(STEPS * cfg.batch_size / fast_dt,
                                           1),
        "fastpath_ms_per_step": round(fast_dt / STEPS * 1e3, 2),
    })

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
    _emit_phase("eval", {"eval_seqs_per_sec": round(eval_seqs, 1)})

    # long-context capability: L=2048 bf16 train steps. Variants:
    #   flash        SASREC-LC, blockwise flash kernel (round 4)
    #   xla          SASREC-LC, materialized probs — expected OOM at B=32
    #   xla_remat    SASREC-LC, XLA + per-block remat: the best-FITTING
    #                dense configuration, so the flash speedup headline is
    #                driver-captured (VERDICT r4 weak #4)
    #   easydgl_lc   the FLAGSHIP at L=2048 on one chip via the blocked
    #                two-sweep BiMAU (kernels/mau_blocked.py, round 5) —
    #                the reference's own model family capped at L≈30
    #   bert4rec_lc  masked objective at L=2048: catalog scoring touches
    #                only masklen rows (the SASREC-LC budget's 31% lever)
    # Guarded so a failure here never costs the headline keys; each
    # variant is isolated (the XLA one legitimately OOMs).
    # BENCH_LONGCTX=0 skips the phase.
    longctx = {}

    def _longctx_variant(key):
        """One variant per fresh subprocess (see LONGCTX_VARIANTS): a child
        gets its own backend grant, so variants can't starve each other or
        inherit this process's resident states/executables."""
        timeout = float(os.environ.get("BENCH_LONGCTX_TIMEOUT", "420"))
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--longctx", key],
                capture_output=True, text=True, timeout=timeout)
            line = next((ln for ln in
                         reversed(res.stdout.strip().splitlines())
                         if ln.startswith("{")), None)
            out = json.loads(line) if line else {
                "error": f"no JSON from child rc={res.returncode}: "
                         + (res.stderr or "")[-120:]}
        except subprocess.TimeoutExpired:
            out = {"error": f"variant exceeded {timeout:.0f}s"}
        except (OSError, ValueError) as e:
            out = {"error": f"{type(e).__name__}: {e}"[:160]}
        for field, val in out.items():
            longctx[f"longctx_{key}_{field}"] = val

    if os.environ.get("BENCH_LONGCTX", "1") != "0":
        # streaming catalog NLL everywhere — the XLA loss path would
        # materialize (B*L, V) logits (9.3 GB) for the AR protocol.
        # Bounded: per-variant timeout x a phase budget, so a pathological
        # variant can't push the whole measure past the driver's window.
        budget = float(os.environ.get("BENCH_LONGCTX_BUDGET", "1200"))
        phase_deadline = time.monotonic() + budget
        for key in LONGCTX_VARIANTS:
            if time.monotonic() >= phase_deadline:
                longctx[f"longctx_{key}_error"] = (
                    f"skipped: longctx phase budget {budget:.0f}s spent")
                continue
            _longctx_variant(key)
        longctx["longctx_config"] = (
            "L=2048 bf16: SASREC-LC B=32; EasyDGL-LC B=8 masklen=256 "
            "(streamed Pallas BiMAU); CTSMA-LC B=8 (streamed causal "
            "MAU); BERT4REC-LC B=32 masklen=256")
        _emit_phase("longctx", longctx)

    print("RESULT " + json.dumps({
        **longctx,
        **METRIC,
        "value": round(ex_per_sec, 1),
        "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
        "ms_per_step": round(ms_per_step, 2),
        "mfu": round(mfu, 4),
        "mfu_peak": f"{peak/1e12:.0f}T bf16 ({peak_kind})",
        "eval_seqs_per_sec": round(eval_seqs, 1),
        "fastpath_examples_per_sec": round(STEPS * cfg.batch_size / fast_dt,
                                           1),
        "fastpath_ms_per_step": round(fast_dt / STEPS * 1e3, 2),
    }), flush=True)


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _last_known_good() -> dict | None:
    """Newest prior round's driver-captured numbers, for EXPLICITLY-STALE
    context in the error line (round-4 verdict Weak #6): a reader of a
    probe-failure JSON should see what the last healthy capture measured
    without mistaking it for this round's number."""
    import glob
    import re as _re
    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = _re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if "value" not in data and isinstance(data.get("tail"), str):
            # driver capture format: our JSON line is the "tail" string
            try:
                data = json.loads(data["tail"].strip().splitlines()[-1])
            except (ValueError, IndexError):
                continue
        if data.get("value") is None:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, data)
    if best is None:
        return None
    rnd, data = best
    keep = {k: data[k] for k in ("value", "unit", "ms_per_step",
                                 "vs_baseline") if k in data}
    keep["stale_from_round"] = rnd
    keep["note"] = "last driver-captured numbers; NOT this run's result"
    return keep


def _error_json(error: str, phase: str, partial: dict) -> dict:
    out = {**METRIC, "value": None, "vs_baseline": None,
           "error": error, "phase": phase}
    out.update(partial)
    stale = _last_known_good()
    if stale:
        out["last_known_good"] = stale
    return out


def orchestrate() -> int:
    platform = os.environ.get("BENCH_PROBE_PLATFORM", "")
    window = float(os.environ.get("BENCH_PROBE_WINDOW", "300"))
    probe_to = float(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
    # first Mosaic compile of a new kernel shape goes through a remote AOT
    # helper (1-15 min); the persistent cache makes warm runs ~2 min
    meas_to = float(os.environ.get("BENCH_TIMEOUT", "2400"))

    ok, info = probe_backend(platform, window, probe_to)
    if not ok:
        # Document the window granted so a future driver can see that a
        # short window (not the bench) bounded the retry budget, and grant
        # a longer one via BENCH_PROBE_WINDOW (wedges historically clear
        # in ~1.5 h; the default 300 s window cannot outlive one).
        print(json.dumps(_error_json(info["error"], "backend_probe",
                                     {"probe_attempts":
                                      info.get("probe_attempts"),
                                      "probe_window_s": window,
                                      "probe_window_env":
                                      "BENCH_PROBE_WINDOW"})))
        return 0  # structured output IS the success mode for the driver

    partial: dict = {"device_kind": info.get("device_kind"),
                     "probe_attempts": info.get("probe_attempts")}
    result = _run_measure(meas_to, dict(partial))
    # Sanity retry: a healthy probe does not rule out a transiently
    # degraded tunnel DURING measurement (observed 2026-08-19: 432 ms/step
    # best-of-3 with the same binary measuring 18.3 ms minutes later). A
    # faithful step beyond BENCH_SANITY_MS is implausible on any supported
    # chip, so re-measure (bounded) and keep the faster run.
    sanity = float(os.environ.get("BENCH_SANITY_MS", "100"))
    retries = 0
    while (result.get("value") and result.get("ms_per_step", 0) > sanity
           and retries < 2):
        retries += 1
        time.sleep(float(os.environ.get("BENCH_SANITY_BACKOFF", "60")))
        # the first run warmed the compile cache, so a retry is minutes —
        # cap it so a hung retry can't triple the driver's wait
        again = _run_measure(min(meas_to, 600.0), dict(partial))
        if again.get("value") and (not result.get("value")
                                   or again.get("ms_per_step", 1e9)
                                   < result.get("ms_per_step", 1e9)):
            result = again
    if retries:
        result["slow_retries"] = retries
    print(json.dumps(result))
    return 0


def _run_measure(meas_to: float, partial: dict) -> dict:
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True)  # own pgid so a hang is precisely killable
    result = None
    deadline = time.monotonic() + meas_to
    import threading
    stderr_buf: list = []
    t = threading.Thread(target=lambda: stderr_buf.append(
        child.stderr.read()), daemon=True)
    t.start()

    def _reap(why: str) -> dict:
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        tail = ""
        if stderr_buf:
            lines = [ln for ln in stderr_buf[0].strip().splitlines() if ln]
            tail = " | ".join(lines[-3:])[-500:]
        return _error_json(f"{why}: {tail}" if tail else why,
                           "measure", partial)

    while True:
        remain = deadline - time.monotonic()
        if remain <= 0:
            result = _reap(f"measurement exceeded {meas_to:.0f}s")
            break
        line = child.stdout.readline()
        if not line:
            child.wait()
            if child.returncode == 0 and result is not None:
                break
            result = result or _reap(
                f"measurement exited rc={child.returncode}")
            break
        line = line.strip()
        if line.startswith("PHASE "):
            try:
                d = json.loads(line[6:])
                d.pop("phase", None)
                partial.update(d)
            except json.JSONDecodeError:
                pass
        elif line.startswith("RESULT "):
            try:
                result = {**json.loads(line[7:]), **{
                    k: partial[k] for k in ("device_kind", "probe_attempts")
                    if partial.get(k) is not None}}
            except json.JSONDecodeError:
                result = _error_json("unparseable RESULT line", "measure",
                                     partial)
    return result


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe_child(sys.argv[2] if len(sys.argv) > 2 else "")
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        measure()
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--longctx":
        _longctx_child(sys.argv[2])
        return 0
    return orchestrate()


if __name__ == "__main__":
    sys.exit(main())
