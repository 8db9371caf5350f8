"""bench.py robustness: the driver's perf-evidence chain must emit exactly
one parseable JSON line under every failure mode (round-2 postmortem: a
wedged TPU tunnel hung bench.py at backend init and the driver recorded
only a traceback tail — VERDICT r2 Next #1)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_overrides, timeout=180):
    env = {**os.environ, **env_overrides}
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, timeout=timeout)
    lines = [ln for ln in res.stdout.strip().splitlines() if ln]
    assert res.returncode == 0, res.stderr[-800:]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines}"
    return json.loads(lines[0])


def test_probe_backend_dead_platform():
    import bench
    ok, info = bench.probe_backend("cuda", window_s=25.0,
                                   attempt_timeout_s=15.0)
    assert not ok
    assert info["probe_attempts"] >= 1
    assert isinstance(info["error"], str) and info["error"]


def test_bench_emits_error_json_when_backend_unavailable():
    out = _run_bench({"BENCH_PROBE_PLATFORM": "cuda",
                      "BENCH_PROBE_WINDOW": "25",
                      "BENCH_PROBE_TIMEOUT": "15"})
    assert out["metric"] == "easydgl_train_examples_per_sec_per_chip"
    assert out["value"] is None
    assert out["phase"] == "backend_probe"
    assert "error" in out and out["error"]


def test_bench_emits_error_json_when_measurement_killed():
    # probe succeeds on CPU; the measure child is killed by the global
    # timeout mid-compile -> partial JSON with phase=measure, no hang
    out = _run_bench({"BENCH_PROBE_PLATFORM": "cpu",
                      "BENCH_PROBE_WINDOW": "60",
                      "BENCH_PROBE_TIMEOUT": "45",
                      "BENCH_TIMEOUT": "3"}, timeout=300)
    assert out["value"] is None
    assert out["phase"] == "measure"
    assert "exceeded" in out["error"] or "rc=" in out["error"]
    assert out["device_kind"]  # probe info survives into the error line


def test_peak_lookup_by_device_kind():
    import bench
    assert bench._peak_for("TPU v5 lite")[0] == 197e12
    assert bench._peak_for("TPU v4")[0] == 275e12
    assert bench._peak_for("TPU v6e")[0] == 918e12
    peak, label = bench._peak_for("Colossus Mk9")
    assert peak == 197e12 and "unknown" in label


def test_sanity_retry_keeps_faster_run(monkeypatch, capsys):
    """A transiently degraded tunnel can pass the probe yet measure an
    implausibly slow step (observed: 432 ms best-of-3, 18.3 ms minutes
    later); orchestrate() must re-measure and keep the faster run."""
    import bench
    runs = [{"metric": "m", "value": 1183.8, "ms_per_step": 432.5},
            {"metric": "m", "value": 28019.8, "ms_per_step": 18.27}]
    calls = []
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: (True, {"device_kind": "TPU v5 lite",
                                                "probe_attempts": 1}))
    def fake_measure(to, partial):
        idx = min(len(calls), len(runs) - 1)
        calls.append(to)
        return dict(runs[idx])

    monkeypatch.setattr(bench, "_run_measure", fake_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_SANITY_MS", "100")
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ms_per_step"] == 18.27
    assert out["slow_retries"] == 1
    assert len(calls) == 2
    assert calls[1] <= 600.0  # retries run under the capped timeout


def test_sanity_retry_bounded_when_still_slow(monkeypatch, capsys):
    import bench
    monkeypatch.setattr(bench, "probe_backend",
                        lambda *a, **k: (True, {"device_kind": "TPU v5 lite",
                                                "probe_attempts": 1}))
    calls = []
    monkeypatch.setattr(
        bench, "_run_measure",
        lambda to, partial: calls.append(to) or
        {"metric": "m", "value": 1000.0, "ms_per_step": 500.0})
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["slow_retries"] == 2 and len(calls) == 3
    assert out["ms_per_step"] == 500.0  # still reported, flagged
