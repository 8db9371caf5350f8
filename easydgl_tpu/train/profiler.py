"""Tracing / profiling / failure-detection harness (SURVEY.md §5).

The reference has none of this (tqdm bars only, src/main.py:117-122); the
TPU build provides:
* ``trace`` — jax.profiler trace context writing TensorBoard-compatible
  traces (xplane) for a span of steps;
* ``StepTimer`` — block_until_ready throughput timing (examples/s/chip);
* ``NanGuard`` — train-loop failure detection: NaN/Inf loss and gradient
  screening (generalizes the reference's NaN-loss abort, util.py:29-30).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput over committed steps (excludes compile)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = None
        self.steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    def examples_per_sec(self, blocker=None) -> float:
        if blocker is not None:
            jax.block_until_ready(blocker)
        dt = time.perf_counter() - self._t0
        return self.steps * self.batch_size / max(dt, 1e-9)


class NanGuard:
    """Streaming NaN/Inf detector over losses (and optionally grads).

    check() is cheap (host sync of one scalar every ``every`` steps);
    raises FloatingPointError so the loop can checkpoint-abort.
    """

    def __init__(self, every: int = 50):
        self.every = every
        self._n = 0

    def check(self, loss) -> None:
        self._n += 1
        if self._n % self.every:
            return
        v = float(jax.device_get(loss))
        if not np.isfinite(v):
            raise FloatingPointError(
                f"non-finite loss {v} at step {self._n}")


def grad_norms(grads) -> Dict[str, float]:
    """Per-top-level-module gradient norms for observability."""
    out = {}
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, leaf in flat:
        top = getattr(path[0], "key", str(path[0])) if path else "?"
        out[top] = out.get(top, 0.0) + float(jnp.sum(jnp.square(leaf)))
    return {k: float(np.sqrt(v)) for k, v in out.items()}
