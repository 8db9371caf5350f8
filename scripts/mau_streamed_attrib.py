"""Kernel-level timing for the streamed Pallas MAU at the EasyDGL-LC
shape. Usage: python scripts/mau_streamed_attrib.py [fwd|fwdbwd] — run
fwd first in its own process to warm the persistent cache with the two
forward kernels before the three backward kernels compile (the remote
AOT helper serializes; one 40-minute monolithic compile run times out
where two ~15-minute runs succeed)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from easydgl_tpu.kernels.mau_streamed import mau_streamed

B, H, T, DH, E = 8, 8, 2048, 64, 64
STEPS = 5
REPS = 3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.key(0), 8)
    q, k, v, t = (jax.random.normal(ks[i], (B, H, T, DH), dt)
                  for i in range(4))
    km = jnp.ones((B, T), jnp.float32)
    iv = jax.random.uniform(ks[4], (B, T))
    oh = jax.nn.one_hot(
        jax.random.randint(ks[5], (B, T), 0, E), E, dtype=jnp.float32)
    wd = jax.random.normal(ks[6], (DH + 1, DH * E), jnp.float32) * 0.02
    bd = jnp.zeros((DH * E,), jnp.float32)
    w = jax.random.normal(ks[7], (E, DH), jnp.float32) * 0.02
    sc = jnp.zeros((E,), jnp.float32)

    def call(q_, k_, v_, t_):
        out, lam = mau_streamed(q_, k_, v_, t_, km, iv, oh, wd, bd, w, sc,
                                causal=False, diag_reset=True)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(lam)

    if mode == "fwd":
        fn = jax.jit(call)
    else:
        @jax.jit
        def fn(q_, k_, v_, t_):
            val, grads = jax.value_and_grad(call, argnums=(0, 1, 2, 3))(
                q_, k_, v_, t_)
            return val + sum(jnp.sum(g.astype(jnp.float32))
                             for g in grads)

    v0 = float(fn(q, k, v, t))  # compile
    assert v0 == v0, "NaN"
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = None
        for _ in range(STEPS):
            acc = fn(q, k, v, t)
        val = float(acc)
        assert val == val
        best = min(best, time.perf_counter() - t0)
    print({"mode": mode, "ms": round(best / STEPS * 1e3, 2)})


if __name__ == "__main__":
    main()
