"""Micro-benchmark: the MAU/BiMAU chain (fwd+bwd) across implementations.

Isolates the self-modulating attention block at the flagship EasyDGL shape
(B=512, H=8, T=31, dh=64, E=64) to attribute train-step time:
  xla    — stock XLA chain (materializes the (B,H,T,E*dh) sigmoid)
  (the standalone intensity-head kernel was deleted round 3; "fused" is
  the whole-chain kernel)
  fused  — single full-chain Pallas kernel (round-2, kernels/mau_attention)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from easydgl_tpu.nn.layers import use_compute_dtype
from easydgl_tpu.nn.temporal import BiMAU

B, H, T, C, E = 512, 8, 31, 512, 64
STEPS = 30


def bench(impl):
    mod = BiMAU(C, H, E, 0.0, intensity_impl=impl)
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (B, T, 3 * C), jnp.float32)
    km = jnp.ones((B, T), jnp.float32)
    iv = jax.random.uniform(rng, (B, T))
    oh = (jax.random.uniform(rng, (B, T, E)) > 0.8).astype(jnp.float32)

    with use_compute_dtype(jnp.bfloat16):
        params = mod.init(rng, x, x, km, iv, oh, deterministic=True)

        def loss(p, x):
            o, l = mod.apply(p, x, x, km, iv, oh, deterministic=True)
            return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(l)

        step = jax.jit(jax.grad(loss))
        g = step(params, x)
        jax.block_until_ready(g)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                g = step(params, x)
            s = float(jax.tree_util.tree_leaves(g)[0].sum())  # host barrier
            best = min(best, time.perf_counter() - t0)
    print(f"{impl:7s}: {best / STEPS * 1e3:7.2f} ms/iter")


if __name__ == "__main__":
    import sys
    for impl in (sys.argv[1:] or ["xla", "fused"]):
        bench(impl)
