"""Attribution for the EasyDGL-LC step: time the blocked-MAU kernel alone
(fwd and fwd+bwd) at the preset's exact shapes, then the model's full
loss fwd, so the 103 ms step can be split into MAU vs everything else.

Timing-only. One process per run (fresh relay grant).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from easydgl_tpu.kernels.mau_blocked import mau_blocked

B, H, T, DH, E = 8, 8, 2048, 64, 64
STEPS = 5
REPS = 3


def best_of(fn):
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        v = float(fn())
        assert v == v
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main():
    dt = jnp.bfloat16 if sys.argv[1:2] == ["bf16"] else jnp.float32
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
        out, lam = mau_blocked(q_, k_, v_, t_, km, iv, oh, wd, bd, w, sc,
                               causal=False, diag_reset=True, block_k=512)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(lam)

    fwd = jax.jit(call)

    @jax.jit
    def fwdbwd(q_, k_, v_, t_):
        val, grads = jax.value_and_grad(call, argnums=(0, 1, 2, 3))(
            q_, k_, v_, t_)
        return val + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

    float(fwd(q, k, v, t))          # compile
    float(fwdbwd(q, k, v, t))

    def chain(f):
        def run():
            acc = None
            for _ in range(STEPS):
                acc = f(q, k, v, t)
            return acc
        return run

    print({"dtype": str(dt.__name__), "fwd_ms": round(best_of(chain(fwd)), 2),
           "fwdbwd_ms": round(best_of(chain(fwdbwd)), 2)})


if __name__ == "__main__":
    main()
