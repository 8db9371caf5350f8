"""Flash-attention kernel tuning sweep (real TPU).

K/V re-stream traffic scales with the number of QUERY blocks (every q
block re-reads all of K/V), so block_q is the bandwidth lever; block_k
bounds the probs tile. This sweeps both plus the D-padding choice to
find the speed-of-light point at the SASREC-LC shape; winners go into
flash_attention's defaults (record in BASELINE.md).

Usage: python scripts/flash_tune.py [L ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from easydgl_tpu.kernels.flash_attention import flash_attention


def time_fb(q, k, v, km, bq, bk, reps=3, chain=5):
    @jax.jit
    def fb(q_, k_, v_):
        f = lambda x: flash_attention(x, k_, v_, km, causal=True,
                                      block_q=bq, block_k=bk).sum()
        return jax.value_and_grad(f)(q_)

    float(fb(q, k, v)[0])  # compile + barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(chain):
            o = fb(q, k, v)
        float(o[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    lengths = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2048]
    b, h, d = 8, 8, 64
    for L in lengths:
        q = jax.random.normal(jax.random.key(0), (b, h, L, d), jnp.bfloat16)
        k, v = q + 1.0, q - 1.0
        km = jnp.ones((b, L), jnp.float32)
        for bq in (128, 256, 512, 1024):
            for bk in (128, 256, 512):
                if bq > L or bk > L:
                    continue
                try:
                    dt = time_fb(q, k, v, km, bq, bk)
                    print(f"L={L:5d} bq={bq:4d} bk={bk:4d} "
                          f"{dt * 1e3:8.2f} ms", flush=True)
                except Exception as e:
                    print(f"L={L:5d} bq={bq:4d} bk={bk:4d} FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
