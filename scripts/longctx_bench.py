"""Long-context benchmark: SASREC-LC (L=2048) flash vs XLA attention.

The reference caps L at 30 (src/main.py:38) and materializes O(L^2)
attention; this measures the NEW long-context capability on real TPU:

  1. full SASREC-LC train steps (fwd+bwd+Adam, bf16) with
     attention_impl=flash vs xla — ms/step + examples/s;
  2. attention-core micro-bench across L in {512, 2048, 8192}: the flash
     kernel's streamed probs vs XLA's materialized (B,H,L,L) tensor
     (at L=8192 x B=8 x H=8 the XLA probs alone are 16 GiB in HBM and
     OOM, while the kernel streams them through VMEM).

Usage: python scripts/longctx_bench.py [--xla_only|--flash_only]
Timing closes every chain with a host transfer (float(...)): on the axon
relay, block_until_ready alone under-measures (BASELINE.md round-3 note).
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

from easydgl_tpu.config import preset
from easydgl_tpu.data.loader import BatchLoader
from easydgl_tpu.data.synthetic import synthetic_split
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.steps import build_train_step, init_state

STEPS = 10
REPS = 3


def best_of(run_chain, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_chain()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_train(impl: str):
    cfg = preset("SASREC-LC").replace(attention_impl=impl,
                                      use_pallas=True)  # streaming NLL:
    # the XLA loss path would materialize (B*L, 17772) logits = 9.3 GB
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * cfg.batch_size,
                         num_items=cfg.num_items, seqslen=cfg.seqslen,
                         seed=0)
    loader = BatchLoader(ds, data_mode="regressive",
                         batch_size=cfg.batch_size, masklen=cfg.masklen,
                         is_training=True)
    features, labels, _ = next(loader.epoch(0))
    feats = {k: jax.device_put(jnp.asarray(v)) for k, v in features.items()}
    labels = jax.device_put(jnp.asarray(labels))

    state = init_state(model, feats, seed=0)
    step = build_train_step(model, donate=False)
    rng = jax.random.key(0, impl=cfg.resolved_prng_impl())
    state, loss = step(state, feats, labels, rng)  # compile
    assert float(loss) == float(loss)

    box = [state]

    def chain():
        s_, l_ = box[0], None
        for _ in range(STEPS):
            s_, l_ = step(s_, feats, labels, rng)
        box[0] = s_
        return float(l_)

    dt = best_of(chain)
    ms = dt / STEPS * 1e3
    print(f"SASREC-LC train [{impl:5s}]  {ms:8.2f} ms/step   "
          f"{STEPS * cfg.batch_size / dt:9.1f} ex/s  "
          f"(B={cfg.batch_size}, L={cfg.seqslen}, bf16)")
    return ms


def bench_attention_core(lengths=(512, 2048, 8192), b=8, h=8, d=64):
    from easydgl_tpu.kernels.flash_attention import flash_attention
    from easydgl_tpu.nn.attention import attention_probs

    for L in lengths:
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, h, L, d), jnp.bfloat16)
        k, v = q + 1.0, q - 1.0
        km = jnp.ones((b, L), jnp.float32)

        @jax.jit
        def flash_fb(q, k, v):
            f = lambda q_: flash_attention(q_, k, v, km, causal=True).sum()
            return jax.value_and_grad(f)(q)

        @jax.jit
        def xla_fb(q, k, v):
            def f(q_):
                p = attention_probs(q_, k, key_mask=km, causal=True)
                return jnp.einsum("bhqk,bhkd->bhqd", p, v).sum()
            return jax.value_and_grad(f)(q)

        for name, fn in (("flash", flash_fb), ("xla", xla_fb)):
            try:
                out = fn(q, k, v)
                float(out[0])  # compile + barrier

                def chain():
                    o = None
                    for _ in range(5):  # amortize the relay dispatch
                        o = fn(q, k, v)
                    return float(o[0])

                dt = best_of(chain) / 5
                print(f"attn core L={L:5d} [{name:5s}] {dt * 1e3:9.2f} ms "
                      f"(fwd+bwd, B={b} H={h} D={d})", flush=True)
            except Exception as e:  # XLA OOM at long L is the point
                print(f"attn core L={L:5d} [{name:5s}]    FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    if "--core_only" not in sys.argv:
        impls = [i for i in ("flash", "xla")
                 if f"--{'xla' if i == 'flash' else 'flash'}_only"
                 not in sys.argv]
        for impl in impls:
            try:
                bench_train(impl)
            except Exception as e:  # XLA OOM at L=2048 is the point
                print(f"SASREC-LC train [{impl:5s}]    FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
    bench_attention_core()
