"""Attribution micro-bench for the fused MAU kernel (kernels/mau_attention).

Times fwd+bwd of the full-chain kernel at the flagship shape, then again
with pieces surgically disabled (monkeypatched), to attribute the ~13 ms:
  full        — the production kernel
  nosigmoid   — sigmoid -> identity (VPU transcendental cost)
  noselector  — selector matmul -> slice (the (rows,EDp)@(EDp,Ep) MXU cost)
  nointensity — whole intensity block -> constant lam (leaves QK^T/softmax/@V)

Timing-only: the disabled variants produce wrong numbers by design.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import easydgl_tpu.kernels.mau_attention as M

B, H, T, dh, E = 512, 8, 31, 64, 64
STEPS = 30

_orig_intensity = M._intensity_block


def _intensity_nosig(probs, t, iv, wd, bd, wf, sel, scaling, *, dh, cp):
    cdt = t.dtype
    seq_units = jax.lax.dot_general(
        probs.astype(cdt), t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    hh, tp, _ = seq_units.shape
    x = M._assemble_x(seq_units, iv, cp, dh)
    x2 = x.reshape(hh * tp, cp)
    z = jax.lax.dot(x2.astype(cdt), wd, preferred_element_type=jnp.float32)
    sig = z + bd[None, :]                       # <-- identity, no sigmoid
    raw2 = jax.lax.dot((sig * wf[None, :]).astype(cdt), sel.astype(cdt),
                       preferred_element_type=jnp.float32)
    raw = raw2.reshape(hh, tp, raw2.shape[-1])
    s = jnp.exp(scaling)[None, None, :]
    lam = s * jax.nn.softplus(raw / s)
    return lam, raw, sig, x


def _intensity_nosel(probs, t, iv, wd, bd, wf, sel, scaling, *, dh, cp):
    cdt = t.dtype
    seq_units = jax.lax.dot_general(
        probs.astype(cdt), t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    hh, tp, _ = seq_units.shape
    x = M._assemble_x(seq_units, iv, cp, dh)
    x2 = x.reshape(hh * tp, cp)
    z = jax.lax.dot(x2.astype(cdt), wd, preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(z + bd[None, :])
    e_p = sel.shape[1]
    raw = sig[:, :e_p].reshape(hh, tp, e_p)     # <-- slice, no matmul
    s = jnp.exp(scaling)[None, None, :]
    lam = s * jax.nn.softplus(raw / s)
    return lam, raw, sig, x


def _intensity_none(probs, t, iv, wd, bd, wf, sel, scaling, *, dh, cp):
    cdt = t.dtype
    seq_units = jax.lax.dot_general(
        probs.astype(cdt), t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    hh, tp, _ = seq_units.shape
    e_p = sel.shape[1]
    ed_p = sel.shape[0]
    lam = jnp.broadcast_to(seq_units[:, :, :1], (hh, tp, e_p)) + 1.0
    raw = lam
    sig = jnp.zeros((hh * tp, ed_p), jnp.float32) + seq_units[0, 0, 0]
    return lam, raw, sig, seq_units


def bench(name, fn):
    M._intensity_block = fn
    rng = jax.random.key(0)
    ks = jax.random.split(rng, 12)
    cdt = jnp.bfloat16
    q = jax.random.normal(ks[0], (B, T, H * dh), cdt)
    k = jax.random.normal(ks[1], (B, T, H * dh), cdt)
    v = jax.random.normal(ks[2], (B, T, H * dh), cdt)
    t = jax.random.normal(ks[3], (B, T, H * dh), cdt)
    km = jnp.ones((B, T), jnp.float32)
    iv = jax.random.uniform(ks[4], (B, T))
    oh = (jax.random.uniform(ks[5], (B, T, E)) > 0.8).astype(jnp.float32)
    wd = jax.random.normal(ks[6], (dh + 1, E * dh), cdt) * 0.02
    bd = jnp.zeros((E * dh,), jnp.float32)
    w = jax.random.normal(ks[7], (E, dh), jnp.float32) * 0.02
    sc = jnp.zeros((E,), jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    def loss(q, k, v, t, wd, bd, w, sc):
        o, lam = M.mau_attention(q, k, v, t, km, iv, oh, wd, bd, w, sc, seed,
                                 False, True, 0.0, num_heads=H)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(lam)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6, 7)))
    g = step(q, k, v, t, wd, bd, w, sc)
    jax.block_until_ready(g)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            g = step(q, k, v, t, wd, bd, w, sc)
        _ = float(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s}: {best / STEPS * 1e3:7.2f} ms/iter", flush=True)
    M._intensity_block = _orig_intensity


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "nosigmoid", "noselector", "nointensity"]
    table = {"full": _orig_intensity, "nosigmoid": _intensity_nosig,
             "noselector": _intensity_nosel, "nointensity": _intensity_none}
    for name in which:
        bench(name, table[name])
