"""Fused multi-head attention kernel (Pallas TPU) for short sequences.

The reference's sequence length is 30 (runme.sh), so the (T, T) score matrix
is tiny — the cost of XLA's unfused path is the HBM round-trips of the many
small intermediates (logits, masked logits, probs, modulated probs). This
kernel fuses QK^T -> bias -> scale -> key/causal mask -> softmax ->
[optional modulation] -> PV for a TILE of batch*head pairs per program, so
every intermediate lives in VMEM only.

Semantics mirror the reference modules exactly (src/module/sequential.py:
16-83, temporal.py): mask value -2^32+1, scale APPLIED AFTER the additive
bias, softmax in fp32.

Supports the whole zoo:
* plain MHA / BERT attention: bias=None, mod=None;
* TiSASREC / TGAT: additive logit ``bias`` (B, H, Tq, Tk);
* MAU / BiMAU: ``mod`` multiplies the post-softmax probs (intensity
  modulation, temporal.py:379) — with ``diag_one=True`` for BiMAU's
  diagonal reset (temporal.py:438-439).

``fused_attention`` is the public entry; ``attention_reference`` the jnp
parity implementation. Forward-only kernel: training still uses the XLA
path when dropout is active (probs must be materialized for dropout
anyway); eval/serving and dropout-0 configs take the fused path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -(2.0 ** 32) + 1.0


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, mod_ref, o_ref, *,
            scale: float, causal: bool, diag_one: bool, t_real: int):
    # blocks: q/k/v (BH_TILE, T, D); bias/mod (BH_TILE, T, T);
    # mask (BH_TILE, T)
    q = q_ref[:]
    k = k_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (bh, T, T)
    if bias_ref is not None:
        s = s + bias_ref[:]
    s = s * scale

    bh, t, _ = s.shape
    if mask_ref is not None:
        km = mask_ref[:]                             # (bh, T)
        s = jnp.where(km[:, None, :] != 0, s, NEG)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    # padded key columns beyond the real sequence never receive weight
    pad_ok = cols < t_real
    if causal:
        pad_ok = pad_ok & (cols <= rows)
    s = jnp.where(pad_ok[None], s, NEG)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    if mod_ref is not None:
        mod = mod_ref[:]
        if diag_one:
            eye = rows == cols
            mod = jnp.where(eye[None], 1.0, mod)
        p = p * mod

    o_ref[:] = jax.lax.dot_general(
        p, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def fused_attention(q, k, v, *, bias=None, key_mask=None, mod=None,
                    causal=False, diag_one=False, scale=None,
                    bh_tile: int = 16, interpret: bool = False):
    """q/k/v: (B, H, T, D); bias/mod: (B, H, T, T) or None;
    key_mask: (B, T) or None. Returns (B, H, T, D) fp32."""
    b, h, t, d = q.shape
    scale = (1.0 / d ** 0.5) if scale is None else scale
    tp = max(_round_up(t, 8), 8)
    dp = max(_round_up(d, 128), 128)
    bh = b * h
    bht = min(bh_tile, bh)
    bhp = _round_up(bh, bht)

    def prep(x, last=dp):
        x = x.reshape(bh, t, x.shape[-1])
        return jnp.pad(x, ((0, bhp - bh), (0, tp - t),
                           (0, last - x.shape[-1])))

    qp, kp, vp = prep(q), prep(k), prep(v)
    args = [qp, kp, vp]
    in_specs = [pl.BlockSpec((bht, tp, dp), lambda i: (i, 0, 0))] * 3

    if bias is not None:
        bp = jnp.pad(bias.reshape(bh, t, t),
                     ((0, bhp - bh), (0, tp - t), (0, tp - t)))
        args.append(bp)
        in_specs.append(pl.BlockSpec((bht, tp, tp), lambda i: (i, 0, 0)))
    if key_mask is not None:
        km = jnp.broadcast_to(key_mask[:, None, :], (b, h, t)).reshape(bh, t)
        km = jnp.pad(km.astype(jnp.float32), ((0, bhp - bh), (0, tp - t)))
        args.append(km)
        in_specs.append(pl.BlockSpec((bht, tp), lambda i: (i, 0)))
    if mod is not None:
        mp = jnp.pad(mod.reshape(bh, t, t),
                     ((0, bhp - bh), (0, tp - t), (0, tp - t)))
        args.append(mp)
        in_specs.append(pl.BlockSpec((bht, tp, tp), lambda i: (i, 0, 0)))

    def kernel(*refs):
        i = 0
        q_r, k_r, v_r = refs[0], refs[1], refs[2]
        i = 3
        b_r = m_r = d_r = None
        if bias is not None:
            b_r = refs[i]; i += 1
        if key_mask is not None:
            m_r = refs[i]; i += 1
        if mod is not None:
            d_r = refs[i]; i += 1
        o_r = refs[i]
        _kernel(q_r, k_r, v_r, b_r, m_r, d_r, o_r, scale=scale,
                causal=causal, diag_one=diag_one, t_real=t)

    out = pl.pallas_call(
        kernel,
        grid=(bhp // bht,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bht, tp, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bhp, tp, dp), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:bh, :t, :d].reshape(b, h, t, d)


def attention_reference(q, k, v, *, bias=None, key_mask=None, mod=None,
                        causal=False, diag_one=False, scale=None):
    """Pure-jnp parity implementation (same math, materialized)."""
    d = q.shape[-1]
    scale = (1.0 / d ** 0.5) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    s = s * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :] != 0, s, NEG)
    if causal:
        t = s.shape[-1]
        tril = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(tril[None, None], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    if mod is not None:
        if diag_one:
            t = p.shape[-1]
            eye = jnp.eye(t, dtype=bool)
            mod = jnp.where(eye[None, None], 1.0, mod)
        p = p * mod
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)
