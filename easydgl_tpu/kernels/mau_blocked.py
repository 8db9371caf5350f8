"""Blocked single-chip MAU/BiMAU: long-context for the self-modulating
attention family (reference src/module/temporal.py:267-452).

The reference materializes every O(T^2) tensor of the MAU chain — probs,
the per-(q,k) mark-intensity modulation, the dropped modulated probs —
which caps EasyDGL/CTSMA at short sequence lengths on one chip (the
published config is L=30). The multi-chip ring MAU
(dist/context.py::mau_ring_attention_spmd) already proved the EXACT
two-sweep decomposition of the chain; this module is the same
decomposition as a single-device key-block-streaming schedule, so the
flagship models get long context WITHOUT a cp>1 mesh:

* sweep 1 (``lax.scan`` over key blocks): online-softmax stats (m, l)
  plus the exp-weighted T accumulation -> ``seq_units = softmax(S) @ T``
  and the row logsumexp, in O(T * block) memory;
* the Hawkes intensity head (reference temporal.py:281-315) runs once on
  ``seq_units`` — it only needs per-QUERY state, which is why a single
  online pass cannot fuse it and two sweeps are the minimal exact split;
* sweep 2: each probs block is recomputed from the saved logsumexp,
  modulated by ``lambda @ onehot^T`` (BiMAU's diagonal reset to 1,
  temporal.py:438-439), dropped, and accumulated into ``out``.

The backward is a custom VJP with the same structure (two more scans), so
TRAINING is O(T * block) as well — no (T, T) residual is ever saved:

* pass 1 recomputes each probs block, accumulates dV and the
  modulation's contribution to d(lambda);
* the intensity head's VJP (a few small matmuls) turns the total
  d(lambda) into d(seq_units) + parameter grads;
* pass 2 recomputes probs again and emits dQ/dK/dT. The softmax-row
  correction is query-local: rho_i = <out_i, g_out_i> + <g_su_i, su_i>
  (the same identity the flash kernel's delta uses, extended by the
  seq_units chain), so neither backward pass needs cross-block state
  beyond O(T) carries.

Block contractions run in the caller's compute dtype with f32
accumulation (the mxu_einsum convention, nn/layers.py:55); under f32 it
reproduces the previous unconditional-f32 math exactly. Softmax stats,
exp/mask math, and all accumulators stay f32 regardless. (Measured
neutral on the EasyDGL-LC step wall-clock — the step is bound elsewhere;
kept for convention consistency with every other contraction site.)

Semantics are the XLA module path's (nn/temporal.py::MAU) bit-for-bit up
to float reassociation: the finite -2^32+1 mask constant is kept, so
fully-masked (left-pad) rows softmax to UNIFORM over the real keys
(padding added for divisibility gets a true -1e38 fill so it never
contributes), and gradients through masked logits are exactly zero.
Dropout keeps the reference's normalize-then-drop order with a
deterministic per-(seed, key-block) ``jax.random`` stream — a different
stream than nn.Dropout's, so exact-parity tests pin rate 0 (the same
contract as dist/context.py and kernels/flash_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from easydgl_tpu.nn.layers import NEG_INF_LOGIT

# fill for alignment padding (not data): must be strictly below the finite
# TF mask constant so dead rows stay uniform over the REAL keys only
PAD_NEG = -1.0e38
F32 = jnp.float32


def _intensity(su, iv, wd, bd, w, scaling):
    """Hawkes intensity head (reference temporal.py:281-315), identical
    math to nn/temporal.py::MAU.intensity: sigmoid(dense([H, dt])) read
    out per event type through the scaled softplus s*log(1+exp(x/s))."""
    b, h, tq, dh = su.shape
    e = w.shape[0]
    x = jnp.concatenate(
        [su, jnp.broadcast_to(iv[:, None, :, None], (b, h, tq, 1))], axis=-1)
    z = jnp.einsum("bhqc,cd->bhqd", x, wd, preferred_element_type=F32)
    sig = jax.nn.sigmoid(z + bd).reshape(b, h, tq, e, dh)
    raw = jnp.einsum("bhqed,ed->bhqe", sig, w, preferred_element_type=F32)
    s_e = jnp.exp(scaling)
    return s_e * jax.nn.softplus(raw / s_e)


def _pad_tail(x, axis, target):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _blocks(x, axis, bk):
    """Split ``axis`` (already a multiple of bk) into leading blocks:
    (..., nb*bk, ...) -> (nb, ..., bk, ...)."""
    nb = x.shape[axis] // bk
    shape = x.shape[:axis] + (nb, bk) + x.shape[axis + 1:]
    return jnp.moveaxis(x.reshape(shape), axis, 0)


def _unblocks(x, axis):
    """Inverse of ``_blocks``: (nb, ..., bk, ...) -> (..., nb*bk, ...)."""
    y = jnp.moveaxis(x, 0, axis)
    shape = y.shape[:axis] + (y.shape[axis] * y.shape[axis + 1],) \
        + y.shape[axis + 2:]
    return y.reshape(shape)


def _mm(eq, a, b, mdt):
    """Block contraction in the caller's compute dtype with f32
    accumulation — the framework's mxu_einsum convention
    (nn/layers.py:55). mdt == f32 reproduces the original
    unconditional-f32 math exactly, so the f32 equality locks are
    unchanged; bf16 operands hit the native MXU rate (measured neutral
    on the EasyDGL-LC step wall-clock, which is bound elsewhere —
    kept for convention consistency)."""
    return jnp.einsum(eq, a.astype(mdt), b.astype(mdt),
                      preferred_element_type=F32)


def _masked_logits(qf, kb_j, kmb_j, j, *, scale, causal, tk, bk, qpos):
    """One (Tq, bk) logits block with TF mask semantics: real masked keys
    get the finite -2^32+1 constant (dead rows -> uniform), alignment
    padding gets -1e38 (never contributes)."""
    s = _mm("bhqd,bhkd->bhqk", qf, kb_j, qf.dtype) * scale
    kpos = j * bk + jnp.arange(bk)
    mask = (kmb_j > 0)[:, None, None, :]
    if causal:
        mask = jnp.logical_and(
            mask, (kpos[None, None, None, :] <= qpos[None, None, :, None]))
    real = (kpos < tk)[None, None, None, :]
    fill = jnp.where(real, NEG_INF_LOGIT, PAD_NEG)
    return jnp.where(mask, s, fill), mask


def _keep_mask(seed, j, shape, rate):
    """Deterministic per-(seed, key-block) keep-mask, identical between
    the forward sweep and both backward passes. Generator follows the
    config.prng_impl="auto" convention (config.py:149-162): the hardware
    rbg on accelerators, threefry on CPU (stable test fixtures). The
    keep-mask tensors are the step's biggest random draws — ~270M
    bernoullis per (T=2048, B=8) step x3 recomputes; threefry's u32
    fusions cost ~19 ms/step of the EasyDGL-LC budget, rbg is ~free."""
    impl = "rbg" if jax.default_backend() != "cpu" else "threefry2x32"
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(3, impl=impl), seed), j)
    return jax.random.bernoulli(key, 1.0 - rate, shape) / (1.0 - rate)


def _diag_patch(iqk, j, *, bk, qpos, value=None, zero=False):
    """BiMAU diagonal reset (temporal.py:438-439): intensity[i, i] := 1 in
    the forward; the corresponding d(intensity) entries are zero."""
    kpos = j * bk + jnp.arange(bk)
    is_diag = kpos[None, None, None, :] == qpos[None, None, :, None]
    if zero:
        return jnp.where(is_diag, 0.0, iqk)
    return jnp.where(is_diag, 1.0, iqk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _mau_blocked(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
                 causal, diag_reset, rate, bk):
    out, lam, _ = _fwd_impl(q, k, v, t, km, iv, oh, wd, bd, w, scaling,
                            seed, causal, diag_reset, rate, bk)
    return out, lam


def _fwd_impl(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
              causal, diag_reset, rate, bk):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    nb = -(-tk // bk)
    tkp = nb * bk
    mdt = q.dtype  # the projections' compute dtype (bf16 in LC presets)
    qf = q
    qpos = jnp.arange(tq)

    kb = _blocks(_pad_tail(k, 2, tkp), 2, bk)
    vb = _blocks(_pad_tail(v, 2, tkp), 2, bk)
    tb = _blocks(_pad_tail(t, 2, tkp), 2, bk)
    kmb = _blocks(_pad_tail(km.astype(F32), 1, tkp), 1, bk)
    ohb = _blocks(_pad_tail(oh.astype(mdt), 1, tkp), 1, bk)
    blk_ids = jnp.arange(nb)

    # ---- sweep 1: online softmax stats + seq_units ----
    def sweep1(carry, xs):
        m, l, su = carry
        kb_j, tb_j, kmb_j, j = xs
        s, _ = _masked_logits(qf, kb_j, kmb_j, j, scale=scale, causal=causal,
                              tk=tk, bk=bk, qpos=qpos)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        su = su * corr + _mm("bhqk,bhkd->bhqd", p, tb_j, mdt)
        return (m_new, l, su), None

    init = (jnp.full((b, h, tq, 1), PAD_NEG, F32),
            jnp.zeros((b, h, tq, 1), F32), jnp.zeros((b, h, tq, dh), F32))
    (m, l, su), _ = jax.lax.scan(sweep1, init, (kb, tb, kmb, blk_ids))
    seq_units = su / l
    # NOTE: probs are recomputed as exp(s - m) / l, NOT exp(s - lse): on a
    # fully-masked row every logit is the -2^32+1 constant whose f32 ulp
    # (512) swallows log(T), so exp(s - (m + log l)) would be exp(+-ulp)
    # garbage while exp(s - m) is exp(0) exactly -> uniform 1/T, matching
    # jax.nn.softmax's subtract-rowmax-then-divide on dead rows.

    # ---- intensity head (query-local) ----
    ivf = iv.astype(F32)
    lam = _intensity(seq_units, ivf, wd.astype(F32), bd.astype(F32),
                     w.astype(F32), scaling.astype(F32))

    # ---- sweep 2: modulated output ----
    def sweep2(acc, xs):
        kb_j, vb_j, ohb_j, kmb_j, j = xs
        s, _ = _masked_logits(qf, kb_j, kmb_j, j, scale=scale, causal=causal,
                              tk=tk, bk=bk, qpos=qpos)
        p = jnp.exp(s - m) / l
        iqk = _mm("bhqe,bke->bhqk", lam, ohb_j, mdt)
        if diag_reset:
            iqk = _diag_patch(iqk, j, bk=bk, qpos=qpos)
        mod = iqk * p
        if rate > 0.0:
            mod = mod * _keep_mask(seed, j, mod.shape, rate)
        return acc + _mm("bhqk,bhkd->bhqd", mod, vb_j, mdt), None

    out, _ = jax.lax.scan(sweep2, jnp.zeros((b, h, tq, dh), F32),
                          (kb, vb, ohb, kmb, blk_ids))
    return out.astype(q.dtype), lam, (m, l, seq_units)


def _mau_blocked_fwd(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
                     causal, diag_reset, rate, bk):
    out, lam, (m, l, seq_units) = _fwd_impl(
        q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
        causal, diag_reset, rate, bk)
    res = (q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
           m, l, seq_units, lam, out)
    return (out, lam), res


def _mau_blocked_bwd(causal, diag_reset, rate, bk, res, cts):
    (q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
     m, l, seq_units, lam, out) = res
    g_out, g_lam_up = cts
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    e = w.shape[0]
    scale = 1.0 / (dh ** 0.5)
    nb = -(-tk // bk)
    tkp = nb * bk
    mdt = q.dtype
    qf = q
    qpos = jnp.arange(tq)

    kb = _blocks(_pad_tail(k, 2, tkp), 2, bk)
    vb = _blocks(_pad_tail(v, 2, tkp), 2, bk)
    tb = _blocks(_pad_tail(t, 2, tkp), 2, bk)
    kmb = _blocks(_pad_tail(km.astype(F32), 1, tkp), 1, bk)
    ohb = _blocks(_pad_tail(oh.astype(mdt), 1, tkp), 1, bk)
    blk_ids = jnp.arange(nb)

    g_out_f = g_out.astype(F32)
    # flash-style delta: sum_k modd*g_mod == <out, g_out> per row
    delta = jnp.sum(out.astype(F32) * g_out_f, axis=-1, keepdims=True)

    # ---- pass 1: dV and the modulation's d(lambda) ----
    def pass1(g_lam_acc, xs):
        kb_j, vb_j, ohb_j, kmb_j, j = xs
        s, _ = _masked_logits(qf, kb_j, kmb_j, j, scale=scale, causal=causal,
                              tk=tk, bk=bk, qpos=qpos)
        p = jnp.exp(s - m) / l
        keep = (_keep_mask(seed, j, p.shape, rate) if rate > 0.0 else 1.0)
        iqk = _mm("bhqe,bke->bhqk", lam, ohb_j, mdt)
        if diag_reset:
            iqk = _diag_patch(iqk, j, bk=bk, qpos=qpos)
        modd = iqk * p * keep
        g_v_j = _mm("bhqk,bhqd->bhkd", modd, g_out_f, mdt)
        g_mod = _mm("bhqd,bhkd->bhqk", g_out_f, vb_j, mdt)
        g_iqk = g_mod * p * keep
        if diag_reset:  # the diagonal is the constant 1, not lambda
            g_iqk = _diag_patch(g_iqk, j, bk=bk, qpos=qpos, zero=True)
        g_lam_acc = g_lam_acc + _mm("bhqk,bke->bhqe", g_iqk, ohb_j, mdt)
        return g_lam_acc, g_v_j

    g_lam_total, g_v_b = jax.lax.scan(
        pass1, jnp.zeros((b, h, tq, e), F32), (kb, vb, ohb, kmb, blk_ids))
    g_lam_total = g_lam_total + g_lam_up.astype(F32)

    # ---- intensity head VJP (small dense ops) ----
    ivf = iv.astype(F32)
    _, int_vjp = jax.vjp(
        lambda su_, wd_, bd_, w_, sc_: _intensity(su_, ivf, wd_, bd_, w_,
                                                  sc_),
        seq_units, wd.astype(F32), bd.astype(F32), w.astype(F32),
        scaling.astype(F32))
    g_su, g_wd, g_bd, g_w, g_sc = int_vjp(g_lam_total)

    # softmax-row correction: rho_i = <out_i, g_out_i> + <g_su_i, su_i>
    rho = delta + jnp.sum(g_su * seq_units, axis=-1, keepdims=True)

    # ---- pass 2: dQ, dK, dT ----
    def pass2(g_q_acc, xs):
        kb_j, vb_j, tb_j, ohb_j, kmb_j, j = xs
        s, mask = _masked_logits(qf, kb_j, kmb_j, j, scale=scale,
                                 causal=causal, tk=tk, bk=bk, qpos=qpos)
        p = jnp.exp(s - m) / l
        keep = (_keep_mask(seed, j, p.shape, rate) if rate > 0.0 else 1.0)
        iqk = _mm("bhqe,bke->bhqk", lam, ohb_j, mdt)
        if diag_reset:
            iqk = _diag_patch(iqk, j, bk=bk, qpos=qpos)
        g_mod = _mm("bhqd,bhkd->bhqk", g_out_f, vb_j, mdt)
        g_p = g_mod * keep * iqk + _mm("bhqd,bhkd->bhqk", g_su, tb_j, mdt)
        # grads through masked logits are exactly zero (the reference's
        # ``where`` does the same, including on fully-masked rows)
        g_s = jnp.where(mask, p * (g_p - rho), 0.0) * scale
        g_q_acc = g_q_acc + _mm("bhqk,bhkd->bhqd", g_s, kb_j, mdt)
        g_k_j = _mm("bhqk,bhqd->bhkd", g_s, qf, mdt)
        g_t_j = _mm("bhqk,bhqd->bhkd", p, g_su, mdt)
        return g_q_acc, (g_k_j, g_t_j)

    g_q, (g_k_b, g_t_b) = jax.lax.scan(
        pass2, jnp.zeros((b, h, tq, dh), F32),
        (kb, vb, tb, ohb, kmb, blk_ids))

    g_k = _unblocks(g_k_b, 2)[:, :, :tk].astype(k.dtype)
    g_v = _unblocks(g_v_b, 2)[:, :, :tk].astype(v.dtype)
    g_t = _unblocks(g_t_b, 2)[:, :, :tk].astype(t.dtype)
    return (g_q.astype(q.dtype), g_k, g_v, g_t, None, None, None,
            g_wd.astype(wd.dtype), g_bd.astype(bd.dtype),
            g_w.astype(w.dtype), g_sc.astype(scaling.dtype), None)


_mau_blocked.defvjp(_mau_blocked_fwd, _mau_blocked_bwd)


def mau_blocked(q, k, v, t, key_mask, intervals, onehot, wd, bd, w, scaling,
                seed=0, *, causal: bool, diag_reset: bool,
                dropout_rate: float = 0.0, block_k: int = 512):
    """Single-chip blocked MAU/BiMAU.

    q/k/v/t: (B, H, T, dh) head-split projections; key_mask: (B, Tk);
    intervals: (B, Tq); onehot: (B, Tk, E) float mark indicators; wd/bd/w/
    scaling: the intensity-head parameters (nn/temporal.py::MAU.setup).
    Returns (out (B, H, Tq, dh), mark_intensity (B, H, Tq, E)) — exactly
    the XLA module path's values and gradients (rate 0) in O(T * block_k)
    memory. ``block_k`` need not divide Tk (alignment padding never
    contributes, including to dead-row uniform fallbacks).
    """
    bk = min(int(block_k), k.shape[2])
    return _mau_blocked(q, k, v, t, key_mask.astype(jnp.float32),
                        intervals.astype(jnp.float32),
                        onehot.astype(jnp.float32), wd, bd, w, scaling,
                        jnp.asarray(seed, jnp.int32), bool(causal),
                        bool(diag_reset), float(dropout_rate), bk)
