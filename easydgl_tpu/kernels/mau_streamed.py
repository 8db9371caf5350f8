"""Streamed (flash-style) Pallas MAU/BiMAU: the blocked two-sweep schedule
of kernels/mau_blocked.py with every (Tq, Tk) tile kept in VMEM.

Same decomposition, same semantics, different engine: mau_blocked runs the
two sweeps as XLA ``lax.scan``s whose per-block (B, H, Tq, bk) logits /
probs / modulation temporaries round-trip HBM between ops — measured
61 ms of the 103 ms EasyDGL-LC step (B=8, L=2048, v5e-1) at ~4% of the
chip's matmul rate, i.e. bandwidth-bound. Here each phase is a Pallas
kernel over a (B*H, q-block, k-block) grid (the flash_attention.py
pattern): the tile chain QK^T -> mask -> exp -> modulate -> dropout -> @V
never leaves VMEM, so the phases are MXU-bound instead.

Phases (custom_vjp, O(T * block) memory like the scan version):

* ``_stats_kernel``  - online-softmax stats (m, l) + the exp-weighted T
  accumulation -> seq_units (sweep 1);
* the Hawkes intensity head runs between them as its own pair of Pallas
  kernels (``_int_fwd_kernel`` / ``_int_bwd_kernel``): the XLA head
  materializes the (B, H, Tq, dh*E) sigmoid intermediate — 2.1 GB and
  ~13 ms of HBM traffic per pass at the EasyDGL-LC shape — while the
  kernels keep it per-tile in VMEM;
* ``_out_kernel``    - recompute probs tiles as exp(s - m)/l, modulate by
  lambda @ onehot^T (BiMAU diagonal reset), dropout, @V (sweep 2);
* ``_glam_kernel``   - backward pass 1: d(lambda) from the modulation
  (dV is NOT computed here: it needs the key-major grid of pass 3);
* ``_dq_kernel``     - backward pass 2 (query-major): dQ, given the
  intensity head's VJP (XLA) and the row correction rho;
* ``_dkvt_kernel``   - backward pass 3 (key-major): dK, dV, dT.

Semantics are mau_blocked's exactly (rate 0): the finite -2^32+1 mask
constant (nn/layers.py::NEG_INF_LOGIT) keeps fully-masked rows softmaxing
to UNIFORM over the real keys; alignment padding gets a true -1e38 fill
so it never contributes (every key tile holds >= 1 real key, so the tile
max is >= -2^32+1 and exp(-1e38 - max) == 0); gradients through masked
logits are exactly zero; probs recompute as exp(s - m)/l, never
exp(s - lse) (the dead-row ulp note in mau_blocked.py). Equality vs
mau_blocked is locked by tests/test_mau_streamed.py (values + grads).

Dropout keeps normalize-then-drop with a per-(bh, q-block, k-block) TPU
PRNG seed regenerated identically across the three consuming kernels
(flash_attention.py::_block_seed convention; lowbias32 hash fallback in
interpret mode) — a different stream than mau_blocked's host-side
jax.random draws, so exact-parity tests pin rate 0 (the same contract as
every other kernel in this package). The hardware PRNG also removes the
~19 ms/step threefry cost the scan path pays for its keep-masks.

Reference chain: src/module/temporal.py:267-452 (MAU/BiMAU), whose every
O(T^2) tensor is materialized and caps the reference at L~30.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easydgl_tpu.kernels.flash_attention import (_block_seed, _k_clamp,
                                                 _keep_mask, _q_clamp,
                                                 _round_up)
from easydgl_tpu.kernels.mau_blocked import PAD_NEG, _intensity
from easydgl_tpu.nn.layers import NEG_INF_LOGIT

F32 = jnp.float32


# ---------------------------------------------------------------------------
# tile helpers
# ---------------------------------------------------------------------------

def _tile_logits(q, k, km_blk, *, scale, causal, qi, ki, bq, bk, tk):
    """(bq, bk) logits tile with mau_blocked._masked_logits semantics:
    visible -> s, real-but-masked/causal-dead -> NEG_INF_LOGIT, alignment
    padding -> PAD_NEG. Returns (s, visible_mask)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=F32) * scale
    kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = jnp.broadcast_to(km_blk > 0, (bq, bk))
    if causal:
        qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        mask = jnp.logical_and(mask, kpos <= qpos)
    real = kpos < tk
    mask = jnp.logical_and(mask, real)
    fill = jnp.where(real, NEG_INF_LOGIT, PAD_NEG)
    return jnp.where(mask, s, fill), mask


def _tile_probs(q, k, km_blk, m, l, *, scale, causal, qi, ki, bq, bk, tk):
    """Recompute the (bq, bk) probs tile from the saved (m, l) stats —
    exp(s - m)/l, the dead-row-safe form."""
    s, mask = _tile_logits(q, k, km_blk, scale=scale, causal=causal,
                           qi=qi, ki=ki, bq=bq, bk=bk, tk=tk)
    return jnp.exp(s - m) / l, mask


def _tile_iqk(lam, oh, *, diag_reset, qi, ki, bq, bk, grad=False):
    """Modulation tile intensity[q, k] = lam[q] . onehot[k] with the BiMAU
    diagonal patched to the constant 1 (grad=False) or its gradient
    zeroed (grad=True, applied to g_iqk)."""
    iqk = jax.lax.dot_general(lam, oh, (((1,), (1,)), ((), ())),
                              preferred_element_type=F32)
    if not diag_reset:
        return iqk, None
    qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    is_diag = qpos == kpos
    return jnp.where(is_diag, 1.0, iqk), is_diag


# ---------------------------------------------------------------------------
# intensity head (Pallas): the XLA head materializes the (B, H, Tq, dh*E)
# sigmoid intermediate — 2.1 GB at the EasyDGL-LC shape, ~13 ms of HBM
# traffic per pass that dominates once the O(T^2) chain is streamed. These
# kernels keep it per-tile in VMEM: only x (Tq, dh+1) in and lam (Tq, E)
# out. Math is _intensity's exactly (reference temporal.py:281-315).
# ---------------------------------------------------------------------------

def _int_fwd_kernel(x_ref, wd_ref, bd_ref, wf_ref, m_ref, sc_ref, lam_ref):
    """lam tile: x @ wd -> sigmoid -> (*w_flat) @ M -> scaled softplus.
    M[c, e] = 1 iff c // dh == e turns the event-major (dh*E,) layout's
    per-event reduction into one MXU matmul (no in-kernel reshape)."""
    x = x_ref[0]
    z = jax.lax.dot_general(x, wd_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=F32)
    sig = jax.nn.sigmoid(z + bd_ref[:][0:1])
    raw = jax.lax.dot_general(sig * wf_ref[:][0:1], m_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=F32)
    s_e = jnp.exp(sc_ref[:][0:1])
    lam_ref[0] = (s_e * jax.nn.softplus(raw / s_e)).astype(lam_ref.dtype)


def _int_bwd_kernel(x_ref, wd_ref, bd_ref, wf_ref, m_ref, sc_ref, gl_ref,
                    gx_ref, gwd_ref, gbd_ref, gwf_ref, gsc_ref,
                    gwd_sc, gbd_sc, gwf_sc, gsc_sc, *, nprog):
    """Recompute-forward backward tile. Parameter grads accumulate in VMEM
    scratch across the (sequential) grid and store on the last program."""
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        gwd_sc[:] = jnp.zeros_like(gwd_sc)
        gbd_sc[:] = jnp.zeros_like(gbd_sc)
        gwf_sc[:] = jnp.zeros_like(gwf_sc)
        gsc_sc[:] = jnp.zeros_like(gsc_sc)

    x, gl = x_ref[0], gl_ref[0]
    z = jax.lax.dot_general(x, wd_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=F32)
    sig = jax.nn.sigmoid(z + bd_ref[:][0:1])
    sigw = sig * wf_ref[:][0:1]
    raw = jax.lax.dot_general(sigw, m_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=F32)
    s_e = jnp.exp(sc_ref[:][0:1])
    rs = raw / s_e
    sig_r = jax.nn.sigmoid(rs)
    lam = s_e * jax.nn.softplus(rs)
    g_raw = gl * sig_r
    # d lam / d scaling-logit p (s = exp(p)): lam - sigmoid(raw/s) * raw
    gsc_sc[0:1] += jnp.sum(gl * (lam - sig_r * raw), axis=0, keepdims=True)
    g_sigw = jax.lax.dot_general(g_raw, m_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
    gwf_sc[0:1] += jnp.sum(g_sigw * sig, axis=0, keepdims=True)
    g_z = g_sigw * wf_ref[:][0:1] * sig * (1.0 - sig)
    gbd_sc[0:1] += jnp.sum(g_z, axis=0, keepdims=True)
    gwd_sc[:] += jax.lax.dot_general(x, g_z, (((0,), (0,)), ((), ())),
                                     preferred_element_type=F32)
    gx_ref[0] = jax.lax.dot_general(
        g_z, wd_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=F32).astype(gx_ref.dtype)

    @pl.when(i == nprog - 1)
    def _store():
        gwd_ref[:] = gwd_sc[:]
        gbd_ref[:] = gbd_sc[:]
        gwf_ref[:] = gwf_sc[:]
        gsc_ref[:] = gsc_sc[:]


def _int_prep(su_p, iv, wd, bd, w, scaling, tq, dh, e, bq, interpret):
    """Constants + packed x for the intensity kernels. su_p: the padded
    (bh, tqp, dp) seq_units from phase 1; x gets the interval in lane dh
    (the concat [su | dt] of temporal.py:294)."""
    bh, tqp, dp = su_p.shape
    b = iv.shape[0]
    h = bh // b
    ed = dh * e
    edp = _round_up(ed, 128)
    ep = _round_up(e, 128)
    iv_p = jnp.pad(iv.astype(F32), ((0, 0), (0, tqp - tq)))
    iv_bh = jnp.broadcast_to(iv_p[:, None], (b, h, tqp)).reshape(bh, tqp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, tqp, dp), 2)
    x = jnp.where(lane == dh, iv_bh[:, :, None], su_p.astype(F32))
    # wd rows padded to dp: row dh is the interval row (wd's last)
    wd_p = jnp.zeros((dp, edp), F32)
    wd_p = wd_p.at[:dh, :ed].set(wd[:dh].astype(F32))
    wd_p = wd_p.at[dh, :ed].set(wd[dh].astype(F32))
    bd_p = jnp.pad(bd.astype(F32), (0, edp - ed))[None].repeat(8, 0)
    wf = jnp.pad(w.reshape(ed).astype(F32), (0, edp - ed))[None].repeat(8, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (edp, ep), 0)
    ev = jax.lax.broadcasted_iota(jnp.int32, (edp, ep), 1)
    m_mat = jnp.where(
        jnp.logical_and(col // dh == ev, col < ed), 1.0, 0.0).astype(F32)
    sc_p = jnp.pad(scaling.astype(F32), (0, ep - e),
                   constant_values=0.0)[None].repeat(8, 0)
    return x, wd_p, bd_p, wf, m_mat, sc_p, (edp, ep)


def _int_block(bq: int, cap: int) -> int:
    """Row-block for the intensity kernels: their (rows, dh*E) z/sig
    tiles hit the 16 MB scoped-VMEM limit at the attention bq (512 rows
    x 4096 lanes x f32 x several live = 19 MB measured), so they tile
    rows independently — the largest power-of-two divisor of bq up to
    ``cap`` (bq divides tqp, so any divisor of bq tiles tqp evenly)."""
    for c in (cap, cap // 2, cap // 4, cap // 8, 8):
        if c >= 8 and bq % c == 0:
            return c
    return bq


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _intensity_streamed(su_p, iv, wd, bd, w, scaling, shape_info, bq,
                        interpret, out_dtype):
    lam_p = _int_fwd(su_p, iv, wd, bd, w, scaling, shape_info, bq,
                     interpret, out_dtype)
    return lam_p


def _int_fwd(su_p, iv, wd, bd, w, scaling, shape_info, bq, interpret,
             out_dtype):
    tq, dh, e = shape_info
    bh, tqp, dp = su_p.shape
    x, wd_p, bd_p, wf, m_mat, sc_p, (edp, ep) = _int_prep(
        su_p, iv, wd, bd, w, scaling, tq, dh, e, bq, interpret)
    ibq = _int_block(bq, 128)
    nq = tqp // ibq
    full = lambda *_: tuple(0 for _ in range(2))            # noqa: E731
    lam_p = pl.pallas_call(
        _int_fwd_kernel,
        grid=(bh, nq),
        in_specs=[pl.BlockSpec((1, ibq, dp), lambda b_, i: (b_, i, 0)),
                  pl.BlockSpec((dp, edp), full),
                  pl.BlockSpec((8, edp), full),
                  pl.BlockSpec((8, edp), full),
                  pl.BlockSpec((edp, ep), full),
                  pl.BlockSpec((8, ep), full)],
        out_specs=pl.BlockSpec((1, ibq, ep), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, ep), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret)(x, wd_p, bd_p, wf, m_mat, sc_p)
    return lam_p


def _int_streamed_fwd(su_p, iv, wd, bd, w, scaling, shape_info, bq,
                      interpret, out_dtype):
    lam_p = _int_fwd(su_p, iv, wd, bd, w, scaling, shape_info, bq,
                     interpret, out_dtype)
    return lam_p, (su_p, iv, wd, bd, w, scaling)


def _int_streamed_bwd(shape_info, bq, interpret, out_dtype, res, g_lam_p):
    su_p, iv, wd, bd, w, scaling = res
    tq, dh, e = shape_info
    bh, tqp, dp = su_p.shape
    x, wd_p, bd_p, wf, m_mat, sc_p, (edp, ep) = _int_prep(
        su_p, iv, wd, bd, w, scaling, tq, dh, e, bq, interpret)
    ibq = _int_block(bq, 64)
    nq = tqp // ibq
    ed = dh * e
    full = lambda *_: (0, 0)                                # noqa: E731
    kern = functools.partial(_int_bwd_kernel, nprog=bh * nq)
    gx, gwd_p, gbd_p, gwf_p, gsc_p = pl.pallas_call(
        kern,
        grid=(bh, nq),
        in_specs=[pl.BlockSpec((1, ibq, dp), lambda b_, i: (b_, i, 0)),
                  pl.BlockSpec((dp, edp), full),
                  pl.BlockSpec((8, edp), full),
                  pl.BlockSpec((8, edp), full),
                  pl.BlockSpec((edp, ep), full),
                  pl.BlockSpec((8, ep), full),
                  pl.BlockSpec((1, ibq, ep), lambda b_, i: (b_, i, 0))],
        out_specs=[pl.BlockSpec((1, ibq, dp), lambda b_, i: (b_, i, 0)),
                   pl.BlockSpec((dp, edp), full),
                   pl.BlockSpec((8, edp), full),
                   pl.BlockSpec((8, edp), full),
                   pl.BlockSpec((8, ep), full)],
        out_shape=[jax.ShapeDtypeStruct((bh, tqp, dp), F32),
                   jax.ShapeDtypeStruct((dp, edp), F32),
                   jax.ShapeDtypeStruct((8, edp), F32),
                   jax.ShapeDtypeStruct((8, edp), F32),
                   jax.ShapeDtypeStruct((8, ep), F32)],
        scratch_shapes=[pltpu.VMEM((dp, edp), F32),
                        pltpu.VMEM((8, edp), F32),
                        pltpu.VMEM((8, edp), F32),
                        pltpu.VMEM((8, ep), F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret)(x, wd_p, bd_p, wf, m_mat, sc_p,
                             g_lam_p.astype(F32))
    # x's interval lane (dh) carries g_iv — dropped (iv is non-trainable
    # in every consumer, matching mau_blocked's None); su lanes < dh.
    g_su_p = gx.at[:, :, dh:].set(0.0)
    g_wd = gwd_p[:dh + 1, :ed].astype(wd.dtype)
    g_bd = gbd_p[0, :ed].astype(bd.dtype)
    g_w = gwf_p[0, :ed].reshape(e, dh).astype(w.dtype)
    g_sc = gsc_p[0, :e].astype(scaling.dtype)
    return (g_su_p, None, g_wd, g_bd, g_w, g_sc)


_intensity_streamed.defvjp(_int_streamed_fwd, _int_streamed_bwd)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _stats_kernel(q_ref, k_ref, t_ref, km_ref, m_ref, l_ref, su_ref,
                  m_sc, l_sc, su_sc, *, scale, causal, bq, bk, nk, tk):
    """Sweep 1: online (m, l) + exp-weighted T accumulation; stores
    m, l and seq_units = su / l."""
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, PAD_NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        su_sc[:] = jnp.zeros_like(su_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, t = q_ref[0], k_ref[0], t_ref[0]
        s, _ = _tile_logits(q, k, km_ref[0], scale=scale, causal=causal,
                            qi=qi, ki=ki, bq=bq, bk=bk, tk=tk)
        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:] = l_sc[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        su_sc[:] = su_sc[:] * corr + jax.lax.dot_general(
            p.astype(t.dtype), t, (((1,), (0,)), ((), ())),
            preferred_element_type=F32)
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

    @pl.when(ki == nk - 1)
    def _store():
        m_ref[0] = m_sc[:, :1]
        l_ref[0] = l_sc[:, :1]
        su_ref[0] = (su_sc[:] / l_sc[:, :1]).astype(su_ref.dtype)


def _out_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, oh_ref, lam_ref,
                m_ref, l_ref, out_ref, acc_sc, *, scale, causal, diag_reset,
                rate, bq, bk, nk, tk, interpret):
    """Sweep 2: modulated, dropped probs @ V."""
    qi, ki = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        p, _ = _tile_probs(q, k, km_ref[0], m_ref[0], l_ref[0], scale=scale,
                           causal=causal, qi=qi, ki=ki, bq=bq, bk=bk, tk=tk)
        iqk, _ = _tile_iqk(lam_ref[0], oh_ref[0], diag_reset=diag_reset,
                           qi=qi, ki=ki, bq=bq, bk=bk)
        mod = iqk * p
        if rate > 0.0:
            mod = mod * _keep_mask(bseed, (bq, bk), rate, interpret)
        acc_sc[:] += jax.lax.dot_general(
            mod.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=F32)

    @pl.when(ki == nk - 1)
    def _store():
        out_ref[0] = acc_sc[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _glam_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, oh_ref, m_ref,
                 l_ref, do_ref, glam_ref, glam_sc, *, scale, causal,
                 diag_reset, rate, bq, bk, nk, tk, interpret):
    """Backward pass 1 (query-major): the modulation's d(lambda)."""
    qi, ki = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(ki == 0)
    def _init():
        glam_sc[:] = jnp.zeros_like(glam_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        p, _ = _tile_probs(q, k, km_ref[0], m_ref[0], l_ref[0], scale=scale,
                           causal=causal, qi=qi, ki=ki, bq=bq, bk=bk, tk=tk)
        g_mod = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
        g_iqk = g_mod * p
        if rate > 0.0:
            g_iqk = g_iqk * _keep_mask(bseed, (bq, bk), rate, interpret)
        if diag_reset:  # the diagonal is the constant 1, not lambda
            qpos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            kpos = ki * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            g_iqk = jnp.where(qpos == kpos, 0.0, g_iqk)
        glam_sc[:] += jax.lax.dot_general(
            g_iqk.astype(oh_ref.dtype), oh_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=F32)

    @pl.when(ki == nk - 1)
    def _store():
        glam_ref[0] = glam_sc[:]


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, t_ref, km_ref, oh_ref,
               lam_ref, m_ref, l_ref, do_ref, gsu_ref, rho_ref, dq_ref,
               dq_sc, *, scale, causal, diag_reset, rate, bq, bk, nk, tk,
               interpret):
    """Backward pass 2 (query-major): dQ."""
    qi, ki = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(ki == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v, t, do = (q_ref[0], k_ref[0], v_ref[0], t_ref[0], do_ref[0])
        p, mask = _tile_probs(q, k, km_ref[0], m_ref[0], l_ref[0],
                              scale=scale, causal=causal, qi=qi, ki=ki,
                              bq=bq, bk=bk, tk=tk)
        iqk, _ = _tile_iqk(lam_ref[0], oh_ref[0], diag_reset=diag_reset,
                           qi=qi, ki=ki, bq=bq, bk=bk)
        g_mod = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
        if rate > 0.0:
            g_mod = g_mod * _keep_mask(bseed, (bq, bk), rate, interpret)
        g_p = g_mod * iqk + jax.lax.dot_general(
            gsu_ref[0], t, (((1,), (1,)), ((), ())),
            preferred_element_type=F32)
        # masked logits carry exactly zero grad (mau_blocked pass2)
        g_s = jnp.where(mask, p * (g_p - rho_ref[0]), 0.0)
        dq_sc[:] += jax.lax.dot_general(
            g_s.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=F32) * scale

    @pl.when(ki == nk - 1)
    def _store():
        dq_ref[0] = dq_sc[:].astype(dq_ref.dtype)


def _dkvt_kernel(seed_ref, q_ref, k_ref, v_ref, t_ref, km_ref, oh_ref,
                 lam_ref, m_ref, l_ref, do_ref, gsu_ref, rho_ref,
                 dk_ref, dv_ref, dt_ref, dk_sc, dv_sc, dt_sc, *, scale,
                 causal, diag_reset, rate, bq, bk, nq, tk, interpret):
    """Backward pass 3 (key-major grid (bh, ki, qi)): dK, dV, dT."""
    ki, qi = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(qi == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)
        dt_sc[:] = jnp.zeros_like(dt_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v, t, do = (q_ref[0], k_ref[0], v_ref[0], t_ref[0], do_ref[0])
        p, mask = _tile_probs(q, k, km_ref[0], m_ref[0], l_ref[0],
                              scale=scale, causal=causal, qi=qi, ki=ki,
                              bq=bq, bk=bk, tk=tk)
        iqk, _ = _tile_iqk(lam_ref[0], oh_ref[0], diag_reset=diag_reset,
                           qi=qi, ki=ki, bq=bq, bk=bk)
        keep = (_keep_mask(bseed, (bq, bk), rate, interpret)
                if rate > 0.0 else None)
        mod = iqk * p if keep is None else iqk * p * keep
        # dV = modd^T @ dOut
        dv_sc[:] += jax.lax.dot_general(
            mod.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)
        g_mod = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
        if keep is not None:
            g_mod = g_mod * keep
        g_p = g_mod * iqk + jax.lax.dot_general(
            gsu_ref[0], t, (((1,), (1,)), ((), ())),
            preferred_element_type=F32)
        g_s = jnp.where(mask, p * (g_p - rho_ref[0]), 0.0)
        dk_sc[:] += jax.lax.dot_general(
            g_s.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=F32) * scale
        # dT = p^T @ g_su (sweep 1's exp-weighted accumulation transpose)
        dt_sc[:] += jax.lax.dot_general(
            p.astype(gsu_ref.dtype), gsu_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=F32)

    @pl.when(qi == nq - 1)
    def _store():
        dk_ref[0] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)
        dt_ref[0] = dt_sc[:].astype(dt_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wiring
# ---------------------------------------------------------------------------

def _pack_bh(x, tp, dp):
    """(B, H, T, D) -> zero-padded (B*H, Tp, Dp)."""
    b, h, t, d = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, dp - d)))
    return x.reshape(b * h, tp, dp)


def _prep_all(q, k, v, t, km, oh, bq, bk):
    """Pad/reshape every kernel operand. km/oh stay per-BATCH (the index
    maps divide the bh grid index by H — no B*H broadcast copy)."""
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    e = oh.shape[-1]
    tqp, tkp = _round_up(tq, bq), _round_up(tk, bk)
    dp, ep = _round_up(dh, 128), _round_up(e, 128)
    qp = _pack_bh(q, tqp, dp)
    kp = _pack_bh(k, tkp, dp)
    vp = _pack_bh(v, tkp, dp)
    tp_ = _pack_bh(t, tkp, dp)
    km_p = jnp.pad(km.astype(F32), ((0, 0), (0, tkp - tk)))[:, None, :]
    oh_p = jnp.pad(oh.astype(q.dtype),
                   ((0, 0), (0, tkp - tk), (0, ep - e)))
    return qp, kp, vp, tp_, km_p, oh_p, (tqp, tkp, dp, ep)


def _index_maps(h, bq, bk, causal, key_major=False):
    """Index maps for the (bh, qi, ki) grids — or (bh, ki, qi) key-major.
    q-side/k-side blocks use the flash causal DMA clamps; km/oh divide the
    bh grid index by H (per-BATCH operands, no B*H broadcast copy)."""
    kc = _k_clamp(causal, bq, bk)
    qc = _q_clamp(causal, bq, bk)
    if key_major:
        qix = lambda b, jk, iq: (b, qc(iq, jk), 0)           # noqa: E731
        kix = lambda b, jk, iq: (b, jk, 0)                   # noqa: E731
        kmix = lambda b, jk, iq: (b // h, 0, jk)             # noqa: E731
        ohix = lambda b, jk, iq: (b // h, jk, 0)             # noqa: E731
    else:
        qix = lambda b, iq, jk: (b, iq, 0)                   # noqa: E731
        kix = lambda b, iq, jk: (b, kc(jk, iq), 0)           # noqa: E731
        kmix = lambda b, iq, jk: (b // h, 0, kc(jk, iq))     # noqa: E731
        ohix = lambda b, iq, jk: (b // h, kc(jk, iq), 0)     # noqa: E731
    return qix, kix, kmix, ohix


def _mk_call(kern, grid, in_specs, out_specs, out_shape, scratch,
             interpret):
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def _mau_streamed(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
                  causal, diag_reset, rate, blocks, interpret):
    out, lam, _ = _fwd_impl(q, k, v, t, km, iv, oh, wd, bd, w, scaling,
                            seed, causal, diag_reset, rate, blocks,
                            interpret)
    return out, lam


def _fwd_impl(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
              causal, diag_reset, rate, blocks, interpret):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    bq, bk = blocks
    bq, bk = min(bq, _round_up(tq, 8)), min(bk, _round_up(tk, 128))
    scale = 1.0 / (dh ** 0.5)
    qp, kp, vp, tp_, km_p, oh_p, (tqp, tkp, dp, ep) = _prep_all(
        q, k, v, t, km, oh, bq, bk)
    nq, nk = tqp // bq, tkp // bk
    bh = b * h
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    qix, kix, kmix, ohix = _index_maps(h, bq, bk, causal)
    # ---- phase 1: stats + seq_units ----
    kern = functools.partial(_stats_kernel, scale=scale, causal=causal,
                             bq=bq, bk=bk, nk=nk, tk=tk)
    m, l, su = _mk_call(
        kern, (bh, nq, nk),
        in_specs=[pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, 1, bk), kmix)],
        out_specs=[pl.BlockSpec((1, bq, 1), qix),
                   pl.BlockSpec((1, bq, 1), qix),
                   pl.BlockSpec((1, bq, dp), qix)],
        out_shape=[jax.ShapeDtypeStruct((bh, tqp, 1), F32),
                   jax.ShapeDtypeStruct((bh, tqp, 1), F32),
                   jax.ShapeDtypeStruct((bh, tqp, dp), F32)],
        scratch=[pltpu.VMEM((bq, 128), F32),
                 pltpu.VMEM((bq, 128), F32),
                 pltpu.VMEM((bq, dp), F32)],
        interpret=interpret)(qp, kp, tp_, km_p)

    # ---- intensity head (Pallas, O(T), per-tile VMEM) ----
    e = oh.shape[-1]
    lam_p = _intensity_streamed(su, iv, wd, bd, w, scaling,
                                (tq, dh, e), bq, interpret, q.dtype)
    lam = lam_p.reshape(b, h, tqp, ep)[:, :, :tq, :e].astype(F32)

    # ---- phase 2: modulated output ----
    kern = functools.partial(_out_kernel, scale=scale, causal=causal,
                             diag_reset=diag_reset, rate=rate, bq=bq, bk=bk,
                             nk=nk, tk=tk, interpret=interpret)
    out = _mk_call(
        kern, (bh, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, 1, bk), kmix),
                  pl.BlockSpec((1, bk, ep), ohix),
                  pl.BlockSpec((1, bq, ep), qix),
                  pl.BlockSpec((1, bq, 1), qix),
                  pl.BlockSpec((1, bq, 1), qix)],
        out_specs=pl.BlockSpec((1, bq, dp), qix),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
        scratch=[pltpu.VMEM((bq, dp), F32)],
        interpret=interpret)(seed_arr, qp, kp, vp, km_p, oh_p, lam_p, m, l)

    out_full = out.reshape(b, h, tqp, dp)[:, :, :tq, :dh]
    return out_full, lam, (m, l, su)


def _mau_streamed_fwd(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
                      causal, diag_reset, rate, blocks, interpret):
    out, lam, (m, l, su_p) = _fwd_impl(
        q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
        causal, diag_reset, rate, blocks, interpret)
    res = (q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
           m, l, su_p, lam, out)
    return (out, lam), res


def _mau_streamed_bwd(causal, diag_reset, rate, blocks, interpret,
                      res, cts):
    (q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed,
     m, l, su_p, lam, out) = res
    g_out, g_lam_up = cts
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    bq, bk = blocks
    bq, bk = min(bq, _round_up(tq, 8)), min(bk, _round_up(tk, 128))
    scale = 1.0 / (dh ** 0.5)
    qp, kp, vp, tp_, km_p, oh_p, (tqp, tkp, dp, ep) = _prep_all(
        q, k, v, t, km, oh, bq, bk)
    nq, nk = tqp // bq, tkp // bk
    bh = b * h
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    lam_p = jnp.pad(lam.astype(q.dtype),
                    ((0, 0), (0, 0), (0, tqp - tq),
                     (0, ep - lam.shape[-1]))).reshape(bh, tqp, ep)
    # dOut enters matmuls against q.dtype tiles (the mxu_einsum
    # convention); delta/rho are computed in f32 OUTSIDE the kernels
    do_p = _pack_bh(g_out.astype(q.dtype), tqp, dp)

    qix, kix, kmix, ohix = _index_maps(h, bq, bk, causal)

    # ---- pass 1: d(lambda) from the modulation ----
    kern = functools.partial(_glam_kernel, scale=scale, causal=causal,
                             diag_reset=diag_reset, rate=rate, bq=bq,
                             bk=bk, nk=nk, tk=tk, interpret=interpret)
    g_lam_mod = _mk_call(
        kern, (bh, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, 1, bk), kmix),
                  pl.BlockSpec((1, bk, ep), ohix),
                  pl.BlockSpec((1, bq, 1), qix),
                  pl.BlockSpec((1, bq, 1), qix),
                  pl.BlockSpec((1, bq, dp), qix)],
        out_specs=pl.BlockSpec((1, bq, ep), qix),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, ep), F32),
        scratch=[pltpu.VMEM((bq, ep), F32)],
        interpret=interpret)(seed_arr, qp, kp, vp, km_p, oh_p, m, l, do_p)

    e = lam.shape[-1]
    g_lam_total = (g_lam_mod.reshape(b, h, tqp, ep)[:, :, :tq, :e]
                   + g_lam_up.astype(F32))

    # ---- intensity head VJP (Pallas, recompute-forward) ----
    g_lam_tot_p = jnp.pad(
        g_lam_total, ((0, 0), (0, 0), (0, tqp - tq),
                      (0, ep - e))).reshape(bh, tqp, ep)
    _, int_vjp = jax.vjp(
        lambda su_, wd_, bd_, w_, sc_: _intensity_streamed(
            su_, iv, wd_, bd_, w_, sc_, (tq, dh, e), bq, interpret, F32),
        su_p, wd, bd, w, scaling)
    g_su_p, g_wd, g_bd, g_w, g_sc = int_vjp(g_lam_tot_p)

    # rho_i = <out_i, g_out_i> + <g_su_i, su_i> (mau_blocked bwd) — padded
    # rows/lanes of g_su_p are zero, su_p padding lanes are zero, so the
    # padded-layout contraction equals the sliced one
    delta = jnp.sum(out.astype(F32) * g_out.astype(F32), axis=-1,
                    keepdims=True)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, tqp - tq),
                              (0, 0))).reshape(bh, tqp, 1)
    rho_p = delta_p + jnp.sum(g_su_p * su_p, axis=-1, keepdims=True)
    gsu_p = g_su_p.astype(q.dtype)

    common_in = [seed_arr, qp, kp, vp, tp_, km_p, oh_p, lam_p, m, l,
                 do_p, gsu_p, rho_p]

    # ---- pass 2 (query-major): dQ ----
    kern = functools.partial(_dq_kernel, scale=scale, causal=causal,
                             diag_reset=diag_reset, rate=rate, bq=bq,
                             bk=bk, nk=nk, tk=tk, interpret=interpret)
    dq = _mk_call(
        kern, (bh, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, bk, dp), kix),
                  pl.BlockSpec((1, 1, bk), kmix),
                  pl.BlockSpec((1, bk, ep), ohix),
                  pl.BlockSpec((1, bq, ep), qix),
                  pl.BlockSpec((1, bq, 1), qix),
                  pl.BlockSpec((1, bq, 1), qix),
                  pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bq, dp), qix),
                  pl.BlockSpec((1, bq, 1), qix)],
        out_specs=pl.BlockSpec((1, bq, dp), qix),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
        scratch=[pltpu.VMEM((bq, dp), F32)],
        interpret=interpret)(*common_in)

    # ---- pass 3 (key-major): dK, dV, dT ----
    qixM, kixM, kmixM, ohixM = _index_maps(h, bq, bk, causal,
                                           key_major=True)
    kern = functools.partial(_dkvt_kernel, scale=scale, causal=causal,
                             diag_reset=diag_reset, rate=rate, bq=bq,
                             bk=bk, nq=nq, tk=tk, interpret=interpret)
    kspec = pl.BlockSpec((1, bk, dp), kixM)
    qspec = pl.BlockSpec((1, bq, dp), qixM)
    col = pl.BlockSpec((1, bq, 1), qixM)
    dk, dv, dt = _mk_call(
        kern, (bh, nk, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  qspec, kspec, kspec, kspec,
                  pl.BlockSpec((1, 1, bk), kmixM),
                  pl.BlockSpec((1, bk, ep), ohixM),
                  pl.BlockSpec((1, bq, ep), qixM),
                  col, col, qspec, qspec, col],
        out_specs=[kspec, kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct((bh, tkp, dp), q.dtype)] * 3,
        scratch=[pltpu.VMEM((bk, dp), F32)] * 3,
        interpret=interpret)(*common_in)

    def _unpack(x, tlen):
        return x.reshape(b, h, tkp, dp)[:, :, :tlen, :dh]

    g_q = dq.reshape(b, h, tqp, dp)[:, :, :tq, :dh].astype(q.dtype)
    return (g_q, _unpack(dk, tk).astype(k.dtype),
            _unpack(dv, tk).astype(v.dtype),
            _unpack(dt, tk).astype(t.dtype), None, None, None,
            g_wd.astype(wd.dtype), g_bd.astype(bd.dtype),
            g_w.astype(w.dtype), g_sc.astype(scaling.dtype), None)


_mau_streamed.defvjp(_mau_streamed_fwd, _mau_streamed_bwd)


def mau_streamed(q, k, v, t, key_mask, intervals, onehot, wd, bd, w,
                 scaling, seed=0, *, causal: bool, diag_reset: bool,
                 dropout_rate: float = 0.0, block_q: int = 512,
                 block_k: int = 512, interpret: bool = False):
    """Streamed Pallas MAU/BiMAU — drop-in for mau_blocked.mau_blocked
    (same argument contract, same values/grads at rate 0; see module doc
    for the dropout-stream difference)."""
    return _mau_streamed(q, k, v, t, key_mask.astype(F32),
                         intervals.astype(F32), onehot.astype(F32),
                         wd, bd, w, scaling,
                         jnp.asarray(seed, jnp.int32), bool(causal),
                         bool(diag_reset), float(dropout_rate),
                         (int(block_q), int(block_k)), bool(interpret))
