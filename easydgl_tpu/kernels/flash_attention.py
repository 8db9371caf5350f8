"""Blockwise (flash) attention for long sequences (Pallas TPU, fwd + bwd).

The reference caps sequences at L=30 and materializes every O(L^2)
attention tensor (src/module/sequential.py:16-83); nothing in it scales
past a few hundred positions. This kernel is the LONG-CONTEXT component of
the TPU build (SURVEY.md §5 "long-context" row): softmax attention with
online (streaming) normalization over key blocks, so the (Tq, Tk) probs
matrix never exists in HBM — memory is O(T·D) and sequence length is
bounded by HBM capacity, not by the O(L^2) intermediate.

Semantics (dist/context.py's ring attention instead keeps the XLA path's
finite -2^32+1 mask constant bit-for-bit, since a ring visits every key
chunk anyway — see that module for the contrast):

* logits = (Q K^T) * scale, masked by ``key_mask`` (per-key, reference
  sequential.py:50-55) and optionally causal (``:58-63``).
* Masked probabilities are EXACTLY zero (the mask is applied to the
  post-exp numerator, not just as a -inf logit), and a row with NO visible
  key outputs ZERO. This differs from the reference XLA path
  (nn/attention.py::attention_probs) only on fully-masked rows, where the
  finite -2^32+1 mask constant makes TF softmax to uniform: those are
  left-pad rows whose loss weight is zero. Rows with >= 1 visible key
  match the XLA path exactly (locked by tests/test_flash_attention.py).
* Gradients through masked logits are exactly zero (the reference's
  ``where`` does the same), including on fully-masked rows.
* Optional probs-dropout (reference sequential.py:66-71 semantics:
  normalize first, then drop + 1/keep rescale) via the TPU PRNG, seeded
  per (batch*head, q-block, k-block) program so the backward regenerates
  the identical mask without materializing it.

Causality skips the strictly-upper-triangular key blocks' compute (the
DMAs still stream, overlapped), halving the FLOPs of a causal pass.

Backward = two recompute kernels (standard flash bwd): a dQ pass gridded
like the forward, and a dK/dV pass gridded key-block-major; both rebuild
the probs tile from (q, k, lse) in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _drop_mask(shape, rate: float):
    """Scaled keep-mask from the (already seeded) TPU PRNG (same
    construction as kernels/mau_attention.py::_drop_mask)."""
    bits = pltpu.prng_random_bits(shape)
    keep_prob = 1.0 - rate
    thresh = jnp.uint32(min(int(keep_prob * (2.0 ** 32)), 2 ** 32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) < thresh
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


def _block_seed(seed_ref, qi, ki):
    """Deterministic per-(bh, qi, ki) seed, identical across the three
    kernels regardless of their grid iteration order (the dK/dV grid is
    key-block-major, so qi/ki are passed explicitly)."""
    bh = pl.program_id(0)
    return (seed_ref[0] + bh * jnp.int32(1000003) + qi * jnp.int32(7919)
            + ki * jnp.int32(104729))


def _hash_drop_mask(seed, shape, rate: float):
    """Interpret-mode keep-mask: the HLO interpreter has no TPU PRNG, so
    tests use a lowbias32-style integer hash instead. Same contract as
    ``_drop_mask`` (deterministic in the seed, identical fwd/bwd) but a
    DIFFERENT stream than the compiled kernel's hardware PRNG — both are
    valid dropout; nothing may depend on the specific mask values."""
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * shape[1] + \
        jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = idx + seed.astype(jnp.uint32) * jnp.uint32(2654435761)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846ca68b)
    x = x ^ (x >> 16)
    keep_prob = 1.0 - rate
    thresh = jnp.uint32(min(int(keep_prob * (2.0 ** 32)), 2 ** 32 - 1))
    return jnp.where(x < thresh, 1.0 / keep_prob, 0.0)


def _keep_mask(seed, shape, rate: float, interpret: bool):
    """seed: the per-(bh, qi, ki) block seed, computed at kernel top
    level (program_id is not lowerable inside a pl.when body in the HLO
    interpreter)."""
    if interpret:
        return _hash_drop_mask(seed, shape, rate)
    pltpu.prng_seed(seed)
    return _drop_mask(shape, rate)


def _tile_mask(km_blk, *, causal: bool, qi, ki, bq: int, bk: int):
    """(bq, bk) bool visibility tile: key_mask row x optional causal."""
    mask = (km_blk > 0)  # (1, bk) -> broadcasts over rows
    mask = jnp.broadcast_to(mask, (bq, bk))
    if causal:
        qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = jnp.logical_and(mask, kpos <= qpos)
    return mask


def _probs_tile(q, k, km_blk, lse, *, scale, causal, qi, ki, bq, bk):
    """Recompute the (bq, bk) probs tile from saved lse (backward path)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    mask = _tile_mask(km_blk, causal=causal, qi=qi, ki=ki, bq=bq, bk=bk)
    return jnp.where(mask, jnp.exp(s - lse), 0.0), mask


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, out_ref, lse_ref,
                acc_sc, m_sc, l_sc, *, scale: float, causal: bool,
                rate: float, bq: int, bk: int, nk: int, interpret: bool):
    qi, ki = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG)
        l_sc[:] = jnp.zeros_like(l_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = _tile_mask(km_ref[0], causal=causal, qi=qi, ki=ki,
                          bq=bq, bk=bk)
        s = jnp.where(mask, s, NEG)
        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # exact-zero masked probs: a fully-masked row keeps p == 0 rather
        # than exp(NEG - NEG) == 1 (zero-output convention, see module doc)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:] = l_sc[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = p
        if rate > 0.0:
            pv = p * _keep_mask(bseed, (bq, bk), rate, interpret)
        acc_sc[:] = acc_sc[:] * corr + jax.lax.dot_general(
            pv.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

    @pl.when(ki == nk - 1)
    def _store():
        l = l_sc[:, :1]
        out_ref[0] = jnp.where(l > 0.0, acc_sc[:] / jnp.maximum(l, 1e-37),
                               0.0).astype(out_ref.dtype)
        lse_ref[0] = (m_sc[:, :1] + jnp.log(jnp.maximum(l, 1e-37)))


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, do_ref, lse_ref,
               dlt_ref, dq_ref, dq_sc, *, scale: float, causal: bool,
               rate: float, bq: int, bk: int, nk: int, interpret: bool):
    qi, ki = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(ki == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        lse = lse_ref[0]  # (bq, 1) column
        p, mask = _probs_tile(q, k, km_ref[0], lse, scale=scale,
                              causal=causal, qi=qi, ki=ki, bq=bq, bk=bk)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = dp * _keep_mask(bseed, (bq, bk), rate, interpret)
        ds = p * (dp - dlt_ref[0])
        ds = jnp.where(mask, ds, 0.0)  # masked logits carry zero grad
        dq_sc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(ki == nk - 1)
    def _store():
        dq_ref[0] = dq_sc[:].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, do_ref, lse_ref,
                dlt_ref, dk_ref, dv_ref, dk_sc, dv_sc, *, scale: float,
                causal: bool, rate: float, bq: int, bk: int, nq: int, interpret: bool):
    # key-block-major grid: (bh, ki, qi) — q is the innermost sweep
    ki, qi = pl.program_id(1), pl.program_id(2)
    bseed = _block_seed(seed_ref, qi, ki)

    @pl.when(qi == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    live = jnp.logical_or(not causal, ki * bk <= qi * bq + (bq - 1))

    @pl.when(live)
    def _step():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        lse = lse_ref[0]  # (bq, 1) column
        p, mask = _probs_tile(q, k, km_ref[0], lse, scale=scale,
                              causal=causal, qi=qi, ki=ki, bq=bq, bk=bk)
        pd = p
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dm = _keep_mask(bseed, (bq, bk), rate, interpret)
            pd = p * dm
            dp = dp * dm
        dv_sc[:] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dlt_ref[0])
        ds = jnp.where(mask, ds, 0.0)
        dk_sc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _store():
        dk_ref[0] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


def _prep(q, k, v, key_mask, bq, bk):
    """(B, H, T, D) -> padded (B*H, Tp, Dp) + (B*H, 1, Tkp) mask."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    tqp, tkp = _round_up(tq, bq), _round_up(tk, bk)
    # D is padded to full 128-lane tiles: measured on v5e, an UNPADDED
    # D=64 layout (legal — block dim == array dim) is a wash at the tuned
    # blocks and ~1.2x SLOWER at mid-size blocks (the MXU charges 64-deep
    # contractions like 128s while 64-lane relayouts add VPU shuffles);
    # see BASELINE.md round 4
    dp = _round_up(d, 128)
    if key_mask is None:
        key_mask = jnp.ones((b, tk), jnp.float32)
    km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, tkp - tk)))
    # (bh, 1, tkp): the unit middle dim keeps the block's sublane dim equal
    # to the array dim (Mosaic tiling rule: last-two block dims must be
    # (8k, 128k) or equal to the array's)
    km = jnp.broadcast_to(km[:, None], (b, h, tkp)).reshape(b * h, 1, tkp)

    def pack(x, tp):
        bb, hh, t, dd = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, dp - dd)))
        return x.reshape(bb * hh, tp, dp)

    return pack(q, tqp), pack(k, tkp), pack(v, tkp), km, (tqp, tkp, dp)


def _k_clamp(causal: bool, bq: int, bk: int):
    """Causal DMA skip for k-side blocks on the (bh, qi, ki) grids: dead
    key blocks (strictly above the diagonal) map to the LAST LIVE block
    index, so consecutive dead steps re-reference the block already in
    VMEM and Mosaic fetches nothing (the compute is predicated off by the
    kernels' ``live`` check) — halving causal K/V streaming."""
    if not causal:
        return lambda j, i: j
    return lambda j, i: jnp.minimum(j, (i * bq + bq - 1) // bk)


def _q_clamp(causal: bool, bq: int, bk: int):
    """The mirror clamp for q-side blocks on the key-major (bh, ki, qi)
    dK/dV grid: dead q blocks (before the diagonal) map up to the first
    live one."""
    if not causal:
        return lambda i, j: i
    return lambda i, j: jnp.maximum(i, (j * bk) // bq)


def _common_specs(bq, bk, dp, causal):
    """(q, k, v, km) in-specs for the forward/dq grid (bh, qi, ki)."""
    kc = _k_clamp(causal, bq, bk)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # seed (1,)
        pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, kc(j, i), 0)),
        pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, kc(j, i), 0)),
        pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, kc(j, i))),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, key_mask, seed, scale, causal, rate, blocks, interpret):
    out, _ = _flash_fwd(q, k, v, key_mask, seed, scale, causal, rate,
                        blocks, interpret)
    return out


def _flash_fwd(q, k, v, key_mask, seed, scale, causal, rate, blocks,
               interpret):
    b, h, tq, d = q.shape
    bq, bk = blocks
    qp, kp, vp, km, (tqp, tkp, dpad) = _prep(q, k, v, key_mask, bq, bk)
    nq, nk = tqp // bq, tkp // bk
    bh = b * h
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             rate=rate, bq=bq, bk=bk, nk=nk, interpret=interpret)
    out, lse = pl.pallas_call(
        kern,
        grid=(bh, nq, nk),
        in_specs=_common_specs(bq, bk, dpad, causal),
        out_specs=[
            pl.BlockSpec((1, bq, dpad), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tqp, dpad), q.dtype),
            jax.ShapeDtypeStruct((bh, tqp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dpad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, km)
    out_full = out.reshape(b, h, tqp, dpad)[:, :, :tq, :d]
    return out_full, (q, k, v, key_mask, seed, out, lse)


def _flash_bwd(scale, causal, rate, blocks, interpret, res, g):
    q, k, v, key_mask, seed, out_padded, lse = res
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = blocks
    qp, kp, vp, km, (tqp, tkp, dpad) = _prep(q, k, v, key_mask, bq, bk)
    nq, nk = tqp // bq, tkp // bk
    bh = b * h
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    go = jnp.pad(g, ((0, 0), (0, 0), (0, tqp - tq), (0, dpad - d)))
    go = go.reshape(bh, tqp, dpad)
    # delta = rowsum(dO * O) — the softmax-jacobian row term
    delta = jnp.sum(go.astype(jnp.float32) *
                    out_padded.astype(jnp.float32), axis=-1,
                    keepdims=True)  # (bh, tqp, 1) column layout

    row_specs = [
        pl.BlockSpec((1, bq, dpad), lambda b_, i, j: (b_, i, 0)),  # do
        pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),     # lse
        pl.BlockSpec((1, bq, 1), lambda b_, i, j: (b_, i, 0)),     # delta
    ]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          rate=rate, bq=bq, bk=bk, nk=nk, interpret=interpret),
        grid=(bh, nq, nk),
        in_specs=_common_specs(bq, bk, dpad, causal) + row_specs,
        out_specs=pl.BlockSpec((1, bq, dpad), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, dpad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, km, go, lse, delta)

    qc = _q_clamp(causal, bq, bk)
    kv_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                     # seed
        pl.BlockSpec((1, bq, dpad), lambda b_, j, i: (b_, qc(i, j), 0)),
        pl.BlockSpec((1, bk, dpad), lambda b_, j, i: (b_, j, 0)),  # k
        pl.BlockSpec((1, bk, dpad), lambda b_, j, i: (b_, j, 0)),  # v
        pl.BlockSpec((1, 1, bk), lambda b_, j, i: (b_, 0, j)),     # km
        pl.BlockSpec((1, bq, dpad), lambda b_, j, i: (b_, qc(i, j), 0)),
        pl.BlockSpec((1, bq, 1), lambda b_, j, i: (b_, qc(i, j), 0)),
        pl.BlockSpec((1, bq, 1), lambda b_, j, i: (b_, qc(i, j), 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          rate=rate, bq=bq, bk=bk, nq=nq, interpret=interpret),
        grid=(bh, nk, nq),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, bk, dpad), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, bk, dpad), lambda b_, j, i: (b_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tkp, dpad), k.dtype),
            jax.ShapeDtypeStruct((bh, tkp, dpad), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, dpad), jnp.float32),
                        pltpu.VMEM((bk, dpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, km, go, lse, delta)

    dq = dq.reshape(b, h, tqp, dpad)[:, :, :tq, :d]
    dk = dk.reshape(b, h, tkp, dpad)[:, :, :tk, :d]
    dv = dv.reshape(b, h, tkp, dpad)[:, :, :tk, :d]
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, key_mask=None, *, causal: bool = False,
                    scale=None, dropout_rate: float = 0.0, seed=0,
                    block_q: int = 1024, block_k: int = 512,
                    interpret: bool = False):
    """Blockwise attention: out = dropout(softmax(mask(QK^T * scale))) @ V.

    q: (B, H, Tq, D); k, v: (B, H, Tk, D); key_mask: (B, Tk) (1 = visible).
    Masked probs are exactly zero; fully-masked rows output zero (see the
    module docstring for how that differs from the XLA reference path on
    left-pad rows only). O(T) memory — the probs tile never leaves VMEM.

    Block defaults are the v5e sweep winners (scripts/flash_tune.py,
    BASELINE.md round 4): K/V re-stream traffic scales with Tq/block_q,
    so big q blocks win — (1024, 512) is 2.1x the old (256, 256) at
    L=8192 and 1.3x at L=2048.
    """
    d = q.shape[-1]
    scale = float(scale) if scale is not None else 1.0 / (d ** 0.5)
    bq = min(block_q, _round_up(q.shape[2], 8))
    bk = min(block_k, _round_up(k.shape[2], 128))
    return _flash(q, k, v, key_mask, jnp.asarray(seed, jnp.int32),
                  scale, bool(causal), float(dropout_rate), (bq, bk),
                  bool(interpret))


def flash_attention_reference(q, k, v, key_mask=None, *, causal=False,
                              scale=None, dropout_rate: float = 0.0):
    """jnp parity implementation of the kernel's exact semantics
    (zero-output convention; dropout_rate must be 0 — the PRNG streams
    are kernel-internal)."""
    assert dropout_rate == 0.0
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = float(scale) if scale is not None else 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((b, 1, tq, tk), bool) if key_mask is None else \
        (key_mask > 0)[:, None, None, :]
    if causal:
        mask = jnp.logical_and(mask, jnp.tril(jnp.ones((tq, tk), bool)))
    s = jnp.where(mask, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(l > 0.0, p / jnp.maximum(l, 1e-37), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
