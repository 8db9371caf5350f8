"""Fused full-catalog softmax scoring (Pallas TPU).

THE hot op of the framework (SURVEY.md §7.3): every train step scores
(B * masklen) hidden rows against the whole catalog via the tied embedding
table (reference EasyDGL.py:149-150 — (N, C) @ (V, C)^T with V = 17772) and
feeds a softmax loss. Materializing the (N, V) logits costs ~218 MB of HBM
traffic each way, twice more in backward. These kernels stream vocab tiles
through VMEM instead:

* forward: one pass computing ``logsumexp`` (online max/sum, flash-style)
  and the label logit — logits never leave VMEM;
* backward: two recompute passes producing d_hidden (vocab as reduction)
  and (d_table, d_bias) (rows as reduction), using
  ``dlogits = dlse * softmax + dlabel * onehot``.

``catalog_nll`` wraps them in a custom_vjp; ``catalog_nll_reference`` is the
pure-jnp parity implementation (tested in interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30
# d_hidden accumulator budget for the fused single-recompute backward;
# larger N falls back to the two-pass kernels
_FUSED_BWD_VMEM_BYTES = 24 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ forward
def _fwd_kernel(h_ref, t_ref, b_ref, lab_ref, lse_ref, ll_ref,
                m_scr, l_scr, ll_scr, *, block_v: int, num_v: int):
    vj = pl.program_id(1)

    @pl.when(vj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        ll_scr[:] = jnp.zeros_like(ll_scr)

    h = h_ref[:]                                   # (bn, C)
    t = t_ref[:]                                   # (bv, C)
    s = jax.lax.dot_general(h, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + b_ref[:][None, :]                      # (bn, bv)

    # online logsumexp
    m_prev, l_prev = m_scr[:], l_scr[:]            # (bn, 1)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p_sum = jnp.sum(jnp.exp(s - m_next), axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_prev * alpha + p_sum

    # label logit: the label falls in exactly one vocab tile
    labels = lab_ref[:]                            # (bn, 1) int32 global ids
    local = labels - vj * block_v
    bn, bv = s.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    picked = jnp.sum(jnp.where(cols == local, s, 0.0), axis=1, keepdims=True)
    ll_scr[:] = ll_scr[:] + picked

    @pl.when(vj == num_v - 1)
    def _store():
        lse_ref[:] = m_scr[:] + jnp.log(l_scr[:])
        ll_ref[:] = ll_scr[:]


def _fwd_call(hidden, table, bias, labels, *, block_n: int, block_v: int):
    n, c = hidden.shape
    v = table.shape[0]
    num_n, num_v = n // block_n, v // block_v
    lse, ll = pl.pallas_call(
        functools.partial(_fwd_kernel, block_v=block_v, num_v=num_v),
        grid=(num_n, num_v),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, c), lambda i, j: (j, 0)),
            pl.BlockSpec((block_v,), lambda i, j: (j,)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_n, 1), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hidden, table, bias, labels)
    return lse[:, 0], ll[:, 0]


# ----------------------------------------------------------------- backward
def _bwd_fused_kernel(h_ref, t_ref, b_ref, lab_ref, lse_ref, dl_ref,
                      dll_ref, dh_ref, dt_ref, db_ref,
                      dh_acc, t_acc, b_acc, *,
                      block_n: int, block_v: int, num_n: int, num_v: int):
    """One recompute pass emitting ALL THREE grads.

    Grid (num_v OUTER, num_n INNER): d_table/d_bias accumulate across the
    inner row loop in block-sized scratch (as the old table kernel did),
    while d_hidden accumulates across the OUTER vocab loop in a full
    (N_pad, C) scratch — N_pad*C*4 bytes is small (6.3 MB at the flagship
    shape) because N = B*masklen. Each (vj, ni) tile recomputes the score
    tile ONCE and feeds both matmuls, saving a whole recompute pass
    (~58 GFLOP/step) + one full stream of the operands vs the previous
    two-kernel backward. dh blocks are written every visit; the final
    vocab pass overwrites them with the complete sums.
    """
    vj, ni = pl.program_id(0), pl.program_id(1)

    @pl.when(ni == 0)
    def _init_tb():
        t_acc[:] = jnp.zeros_like(t_acc)
        b_acc[:] = jnp.zeros_like(b_acc)

    h = h_ref[:]
    t = t_ref[:]
    s = jax.lax.dot_general(h, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + b_ref[:][None, :]
    p = jnp.exp(s - lse_ref[:])                    # softmax tile (bn, bv)

    labels = lab_ref[:]
    local = labels - vj * block_v
    bn, bv = s.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    onehot = (cols == local).astype(jnp.float32)
    g = dl_ref[:] * p + dll_ref[:] * onehot        # dlogits tile

    sl = pl.dslice(ni * block_n, block_n)
    contrib = jax.lax.dot(g.astype(t.dtype), t,
                          preferred_element_type=jnp.float32)

    @pl.when(vj == 0)
    def _dh_first():
        dh_acc[sl, :] = contrib

    @pl.when(vj > 0)
    def _dh_rest():
        dh_acc[sl, :] += contrib

    dh_ref[:] = dh_acc[sl, :]

    t_acc[:] += jax.lax.dot_general(g.astype(h.dtype), h,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    b_acc[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(ni == num_n - 1)
    def _store_tb():
        dt_ref[:] = t_acc[:]
        db_ref[:] = b_acc[:]


def _bwd_hidden_kernel(h_ref, t_ref, b_ref, lab_ref, lse_ref, dl_ref,
                       dll_ref, dh_ref, acc, *, block_v: int, num_v: int):
    vj = pl.program_id(1)

    @pl.when(vj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    t = t_ref[:]
    s = jax.lax.dot_general(h, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + b_ref[:][None, :]
    p = jnp.exp(s - lse_ref[:])                    # softmax tile (bn, bv)

    labels = lab_ref[:]
    local = labels - vj * block_v
    bn, bv = s.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    onehot = (cols == local).astype(jnp.float32)

    g = dl_ref[:] * p + dll_ref[:] * onehot        # dlogits tile
    acc[:] += jax.lax.dot(g.astype(t.dtype), t,
                          preferred_element_type=jnp.float32)

    @pl.when(vj == num_v - 1)
    def _store():
        dh_ref[:] = acc[:]


def _bwd_table_kernel(h_ref, t_ref, b_ref, lab_ref, lse_ref, dl_ref,
                      dll_ref, dt_ref, db_ref, t_acc, b_acc,
                      *, block_v: int, num_n: int):
    ni = pl.program_id(1)
    vj = pl.program_id(0)

    @pl.when(ni == 0)
    def _init():
        t_acc[:] = jnp.zeros_like(t_acc)
        b_acc[:] = jnp.zeros_like(b_acc)

    h = h_ref[:]
    t = t_ref[:]
    s = jax.lax.dot_general(h, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + b_ref[:][None, :]
    p = jnp.exp(s - lse_ref[:])

    labels = lab_ref[:]
    local = labels - vj * block_v
    bn, bv = s.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    onehot = (cols == local).astype(jnp.float32)

    g = dl_ref[:] * p + dll_ref[:] * onehot        # (bn, bv)
    t_acc[:] += jax.lax.dot_general(g.astype(h.dtype), h,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    b_acc[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(ni == num_n - 1)
    def _store():
        dt_ref[:] = t_acc[:]
        db_ref[:] = b_acc[:]


# ------------------------------------------------------------------ wrapper
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def catalog_nll(hidden, table, bias, labels, block_n=256, block_v=2048):
    """(lse, label_logit) per row, computed tile-streamed.

    hidden (N, C) f32; table (V, C); bias (V,); labels (N,) int32.
    Pads N and V internally to tile multiples (padding vocab columns get
    bias=NEG so they contribute nothing to the logsumexp).
    """
    out, _ = _catalog_fwd(hidden, table, bias, labels, block_n, block_v)
    return out


def _pad(hidden, table, bias, labels, block_n, block_v):
    n, c = hidden.shape
    v = table.shape[0]
    np_, vp = _round_up(n, block_n), _round_up(v, block_v)
    if np_ != n:
        hidden = jnp.pad(hidden, ((0, np_ - n), (0, 0)))
        labels = jnp.pad(labels, (0, np_ - n))
    if vp != v:
        table = jnp.pad(table, ((0, vp - v), (0, 0)))
        bias = jnp.pad(bias, (0, vp - v), constant_values=NEG)
    return hidden, table, bias, labels, n, v


def _catalog_fwd(hidden, table, bias, labels, block_n, block_v):
    hp, tp, bp, lp, n, v = _pad(hidden, table, bias, labels, block_n, block_v)
    lab2 = lp.astype(jnp.int32)[:, None]
    lse, ll = _fwd_call(hp, tp, bp, lab2, block_n=block_n, block_v=block_v)
    out = (lse[:n], ll[:n])
    return out, (hidden, table, bias, labels, lse[:n], ll[:n])


def _catalog_bwd(block_n, block_v, res, grads):
    hidden, table, bias, labels, lse_p, _ = res
    dlse, dll = grads
    n, c = hidden.shape
    v = table.shape[0]
    # backward keeps a (block_v, C) accumulator + score tiles resident in
    # VMEM simultaneously; vmem_limit below is raised past the 16MB scoped
    # default (v5e VMEM is far larger), so tiles stay near forward-sized
    block_n = min(block_n, 512)
    block_v = min(block_v, 2048)
    hp, tp, bp, lp, _, _ = _pad(hidden, table, bias, labels, block_n, block_v)
    np_, vp = hp.shape[0], tp.shape[0]
    num_n, num_v = np_ // block_n, vp // block_v
    lab2 = lp.astype(jnp.int32)[:, None]
    lse2 = jnp.pad(lse_p, (0, np_ - n))[:, None]
    dlse2 = jnp.pad(dlse, (0, np_ - n))[:, None]
    dll2 = jnp.pad(dll, (0, np_ - n))[:, None]

    # fused single-recompute backward when the full (N_pad, C) d_hidden
    # accumulator fits comfortably in VMEM (training N = B*masklen is
    # small; huge-N callers fall back to the two-pass kernels below)
    if np_ * c * 4 <= _FUSED_BWD_VMEM_BYTES:
        dh, dt, db = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, block_n=block_n,
                              block_v=block_v, num_n=num_n, num_v=num_v),
            grid=(num_v, num_n),
            in_specs=[
                pl.BlockSpec((block_n, c), lambda j, i: (i, 0)),
                pl.BlockSpec((block_v, c), lambda j, i: (j, 0)),
                pl.BlockSpec((block_v,), lambda j, i: (j,)),
                pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_n, c), lambda j, i: (i, 0)),
                pl.BlockSpec((block_v, c), lambda j, i: (j, 0)),
                pl.BlockSpec((1, block_v), lambda j, i: (0, j)),
            ],
            out_shape=[jax.ShapeDtypeStruct((np_, c), jnp.float32),
                       jax.ShapeDtypeStruct((vp, c), jnp.float32),
                       jax.ShapeDtypeStruct((1, vp), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((np_, c), jnp.float32),
                            pltpu.VMEM((block_v, c), jnp.float32),
                            pltpu.VMEM((1, block_v), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(hp, tp, bp, lab2, lse2, dlse2, dll2)
        return (dh[:n].astype(hidden.dtype), dt[:v].astype(table.dtype),
                db[0, :v].astype(bias.dtype), None)

    dh = pl.pallas_call(
        functools.partial(_bwd_hidden_kernel, block_v=block_v, num_v=num_v),
        grid=(num_n, num_v),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, c), lambda i, j: (j, 0)),
            pl.BlockSpec((block_v,), lambda i, j: (j,)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hp, tp, bp, lab2, lse2, dlse2, dll2)

    dt, db = pl.pallas_call(
        functools.partial(_bwd_table_kernel, block_v=block_v, num_n=num_n),
        grid=(num_v, num_n),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda j, i: (i, 0)),
            pl.BlockSpec((block_v, c), lambda j, i: (j, 0)),
            pl.BlockSpec((block_v,), lambda j, i: (j,)),
            pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda j, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_v, c), lambda j, i: (j, 0)),
            pl.BlockSpec((1, block_v), lambda j, i: (0, j)),
        ],
        out_shape=[jax.ShapeDtypeStruct((vp, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, vp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_v, c), jnp.float32),
                        pltpu.VMEM((1, block_v), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hp, tp, bp, lab2, lse2, dlse2, dll2)

    return (dh[:n].astype(hidden.dtype), dt[:v].astype(table.dtype),
            db[0, :v].astype(bias.dtype), None)


catalog_nll.defvjp(lambda h, t, b, l, bn, bv: _catalog_fwd(h, t, b, l, bn, bv),
                   _catalog_bwd)


# ---------------------------------------------------------------- reference
def catalog_nll_reference(hidden, table, bias, labels
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp parity implementation (materializes logits)."""
    logits = jnp.einsum("nc,vc->nv", hidden, table,
                        preferred_element_type=jnp.float32) + bias
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32),
                             axis=1)[:, 0]
    return lse, ll
