"""Fused Hawkes-intensity head (Pallas TPU).

The MAU/BiMAU intensity head (reference temporal.py:281-315) computes

    lam_raw[n, e] = sum_d sigmoid(x[n] @ Wd)[e*dh + d] * w[e, d]

The sigmoid activation has shape (B*H*T, E*dh) — for the flagship config
(B=512, H=8, T=31, E=64, dh=64) that is a 2.1 GB fp32 tensor that XLA
materializes in HBM on the forward AND backward pass. This kernel streams
row tiles through VMEM: matmul -> sigmoid -> per-event weighted reduce in
one pass, so only the (N, E) result ever reaches HBM. Backward recomputes
the tile and produces dx / dWd / dw the same way.

``intensity_raw`` (custom_vjp) returns the pre-softplus per-event weighted
sums; the scaled softplus + modulation stays in XLA (cheap, (N, E)-sized).
``intensity_raw_reference`` is the jnp parity implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_sum_matrix(num_events: int, dh: int) -> jnp.ndarray:
    """(E*dh, E) 0/1 selector: column block e sums to output e. Computed
    from iota inside the kernel (Mosaic-safe; no 3D reshapes)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_events * dh, num_events),
                                    0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (num_events * dh, num_events),
                                    1)
    return (rows // dh == cols).astype(jnp.float32)


def _fwd_kernel(x_ref, wd_ref, bd_ref, w_ref, out_ref, *,
                num_events: int, dh: int):
    x = x_ref[:]                                    # (bn, C)
    z = jax.lax.dot(x, wd_ref[:],
                    preferred_element_type=jnp.float32)   # (bn, E*dh)
    s = jax.nn.sigmoid(z + bd_ref[:][None, :])
    sw = s * w_ref[:][None, :]                      # w flattened (E*dh,)
    # In mixed-precision mode (bf16 inputs) the selector reduce also runs
    # with bf16 operands — the fast MXU path, with fp32 accumulation. In
    # fp32 mode everything stays exact.
    red = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    sel = _block_sum_matrix(num_events, dh).astype(red)
    out_ref[:] = jax.lax.dot(sw.astype(red), sel,
                             preferred_element_type=jnp.float32)


def _bwd_kernel(x_ref, wd_ref, bd_ref, w_ref, g_ref,
                dx_ref, dwd_ref, dbd_ref, dw_ref,
                dwd_acc, dbd_acc, dw_acc, *,
                num_events: int, dh: int, num_n: int):
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _init():
        dwd_acc[:] = jnp.zeros_like(dwd_acc)
        dbd_acc[:] = jnp.zeros_like(dbd_acc)
        dw_acc[:] = jnp.zeros_like(dw_acc)

    x = x_ref[:]
    z = jax.lax.dot(x, wd_ref[:], preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(z + bd_ref[:][None, :])      # (bn, E*dh)
    g = g_ref[:]                                    # (bn, E) upstream grad
    # d lam_raw / d s = w ; broadcast g over dh via the 0/1 selector
    # (e-major flattened layout; avoids Mosaic-unsupported 3D reshapes);
    # bf16 fast path only in mixed-precision mode (see forward kernel)
    red = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    sel = _block_sum_matrix(num_events, dh).astype(red)
    g_full = jax.lax.dot_general(
        g.astype(red), sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (bn, E*dh)
    ds = g_full * w_ref[:][None, :]
    dz = ds * s * (1.0 - s)
    dx_ref[:] = jax.lax.dot_general(
        dz.astype(x.dtype), wd_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwd_acc[:] += jax.lax.dot_general(
        x, dz.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbd_acc[:] += jnp.sum(dz, axis=0, keepdims=True)
    dw_acc[:] += jnp.sum(g_full * s, axis=0, keepdims=True)

    @pl.when(ni == num_n - 1)
    def _store():
        dwd_ref[:] = dwd_acc[:]
        dbd_ref[:] = dbd_acc[:]
        dw_ref[:] = dw_acc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def intensity_raw(x, wd, bd, w, block_n=1024):
    """x: (N, C); wd: (C, E*dh); bd: (E*dh,); w: (E, dh) readout.
    Returns (N, E) pre-softplus weighted sums."""
    out, _ = _int_fwd(x, wd, bd, w, block_n)
    return out


def _pad_rows(x, block_n):
    n = x.shape[0]
    np_ = _round_up(n, block_n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    return x, n


def _int_fwd(x, wd, bd, w, block_n):
    e, dh = w.shape
    xp, n = _pad_rows(x, block_n)
    np_ = xp.shape[0]
    wf = w.reshape(e * dh)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_events=e, dh=dh),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, x.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec(wd.shape, lambda i: (0, 0)),
            pl.BlockSpec(bd.shape, lambda i: (0,)),
            pl.BlockSpec(wf.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_n, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wd, bd, wf)
    return out[:n], (x, wd, bd, w)


def _int_bwd(block_n, res, g):
    x, wd, bd, w = res
    e, dh = w.shape
    c = x.shape[1]
    # backward keeps z/s/g_full/ds/dz tiles + weight accumulators live in
    # VMEM simultaneously; the raised vmem_limit (v5e VMEM >> the 16MB
    # scoped default) lets the tiles stay forward-sized
    block_n = min(block_n, 512)
    xp, n = _pad_rows(x, block_n)
    gp, _ = _pad_rows(g, block_n)
    np_ = xp.shape[0]
    num_n = np_ // block_n
    wf = w.reshape(e * dh)
    dx, dwd, dbd, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, num_events=e, dh=dh, num_n=num_n),
        grid=(num_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec(wd.shape, lambda i: (0, 0)),
            pl.BlockSpec(bd.shape, lambda i: (0,)),
            pl.BlockSpec(wf.shape, lambda i: (0,)),
            pl.BlockSpec((block_n, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec(wd.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, e * dh), lambda i: (0, 0)),
            pl.BlockSpec((1, e * dh), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, c), jnp.float32),
            jax.ShapeDtypeStruct(wd.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, e * dh), jnp.float32),
            jax.ShapeDtypeStruct((1, e * dh), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM(wd.shape, jnp.float32),
                        pltpu.VMEM((1, e * dh), jnp.float32),
                        pltpu.VMEM((1, e * dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wd, bd, wf, gp)
    # dw: sum over dh happened per flattened column; reshape (E, dh)
    dw_out = dw[0].reshape(e, dh)
    return (dx[:n].astype(x.dtype), dwd.astype(wd.dtype),
            dbd[0].astype(bd.dtype), dw_out.astype(w.dtype))


intensity_raw.defvjp(lambda x, wd, bd, w, bn: _int_fwd(x, wd, bd, w, bn),
                     _int_bwd)


def intensity_raw_reference(x, wd, bd, w):
    """Pure-jnp parity implementation (materializes the (N, E*dh) sigmoid)."""
    e, dh = w.shape
    s = jax.nn.sigmoid(jnp.einsum("nc,cd->nd", x, wd,
                                  preferred_element_type=jnp.float32) + bd)
    return jnp.einsum("ned,ed->ne", s.reshape(-1, e, dh), w,
                      preferred_element_type=jnp.float32)
