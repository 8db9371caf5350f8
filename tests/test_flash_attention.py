"""Parity tests for the blockwise (flash) long-context attention kernel.

The kernel runs in interpret mode on the suite's CPU platform; its exact
semantics are pinned by ``flash_attention_reference`` (same file) and its
agreement with the production XLA path (nn/attention.py::attention_probs)
is locked for every row with >= 1 visible key — the only divergence is
the documented zero-output-vs-uniform convention on fully-masked rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.kernels.flash_attention import (
    flash_attention, flash_attention_reference)
from easydgl_tpu.nn.attention import attention_probs


def _data(rng, b=2, h=2, tq=48, tk=48, d=16, pad_prefix=True):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    q, k, v = mk(b, h, tq, d), mk(b, h, tk, d), mk(b, h, tk, d)
    km = (rng.rand(b, tk) > 0.25).astype(np.float32)
    if pad_prefix:  # left-padded sequences, like the real loader
        km[:, :5] = 0.0
        km[:, -3:] = 1.0
    return q, k, v, jnp.asarray(km)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(rng, causal):
    q, k, v, km = _data(rng)
    out = flash_attention(q, k, v, km, causal=causal, block_q=16,
                          block_k=128, interpret=True)
    ref = flash_attention_reference(q, k, v, km, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla_path_on_visible_rows(rng, causal):
    """Exact agreement with the production attention_probs path wherever a
    row has at least one visible key."""
    q, k, v, km = _data(rng)
    out = flash_attention(q, k, v, km, causal=causal, block_q=16,
                          block_k=128, interpret=True)
    probs = attention_probs(q, k, key_mask=km, causal=causal)
    ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    vis = (km[:, None, None, :] > 0)
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        vis = jnp.logical_and(vis, jnp.tril(jnp.ones((tq, tk), bool)))
    has_key = np.asarray(jnp.any(vis, axis=-1))  # (B, 1, Tq)
    has_key = np.broadcast_to(has_key[..., None], out.shape)
    np.testing.assert_allclose(np.asarray(out)[has_key],
                               np.asarray(ref)[has_key],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_reference(rng, causal):
    q, k, v, km = _data(rng, tq=32, tk=32, d=8)
    co = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss_k(q_, k_, v_):
        o = flash_attention(q_, k_, v_, km, causal=causal, block_q=16,
                            block_k=128, interpret=True)
        return jnp.sum(o * co)

    def loss_r(q_, k_, v_):
        o = flash_attention_reference(q_, k_, v_, km, causal=causal)
        return jnp.sum(o * co)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_flash_unaligned_lengths(rng):
    """T not a multiple of the block sizes (pad path), D not 128."""
    q, k, v, km = _data(rng, tq=31, tk=31, d=24)
    out = flash_attention(q, k, v, km, causal=True, block_q=16,
                          block_k=128, interpret=True)
    ref = flash_attention_reference(q, k, v, km, causal=True)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_rectangular_queries(rng):
    """Tq != Tk (e.g. gathered prediction rows attending over full keys)."""
    q, k, v, km = _data(rng, tq=8, tk=48, d=16)
    q = q[:, :, :8]
    out = flash_attention(q, k, v, km, causal=False, block_q=8,
                          block_k=128, interpret=True)
    ref = flash_attention_reference(q, k, v, km, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_dropout_statistics(rng):
    """Dropout: keep fraction ~= 1-rate, kept entries rescaled, fwd/bwd
    deterministic in the seed."""
    rate = 0.4
    q, k, v, km = _data(rng, b=2, h=2, tq=64, tk=64, d=16,
                        pad_prefix=False)
    km = jnp.ones_like(km)
    args = dict(causal=False, dropout_rate=rate, block_q=32, block_k=128,
                interpret=True)
    o1 = flash_attention(q, k, v, km, seed=7, **args)
    o2 = flash_attention(q, k, v, km, seed=7, **args)
    o3 = flash_attention(q, k, v, km, seed=8, **args)
    base = flash_attention(q, k, v, km, causal=False, block_q=32,
                           block_k=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # E[dropped probs] == probs: block mean should be close to baseline
    assert abs(float(jnp.mean(o1) - jnp.mean(base))) < 0.05

    def loss(q_):
        return jnp.sum(flash_attention(q_, k, v, km, seed=7, **args) ** 2)

    g1, g2 = jax.grad(loss)(q), jax.grad(loss)(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.all(np.isfinite(np.asarray(g1)))


def test_flash_dropout_grads_match_autodiff_of_fwd(rng):
    """The custom backward must be the exact VJP of the dropped forward:
    compare against finite differences through the kernel forward."""
    rate = 0.3
    q, k, v, km = _data(rng, b=1, h=1, tq=16, tk=16, d=8,
                        pad_prefix=False)
    args = dict(causal=True, dropout_rate=rate, block_q=16, block_k=128,
                interpret=True, seed=3)

    def f(q_):
        return float(jnp.sum(flash_attention(q_, k, v, km, **args)))

    g = jax.grad(lambda q_: jnp.sum(
        flash_attention(q_, k, v, km, **args)))(q)
    eps = 1e-3
    idxs = [(0, 0, 3, 2), (0, 0, 10, 5), (0, 0, 15, 0)]
    for idx in idxs:
        dq = np.zeros(q.shape, np.float32)
        dq[idx] = eps
        fd = (f(q + dq) - f(q - dq)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=2e-2, atol=2e-3)
