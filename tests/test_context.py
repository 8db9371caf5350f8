"""Ring (CP) and Ulysses (SP) attention vs the dense production path.

Runs on the suite's forced 8-device CPU platform (SURVEY.md §4c): a
(data=2, seq=4) mesh, sequence sharded 4-way. Equality covers values AND
gradients, including left-pad rows (the ring reproduces the TF finite
-2^32+1 mask semantics bit-for-bit, uniform fallback included).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from easydgl_tpu.dist.context import (ring_attention_spmd,
                                      ulysses_attention_spmd)
from easydgl_tpu.nn.attention import attention_probs


def _mesh(eight_devices):
    return Mesh(np.asarray(eight_devices).reshape(2, 4), ("data", "seq"))


def _data(rng, b=4, h=4, t=32, d=8):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    q, k, v = mk(b, h, t, d), mk(b, h, t, d), mk(b, h, t, d)
    km = (rng.rand(b, t) > 0.25).astype(np.float32)
    km[:, :6] = 0.0   # left padding: rows 0..5 are fully masked for
    km[:, -2:] = 1.0  # causal queries in the pad region (uniform fallback)
    return q, k, v, jnp.asarray(km)


def _dense(q, k, v, km, causal):
    probs = attention_probs(q, k, key_mask=km, causal=causal)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(rng, eight_devices, causal):
    mesh = _mesh(eight_devices)
    q, k, v, km = _data(rng)
    out = ring_attention_spmd(q, k, v, km, mesh, seq_axis="seq",
                              data_axis="data", causal=causal)
    ref = _dense(q, k, v, km, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_dense(rng, eight_devices, causal):
    mesh = _mesh(eight_devices)
    q, k, v, km = _data(rng)
    co = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss_ring(q_, k_, v_):
        o = ring_attention_spmd(q_, k_, v_, km, mesh, seq_axis="seq",
                                data_axis="data", causal=causal)
        return jnp.sum(o * co)

    def loss_dense(q_, k_, v_):
        return jnp.sum(_dense(q_, k_, v_, km, causal) * co)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_dense(rng, eight_devices, causal):
    mesh = _mesh(eight_devices)
    q, k, v, km = _data(rng)
    out = ulysses_attention_spmd(q, k, v, km, mesh, seq_axis="seq",
                                 data_axis="data", causal=causal)
    ref = _dense(q, k, v, km, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_grads_match_dense(rng, eight_devices):
    mesh = _mesh(eight_devices)
    q, k, v, km = _data(rng)
    co = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss_u(q_, k_, v_):
        o = ulysses_attention_spmd(q_, k_, v_, km, mesh, seq_axis="seq",
                                   data_axis="data", causal=True)
        return jnp.sum(o * co)

    def loss_dense(q_, k_, v_):
        return jnp.sum(_dense(q_, k_, v_, km, True) * co)

    gu = jax.grad(loss_u, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gu, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_ring_seq_only_mesh(rng, eight_devices):
    """cp across ALL devices (no data axis) also works."""
    mesh = Mesh(np.asarray(eight_devices), ("seq",))
    q, k, v, km = _data(rng, b=2, t=64)
    out = ring_attention_spmd(q, k, v, km, mesh, seq_axis="seq",
                              causal=True)
    ref = _dense(q, k, v, km, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_dropout_statistics(rng, eight_devices):
    mesh = _mesh(eight_devices)
    q, k, v, km = _data(rng)
    km = jnp.ones_like(km)
    kw = dict(seq_axis="seq", data_axis="data", causal=False,
              dropout_rate=0.4)
    o1 = ring_attention_spmd(q, k, v, km, mesh, seed=5, **kw)
    o2 = ring_attention_spmd(q, k, v, km, mesh, seed=5, **kw)
    o3 = ring_attention_spmd(q, k, v, km, mesh, seed=6, **kw)
    base = ring_attention_spmd(q, k, v, km, mesh, seq_axis="seq",
                               data_axis="data", causal=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    assert abs(float(jnp.mean(o1) - jnp.mean(base))) < 0.05
