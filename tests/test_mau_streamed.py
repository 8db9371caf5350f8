"""Streamed Pallas MAU/BiMAU (kernels/mau_streamed.py) vs the dense XLA
module path AND the blocked scan schedule: values + gradients, causal and
bidirectional, dead rows, non-divisible tile sizes (interpret mode — the
HLO interpreter stands in for Mosaic on CPU, same contract as
tests/test_flash_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.nn.temporal import MAU

B, H, T, C, E = 2, 2, 19, 16, 3


def _inputs(rng, t=T, b=B):
    q_in = jnp.asarray(rng.randn(b, t, C).astype(np.float32))
    k_in = jnp.asarray(rng.randn(b, t, C).astype(np.float32))
    km = np.ones((b, t), np.float32)
    km[0, :7] = 0.0          # left padding
    km[1, :] = 0.0           # an entirely dead example (uniform fallback)
    iv = jnp.asarray(np.abs(rng.randn(b, t)).astype(np.float32))
    oh = np.zeros((b, t, E), np.float32)
    oh[np.arange(b)[:, None], np.arange(t)[None],
       rng.randint(0, E, (b, t))] = 1.0
    return q_in, k_in, jnp.asarray(km), iv, jnp.asarray(oh)


def _mods(causal, diag_reset, rate=0.0):
    kw = dict(num_units=C, num_heads=H, num_events=E, dropout_rate=rate,
              causal_default=causal, diag_reset=diag_reset)
    return (MAU(intensity_impl="xla", **kw),
            MAU(intensity_impl="streamed", **kw))


@pytest.mark.parametrize("causal,diag_reset",
                         [(True, False),    # CTSMA's MAU
                          (False, True)])   # EasyDGL's BiMAU semantics
def test_streamed_matches_xla_values_and_grads(rng, causal, diag_reset):
    q_in, k_in, km, iv, oh = _inputs(rng)
    m_x, m_s = _mods(causal, diag_reset)
    params = m_x.init(jax.random.key(0), q_in, k_in, km, iv, oh,
                      deterministic=True)
    co = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    cl = jnp.asarray(rng.randn(B, H, T, E).astype(np.float32))

    ox, lx = m_x.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    os_, ls = m_s.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ox),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lx),
                               rtol=1e-5, atol=1e-5)

    def loss(mod, p, q_, k_):
        out, lam = mod.apply(p, q_, k_, km, iv, oh, deterministic=True)
        return jnp.sum(out * co) + jnp.sum(lam * cl)

    gx = jax.grad(lambda p, q_, k_: loss(m_x, p, q_, k_),
                  argnums=(0, 1, 2))(params, q_in, k_in)
    gs = jax.grad(lambda p, q_, k_: loss(m_s, p, q_, k_),
                  argnums=(0, 1, 2))(params, q_in, k_in)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gs)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))


def test_streamed_matches_blocked_long(rng):
    """The two long-context engines agree with each other at a length
    spanning several (non-divisible) tiles, values + input grads."""
    t = 70
    q_in, k_in, km, iv, oh = _inputs(rng, t=t)
    kw = dict(num_units=C, num_heads=H, num_events=E, dropout_rate=0.0,
              causal_default=False, diag_reset=True)
    m_b = MAU(intensity_impl="blocked", blocked_block_k=32, **kw)
    m_s = MAU(intensity_impl="streamed", **kw)
    params = m_b.init(jax.random.key(0), q_in, k_in, km, iv, oh,
                      deterministic=True)
    ob, lb = m_b.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    os_, ls = m_s.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ob),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)

    def loss(mod, q_, k_):
        out, lam = mod.apply(params, q_, k_, km, iv, oh,
                             deterministic=True)
        return jnp.sum(out) + jnp.sum(lam * lam)

    gb = jax.grad(lambda q_, k_: loss(m_b, q_, k_),
                  argnums=(0, 1))(q_in, k_in)
    gs = jax.grad(lambda q_, k_: loss(m_s, q_, k_),
                  argnums=(0, 1))(q_in, k_in)
    for a, b_ in zip(gs, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_streamed_dropout_deterministic_and_finite(rng):
    """rate > 0: the streamed stream (TPU PRNG / interpret hash) differs
    from every other impl's (documented) but must be deterministic in the
    rng and keep grads finite, with the keep-mask identical across the
    value and grad passes (no mask mismatch => unbiased grads)."""
    q_in, k_in, km, iv, oh = _inputs(rng)
    kw = dict(num_units=C, num_heads=H, num_events=E, dropout_rate=0.3,
              causal_default=False, diag_reset=True)
    m_s = MAU(intensity_impl="streamed", **kw)
    params = m_s.init(jax.random.key(0), q_in, k_in, km, iv, oh,
                      deterministic=True)

    def run(key):
        return m_s.apply(params, q_in, k_in, km, iv, oh,
                         deterministic=False, rngs={"dropout": key})[0]

    o1 = run(jax.random.key(7))
    o2 = run(jax.random.key(7))
    o3 = run(jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))

    g = jax.grad(lambda q_: jnp.sum(m_s.apply(
        params, q_, k_in, km, iv, oh, deterministic=False,
        rngs={"dropout": jax.random.key(7)})[0]))(q_in)
    assert np.isfinite(np.asarray(g)).all()


def test_ctsma_long_context_train_step():
    """CTSMA-LC preset wiring at L=512 on CPU: loss + grads finite for
    the causal self-modulating model — the regressive counterpart of
    test_mau_blocked.py::test_easydgl_long_context_train_step. Runs the
    any-backend blocked engine (use_pallas unset — full-model Pallas is
    accelerator-only); the streamed engine itself is locked by the
    module-level tests above and measured on-chip (BASELINE.md)."""
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import compute_loss

    cfg = preset("CTSMA-LC").replace(
        num_items=60, seqslen=511, num_units=16, num_heads=2,
        num_events=E, batch_size=2, compute_dtype="float32")
    ds = synthetic_split(num_rows=4, num_items=60, seqslen=511, seed=11)
    table = synthetic_mark_table(60, E, seed=1)
    model = build_model(cfg)
    ld = BatchLoader(ds, data_mode=model.data_mode, batch_size=2,
                     masklen=cfg.masklen, is_training=True, seed=5,
                     mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    features = {k: jnp.asarray(v) for k, v in features.items()}
    labels = jnp.asarray(labels)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        features, is_training=True)
    loss, grads = jax.value_and_grad(
        lambda p: compute_loss(model, p, features, labels,
                               {"dropout": jax.random.key(2)}))(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))


def test_model_level_streamed_wiring():
    """attention_impl='flash' + use_pallas selects the streamed engine for
    the MAU family (models/base.py::mau_impl)."""
    from easydgl_tpu.config import preset
    from easydgl_tpu.models.base import mau_impl
    cfg = preset("EasyDGL").replace(attention_impl="flash",
                                    use_pallas=True)
    assert mau_impl(cfg) == "streamed"
    assert mau_impl(cfg.replace(use_pallas=False)) == "blocked"
    assert mau_impl(cfg.replace(attention_impl="xla",
                                use_pallas=True)) == "fused"
