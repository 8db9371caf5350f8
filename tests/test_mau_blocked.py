"""Blocked single-chip MAU/BiMAU (kernels/mau_blocked.py) vs the dense XLA
module path: values AND gradients, causal and bidirectional, including
dead (fully-masked) rows, non-divisible block sizes, and the model-level
wiring (EasyDGL/CTSMA under attention_impl='flash')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.config import preset
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
    oh[np.arange(b)[:, None], np.arange(t)[None], rng.randint(0, E, (b, t))] = 1.0
    return q_in, k_in, jnp.asarray(km), iv, jnp.asarray(oh)


def _pair(causal, diag_reset, block_k, rate=0.0):
    kw = dict(num_units=C, num_heads=H, num_events=E, dropout_rate=rate,
              causal_default=causal, diag_reset=diag_reset)
    return (MAU(intensity_impl="xla", **kw),
            MAU(intensity_impl="blocked", blocked_block_k=block_k, **kw))


@pytest.mark.parametrize("causal,diag_reset,block_k",
                         [(True, False, 8),    # CTSMA's MAU
                          (False, True, 8),    # EasyDGL's BiMAU semantics
                          (True, False, 5),    # bk does not divide T
                          (False, False, 64)])  # single block (bk > T)
def test_blocked_matches_xla_values_and_grads(rng, causal, diag_reset,
                                              block_k):
    q_in, k_in, km, iv, oh = _inputs(rng)
    m_x, m_b = _pair(causal, diag_reset, block_k)
    params = m_x.init(jax.random.key(0), q_in, k_in, km, iv, oh,
                      deterministic=True)
    co = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    cl = jnp.asarray(rng.randn(B, H, T, E).astype(np.float32))

    def loss(mod, p, q_, k_):
        out, lam = mod.apply(p, q_, k_, km, iv, oh, deterministic=True)
        return jnp.sum(out * co) + jnp.sum(lam * cl)

    for mod in (m_x, m_b):  # identical param trees
        out, lam = mod.apply(params, q_in, k_in, km, iv, oh,
                             deterministic=True)
        assert out.shape == (B, T, C) and lam.shape == (B, H, T, E)

    ox, lx = m_x.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    ob, lb = m_b.apply(params, q_in, k_in, km, iv, oh, deterministic=True)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(ox),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lx),
                               rtol=1e-5, atol=1e-5)

    gx = jax.grad(lambda p, q_, k_: loss(m_x, p, q_, k_),
                  argnums=(0, 1, 2))(params, q_in, k_in)
    gb = jax.grad(lambda p, q_, k_: loss(m_b, p, q_, k_),
                  argnums=(0, 1, 2))(params, q_in, k_in)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))


def test_blocked_dropout_deterministic_and_finite(rng):
    """rate > 0: the blocked stream differs from nn.Dropout's (documented),
    but must be deterministic in the rng and keep grads finite."""
    q_in, k_in, km, iv, oh = _inputs(rng)
    _, m_b = _pair(False, True, 8, rate=0.3)
    params = m_b.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      q_in, k_in, km, iv, oh, deterministic=True)

    def loss(p, r):
        out, lam = m_b.apply(p, q_in, k_in, km, iv, oh, deterministic=False,
                             rngs={"dropout": r})
        return jnp.sum(out ** 2) + jnp.sum(lam)

    r = jax.random.key(7)
    l1, l2 = loss(params, r), loss(params, r)
    assert float(l1) == float(l2)
    g = jax.grad(loss)(params, r)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(g))


def _model_pair(name, **kw):
    base = dict(num_items=40, num_units=16, num_heads=2, num_blocks=2,
                num_events=E, batch_size=4, hidden_dropout_rate=0.0,
                attention_probs_dropout_rate=0.0, ct_reg=1e-3)
    base.update(kw)
    return (preset(name).replace(attention_impl="xla", **base),
            preset(name).replace(attention_impl="flash", mau_block_k=8,
                                 **base))


@pytest.mark.parametrize("name", ["EasyDGL", "CTSMA"])
def test_model_flash_train_step_matches_xla(rng, name):
    """Full-model loss + grads: attention_impl='flash' (-> blocked MAU)
    equals the dense path for both self-modulating models, TPP
    regularizer included."""
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import compute_loss

    cfg_x, cfg_b = _model_pair(name, seqslen=12)
    mode = "mau" if name == "EasyDGL" else "regressive"
    ds = synthetic_split(num_rows=8, num_items=40, seqslen=12, seed=3)
    table = synthetic_mark_table(40, E, seed=1)
    ld = BatchLoader(ds, data_mode=mode, batch_size=4, masklen=3,
                     is_training=True, seed=5, mark_table=table,
                     needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    features = {k: jnp.asarray(v) for k, v in features.items()}
    labels = jnp.asarray(labels)

    m_x, m_b = build_model(cfg_x), build_model(cfg_b)
    params = m_x.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      features, is_training=True)

    def loss_fn(model):
        return lambda p: compute_loss(model, p, features, labels,
                                      {"dropout": jax.random.key(2)})

    lx, gx = jax.value_and_grad(loss_fn(m_x))(params)
    lb, gb = jax.value_and_grad(loss_fn(m_b))(params)
    np.testing.assert_allclose(float(lb), float(lx), rtol=1e-5)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=str(pa))


def test_easydgl_long_context_train_step(rng):
    """EasyDGL-LC wiring at L=512 on CPU (64x the reference ceiling is
    exercised on-chip by bench.py's longctx phase; this locks the
    TRAIN-STEP path — loss finite, grads finite — at a length where the
    dense path would already be building 512^2 modulation tensors per
    head)."""
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import compute_loss

    cfg = preset("EasyDGL-LC").replace(
        num_items=60, seqslen=511, masklen=16, num_units=16, num_heads=2,
        num_events=E, batch_size=2, mau_block_k=128,
        compute_dtype="float32")
    ds = synthetic_split(num_rows=4, num_items=60, seqslen=511, seed=11)
    table = synthetic_mark_table(60, E, seed=1)
    ld = BatchLoader(ds, data_mode="mau", batch_size=2, masklen=16,
                     is_training=True, seed=5, mark_table=table,
                     needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    features = {k: jnp.asarray(v) for k, v in features.items()}
    labels = jnp.asarray(labels)
    model = build_model(cfg)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        features, is_training=True)
    loss, grads = jax.value_and_grad(
        lambda p: compute_loss(model, p, features, labels,
                               {"dropout": jax.random.key(2)}))(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))
