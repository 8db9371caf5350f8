"""Factored Bochner (functional-time) attention: TGAT and TGREC.

The angle-addition identity
``cos(w(tq-tk)+phi) = cos(w tq+phi)cos(w tk) + sin(w tq+phi)sin(w tk)``
turns every per-(q,k) time feature into a rank-2 product of per-position
features (nn/coding.py::TimeFunctionCoding.factors), so

* TGAT's logit-bias tensor (reference temporal.py:108-184 over
  coding.py:97-122) and
* TGREC's time-concatenated keys/values (temporal.py:187-264, the zoo's
  heaviest O(L^2*C) object)

become augmented plain attention — exact (event times are nondecreasing,
so the (tq-tk)+ clamp is inactive on unmasked entries), O(L*C) memory,
and flash/ring-eligible. These tests lock factored == dense for values
AND gradients, the flash variants in interpret mode, and the long-L
train-step path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from easydgl_tpu.config import preset
from easydgl_tpu.data.loader import BatchLoader
from easydgl_tpu.data.synthetic import synthetic_split
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.steps import compute_loss

V, L, B = 50, 12, 4


def _cfg(name, **kw):
    base = dict(num_items=V, seqslen=L, num_units=16, num_heads=2,
                num_blocks=2, batch_size=B, hidden_dropout_rate=0.0,
                attention_probs_dropout_rate=0.0, time_scale=86400.0)
    base.update(kw)
    return preset(name).replace(**base)


def _batches(cfg, seed=7):
    ds = synthetic_split(num_rows=2 * B, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=seed)
    tr = BatchLoader(ds, data_mode="regressive", batch_size=B,
                     masklen=cfg.masklen, is_training=True)
    ev = BatchLoader(ds, data_mode="regressive", batch_size=B,
                     masklen=cfg.masklen, is_training=False)
    f, lab, _ = next(tr.epoch(0))
    ef, _, _ = next(ev.epoch(0))
    to_dev = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    return to_dev(f), jnp.asarray(lab), to_dev(ef)


@pytest.mark.parametrize("name", ["TGAT", "TGREC"])
def test_factored_matches_dense_values_and_grads(name):
    cfg_d = _cfg(name)
    cfg_f = _cfg(name, attention_impl="factored")
    feats, labels, efeats = _batches(cfg_d)
    m_d, m_f = build_model(cfg_d), build_model(cfg_f)
    params = m_d.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      feats, is_training=True)
    # identical param trees: the factored path reuses the same Dense/
    # coding variables (weight split by basis application, not new params)
    params_f = m_f.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))

    # live query rows (>=1 causally visible valid key) are the rows the
    # loss and eval consume — locked STRICT. Dead pad-query rows mix
    # large-argument f32 trig (w*t ~ 1e5 rad) that dense and factored
    # reduce differently (~3e-4) — locked loose; their outputs are
    # key-masked away from every downstream real row.
    live = np.cumsum(np.asarray(feats["seqs_i"]) != 0, axis=1) > 0
    for m_feats, training in ((feats, True), (efeats, False)):
        ld, _ = m_d.apply(params, m_feats, is_training=training,
                          rngs={"dropout": jax.random.key(2)})
        lf, _ = m_f.apply(params, m_feats, is_training=training,
                          rngs={"dropout": jax.random.key(2)})
        lf, ld = np.asarray(lf), np.asarray(ld)
        rows = live.reshape(-1) if training else np.ones(len(ld), bool)
        np.testing.assert_allclose(lf[rows], ld[rows], rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(lf, ld, rtol=1e-3, atol=1e-3)

    def grad_check(m_feats, m_labels, bf_rtol):
        gd = jax.grad(lambda p: compute_loss(
            m_d, p, m_feats, m_labels, {"dropout": jax.random.key(1)}))(params)
        gf = jax.grad(lambda p: compute_loss(
            m_f, p, m_feats, m_labels, {"dropout": jax.random.key(1)}))(params)
        for (pa, a), (_, b_) in zip(jax.tree_util.tree_leaves_with_path(gd),
                                    jax.tree_util.tree_leaves_with_path(gf)):
            # basis_freq's grad carries a Δt multiplier: on the BOUNDARY
            # pad row (the last pad position predicts the first real item,
            # so it holds loss weight with uniform probs over pad keys at
            # Δt ~ 1e4 days) both paths evaluate f32 trig at ~1e5 rad,
            # whose argument-reduction noise (~1e-7 absolute on sin) is
            # amplified by that Δt — dense reduces w*Δt once, factored
            # reduces w*tq and w*tk separately, leaving ~0.3% relative
            # residue on a batch with pads. The pad-free call below locks
            # the SAME leaf at 1e-4, proving the decomposition itself is
            # exact.
            bf = "basis_freq" in str(pa)
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=bf_rtol if bf else 1e-4,
                                       atol=2 * bf_rtol if bf else 1e-5,
                                       err_msg=str(pa))

    grad_check(feats, labels, bf_rtol=1e-2)
    ids = np.asarray(feats["seqs_i"]).copy()
    ids[ids == 0] = 1  # pad-free: every key time is a real event time
    ts = np.asarray(feats["seqs_t"]).copy()
    for r in range(ts.shape[0]):
        nz = ts[r][ts[r] > 0]
        ts[r][ts[r] == 0] = nz[0] if len(nz) else 1.0
    nopad = dict(feats)
    nopad["seqs_i"], nopad["seqs_t"] = jnp.asarray(ids), jnp.asarray(ts)
    grad_check(nopad, labels, bf_rtol=1e-4)


@pytest.mark.parametrize("name", ["TGAT", "TGREC"])
def test_flash_matches_dense(name):
    """attention_impl='flash': factored features + the blockwise kernel
    must reproduce the dense path on every row (uniform-fallback patch
    for dead rows)."""
    cfg_d = _cfg(name)
    cfg_f = _cfg(name, attention_impl="flash")
    feats, _, efeats = _batches(cfg_d)
    m_d, m_f = build_model(cfg_d), build_model(cfg_f)
    params = m_d.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      feats, is_training=True)
    live = np.cumsum(np.asarray(feats["seqs_i"]) != 0, axis=1) > 0
    for m_feats, training in ((feats, True), (efeats, False)):
        ld, _ = m_d.apply(params, m_feats, is_training=training,
                          rngs={"dropout": jax.random.key(2)})
        with pltpu.force_tpu_interpret_mode():
            lf, _ = m_f.apply(params, m_feats, is_training=training,
                              rngs={"dropout": jax.random.key(2)})
        lf, ld = np.asarray(lf), np.asarray(ld)
        # strict on live rows; dead pad-query rows carry large-argument
        # f32 trig reduced differently by the two paths (see the factored
        # test above)
        rows = live.reshape(-1) if training else np.ones(len(ld), bool)
        np.testing.assert_allclose(lf[rows], ld[rows], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(lf, ld, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["TGAT", "TGREC"])
def test_factored_long_train_step(name):
    """L=512 (17x the reference ceiling) TRAIN step through the factored
    path: loss finite, every grad finite — locking the backward at a
    length where the dense layout would materialize (B, 512, 512, C)
    coded tensors."""
    cfg = _cfg(name, seqslen=512, num_blocks=1, batch_size=2,
               attention_impl="factored")
    ds = synthetic_split(num_rows=4, num_items=V, seqslen=512, seed=3)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=2,
                     masklen=cfg.masklen, is_training=True)
    f, lab, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in f.items()}
    model = build_model(cfg)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    loss, grads = jax.value_and_grad(lambda p: compute_loss(
        model, p, feats, jnp.asarray(lab),
        {"dropout": jax.random.key(2)}))(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))
