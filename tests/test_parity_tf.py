"""Differential numeric parity vs the runnable TF reference.

For each model: build the reference graph at a tiny config (CPU), initialize
its variables, transplant them into this framework's flax params (total,
shape-checked coverage — parity/mapping.py), feed both implementations one
identical batch, and assert:

* eval logits (reference Sequential.__call__ is_training=False,
  src/model/Base.py:150-154) match to ~1e-4;
* the raw train loss (src/model/Base.py:119-131 + model-specific
  regularizers) matches to ~1e-5 relative.

Dropout rates are zeroed so both graphs are deterministic; l2_reg is
NONZERO so the regularization-loss path is covered too.
"""
import numpy as np
import pytest

from easydgl_tpu.config import preset
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.steps import compute_loss

try:
    from easydgl_tpu.parity.refbridge import RefModel, reference_available
    from easydgl_tpu.parity.mapping import MAPPERS, transplant
    HAVE_REF = reference_available()
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(
    not HAVE_REF, reason="reference sources or TF unavailable")

V, L, B = 50, 8, 4
RTOL = 1e-4


def tiny_cfg(name, **kw):
    base = dict(num_items=V, seqslen=L, num_units=16, num_blocks=2,
                num_heads=2, batch_size=B, l2_reg=1e-3,
                hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0,
                timelen=20)
    base.update(kw)
    return preset(name).replace(**base)


def seq_batch(seed=3):
    """Deterministic right-aligned (ids, ts) batch shared by both sides."""
    rng = np.random.RandomState(seed)
    ids = np.zeros((B, L + 1), np.int32)
    ts = np.zeros((B, L + 1), np.float32)
    for r in range(B):
        n = rng.randint(4, L + 2)
        ids[r, L + 1 - n:] = rng.randint(1, V, n)
        ts[r, L + 1 - n:] = np.sort(rng.uniform(1e5, 9e5, n))
    return ids, ts


def regressive_feats(ids, ts, with_time=False):
    feats = {"seqs_i": ids[:, :-1]}
    labels = ids[:, 1:]
    if with_time:
        feats["seqs_t"] = ts
    return feats, labels


import jax


def my_model(name, cfg, feats):
    model = build_model(cfg)
    jfeats = {k: jax.numpy.asarray(v) for k, v in feats.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        jfeats, is_training=True)
    return model, params


def check_model(name, cfg, feature_specs, feats, labels, extra_feats=None,
                rtol=RTOL, mark_file=None, loss_rtol=2e-5):
    """Full differential check for one model."""
    ref = RefModel(name, cfg, feature_specs, mark_file=mark_file)
    try:
        model, params = my_model(name, cfg, feats)
        mapping = MAPPERS[name](ref.variables, cfg)
        params = transplant(params, mapping)
        jfeats = {k: jax.numpy.asarray(v) for k, v in feats.items()}

        ref_logits = ref.eval_logits(feats)
        my_logits, _ = model.apply(params, jfeats, is_training=False)
        np.testing.assert_allclose(np.asarray(my_logits), ref_logits,
                                   rtol=rtol, atol=1e-4)

        ref_loss = ref.train_loss(feats, labels)
        my_loss = float(compute_loss(model, params, jfeats,
                                     jax.numpy.asarray(labels),
                                     rngs={"dropout": jax.random.key(2)}))
        np.testing.assert_allclose(my_loss, ref_loss, rtol=loss_rtol)
    finally:
        ref.close()


def test_sasrec_parity():
    cfg = tiny_cfg("SASREC")
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts)
    check_model("SASREC", cfg, {"seqs_i": ((L,), "int32")}, feats, labels)
