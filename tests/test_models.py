"""Forward-pass contract tests for the 11-model zoo, fed through the real
loader path (loader <-> model feature contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.config import preset
from easydgl_tpu.data.loader import BatchLoader
from easydgl_tpu.data.synthetic import synthetic_mark_table, synthetic_split
from easydgl_tpu.models.registry import MODELS, build_model

V, L, E, B = 50, 8, 5, 4


def tiny_cfg(name):
    cfg = preset(name).replace(num_items=V, seqslen=L, num_units=16,
                               num_blocks=2, num_events=E, masklen=3,
                               batch_size=B, timelen=20)
    cfg = cfg.replace(num_heads=1 if name == "GRU4REC" else 2)
    return cfg


def loaders_for(model, cfg):
    ds = synthetic_split(num_rows=3 * B, num_items=V, seqslen=L, seed=7,
                         with_datetime=True)
    table = synthetic_mark_table(V, E, seed=1) if model.uses_tpp else None
    mk = dict(data_mode=model.data_mode, batch_size=B, masklen=cfg.masklen,
              mark_table=table, needs_marks=model.uses_tpp)
    return (BatchLoader(ds, is_training=True, **mk),
            BatchLoader(ds, is_training=False, **mk))


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_shapes(name):
    cfg = tiny_cfg(name)
    model = build_model(cfg)
    tr, ev = loaders_for(model, cfg)

    features, labels, _ = next(tr.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    logits, aux = model.apply(params, feats, is_training=True,
                              rngs={"dropout": jax.random.key(2)})
    n_rows = (B * cfg.masklen if model.data_mode in ("masked", "grec", "mau")
              else B * L)
    assert logits.shape == (n_rows, model.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    if model.uses_tpp:
        assert len(aux["intensities"]) == cfg.num_blocks
        assert aux["intensities"][0].shape[-1] == E

    features, labels, valid = next(ev.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    logits, _ = model.apply(params, feats, is_training=False)
    assert logits.shape == (B, model.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_padding_invariance_sasrec():
    """Padded positions must not influence last-position predictions."""
    cfg = tiny_cfg("SASREC").replace(hidden_dropout_rate=0.0,
                                     attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    ids = np.zeros((2, L), np.int32)
    ids[0, -3:] = [5, 7, 9]
    ids[1, -3:] = [5, 7, 9]
    feats = {"seqs_i": jnp.asarray(ids)}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=False)
    base, _ = model.apply(params, feats, is_training=False)
    ids2 = ids.copy()
    # same suffix, different padding content should be irrelevant: padding is
    # id 0 either way, but shift history start
    feats2 = {"seqs_i": jnp.asarray(ids2)}
    out2, _ = model.apply(params, feats2, is_training=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2), rtol=1e-6)


def test_easydgl_diag_reset():
    """BiMAU resets the intensity diagonal to 1 (temporal.py:438-439):
    verified via the module-level flag plumbing."""
    from easydgl_tpu.nn.temporal import BiMAU, MGAU
    bim = BiMAU(8, 2, 3)
    assert bim.diag_reset and bim.fused_qkvt and not bim.causal_default
    mg = MGAU(8, 2, 3)
    assert not mg.diag_reset and mg.fused_qkvt
