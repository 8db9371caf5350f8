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


@pytest.mark.parametrize("name", ["TGAT"])
def test_pad_timestamp_invariance(name):
    """Garbage timestamps at PADDED positions must not change eval logits.

    Padded positions only reach the temporal attention through time codes on
    masked key columns — exactly the leak a broken key mask hides. TGAT only:
    in TiSASREC the reference ITSELF leaks pad timestamps into the output
    (fully-masked causal rows softmax to uniform and pick up v_int garbage;
    the post-softmax query mask doesn't fire because queries are layernormed,
    temporal.py:84-88 + TiSASREC.py:71), and this repo reproduces that
    faithfully — so no such invariance exists there to test.
    """
    cfg = tiny_cfg(name).replace(hidden_dropout_rate=0.0,
                                 attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    ids = np.zeros((2, L), np.int32)
    ids[0, -3:] = [5, 7, 9]
    ids[1, -5:] = [2, 4, 6, 8, 10]
    t = np.zeros((2, L + 1), np.float32)   # loader layout: L+1 timestamps
    t[0, -4:] = [1e5, 2e5, 3e5, 4e5]
    t[1, -6:] = [1e5, 1.5e5, 2e5, 2.5e5, 3e5, 3.5e5]
    feats = {"seqs_i": jnp.asarray(ids), "seqs_t": jnp.asarray(t)}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=False)
    base, _ = model.apply(params, feats, is_training=False)

    # ts[0] feeds ONLY key column 0 of the interval codes (later pad
    # timestamps also reach valid rows through query-side codes + the
    # joint-(T,C) LN moments, faithful to the reference, so they are not
    # invariant); ids[:, 0] == 0 -> key column 0 is masked -> garbage there
    # must be invisible.
    t2 = t.copy()
    t2[:, 0] = [7.7e5, 9.9e5]
    feats2 = {"seqs_i": jnp.asarray(ids), "seqs_t": jnp.asarray(t2)}
    out2, _ = model.apply(params, feats2, is_training=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2),
                               rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["SASREC", "BERT4REC", "EasyDGL"])
def test_cross_batch_independence(name):
    """Row A's eval logits must not depend on which other rows share the
    batch (catches reshape bugs that mix the batch axis and any accidental
    cross-example normalization)."""
    cfg = tiny_cfg(name).replace(hidden_dropout_rate=0.0,
                                 attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    _, ev1 = loaders_for(model, cfg)
    ds2 = synthetic_split(num_rows=3 * B, num_items=V, seqslen=L, seed=99,
                          with_datetime=True)
    table = synthetic_mark_table(V, E, seed=1) if model.uses_tpp else None
    ev2 = BatchLoader(ds2, is_training=False, data_mode=model.data_mode,
                      batch_size=B, masklen=cfg.masklen, mark_table=table,
                      needs_marks=model.uses_tpp)

    f1, _, _ = next(ev1.epoch(0))
    f2, _, _ = next(ev2.epoch(0))
    # splice row 0 of batch-1 into batch-2 (all other rows differ)
    spliced = {k: np.concatenate([v1[:1], f2[k][1:]], axis=0)
               for k, v1 in ((k, np.asarray(v)) for k, v in f1.items())}
    feats1 = {k: jnp.asarray(v) for k, v in f1.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats1, is_training=True)
    base, _ = model.apply(params, feats1, is_training=False)
    out, _ = model.apply(
        params, {k: jnp.asarray(v) for k, v in spliced.items()},
        is_training=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]),
                               rtol=2e-5, atol=1e-5)


def test_easydgl_diag_reset():
    """BiMAU resets the intensity diagonal to 1 (temporal.py:438-439):
    verified via the module-level flag plumbing."""
    from easydgl_tpu.nn.temporal import BiMAU, MGAU
    bim = BiMAU(8, 2, 3)
    assert bim.diag_reset and bim.fused_qkvt and not bim.causal_default
    mg = MGAU(8, 2, 3)
    assert not mg.diag_reset and mg.fused_qkvt


@pytest.mark.parametrize("training", [True, False])
def test_easydgl_query_gather_mode(training):
    """The OPT-IN query-gather approximation (gather_queries=True): the
    reference's ContribLayerNorm couples sequence positions through its
    (T, C) moments, so logits are only approximately equal to the faithful
    path — but the final block's INTENSITIES are computed before any LN and
    must match the gathered full-length intensities exactly."""
    cfg = tiny_cfg("EasyDGL").replace(hidden_dropout_rate=0.0,
                                      attention_probs_dropout_rate=0.0)
    slow = build_model(cfg)
    assert not slow.gather_queries       # approximate mode must be opt-in
    fast = type(slow)(cfg=cfg, gather_queries=True)
    tr, ev = loaders_for(slow, cfg)
    features, labels, _ = next((tr if training else ev).epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = slow.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)},
                       feats, is_training=training)
    fast_logits, fast_aux = fast.apply(params, feats, is_training=training)
    slow_logits, slow_aux = slow.apply(params, feats, is_training=training)
    assert fast_logits.shape == slow_logits.shape
    assert np.isfinite(np.asarray(fast_logits)).all()
    # LN-statistics drift only — the two paths stay in the same ballpark
    assert float(jnp.max(jnp.abs(fast_logits[:, 1:]
                                 - slow_logits[:, 1:]))) < 5.0
    if training:
        pos = feats["masked_positions"].astype(jnp.int32)
        last_full = slow_aux["intensities"][-1]
        np.testing.assert_allclose(
            np.asarray(fast_aux["intensities"][-1]),
            np.asarray(jnp.take_along_axis(last_full,
                                           pos[:, None, :, None], axis=2)),
            rtol=2e-5, atol=2e-5)


def test_registry_gather_queries_flag():
    """cfg.gather_queries builds the fast-path EasyDGL and rejects models
    without a query-gather path."""
    import pytest as _pytest
    from easydgl_tpu.config import preset
    from easydgl_tpu.models.registry import build_model
    m = build_model(preset("EasyDGL").replace(gather_queries=True))
    assert m.gather_queries is True
    assert build_model(preset("EasyDGL")).gather_queries is False
    with _pytest.raises(ValueError):
        build_model(preset("SASREC").replace(gather_queries=True))
