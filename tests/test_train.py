"""End-to-end training tests (SURVEY.md §4b: golden-metric integration on a
tiny synthetic dataset)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.config import preset
from easydgl_tpu.data.synthetic import synthetic_mark_table, synthetic_split
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.loop import evaluate, make_loaders, train_model
from easydgl_tpu.train.steps import (build_eval_step, build_train_step,
                                     compute_loss, init_state)

V, L = 40, 10


def _cfg(name, **kw):
    base = dict(num_items=V, seqslen=L, num_units=16, num_heads=2,
                num_blocks=1, masklen=3, batch_size=16, num_events=4,
                patience=3)
    base.update(kw)
    return preset(name).replace(**base)


def _splits(n=96, datetime=False):
    return (synthetic_split(num_rows=n, num_items=V, seqslen=L, seed=1,
                            with_datetime=datetime),
            synthetic_split(num_rows=32, num_items=V, seqslen=L, seed=2,
                            with_datetime=datetime),
            synthetic_split(num_rows=32, num_items=V, seqslen=L, seed=3,
                            with_datetime=datetime))


def test_gru4rec_learns():
    """The PR1 north-star config: GRU4REC must beat chance after a few
    epochs of the structured synthetic data."""
    cfg = _cfg("GRU4REC", num_heads=1)
    tr, vl, te = _splits()
    state, res = train_model(cfg, tr, vl, te, num_epochs=8)
    assert res, "no summary produced"
    # random-ranking H50 baseline == 50/40 impossible; H10 chance = 10/40
    assert res["H10"] > 0.3, f"model failed to learn: {res}"
    assert 0.0 <= res["N100"] <= 1.0


def test_easydgl_trains_with_tpp():
    cfg = _cfg("EasyDGL", ct_reg=1e-3)
    tr, vl, te = _splits()
    table = synthetic_mark_table(V, 4, seed=5)
    model = build_model(cfg)
    trl, vll, tel = make_loaders(cfg, model, tr, vl, te, table)
    features, labels, _ = next(trl.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    state = init_state(model, feats, 0)
    step = build_train_step(model)
    losses = []
    for epoch in range(3):
        for features, labels, _ in trl.epoch(epoch):
            feats = {k: jnp.asarray(v) for k, v in features.items()}
            state, loss = step(state, feats, jnp.asarray(labels),
                               jax.random.key(0))
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss not decreasing: {losses[:3]}...{losses[-3:]}"


def test_tpp_regularizer_changes_loss():
    """ct_reg must flow into the loss (CTSMA.py:97-110 path)."""
    table = synthetic_mark_table(V, 4, seed=5)
    tr, vl, te = _splits()
    losses = {}
    for ct in (0.0, 10.0):
        cfg = _cfg("CTSMA", ct_reg=ct, l2_reg=0.0)
        model = build_model(cfg)
        trl, _, _ = make_loaders(cfg, model, tr, vl, te, table)
        features, labels, _ = next(trl.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            feats, is_training=True)
        losses[ct] = float(compute_loss(
            model, params, feats, jnp.asarray(labels),
            {"dropout": jax.random.key(2)}))
    assert losses[0.0] != losses[10.0]


def test_l2_reg_changes_loss():
    tr, vl, te = _splits()
    losses = {}
    for l2 in (0.0, 1.0):
        cfg = _cfg("SASREC", l2_reg=l2)
        model = build_model(cfg)
        trl, _, _ = make_loaders(cfg, model, tr, vl, te)
        features, labels, _ = next(trl.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            feats, is_training=True)
        losses[l2] = float(compute_loss(model, params, feats,
                                        jnp.asarray(labels),
                                        {"dropout": jax.random.key(2)}))
    assert losses[1.0] > losses[0.0]


def test_eval_mask_seen():
    """mask_seen must remove input items from the ranking (Base.py:156-163)."""
    from easydgl_tpu.eval.metrics import mask_seen_logits
    logits = jnp.zeros((2, 10))
    seen = jnp.asarray([[1, 2, 3], [4, 5, 5]])
    out = np.asarray(mask_seen_logits(logits, seen))
    assert (out[0, [1, 2, 3]] < -1e29).all()
    assert (out[1, [4, 5]] < -1e29).all()
    assert out[0, 4] == 0.0


def test_metric_sums_exact():
    from easydgl_tpu.eval.metrics import metric_sums
    logits = np.zeros((2, 200), np.float32)
    logits[0, 7] = 5.0     # rank 0 for row 0
    logits[1, 150] = -1.0  # true item ranked below top-100
    sums = jax.tree.map(float, jax.device_get(metric_sums(
        jnp.asarray(logits), jnp.asarray([7, 150]),
        jnp.asarray([True, True]))))
    assert sums["count"] == 2.0
    assert sums["H10"] == 1.0 and sums["H100"] == 1.0
    np.testing.assert_allclose(sums["N10"], 1.0 / np.log2(2.0), rtol=1e-6)


def test_metric_sums_matches_topk_with_ties():
    """The rank-counting metrics must equal a materialized lax.top_k
    implementation bit-for-bit, INCLUDING tie-break (equal logits ranked
    by ascending index — integer-valued logits force massive ties)."""
    from easydgl_tpu.eval.metrics import MAX_K, TOPK, metric_sums
    rng_l = np.random.RandomState(7)
    for tie in (False, True):
        b, vsz = 48, 300
        if tie:
            logits = jnp.asarray(
                rng_l.randint(0, 4, (b, vsz)).astype(np.float32))
        else:
            logits = jnp.asarray(rng_l.randn(b, vsz).astype(np.float32))
        true = jnp.asarray(rng_l.randint(0, vsz, (b,)).astype(np.int32))
        valid = jnp.asarray(rng_l.rand(b) > 0.25)
        got = jax.tree.map(float, jax.device_get(
            metric_sums(logits, true, valid)))
        # reference: materialized top-k membership
        max_k = min(MAX_K, vsz)
        _, top_idx = jax.lax.top_k(logits, max_k)
        hit = np.asarray(top_idx == true[:, None], np.float32)
        gain = (1.0 / np.log2(np.arange(2, max_k + 2))).astype(np.float32)
        v = np.asarray(valid, np.float32)
        for k in TOPK:
            kk = min(k, max_k)
            np.testing.assert_allclose(
                got[f"H{k}"],
                float(np.sum(np.sign(hit[:, :kk].sum(-1)) * v)),
                atol=1e-5, err_msg=f"H{k} tie={tie}")
            np.testing.assert_allclose(
                got[f"N{k}"],
                float(np.sum((hit[:, :kk] * gain[:kk]).sum(-1) * v)),
                rtol=1e-5, atol=1e-5, err_msg=f"N{k} tie={tie}")


def test_early_stopping_semantics():
    """Faithful util.py:14-58 behavior: NaN abort, patience, first-epoch
    best_valid refresh rule."""
    from easydgl_tpu.train.early_stopping import EarlyStopping
    saves = []
    es = EarlyStopping("m", patience=2, save_fn=lambda: saves.append(1))
    # first step seeds everything and saves
    assert not es.step(1.0, 0.5, {"H100": 0.5}, {"H100": 0.1})
    assert es.res == {"H100": 0.1} and len(saves) == 1
    # improvement: refresh res where valid >= FIRST valid, save
    assert not es.step(0.9, 0.6, {"H100": 0.6}, {"H100": 0.2})
    assert es.res == {"H100": 0.2} and len(saves) == 2
    # two degradations -> patience exhausted
    assert not es.step(0.8, 0.1, {"H100": 0.1}, {"H100": 0.9})
    assert es.step(0.8, 0.1, {"H100": 0.1}, {"H100": 0.9})
    assert es.res == {"H100": 0.2}  # degraded epochs never refresh res
    # NaN aborts immediately
    es2 = EarlyStopping("m", patience=5)
    assert es2.step(float("nan"), 0.5, {"H100": 0.5}, {"H100": 0.1})


def test_nan_guard():
    from easydgl_tpu.train.profiler import NanGuard
    g = NanGuard(every=1)
    g.check(jnp.asarray(1.0))
    with pytest.raises(FloatingPointError):
        g.check(jnp.asarray(float("inf")))


def test_bf16_compute_matches_f32_roughly():
    """Mixed precision (bf16 matmuls, fp32 accumulation/params) must stay
    close to the fp32 loss and keep eval metrics sane."""
    tr, vl, te = _splits()
    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = _cfg("SASREC", hidden_dropout_rate=0.0,
                   attention_probs_dropout_rate=0.0).replace(compute_dtype=dt)
        model = build_model(cfg)
        trl, _, _ = make_loaders(cfg, model, tr, vl, te)
        features, labels, _ = next(trl.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            feats, is_training=True)
        losses[dt] = float(compute_loss(model, params, feats,
                                        jnp.asarray(labels),
                                        {"dropout": jax.random.key(2)}))
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


def test_block_lstm_math(rng):
    """BlockLSTM vs literal NumPy LSTMBlockCell equations."""
    from easydgl_tpu.nn.rnn import BlockLSTM
    b, t, c = 2, 4, 3
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    lstm = BlockLSTM(num_units=c)
    params = lstm.init(jax.random.key(0), x)
    out, (cf, hf) = lstm.apply(params, x)
    p = jax.tree.map(np.asarray, params["params"])
    w, r, bias = p["w"], p["r"], p["b"]
    sig = lambda v: 1/(1+np.exp(-v))
    cs = np.zeros((b, c)); hs = np.zeros((b, c)); ref = []
    for s in range(t):
        g = np.asarray(x)[:, s] @ w + hs @ r + bias
        i, cc, f, o = np.split(g, 4, axis=-1)
        cs = sig(f + 1.0) * cs + sig(i) * np.tanh(cc)
        hs = sig(o) * np.tanh(cs)
        ref.append(hs.copy())
    np.testing.assert_allclose(np.asarray(out), np.stack(ref, 1),
                               rtol=1e-5, atol=1e-5)


def test_train_step_determinism():
    """Same seeds -> bit-identical losses (the reference's determinism
    harness, main.py:157-168, as a test)."""
    cfg = _cfg("SASREC")
    tr, vl, te = _splits()
    model = build_model(cfg)
    trl, _, _ = make_loaders(cfg, model, tr, vl, te)
    outs = []
    for _ in range(2):
        features, labels, _ = next(trl.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        state = init_state(model, feats, 0)
        step = build_train_step(model, donate=False)
        losses = []
        for e in range(2):
            for features, labels, _ in trl.epoch(e):
                feats = {k: jnp.asarray(v) for k, v in features.items()}
                state, loss = step(state, feats, jnp.asarray(labels),
                                   jax.random.key(7))
                losses.append(float(loss))
        outs.append(losses)
    assert outs[0] == outs[1]


def test_resume_roundtrip(tmp_path):
    """train -> checkpoint -> resume continues from the saved step."""
    cfg = _cfg("GRU4REC", num_heads=1, patience=100)
    tr, vl, te = _splits(n=64)
    state1, _ = train_model(cfg, tr, vl, te, ckpt_dir=str(tmp_path),
                            num_epochs=2)
    state2, _ = train_model(cfg, tr, vl, te, ckpt_dir=str(tmp_path),
                            num_epochs=2, resume=True)
    # resumed run starts at epoch 2 == num_epochs -> no extra training
    assert int(state2.step) == int(state1.step)


def test_multi_step_matches_sequential():
    """K scanned steps must equal K sequential steps (same rng derivation
    is step-counter-based in both paths is NOT guaranteed — the scan path
    derives dropout from the step counter — so compare with dropout off)."""
    from easydgl_tpu.train.steps import build_multi_step, stack_batches
    cfg = _cfg("SASREC", hidden_dropout_rate=0.0,
               attention_probs_dropout_rate=0.0)
    tr, vl, te = _splits()
    model = build_model(cfg)
    trl, _, _ = make_loaders(cfg, model, tr, vl, te)
    batches = []
    for features, labels, _ in trl.epoch(0):
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        batches.append((feats, jnp.asarray(labels)))
    batches = batches[:4]
    state = init_state(model, batches[0][0], 0)

    step = build_train_step(model, donate=False)
    s1 = state
    seq_losses = []
    for f, l in batches:
        s1, loss = step(s1, f, l, jax.random.key(0))
        seq_losses.append(float(loss))

    multi = build_multi_step(model, donate=False)
    sf, sl = stack_batches(batches)
    s2, losses = multi(state, sf, sl, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_evaluate_exact_over_padded_tail():
    """evaluate() must weight metrics by exact row counts across a padded
    final batch (reference streams tf.metrics.mean; we must match the exact
    per-example mean)."""
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.eval.metrics import metric_sums
    cfg = _cfg("SASREC", batch_size=16)
    model = build_model(cfg)
    # 22 rows -> one full batch + one 6-valid padded batch
    ds = synthetic_split(num_rows=22, num_items=V, seqslen=L, seed=9)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=16,
                     is_training=False)
    f0, _, _ = next(ld.epoch())
    feats0 = {k: jnp.asarray(v) for k, v in f0.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats0, is_training=False)
    es = build_eval_step(model)
    res = evaluate(es, params, ld)

    # manual per-row computation over ALL 22 rows at once
    proto_feats = {"seqs_i": ds.arrays["seqs_i"][:, :-1],
                   "seqs_t": ds.arrays["seqs_t"]}
    feats = {k: jnp.asarray(v) for k, v in proto_feats.items()}
    logits, _ = model.apply(params, feats, is_training=False)
    if cfg.mask_seen:
        from easydgl_tpu.eval.metrics import mask_seen_logits
        logits = mask_seen_logits(logits, feats["seqs_i"])
    sums = jax.device_get(metric_sums(
        logits, jnp.asarray(ds.arrays["seqs_i"][:, -1]),
        jnp.ones((22,), bool)))
    for k in res:
        np.testing.assert_allclose(res[k], float(sums[k]) / 22.0,
                                   rtol=1e-6, err_msg=k)


def test_recommender_easydgl_marks():
    """Serving path for the flagship TPP model (marks plumbed through)."""
    from easydgl_tpu.eval.recommender import Recommender
    cfg = _cfg("EasyDGL", mask_seen=True)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=4, num_items=V, seqslen=L, seed=2)
    table = synthetic_mark_table(V, 4, seed=3)
    from easydgl_tpu.data.masking import make_protocol
    proto = make_protocol("mau", masklen=3, mask_id=V)
    features, _ = proto(dict(ds.arrays), False, None)
    ids = features["seqs_i"]
    safe = np.where(ids >= table.shape[0], 0, ids)
    features["seqs_marks"] = table[safe].astype(np.float32)
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0)}, feats,
                        is_training=False)
    rec = Recommender(cfg, params, mark_table=table)
    ids_out, scores = rec.recommend(dict(ds.arrays), k=7)
    assert ids_out.shape == (4, 7)
    assert (ids_out != 0).all()


# Trained-metric goldens amplify ANY numerics difference through 4 epochs
# of training, including XLA:CPU codegen differences BETWEEN HOST CPU
# TYPES (round 5 measured 0.43% on EasyDGL N10 between the fixture's
# generation host and a host with a different avx/amx feature set — at
# old commits too, so environmental, not code). 1e-2 keeps them as gross
# drift detectors across hosts; per-step numerics stay locked at
# 1e-4..1e-7 by the differential suites (test_parity_tf.py), which
# compare within one process and are host-portable.
GOLDEN_RTOL = 1e-2


def test_golden_gru4rec_metrics():
    """Golden-metric regression fixture (behavioral drift detector — update
    the fixture only for INTENTIONAL numerics changes). Regenerated
    2026-08-18 with S2PNM's: the harness-parity round fixed the scan-GRU
    init to the cuDNN build's per-matrix orthogonal (one orthogonal per
    canonical gate matrix instead of one over the concatenated block).
    NOTE: values are specific to the conftest's 8-virtual-device CPU
    platform — regenerate under pytest (device count changes XLA:CPU
    thread partitioning and thus float reduction order)."""
    cfg = _cfg("GRU4REC", num_heads=1)
    tr, vl, te = _splits()
    _, res = train_model(cfg, tr, vl, te, num_epochs=4)
    golden = {"H10": 0.5, "H100": 1.0, "H50": 1.0,
              "N10": 0.24263, "N100": 0.352397, "N50": 0.352397}
    for k, v in golden.items():
        np.testing.assert_allclose(res[k], v, rtol=GOLDEN_RTOL, err_msg=k)


def test_adamw_warmup_optimizer():
    """The reference's BERT optimizer path (optimization.py:27-84): linear
    warmup schedule + decoupled weight decay masking LN/bias params."""
    import dataclasses
    import optax
    from easydgl_tpu.train.optim import build_optimizer
    cfg = _cfg("SASREC")
    ocfg = dataclasses.replace(cfg.optim, name="adamw_warmup",
                               num_train_steps=100, num_warmup_steps=10)
    tx = build_optimizer(ocfg)
    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
              "ln": {"beta": jnp.ones((3,)), "gamma": jnp.ones((3,))}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(new):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("name,kw,golden", [
    # regenerated 2026-08-19 (round 4): the suite now PINS the persistent
    # compilation cache OFF (conftest EASYDGL_NO_COMPILE_CACHE) — the CLI
    # tests used to enable it process-globally, making these trained
    # metrics depend on the mutable ~/.jax_cache contents (cached CPU
    # executables with machine features this host lacks). Cache-free
    # values are stable in isolation AND in-suite.
    ("EasyDGL", dict(ct_reg=1e-3, time_scale=1000.0),
     {"H10": 0.40625, "H100": 1.0, "H50": 1.0,
      "N10": 0.207052, "N100": 0.341178, "N50": 0.341178}),
    ("CTSMA", dict(ct_reg=1e-3, time_scale=1000.0),
     {"H10": 0.21875, "H100": 1.0, "H50": 1.0,
      "N10": 0.084841, "N100": 0.258039, "N50": 0.258039}),
    # regenerated 2026-08-19: the interval edge bucket (Δt >= timelen) now
    # produces ZERO vectors, matching the reference-on-GPU gather semantics
    # (nn/coding.py::TimeIntervalCoding docstring)
    ("TiSASREC", dict(time_scale=1000.0, timelen=20),
     {"H10": 0.25, "H100": 1.0, "H50": 1.0,
      "N10": 0.114603, "N100": 0.278111, "N50": 0.278111}),
])
def test_golden_metrics_temporal_models(name, kw, golden):
    """Golden-metric drift detectors for the numerically hairiest paths —
    EasyDGL (BiMAU TPP + mau masking), CTSMA (MAU TPP), TiSASREC (interval
    buckets) — complementing the GRU4REC fixture above. Values produced by
    code that passes differential TF-reference parity
    (tests/test_parity_tf.py); update only for INTENTIONAL changes or
    library bumps (EasyDGL/BERT4REC/GREC regenerated 2026-08-18 on jax
    0.9.0 — the round-2 snapshot reproduces the same drift, so it is
    environmental, not a code regression)."""
    cfg = _cfg(name, **kw)
    tr, vl, te = _splits()
    table = (synthetic_mark_table(V, 4, seed=4)
             if name in ("EasyDGL", "CTSMA") else None)
    _, res = train_model(cfg, tr, vl, te, mark_table=table, num_epochs=4)
    for k, v in golden.items():
        np.testing.assert_allclose(res[k], v, rtol=GOLDEN_RTOL, err_msg=k)


@pytest.mark.parametrize("name,kw,golden", [
    ("SASREC", dict(),
     {"H10": 0.21875, "N10": 0.10128, "N100": 0.273074}),
    # BERT4REC/GREC regenerated 2026-08-19 cache-free (see the temporal
    # fixtures' note)
    # BERT4REC/GREC regenerated 2026-08-20 (round 5): host-CPU-type change
    # flipped one eval prediction each (the GOLDEN_RTOL note — on a
    # 32-row eval set a single rank flip moves H10 by 0.03125, outside
    # any honest rtol). Values identical at round-4 and round-5 code on
    # this host, so environmental, not a code regression.
    ("BERT4REC", dict(),
     {"H10": 0.375, "N10": 0.137535, "N100": 0.295839}),
    ("S2PNM", dict(),
     {"H10": 0.09375, "N10": 0.058964, "N100": 0.256834}),
    ("GREC", dict(),
     {"H10": 0.3125, "N10": 0.162528, "N100": 0.311079}),
    ("TGAT", dict(time_scale=1000.0),
     {"H10": 0.21875, "N10": 0.099764, "N100": 0.268345}),
    ("TGREC", dict(time_scale=1000.0),
     {"H10": 0.5625, "N10": 0.300542, "N100": 0.391311}),
    ("TimelyREC", dict(),
     {"H10": 0.375, "N10": 0.154458, "N100": 0.297602}),
])
def test_golden_metrics_remaining_models(name, kw, golden):
    """Golden-metric drift detectors for the rest of the zoo — with the
    temporal fixtures above, ALL 11 models are now locked against silent
    numerics drift. Same harness/seeds as the other fixtures; update only
    for INTENTIONAL changes."""
    cfg = _cfg(name, **kw)
    tr, vl, te = _splits(datetime=(name == "TimelyREC"))
    _, res = train_model(cfg, tr, vl, te, num_epochs=4)
    for k, v in golden.items():
        np.testing.assert_allclose(res[k], v, rtol=GOLDEN_RTOL, err_msg=k)
