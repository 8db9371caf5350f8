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
                num_heads=2, batch_size=B, l2_reg=1e-3, masklen=3,
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


def check_model(name, cfg, feature_specs, train_feats, labels, *,
                eval_feats=None, my_train_extra=None, my_eval_extra=None,
                mark_file=None, rtol=RTOL, atol=1e-4, loss_rtol=2e-5):
    """Full differential check for one model.

    ``eval_feats`` defaults to ``train_feats`` (AR models); masked models
    pass the mask-last variant. ``my_*_extra`` adds loader-derived features
    this framework consumes directly (dense mark rows) while the reference
    looks them up from its pickled table inside the graph.
    """
    eval_feats = train_feats if eval_feats is None else eval_feats
    ref = RefModel(name, cfg, feature_specs, mark_file=mark_file)
    try:
        my_train = {**train_feats, **(my_train_extra or {})}
        my_eval = {**eval_feats, **(my_eval_extra or {})}
        model, params = my_model(name, cfg, my_train)
        mapping = MAPPERS[name](ref.variables, cfg)
        params = transplant(params, mapping)

        ref_logits = ref.eval_logits(eval_feats)
        jeval = {k: jax.numpy.asarray(v) for k, v in my_eval.items()}
        my_logits, _ = model.apply(params, jeval, is_training=False)
        np.testing.assert_allclose(np.asarray(my_logits), ref_logits,
                                   rtol=rtol, atol=atol)

        ref_loss = ref.train_loss(train_feats, labels)
        jtrain = {k: jax.numpy.asarray(v) for k, v in my_train.items()}
        my_loss = float(compute_loss(model, params, jtrain,
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


def test_tgat_parity():
    cfg = tiny_cfg("TGAT")
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts, with_time=True)
    check_model("TGAT", cfg,
                {"seqs_i": ((L,), "int32"), "seqs_t": ((L + 1,), "float32")},
                feats, labels)


def test_tisasrec_parity():
    cfg = tiny_cfg("TiSASREC")
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts, with_time=True)
    check_model("TiSASREC", cfg,
                {"seqs_i": ((L,), "int32"), "seqs_t": ((L + 1,), "float32")},
                feats, labels)


def test_gru4rec_parity():
    """The scan GRU vs the reference's cuDNN-math-equivalent CPU cell stack
    (CudnnCompatibleGRUCell, cudnn_rnn_ops.py:81-116)."""
    cfg = tiny_cfg("GRU4REC", num_heads=1)
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts)
    check_model("GRU4REC", cfg, {"seqs_i": ((L,), "int32")}, feats, labels)


def test_s2pnm_parity():
    cfg = tiny_cfg("S2PNM", num_blocks=1)
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts)
    check_model("S2PNM", cfg, {"seqs_i": ((L,), "int32")}, feats, labels)


def masked_batch(mask_id, ignore_head=False, seed=3):
    """Deterministic BERT-style masking over the (L+1)-length sequences."""
    ids, ts = seq_batch(seed)
    lo = 1 if ignore_head else 0
    pos = np.stack([np.array([lo + 1, 4, L])] * B)          # (B, ML=3)
    masked = ids.copy()
    np.put_along_axis(masked, pos, mask_id, axis=1)
    labels = np.take_along_axis(ids, pos, axis=1)
    eval_masked = ids.copy()
    eval_masked[:, -1] = mask_id                            # mask_last
    return ids, ts, pos.astype(np.int32), masked, labels, eval_masked


def test_bert4rec_parity():
    cfg = tiny_cfg("BERT4REC")
    ids, ts, pos, masked, labels, eval_masked = masked_batch(mask_id=V)
    specs = {"seqs_i": ((L + 1,), "int32"),
             "masked_positions": ((cfg.masklen,), "int32")}
    check_model("BERT4REC", cfg, specs,
                {"seqs_i": masked, "masked_positions": pos}, labels,
                eval_feats={"seqs_i": eval_masked})


def test_grec_parity():
    cfg = tiny_cfg("GREC", masklen=3)
    ids, ts, pos, masked, labels, _ = masked_batch(mask_id=V,
                                                   ignore_head=True)
    specs = {"seqs_i": ((None,), "int32"), "seqs_m": ((None,), "int32"),
             "masked_positions": ((cfg.masklen,), "int32")}
    train = {"seqs_i": ids, "seqs_m": masked,
             "masked_positions": pos - 1}   # AR shift (dataloader.py:136)
    evalf = {"seqs_i": ids[:, :-1], "seqs_m": ids[:, :-1]}
    check_model("GREC", cfg, specs, train, labels, eval_feats=evalf)


def test_timelyrec_parity():
    cfg = tiny_cfg("TimelyREC")
    ids, ts = seq_batch()
    rng = np.random.RandomState(11)
    feats, labels = regressive_feats(ids, ts, with_time=True)
    feats["seqs_month"] = rng.randint(1, 13, (B, L)).astype(np.int64)
    feats["seqs_day"] = rng.randint(1, 32, (B, L)).astype(np.int64)
    feats["seqs_weekday"] = rng.randint(0, 7, (B, L)).astype(np.int64)
    feats["seqs_hour"] = rng.randint(0, 24, (B, L)).astype(np.int64)
    feats["seqs_i"] = feats["seqs_i"].astype(np.int64)
    specs = {"seqs_i": ((L,), "int64"), "seqs_t": ((L + 1,), "float32"),
             "seqs_month": ((L,), "int64"), "seqs_day": ((L,), "int64"),
             "seqs_weekday": ((L,), "int64"), "seqs_hour": ((L,), "int64")}
    check_model("TimelyREC", cfg, specs, feats, labels)


def test_tgrec_parity():
    """TGREC is unrunnable as shipped (its span tiling needs L timestamps
    while the reader supplies L+1, TGREC.py:47-51); this repo uses the TGAT
    span convention instead (models/tgrec.py:7-11). With CONSTANT timestamps
    both conventions give a zero span matrix, so everything EXCEPT the
    (documented, divergent) span convention is differentially tested."""
    # num_heads=1: the reference never head-tiles the TGREC attention mask
    # (TGREC.py:54-55 build (N,T,T) masks, but temporal.py:236-246 Selects
    # against (h*N,T,T) logits), so heads>1 crashes it — consistent with the
    # argparse default (num_heads=1) the model shipped with.
    cfg = tiny_cfg("TGREC", num_heads=1)
    ids, _ = seq_batch()
    const_ts_ref = np.full((B, L), 5e5, np.float32)
    const_ts_mine = np.full((B, L + 1), 5e5, np.float32)
    feats_ref = {"seqs_i": ids[:, :-1], "seqs_t": const_ts_ref}
    labels = ids[:, 1:]
    ref_specs = {"seqs_i": ((L,), "int32"), "seqs_t": ((L,), "float32")}

    ref = RefModel("TGREC", cfg, ref_specs)
    try:
        my_feats = {"seqs_i": ids[:, :-1], "seqs_t": const_ts_mine}
        model, params = my_model("TGREC", cfg, my_feats)
        params = transplant(params, MAPPERS["TGREC"](ref.variables, cfg))
        jfeats = {k: jax.numpy.asarray(v) for k, v in my_feats.items()}

        ref_logits = ref.eval_logits(feats_ref)
        my_logits, _ = model.apply(params, jfeats, is_training=False)
        np.testing.assert_allclose(np.asarray(my_logits), ref_logits,
                                   rtol=RTOL, atol=1e-4)
        ref_loss = ref.train_loss(feats_ref, labels)
        my_loss = float(compute_loss(model, params, jfeats,
                                     jax.numpy.asarray(labels),
                                     rngs={"dropout": jax.random.key(2)}))
        np.testing.assert_allclose(my_loss, ref_loss, rtol=2e-5)
    finally:
        ref.close()


@pytest.fixture(scope="module")
def mark_setup(tmp_path_factory):
    from easydgl_tpu.data.synthetic import synthetic_mark_table
    from easydgl_tpu.parity.refbridge import write_mark_pickle
    E = 5
    mark = synthetic_mark_table(V, E, seed=1).astype(np.int64)
    path = write_mark_pickle(
        mark, str(tmp_path_factory.mktemp("mark") / "mark.pkl"))
    return mark, path, E


def test_ctsma_parity(mark_setup):
    mark, mark_file, E = mark_setup
    cfg = tiny_cfg("CTSMA", ct_reg=1e-3, num_events=E)
    ids, ts = seq_batch()
    feats, labels = regressive_feats(ids, ts, with_time=True)
    extra = {"seqs_marks": mark[feats["seqs_i"]].astype(np.float32),
             "next_marks": mark[labels].astype(np.float32)}
    specs = {"seqs_i": ((L,), "int32"), "seqs_t": ((L + 1,), "float32")}
    check_model("CTSMA", cfg, specs, feats, labels, mark_file=mark_file,
                my_train_extra=extra, my_eval_extra=extra)


# ---------------------------------------------------------------------------
# Trajectory parity: N real optimizer steps on both sides from transplanted
# weights must produce the same per-step loss sequence. This extends the
# single-point loss check to GRADIENTS and the OPTIMIZER (reference trainOp:
# plain Adam Base.py:142-144; beta2=0.98/eps=1e-9/global-norm-clip-5 for
# GRU4REC, GRU4REC.py:60-71) — a drift in any backward pass or update rule
# compounds across steps and fails the comparison.
# ---------------------------------------------------------------------------

TRAJ_STEPS = 5


def run_trajectory(name, cfg, feature_specs, batch_fn, *, mark_file=None,
                   extras_fn=None, rtol=1e-4):
    from easydgl_tpu.train.steps import build_train_step, init_state
    ref = RefModel(name, cfg, feature_specs, mark_file=mark_file,
                   train_mode="step")
    try:
        batches = [batch_fn(s) for s in range(TRAJ_STEPS)]
        f0, l0 = batches[0]
        my0 = {**f0, **(extras_fn(f0, l0) if extras_fn else {})}
        model, params = my_model(name, cfg, my0)
        params = transplant(params, MAPPERS[name](ref.variables, cfg))
        state = init_state(
            model, {k: jax.numpy.asarray(v) for k, v in my0.items()}, seed=0)
        state = state._replace(params=params)
        step = build_train_step(model, donate=False)
        rng = jax.random.key(7)  # dropout rates are zero — rng is inert
        my_losses, ref_losses = [], []
        for feats, labels in batches:
            myf = {**feats, **(extras_fn(feats, labels) if extras_fn else {})}
            jf = {k: jax.numpy.asarray(v) for k, v in myf.items()}
            state, ml = step(state, jf, jax.numpy.asarray(labels), rng)
            my_losses.append(float(ml))            # pre-update loss
            ref_losses.append(ref.train_step(feats, labels))
        np.testing.assert_allclose(my_losses, ref_losses, rtol=rtol)
    finally:
        ref.close()


def test_sasrec_trajectory_parity():
    cfg = tiny_cfg("SASREC")

    def batch(s):
        ids, ts = seq_batch(seed=20 + s)
        return regressive_feats(ids, ts)

    run_trajectory("SASREC", cfg, {"seqs_i": ((L,), "int32")}, batch)


def test_gru4rec_trajectory_parity():
    """Covers the clipped/beta2=0.98/eps=1e-9 optimizer variant and the scan
    GRU backward vs the reference's CudnnCompatibleGRUCell stack."""
    cfg = tiny_cfg("GRU4REC", num_heads=1)

    def batch(s):
        ids, ts = seq_batch(seed=40 + s)
        return regressive_feats(ids, ts)

    run_trajectory("GRU4REC", cfg, {"seqs_i": ((L,), "int32")}, batch)


def test_tgat_trajectory_parity():
    cfg = tiny_cfg("TGAT")

    def batch(s):
        ids, ts = seq_batch(seed=50 + s)
        return regressive_feats(ids, ts, with_time=True)

    run_trajectory("TGAT", cfg,
                   {"seqs_i": ((L,), "int32"),
                    "seqs_t": ((L + 1,), "float32")}, batch)


def test_tisasrec_trajectory_parity():
    """Interval-bucket attention: bucket clipping + K/V interval tables."""
    cfg = tiny_cfg("TiSASREC")

    def batch(s):
        ids, ts = seq_batch(seed=60 + s)
        return regressive_feats(ids, ts, with_time=True)

    run_trajectory("TiSASREC", cfg,
                   {"seqs_i": ((L,), "int32"),
                    "seqs_t": ((L + 1,), "float32")}, batch)


def test_s2pnm_trajectory_parity():
    cfg = tiny_cfg("S2PNM", num_blocks=1)

    def batch(s):
        ids, ts = seq_batch(seed=70 + s)
        return regressive_feats(ids, ts)

    run_trajectory("S2PNM", cfg, {"seqs_i": ((L,), "int32")}, batch)


def test_timelyrec_trajectory_parity():
    cfg = tiny_cfg("TimelyREC")
    drng = np.random.RandomState(11)

    def batch(s):
        ids, ts = seq_batch(seed=80 + s)
        feats, labels = regressive_feats(ids, ts, with_time=True)
        feats["seqs_month"] = drng.randint(1, 13, (B, L)).astype(np.int64)
        feats["seqs_day"] = drng.randint(1, 32, (B, L)).astype(np.int64)
        feats["seqs_weekday"] = drng.randint(0, 7, (B, L)).astype(np.int64)
        feats["seqs_hour"] = drng.randint(0, 24, (B, L)).astype(np.int64)
        feats["seqs_i"] = feats["seqs_i"].astype(np.int64)
        return feats, labels

    specs = {"seqs_i": ((L,), "int64"), "seqs_t": ((L + 1,), "float32"),
             "seqs_month": ((L,), "int64"), "seqs_day": ((L,), "int64"),
             "seqs_weekday": ((L,), "int64"), "seqs_hour": ((L,), "int64")}
    run_trajectory("TimelyREC", cfg, specs, batch)


def test_bert4rec_trajectory_parity():
    cfg = tiny_cfg("BERT4REC")
    specs = {"seqs_i": ((L + 1,), "int32"),
             "masked_positions": ((cfg.masklen,), "int32")}

    def batch(s):
        _, _, pos, masked, labels, _ = masked_batch(mask_id=V, seed=90 + s)
        return {"seqs_i": masked, "masked_positions": pos}, labels

    run_trajectory("BERT4REC", cfg, specs, batch)


def test_grec_trajectory_parity():
    cfg = tiny_cfg("GREC", masklen=3)
    specs = {"seqs_i": ((None,), "int32"), "seqs_m": ((None,), "int32"),
             "masked_positions": ((cfg.masklen,), "int32")}

    def batch(s):
        ids, _, pos, masked, labels, _ = masked_batch(
            mask_id=V, ignore_head=True, seed=100 + s)
        return {"seqs_i": ids, "seqs_m": masked,
                "masked_positions": pos - 1}, labels   # AR shift

    run_trajectory("GREC", cfg, specs, batch)


def test_ctsma_trajectory_parity(mark_setup):
    mark, mark_file, E = mark_setup
    cfg = tiny_cfg("CTSMA", ct_reg=1e-3, num_events=E)

    def batch(s):
        ids, ts = seq_batch(seed=110 + s)
        return regressive_feats(ids, ts, with_time=True)

    def extras(feats, labels):
        return {"seqs_marks": mark[feats["seqs_i"]].astype(np.float32),
                "next_marks": mark[labels].astype(np.float32)}

    run_trajectory("CTSMA", cfg,
                   {"seqs_i": ((L,), "int32"),
                    "seqs_t": ((L + 1,), "float32")}, batch,
                   mark_file=mark_file, extras_fn=extras)


def test_tgrec_trajectory_parity():
    """Constant timestamps (zero span matrix) sidestep the documented span
    repair (models/tgrec.py:7-11); everything else — including TGREC's
    clipped-Adam trainOp — is trajectory-checked."""
    cfg = tiny_cfg("TGREC", num_heads=1)

    def batch_ref(s):
        ids, _ = seq_batch(seed=120 + s)
        return ({"seqs_i": ids[:, :-1],
                 "seqs_t": np.full((B, L), 5e5, np.float32)}, ids[:, 1:])

    from easydgl_tpu.train.steps import build_train_step, init_state
    ref = RefModel("TGREC", cfg,
                   {"seqs_i": ((L,), "int32"), "seqs_t": ((L,), "float32")},
                   train_mode="step")
    try:
        batches = [batch_ref(s) for s in range(TRAJ_STEPS)]
        my0 = {"seqs_i": batches[0][0]["seqs_i"],
               "seqs_t": np.full((B, L + 1), 5e5, np.float32)}
        model, params = my_model("TGREC", cfg, my0)
        params = transplant(params, MAPPERS["TGREC"](ref.variables, cfg))
        state = init_state(
            model, {k: jax.numpy.asarray(v) for k, v in my0.items()}, seed=0)
        state = state._replace(params=params)
        step = build_train_step(model, donate=False)
        rng = jax.random.key(7)
        my_losses, ref_losses = [], []
        for feats, labels in batches:
            myf = {"seqs_i": feats["seqs_i"],
                   "seqs_t": np.full((B, L + 1), 5e5, np.float32)}
            jf = {k: jax.numpy.asarray(v) for k, v in myf.items()}
            state, ml = step(state, jf, jax.numpy.asarray(labels), rng)
            my_losses.append(float(ml))
            ref_losses.append(ref.train_step(feats, labels))
        np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-4)
    finally:
        ref.close()


def test_easydgl_trajectory_parity(mark_setup):
    """Flagship: masked protocol + MAU intensity + TPP regularizer grads."""
    mark, mark_file, E = mark_setup
    cfg = tiny_cfg("EasyDGL", ct_reg=1e-3, num_events=E)
    specs = {"seqs_i": ((L + 1,), "int32"), "seqs_t": ((L + 1,), "float32"),
             "masked_positions": ((cfg.masklen,), "int32")}

    def batch(s):
        ids, ts, pos, masked, labels, _ = masked_batch(
            mask_id=V, ignore_head=True, seed=30 + s)
        return {"seqs_i": masked, "seqs_t": ts,
                "masked_positions": pos}, labels

    def extras(feats, labels):
        safe = np.where(feats["seqs_i"] == V, 0, feats["seqs_i"])
        return {"seqs_marks": mark[safe].astype(np.float32),
                "next_marks": mark[labels].astype(np.float32)}

    run_trajectory("EasyDGL", cfg, specs, batch, mark_file=mark_file,
                   extras_fn=extras)


def test_easydgl_parity(mark_setup):
    mark, mark_file, E = mark_setup
    cfg = tiny_cfg("EasyDGL", ct_reg=1e-3, num_events=E)
    ids, ts, pos, masked, labels, eval_masked = masked_batch(
        mask_id=V, ignore_head=True)
    specs = {"seqs_i": ((L + 1,), "int32"), "seqs_t": ((L + 1,), "float32"),
             "masked_positions": ((cfg.masklen,), "int32")}

    def marks_of(seq):  # MASK id -> row 0 (EasyDGL.py:76-77)
        safe = np.where(seq == V, 0, seq)
        return mark[safe].astype(np.float32)

    train = {"seqs_i": masked, "seqs_t": ts, "masked_positions": pos}
    evalf = {"seqs_i": eval_masked, "seqs_t": ts}
    check_model("EasyDGL", cfg, specs, train, labels, eval_feats=evalf,
                mark_file=mark_file,
                my_train_extra={"seqs_marks": marks_of(masked),
                                "next_marks": mark[labels].astype(np.float32)},
                my_eval_extra={"seqs_marks": marks_of(eval_masked)})
