"""Long-context wiring tests: the flash kernel and the ring (CP) path as
drop-in attention cores for the MHA model family (SASREC & co).

* flash == xla at the MODULE level for every row (the wrapper patches the
  kernel's zero-output rows back to the TF uniform fallback);
* a full SASREC train step on a (data=2, model=1, seq=4) mesh — ring
  attention, T sharded 4-ways — must match the unsharded step.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from easydgl_tpu.config import MeshConfig, preset
from easydgl_tpu.core.mesh import make_mesh
from easydgl_tpu.data.loader import BatchLoader
from easydgl_tpu.data.synthetic import synthetic_split
from easydgl_tpu.models.registry import build_model

V, L, B = 50, 8, 8


def _cfg(**kw):
    base = dict(num_items=V, seqslen=L, num_units=16, num_heads=2,
                num_blocks=2, batch_size=B, hidden_dropout_rate=0.0,
                attention_probs_dropout_rate=0.0)
    base.update(kw)
    return preset("SASREC").replace(**base)


def _batch(cfg, seed=7):
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=L, seed=seed)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=B,
                     masklen=cfg.masklen, is_training=True)
    features, labels, _ = next(ld.epoch(0))
    return {k: jnp.asarray(v) for k, v in features.items()}, \
        jnp.asarray(labels)


def test_sasrec_flash_equals_xla():
    """attention_impl='flash' must reproduce the XLA path on every row —
    including left-pad rows (uniform-fallback patch)."""
    feats, _ = _batch(_cfg())
    m_x = build_model(_cfg(attention_impl="xla"))
    m_f = build_model(_cfg(attention_impl="flash"))
    params = m_x.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)},
                      feats, is_training=True)
    lx, _ = m_x.apply(params, feats, is_training=False)
    with pltpu.force_tpu_interpret_mode():
        lf, _ = m_f.apply(params, feats, is_training=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                               rtol=2e-4, atol=2e-4)

    # training rows too (all positions, so pad rows are in the batch)
    ltx, _ = m_x.apply(params, feats, is_training=True,
                       rngs={"dropout": jax.random.key(2)})
    with pltpu.force_tpu_interpret_mode():
        ltf, _ = m_f.apply(params, feats, is_training=True,
                           rngs={"dropout": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(ltf), np.asarray(ltx),
                               rtol=2e-4, atol=2e-4)


def test_flash_spmd_matches_unsharded(rng, eight_devices):
    """kernels/spmd.py::flash_attention_spmd on a (data=2, model=2) mesh
    (batch + whole-head sharding) == the unsharded kernel, values and
    grads (interpret mode on the CPU platform)."""
    import numpy as _np
    from jax.sharding import Mesh
    from easydgl_tpu.kernels.flash_attention import flash_attention
    from easydgl_tpu.kernels.spmd import flash_attention_spmd

    mesh = Mesh(np.asarray(eight_devices[:4]).reshape(2, 2),
                ("data", "model"))
    b, h, t, d = 4, 4, 32, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(_np.float32))
    q, k, v = mk(b, h, t, d), mk(b, h, t, d), mk(b, h, t, d)
    km = jnp.asarray((rng.rand(b, t) > 0.3).astype(_np.float32))
    co = mk(b, h, t, d)

    # the HLO interpreter (interpret=True), NOT force_tpu_interpret_mode:
    # the TPU-semantics interpreter deadlocks under shard_map here
    def loss_sp(q_, k_, v_):
        o = flash_attention_spmd(q_, k_, v_, km, mesh, causal=True,
                                 block_q=16, block_k=128, interpret=True)
        return jnp.sum(o * co)

    def loss_ref(q_, k_, v_):
        o = flash_attention(q_, k_, v_, km, causal=True, block_q=16,
                            block_k=128, interpret=True)
        return jnp.sum(o * co)

    ls, gs = jax.value_and_grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-5)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)


def test_tisasrec_factored_equals_dense(rng):
    """The factored interval attention (bucket projections + segment-sum,
    no (Tq, Tk, C) tensor) must equal the dense reference layout: logits
    in both modes and the loss gradients."""
    from easydgl_tpu.train.steps import compute_loss, init_state

    cfg = preset("TiSASREC").replace(
        num_items=V, seqslen=L, num_units=16, num_heads=2, num_blocks=2,
        timelen=20, batch_size=B, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0)
    m_d = build_model(cfg)
    m_f = build_model(cfg.replace(attention_impl="factored"))
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=L, seed=9)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=B,
                     masklen=cfg.masklen, is_training=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    labels = jnp.asarray(labels)

    state = init_state(m_d, feats, seed=0)
    # identical param trees (the factored path touches the same tables)
    state_f = init_state(m_f, feats, seed=0)
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(state_f.params))

    ld_ev = BatchLoader(ds, data_mode="regressive", batch_size=B,
                        masklen=cfg.masklen, is_training=False)
    ef, _, _ = next(ld_ev.epoch(0))
    efeats = {k: jnp.asarray(v) for k, v in ef.items()}
    for m_feats, training in ((feats, True), (efeats, False)):
        ldx, _ = m_d.apply(state.params, m_feats, is_training=training,
                           rngs={"dropout": jax.random.key(2)})
        lfx, _ = m_f.apply(state.params, m_feats, is_training=training,
                           rngs={"dropout": jax.random.key(2)})
        np.testing.assert_allclose(np.asarray(lfx), np.asarray(ldx),
                                   rtol=2e-5, atol=2e-5)

    gd = jax.grad(lambda p: compute_loss(
        m_d, p, feats, labels, {"dropout": jax.random.key(1)}))(state.params)
    gf = jax.grad(lambda p: compute_loss(
        m_f, p, feats, labels, {"dropout": jax.random.key(1)}))(state.params)
    for (pa, a), (_, b_) in zip(jax.tree_util.tree_leaves_with_path(gd),
                                jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5, err_msg=str(pa))


def test_tisasrec_factored_long_forward():
    """TiSASREC at L=512 (17x the reference ceiling) via the factored
    path: the dense layout would materialize 2 x (B, 512, 512, C)
    interval tensors; the factored one touches nothing bigger than
    (B, H, 512, timelen+2)."""
    cfg = preset("TiSASREC").replace(
        num_items=100, seqslen=512, num_units=16, num_heads=2,
        num_blocks=1, timelen=512, batch_size=2,
        hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0,
        attention_impl="factored")
    model = build_model(cfg)
    ds = synthetic_split(num_rows=4, num_items=100, seqslen=512, seed=1)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=2,
                     masklen=cfg.masklen, is_training=True)
    features, _, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    logits, _ = model.apply(params, feats, is_training=True,
                            rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(np.asarray(logits)).all()


def test_tisasrec_factored_long_train_step():
    """Backward lock at L=512 for the factored interval path (the
    factored-vs-dense GRADS equality runs at modest L above; this pins
    the train step — loss + every grad finite — at a length where a
    factored-backward bug, e.g. in the segment-sum transpose, would
    surface as NaN/Inf or OOM)."""
    from easydgl_tpu.train.steps import compute_loss
    cfg = preset("TiSASREC").replace(
        num_items=100, seqslen=512, num_units=16, num_heads=2,
        num_blocks=1, timelen=512, batch_size=2,
        hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0,
        attention_impl="factored")
    model = build_model(cfg)
    ds = synthetic_split(num_rows=4, num_items=100, seqslen=512, seed=1)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=2,
                     masklen=cfg.masklen, is_training=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    loss, grads = jax.value_and_grad(lambda p: compute_loss(
        model, p, feats, jnp.asarray(labels),
        {"dropout": jax.random.key(2)}))(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))


def test_grec_long_train_step():
    """Backward lock at L=512 for the conv family (forward-only before
    round 5): loss + grads finite through the dilated-conv stack."""
    from easydgl_tpu.train.steps import compute_loss
    cfg = preset("GREC").replace(num_items=100, seqslen=512, num_units=16,
                                 masklen=8, batch_size=4,
                                 hidden_dropout_rate=0.0)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=8, num_items=100, seqslen=512, seed=0)
    ld = BatchLoader(ds, data_mode=model.data_mode, batch_size=4,
                     masklen=8, is_training=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    loss, grads = jax.value_and_grad(lambda p: compute_loss(
        model, p, feats, jnp.asarray(labels),
        {"dropout": jax.random.key(2)}))(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))


def test_grec_long_context_forward():
    """The conv family is long-context out of the box: GREC's dilated
    convs are O(L*C) with no (L, L) tensor anywhere — a L=512 forward
    (17x the reference's ceiling) runs and stays finite."""
    cfg = preset("GREC").replace(num_items=100, seqslen=512, num_units=16,
                                 masklen=8, batch_size=4,
                                 hidden_dropout_rate=0.0)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=8, num_items=100, seqslen=512, seed=0)
    ld = BatchLoader(ds, data_mode=model.data_mode, batch_size=4,
                     masklen=8, is_training=True)
    features, _, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    logits, _ = model.apply(params, feats, is_training=True,
                            rngs={"dropout": jax.random.key(2)})
    assert logits.shape == (4 * 8, model.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_remat_matches_no_remat(rng):
    """cfg.remat (per-block jax.checkpoint, the long-context memory lever)
    must change nothing: identical param tree, loss and grads."""
    from easydgl_tpu.train.steps import compute_loss, init_state

    cfg = _cfg()
    feats, labels = _batch(cfg)
    m0, m1 = build_model(cfg), build_model(cfg.replace(remat=True))
    state = init_state(m0, feats, seed=0)

    def loss(model):
        return jax.value_and_grad(lambda p: compute_loss(
            model, p, feats, labels, {"dropout": jax.random.key(1)}))(
            state.params)

    (l0, g0), (l1, g1) = loss(m0), loss(m1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                               jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))


def test_bert4rec_flash_equals_xla():
    """BERT4REC's (B, Tq, Tk) attention mask is an exact key-mask
    broadcast, so the flash core must reproduce the dense path."""
    cfg = preset("BERT4REC").replace(
        num_items=V, seqslen=7, num_units=16, num_heads=2, num_blocks=2,
        masklen=3, batch_size=B, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0)
    model_x = build_model(cfg)
    model_f = build_model(cfg.replace(attention_impl="flash"))
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=7, seed=3)
    ld = BatchLoader(ds, data_mode="masked", batch_size=B, masklen=3,
                     is_training=True)
    features, _, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model_x.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          feats, is_training=True)
    lx, _ = model_x.apply(params, feats, is_training=False)
    with pltpu.force_tpu_interpret_mode():
        lf, _ = model_f.apply(params, feats, is_training=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                               rtol=2e-4, atol=2e-4)


def test_bert4rec_cp_logits_match_single(rng):
    """BERT4REC (bidirectional ring) under a cp=4 mesh == single device;
    model_seqslen is L+1 so L=7 -> T=8 divides cp."""
    from easydgl_tpu.core.mesh import use_spmd_mesh
    from easydgl_tpu.train.steps import init_state

    cfg = preset("BERT4REC").replace(
        num_items=V, seqslen=7, num_units=16, num_heads=2, num_blocks=2,
        masklen=3, batch_size=B, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=7, seed=4)
    ld = BatchLoader(ds, data_mode="masked", batch_size=B, masklen=3,
                     is_training=False)
    features, _, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    state = init_state(model, feats, seed=0)
    ref, _ = model.apply(state.params, feats, is_training=False)

    mesh = make_mesh(MeshConfig(dp=2, mp=1, cp=4))

    @jax.jit
    def mesh_logits(params, feats):
        with use_spmd_mesh(mesh):
            lg, _ = model.apply(params, feats, is_training=False)
        return lg

    out = mesh_logits(state.params, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sasrec_cp_train_step_matches_single(rng):
    """SASREC on a cp=4 mesh (ring attention, T sharded) == single device."""
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = _cfg()
    model = build_model(cfg)
    feats, labels = _batch(cfg)

    state = init_state(model, feats, seed=0)
    rng_key = jax.random.key(7)

    ref_step = build_train_step(model, donate=False)
    ref_state, ref_loss = ref_step(state, feats, labels, rng_key)

    mesh = make_mesh(MeshConfig(dp=2, mp=1, cp=4))
    assert mesh.axis_names == ("data", "model", "seq")
    sh_state = shard_state(state, mesh)
    b_sh = batch_shardings((feats, labels), mesh)
    feats_sh = jax.tree.map(jax.device_put, feats, b_sh[0])
    labels_sh = jax.device_put(labels, b_sh[1])
    step = build_sharded_train_step(model, mesh, (feats, labels))
    new_state, loss = step(sh_state, feats_sh, labels_sh, rng_key)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))


def test_sasrec_cp_ulysses_matches_single(rng):
    """cp_impl='ulysses' (all_to_all seq<->head re-sharding) as the CP
    algorithm: same train-step equality as the ring (heads=4 divides
    cp=4)."""
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = _cfg(num_heads=4, cp_impl="ulysses")
    model = build_model(cfg)
    feats, labels = _batch(cfg)

    state = init_state(model, feats, seed=0)
    rng_key = jax.random.key(7)
    ref_step = build_train_step(model, donate=False)
    _, ref_loss = ref_step(state, feats, labels, rng_key)

    mesh = make_mesh(MeshConfig(dp=2, mp=1, cp=4))
    sh_state = shard_state(state, mesh)
    b_sh = batch_shardings((feats, labels), mesh)
    feats_sh = jax.tree.map(jax.device_put, feats, b_sh[0])
    labels_sh = jax.device_put(labels, b_sh[1])
    step = build_sharded_train_step(model, mesh, (feats, labels))
    _, loss = step(sh_state, feats_sh, labels_sh, rng_key)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_easydgl_cp_train_step_matches_single(rng):
    """The FLAGSHIP under CP: EasyDGL (BiMAU + marks + TPP) on a
    (dp=2, mp=1, cp=4) mesh — the ring MAU (two-sweep online softmax +
    shard-local intensity head, dist/context.py) must reproduce the
    single-device step: loss and every param update."""
    from easydgl_tpu.data.synthetic import synthetic_mark_table
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(
        num_items=V, seqslen=7, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=3, batch_size=B, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0, ct_reg=1e-4)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=7, seed=5)
    table = synthetic_mark_table(V, 4, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=B, masklen=3,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    labels = jnp.asarray(labels)

    state = init_state(model, feats, seed=0)
    rng_key = jax.random.key(7)
    ref_step = build_train_step(model, donate=False)
    ref_state, ref_loss = ref_step(state, feats, labels, rng_key)

    mesh = make_mesh(MeshConfig(dp=2, mp=1, cp=4))
    sh_state = shard_state(state, mesh)
    b_sh = batch_shardings((feats, labels), mesh)
    feats_sh = jax.tree.map(jax.device_put, feats, b_sh[0])
    labels_sh = jax.device_put(labels, b_sh[1])
    step = build_sharded_train_step(model, mesh, (feats, labels))
    new_state, loss = step(sh_state, feats_sh, labels_sh, rng_key)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))


def test_cp_eval_matches_single(rng):
    """Eval LOGITS under the cp mesh equal the single-device eval (rank
    counts can legitimately flip on the tiny random-init catalog when two
    items sit within float-reorder distance, so the equality statement is
    on the logits; metric-sum equivalence on real-scale logits is covered
    by tests/test_sharding.py and the distributed-eval tests)."""
    from easydgl_tpu.core.mesh import use_spmd_mesh
    from easydgl_tpu.train.steps import init_state

    cfg = _cfg()
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * B, num_items=V, seqslen=L, seed=11)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=B,
                     masklen=cfg.masklen, is_training=False)
    features, labels, valid = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}

    state = init_state(model, feats, seed=0)
    ref, _ = model.apply(state.params, feats, is_training=False)

    mesh = make_mesh(MeshConfig(dp=2, mp=1, cp=4))

    @jax.jit
    def mesh_logits(params, feats):
        with use_spmd_mesh(mesh):
            lg, _ = model.apply(params, feats, is_training=False)
        return lg

    out = mesh_logits(state.params, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
