"""Sharding-equivalence tests on the forced 8-device CPU platform
(SURVEY.md §4c): sharded must equal replicated bit-for-bit (up to fp
reduction order)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from easydgl_tpu.config import MeshConfig, preset
from easydgl_tpu.core.mesh import make_mesh
from easydgl_tpu.dist.embedding import sharded_tied_logits
from easydgl_tpu.dist.topk import (distributed_label_nll,
                                   distributed_mask_seen, distributed_top_k)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(dp=2, mp=4))


def test_sharded_tied_logits(mesh, rng):
    v, c, n = 32, 8, 6
    table = jnp.asarray(rng.randn(v, c).astype(np.float32))
    hidden = jnp.asarray(rng.randn(n, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(v).astype(np.float32))
    out = sharded_tied_logits(hidden, table, bias, mesh)
    ref = hidden @ table.T + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_distributed_top_k(mesh, rng):
    n, v, k = 4, 64, 7
    logits = jnp.asarray(rng.randn(n, v).astype(np.float32))
    vals, idx = distributed_top_k(logits, k, mesh)
    ref_vals, ref_idx = jax.lax.top_k(logits, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_distributed_label_nll(mesh, rng):
    n, v = 4, 64
    logits = jnp.asarray(rng.randn(n, v).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(0, v, (n,)).astype(np.int32))
    out = distributed_label_nll(logits, labels, mesh)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    ref = lse - jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_distributed_mask_seen(mesh, rng):
    n, v, t = 4, 64, 5
    logits = jnp.zeros((n, v), jnp.float32)
    seen = jnp.asarray(rng.randint(0, v, (n, t)).astype(np.int32))
    out = np.asarray(distributed_mask_seen(logits, seen, mesh))
    for r in range(n):
        for i in range(v):
            if i in set(np.asarray(seen)[r].tolist()):
                assert out[r, i] < -1e29
            else:
                assert out[r, i] == 0.0


def test_sharded_train_step_matches_single(rng):
    """One EasyDGL train step on a (2 data x 4 model) mesh must match the
    unsharded step (same seeds): DP psum + table sharding change nothing."""
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.loop import make_loaders
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    v = 48  # divisible by mp=4... table has 48 rows
    cfg = preset("EasyDGL").replace(
        num_items=v - 1, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=3, batch_size=8, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0, ct_reg=1e-4)
    model = build_model(cfg)
    assert model.vocab_size % 4 == 0

    ds = synthetic_split(num_rows=16, num_items=cfg.num_items, seqslen=8,
                         seed=5)
    table = synthetic_mark_table(cfg.num_items, 4, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=3,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(vv) for k, vv in features.items()}
    labels = jnp.asarray(labels)

    state = init_state(model, feats, seed=0)
    rng_key = jax.random.key(7)

    # single-device reference
    ref_step = build_train_step(model, donate=False)
    ref_state, ref_loss = ref_step(state, feats, labels, rng_key)

    # sharded
    mesh = make_mesh(MeshConfig(dp=2, mp=4))
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
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(pa))


def test_distributed_eval_matches_single(rng):
    """Distributed full-catalog eval (sharded scoring + top-k merge) must
    reproduce the single-device metric sums exactly (EasyDGL, 2x4 mesh)."""
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.eval.evaluator import build_distributed_eval_step
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.sharded import shard_state
    from easydgl_tpu.train.steps import (build_eval_step, build_train_step,
                                         init_state)

    cfg = preset("EasyDGL").replace(
        num_items=63, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=3, batch_size=8, mask_seen=True,
        hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    assert model.vocab_size % 4 == 0

    ds = synthetic_split(num_rows=16, num_items=cfg.num_items, seqslen=8,
                         seed=5)
    table = synthetic_mark_table(cfg.num_items, 4, seed=2)
    tl = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=3,
                     is_training=True, mark_table=table, needs_marks=True)
    el = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=3,
                     is_training=False, mark_table=table, needs_marks=True)
    f0, _, _ = next(tl.epoch(0))
    state = init_state(model, {k: jnp.asarray(v) for k, v in f0.items()}, 0)

    features, labels, valid = next(el.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    labels, valid = jnp.asarray(labels), jnp.asarray(valid)

    ref = jax.device_get(build_eval_step(model)(
        state.params, feats, labels, valid))

    mesh = make_mesh(MeshConfig(dp=2, mp=4))
    sh_state = shard_state(state, mesh)
    dist_step = build_distributed_eval_step(model, mesh)
    got = jax.device_get(dist_step(sh_state.params, feats, labels, valid))

    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_train_model_with_mesh(rng, tmp_path):
    """Full train_model loop on a (2 data x 4 model) mesh end-to-end:
    sharded steps + distributed eval must produce sane metrics."""
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.train.loop import train_model

    cfg = preset("EasyDGL").replace(
        num_items=63, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=3, batch_size=16, mask_seen=True, patience=50)
    mk = dict(num_items=cfg.num_items, seqslen=cfg.seqslen)
    tr = synthetic_split(num_rows=64, seed=1, **mk)
    vl = synthetic_split(num_rows=16, seed=2, **mk)
    te = synthetic_split(num_rows=16, seed=3, **mk)
    table = synthetic_mark_table(cfg.num_items, 4, seed=4)
    mesh = make_mesh(MeshConfig(dp=2, mp=4))
    state, res = train_model(cfg, tr, vl, te, mark_table=table,
                             num_epochs=2, mesh=mesh)
    assert res and 0.0 <= res["H100"] <= 1.0
    assert int(state.step) == 2 * (64 // 16)


def test_sharded_train_step_with_pallas_kernels(rng):
    """use_pallas=True under a (2 data x 4 model) mesh: the shard_mapped
    kernels (vocab-sharded catalog NLL + data-sharded fused MAU attention,
    kernels/spmd.py) must reproduce the single-device KERNEL step."""
    from jax.experimental.pallas import tpu as pltpu

    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(
        num_items=47, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=4, batch_size=8, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0, ct_reg=1e-4, use_pallas=True)
    model = build_model(cfg)
    assert model.vocab_size % 4 == 0      # 48 rows over mp=4

    ds = synthetic_split(num_rows=16, num_items=cfg.num_items, seqslen=8,
                         seed=5)
    table = synthetic_mark_table(cfg.num_items, 4, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=4,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(vv) for k, vv in features.items()}
    labels = jnp.asarray(labels)

    with pltpu.force_tpu_interpret_mode():
        state = init_state(model, feats, seed=0)
        rng_key = jax.random.key(7)

        ref_step = build_train_step(model, donate=False)
        ref_state, ref_loss = ref_step(state, feats, labels, rng_key)

        mesh = make_mesh(MeshConfig(dp=2, mp=4))
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
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=str(pa))


def test_catalog_nll_spmd_unit(mesh, rng):
    """Vocab-sharded fused NLL == reference, values AND grads (the
    out-of-shard-label -> padded-column trap is the regression target)."""
    from jax.experimental.pallas import tpu as pltpu

    from easydgl_tpu.kernels.scoring import catalog_nll_reference
    from easydgl_tpu.kernels.spmd import catalog_nll_spmd

    n, c, v = 16, 8, 48
    hidden = jnp.asarray(rng.randn(n, c).astype(np.float32))
    table = jnp.asarray(rng.randn(v, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(v).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, v, (n,)).astype(np.int32))

    def loss_s(h, t, b):
        lse, ll = catalog_nll_spmd(h, t, b, labels, mesh, 8, 16)
        return jnp.sum((lse - ll) * jnp.arange(1.0, n + 1))

    def loss_r(h, t, b):
        lse, ll = catalog_nll_reference(h, t, b, labels)
        return jnp.sum((lse - ll) * jnp.arange(1.0, n + 1))

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(float(loss_s(hidden, table, bias)),
                                   float(loss_r(hidden, table, bias)),
                                   rtol=1e-5)
        gs = jax.grad(loss_s, argnums=(0, 1, 2))(hidden, table, bias)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(hidden, table, bias)
    for a, b_, name in zip(gs, gr, ("dhidden", "dtable", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_mau_attention_spmd_head_sharded(rng):
    """Tensor-parallel fused MAU: heads split over the model axis (the
    natural (B, T, C) layout makes head sharding a pure channel split)
    must equal the single-device kernel, forward and gradients."""
    from jax.experimental.pallas import tpu as pltpu

    from easydgl_tpu.kernels.mau_attention import mau_attention
    from easydgl_tpu.kernels.spmd import mau_attention_spmd

    b, h, t, dh, e = 4, 2, 7, 8, 5
    c = h * dh
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    q, k, v, tt = mk(b, t, c), mk(b, t, c), mk(b, t, c), mk(b, t, c)
    km = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    km = km.at[:, -2:].set(1.0)
    iv = jnp.asarray(rng.rand(b, t).astype(np.float32))
    oh = jnp.asarray((rng.rand(b, t, e) > 0.5).astype(np.float32))
    wd, bd = mk(dh + 1, e * dh) * 0.1, mk(e * dh) * 0.1
    w, sc = mk(e, dh) * 0.1, mk(e) * 0.1
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    assert h % mesh.shape[mesh.axis_names[1]] == 0  # head sharding engages

    with pltpu.force_tpu_interpret_mode():
        def loss_ref(a):
            o, l = mau_attention(a[0], a[1], a[2], a[3], km, iv, oh,
                                 a[4], a[5], a[6], a[7], 0, False, True,
                                 0.0, num_heads=h)
            return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(l)), (o, l)

        def loss_sh(a):
            o, l = mau_attention_spmd(a[0], a[1], a[2], a[3], km, iv, oh,
                                      a[4], a[5], a[6], a[7], 0, mesh,
                                      False, True, 0.0, h)
            return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(l)), (o, l)

        a = (q, k, v, tt, wd, bd, w, sc)
        (lr, (o_r, l_r)), g_r = jax.value_and_grad(loss_ref,
                                                   has_aux=True)(a)
        (ls, (o_s, l_s)), g_s = jax.value_and_grad(loss_sh,
                                                   has_aux=True)(a)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-6)
    for x, y, name in zip(g_s, g_r, ("dq", "dk", "dv", "dt", "dwd",
                                     "dbd", "dw", "dsc")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_sharded_train_step_head_sharded_kernels(rng):
    """Full kernel-path sharded train step on a (4 data x 2 model) mesh
    where the model axis DIVIDES the head count: tensor-parallel attention
    + vocab-sharded NLL together must reproduce the single-device step."""
    from jax.experimental.pallas import tpu as pltpu

    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(
        num_items=47, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=4, batch_size=8, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0, ct_reg=1e-4, use_pallas=True)
    model = build_model(cfg)
    assert model.vocab_size % 2 == 0

    ds = synthetic_split(num_rows=16, num_items=cfg.num_items, seqslen=8,
                         seed=5)
    table = synthetic_mark_table(cfg.num_items, 4, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=4,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(vv) for k, vv in features.items()}
    labels = jnp.asarray(labels)

    with pltpu.force_tpu_interpret_mode():
        state = init_state(model, feats, seed=0)
        rng_key = jax.random.key(7)
        ref_step = build_train_step(model, donate=False)
        ref_state, ref_loss = ref_step(state, feats, labels, rng_key)

        mesh = make_mesh(MeshConfig(dp=4, mp=2))
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
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=str(pa))


def test_sharded_gather_queries_fast_path(rng):
    """cfg.gather_queries under a mesh: the rectangular (Tq=masklen) fused
    kernel runs inside the shard_map (data-sharded, head-sharded) and must
    reproduce the single-device fast-path step."""
    from jax.experimental.pallas import tpu as pltpu

    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.sharded import (batch_shardings,
                                           build_sharded_train_step,
                                           shard_state)
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(
        num_items=47, seqslen=8, num_units=16, num_heads=2, num_blocks=1,
        num_events=4, masklen=4, batch_size=8, hidden_dropout_rate=0.0,
        attention_probs_dropout_rate=0.0, ct_reg=1e-4, use_pallas=True,
        gather_queries=True)
    model = build_model(cfg)
    assert model.gather_queries

    ds = synthetic_split(num_rows=16, num_items=cfg.num_items, seqslen=8,
                         seed=9)
    table = synthetic_mark_table(cfg.num_items, 4, seed=2)
    ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=4,
                     is_training=True, mark_table=table, needs_marks=True)
    features, labels, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(vv) for k, vv in features.items()}
    labels = jnp.asarray(labels)

    with pltpu.force_tpu_interpret_mode():
        state = init_state(model, feats, seed=0)
        rng_key = jax.random.key(3)
        ref_step = build_train_step(model, donate=False)
        _, ref_loss = ref_step(state, feats, labels, rng_key)

        mesh = make_mesh(MeshConfig(dp=4, mp=2))   # head sharding engages
        sh_state = shard_state(state, mesh)
        b_sh = batch_shardings((feats, labels), mesh)
        feats_sh = jax.tree.map(jax.device_put, feats, b_sh[0])
        labels_sh = jax.device_put(labels, b_sh[1])
        step = build_sharded_train_step(model, mesh, (feats, labels))
        _, loss = step(sh_state, feats_sh, labels_sh, rng_key)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_no_table_all_gather_in_sharded_step():
    """HLO audit (VERDICT r2 Next #3): at a mesh with mp>1 the row-sharded
    item table must never be materialized by an all-gather in the compiled
    train step — the lookup is served by a gather-psum of (B/dp, L+1, C)
    activations (~V/B_shard/(L+1) times cheaper at the flagship: 36 MB vs
    1 MB). Full-shape audit: scripts/hlo_embedding_audit.py."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0] + "/scripts")
    try:
        from hlo_embedding_audit import (compile_sharded_step_hlo,
                                         collect_collectives,
                                         find_table_gathers)
    finally:
        sys.path.pop(0)

    vocab = 1024
    hlo = compile_sharded_step_hlo(vocab=vocab, units=64, batch=16,
                                   dp=4, mp=2, seqslen=12, num_heads=2)
    assert find_table_gathers(hlo, vocab) == []
    # sanity: the audit regex does see collectives in this program
    ops = {op for op, _, _ in collect_collectives(hlo)}
    assert "all-reduce" in ops
