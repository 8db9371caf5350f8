"""Pallas kernel parity tests vs pure-jnp references, run in interpreter
mode on CPU (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _data(rng, n=16, c=8, v=40):
    hidden = jnp.asarray(rng.randn(n, c).astype(np.float32))
    table = jnp.asarray(rng.randn(v, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(v).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, v, (n,)).astype(np.int32))
    return hidden, table, bias, labels


def test_catalog_nll_forward(rng):
    from easydgl_tpu.kernels.scoring import catalog_nll, catalog_nll_reference
    hidden, table, bias, labels = _data(rng)
    lse, ll = catalog_nll(hidden, table, bias, labels, 8, 16)
    rlse, rll = catalog_nll_reference(hidden, table, bias, labels)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(rll),
                               rtol=1e-5, atol=1e-5)


def test_catalog_nll_forward_unaligned(rng):
    """N and V not multiples of the block sizes exercise the padding path."""
    from easydgl_tpu.kernels.scoring import catalog_nll, catalog_nll_reference
    hidden, table, bias, labels = _data(rng, n=13, v=37)
    lse, ll = catalog_nll(hidden, table, bias, labels, 8, 16)
    rlse, rll = catalog_nll_reference(hidden, table, bias, labels)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(rll),
                               rtol=1e-5, atol=1e-5)


def test_catalog_nll_grads(rng):
    from easydgl_tpu.kernels.scoring import catalog_nll, catalog_nll_reference
    hidden, table, bias, labels = _data(rng, n=8, c=8, v=32)

    def loss_k(h, t, b):
        lse, ll = catalog_nll(h, t, b, labels, 8, 16)
        # softmax+eps loss shape (Base.py:121-127)
        return jnp.sum(-jnp.log(jnp.exp(ll - lse) + 1e-5) *
                       jnp.arange(1, 9))

    def loss_r(h, t, b):
        lse, ll = catalog_nll_reference(h, t, b, labels)
        return jnp.sum(-jnp.log(jnp.exp(ll - lse) + 1e-5) *
                       jnp.arange(1, 9))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(hidden, table, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(hidden, table, bias)
    for a, b_, name in zip(gk, gr, ("dhidden", "dtable", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_compute_loss_kernel_vs_xla(rng):
    """compute_loss with the fused kernel (interpret mode) must equal the
    XLA logits path for a real model batch."""
    import jax
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import synthetic_split
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import compute_loss

    losses = {}
    for use_pallas in (False, True):
        cfg = preset("SASREC").replace(
            num_items=40, seqslen=8, num_units=16, num_heads=2,
            num_blocks=1, batch_size=8, use_pallas=use_pallas,
            hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0)
        model = build_model(cfg)
        ds = synthetic_split(num_rows=8, num_items=40, seqslen=8, seed=1)
        ld = BatchLoader(ds, data_mode="regressive", batch_size=8,
                         is_training=True)
        features, labels, _ = next(ld.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            feats, is_training=True)
        losses[use_pallas] = float(compute_loss(
            model, params, feats, jnp.asarray(labels),
            {"dropout": jax.random.key(2)}))
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_easydgl_pallas_intensity_path(rng):
    """EasyDGL loss with use_pallas=True (fused NLL + fused intensity head)
    must equal the XLA path."""
    import jax
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import compute_loss

    losses = {}
    for use_pallas in (False, True):
        cfg = preset("EasyDGL").replace(
            num_items=40, seqslen=8, num_units=16, num_heads=2,
            num_blocks=1, num_events=4, masklen=3, batch_size=8,
            use_pallas=use_pallas, ct_reg=1e-4,
            hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0)
        model = build_model(cfg)
        ds = synthetic_split(num_rows=8, num_items=40, seqslen=8, seed=1)
        table = synthetic_mark_table(40, 4, seed=1)
        ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=3,
                         is_training=True, mark_table=table,
                         needs_marks=True)
        features, labels, _ = next(ld.epoch(0))
        feats = {k: jnp.asarray(v) for k, v in features.items()}
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            feats, is_training=True)
        losses[use_pallas] = float(compute_loss(
            model, params, feats, jnp.asarray(labels),
            {"dropout": jax.random.key(2)}))
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def _mau_data(rng, b=3, h=2, t=7, dh=8, e=5):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    q, k, v, tt = mk(b, h, t, dh), mk(b, h, t, dh), mk(b, h, t, dh), \
        mk(b, h, t, dh)
    km = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    km = km.at[:, -3:].set(1.0)
    iv = jnp.asarray(rng.rand(b, t).astype(np.float32))
    oh = jnp.asarray((rng.rand(b, t, e) > 0.5).astype(np.float32))
    wd = mk(dh + 1, e * dh) * 0.1
    bd = mk(e * dh) * 0.1
    w = mk(e, dh) * 0.1
    sc = mk(e) * 0.1
    return q, k, v, tt, km, iv, oh, wd, bd, w, sc


def _mh(x):
    """(B, H, T, dh) -> the kernel's natural (B, T, H*dh) wire format."""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _sh(x, h):
    """(B, T, H*dh) -> (B, H, T, dh) (for reference-side autodiff)."""
    b, t, c = x.shape
    return x.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal,diag", [(True, False), (False, True)])
def test_mau_attention_forward(rng, causal, diag):
    """Fused MAU/BiMAU chain (kernels/mau_attention) vs jnp reference."""
    from easydgl_tpu.kernels.mau_attention import (mau_attention,
                                                   mau_attention_reference)
    args = _mau_data(rng)
    q, k, v, t = args[:4]
    ok, lk = mau_attention(_mh(q), _mh(k), _mh(v), _mh(t), *args[4:],
                           0, causal, diag, 0.0, num_heads=q.shape[1])
    orf, lrf = mau_attention_reference(*args, causal=causal, diag_reset=diag)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(_mh(orf)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lrf),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal,diag", [(True, False), (False, True)])
def test_mau_attention_grads(rng, causal, diag):
    """All 8 differentiable inputs (q/k/v/t + 4 intensity params), with
    cotangents on BOTH outputs (attention out + TPP-side intensities)."""
    from easydgl_tpu.kernels.mau_attention import (mau_attention,
                                                   mau_attention_reference)
    q, k, v, t, km, iv, oh, wd, bd, w, sc = _mau_data(rng)
    h = q.shape[1]

    def loss_k(a):
        o, l = mau_attention(_mh(a[0]), _mh(a[1]), _mh(a[2]), _mh(a[3]),
                             km, iv, oh, a[4], a[5], a[6], a[7],
                             0, causal, diag, 0.0, num_heads=h)
        return jnp.sum(jnp.sin(_sh(o, h))) + jnp.sum(jnp.cos(l))

    def loss_r(a):
        o, l = mau_attention_reference(a[0], a[1], a[2], a[3], km, iv, oh,
                                       a[4], a[5], a[6], a[7],
                                       causal=causal, diag_reset=diag)
        return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(l))

    a = (q, k, v, t, wd, bd, w, sc)
    gk = jax.grad(loss_k)(a)
    gr = jax.grad(loss_r)(a)
    names = ("dq", "dk", "dv", "dt", "dwd", "dbd", "dw", "dscaling")
    for x, y, name in zip(gk, gr, names):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("causal,diag", [(True, False), (False, True)])
def test_mau_attention_block_batched(rng, causal, diag):
    """b=8 triggers the multi-batch-row-per-program path (auto BB > 1):
    forward + all grads must match the reference exactly as at BB=1."""
    from easydgl_tpu.kernels import mau_attention as MA
    # at these tiny shapes the chooser must actually pick a block > 1
    assert MA._auto_bb(8, 2, 8, 128, MA._FWD_LIVE, MA._FWD_BUDGET) == 8
    q, k, v, t, km, iv, oh, wd, bd, w, sc = _mau_data(rng, b=8)
    h = q.shape[1]

    ok, lk = MA.mau_attention(_mh(q), _mh(k), _mh(v), _mh(t), km, iv, oh,
                              wd, bd, w, sc, 0, causal, diag, 0.0,
                              num_heads=h)
    orf, lrf = MA.mau_attention_reference(q, k, v, t, km, iv, oh, wd, bd,
                                          w, sc, causal=causal,
                                          diag_reset=diag)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(_mh(orf)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lrf),
                               rtol=1e-5, atol=1e-5)

    def loss_k(a):
        o, l = MA.mau_attention(_mh(a[0]), _mh(a[1]), _mh(a[2]), _mh(a[3]),
                                km, iv, oh, a[4], a[5], a[6], a[7],
                                0, causal, diag, 0.0, num_heads=h)
        return jnp.sum(jnp.sin(_sh(o, h))) + jnp.sum(jnp.cos(l))

    def loss_r(a):
        o, l = MA.mau_attention_reference(a[0], a[1], a[2], a[3], km, iv, oh,
                                          a[4], a[5], a[6], a[7],
                                          causal=causal, diag_reset=diag)
        return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(l))

    a = (q, k, v, t, wd, bd, w, sc)
    gk = jax.grad(loss_k)(a)
    gr = jax.grad(loss_r)(a)
    for x, y, name in zip(gk, gr, ("dq", "dk", "dv", "dt", "dwd", "dbd",
                                   "dw", "dscaling")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("bimau", [False, True])
def test_mau_module_fused_equals_xla(rng, bimau):
    """MAU/BiMAU module: intensity_impl='fused' (one Pallas kernel) must
    reproduce the XLA path bit-for-bit-ish at dropout 0."""
    from easydgl_tpu.nn.temporal import MAU, BiMAU
    b, t, c, h, e = 3, 7, 16, 2, 5
    x = jnp.asarray(rng.randn(b, t, 2 * c).astype(np.float32))
    km = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    km = km.at[:, -2:].set(1.0)
    iv = jnp.asarray(rng.rand(b, t).astype(np.float32))
    oh = jnp.asarray((rng.rand(b, t, e) > 0.5).astype(np.float32))

    def build(impl):
        if bimau:
            return BiMAU(c, h, e, 0.0, intensity_impl=impl)
        return MAU(c, h, e, 0.0, intensity_impl=impl)

    params = build("xla").init(jax.random.key(0), x, x, km, iv, oh,
                               deterministic=True)
    o_x, l_x = build("xla").apply(params, x, x, km, iv, oh,
                                  deterministic=True)
    o_f, l_f = build("fused").apply(params, x, x, km, iv, oh,
                                    deterministic=True)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal,diag", [(True, False), (False, True)])
def test_mau_attention_gathered_queries(rng, causal, diag):
    """Rectangular query-gather path: the kernel with Tq < Tk and explicit
    qpos must equal the FULL square computation's rows at those positions —
    forward, intensities, and every gradient (kv-side grads scatter back
    from only the gathered rows)."""
    from easydgl_tpu.kernels import mau_attention as MA
    q, k, v, t, km, iv, oh, wd, bd, w, sc = _mau_data(rng, b=4, t=7)
    h = q.shape[1]
    qpos = jnp.asarray(np.stack([np.sort(rng.choice(7, 3, replace=False))
                                 for _ in range(4)]).astype(np.int32))
    qg = jnp.take_along_axis(q, qpos[:, None, :, None], axis=2)
    ivg = jnp.take_along_axis(iv, qpos, axis=1)

    ok, lk = MA.mau_attention(_mh(qg), _mh(k), _mh(v), _mh(t), km, ivg, oh,
                              wd, bd, w, sc, 0, causal, diag, 0.0,
                              num_heads=h, qpos=qpos)
    # reference: full square chain, then gather the rows
    orf, lrf = MA.mau_attention_reference(q, k, v, t, km, iv, oh, wd, bd,
                                          w, sc, causal=causal,
                                          diag_reset=diag)
    orf = jnp.take_along_axis(orf, qpos[:, None, :, None], axis=2)
    lrf = jnp.take_along_axis(lrf, qpos[:, None, :, None], axis=2)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(_mh(orf)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lrf),
                               rtol=1e-5, atol=1e-5)

    # grads: rectangular jnp reference (qpos-aware) vs the kernel
    def loss_k(a):
        o, l = MA.mau_attention(_mh(jnp.take_along_axis(
            a[0], qpos[:, None, :, None], axis=2)), _mh(a[1]), _mh(a[2]),
            _mh(a[3]), km, ivg, oh, a[4], a[5], a[6], a[7], 0, causal,
            diag, 0.0, num_heads=h, qpos=qpos)
        return jnp.sum(jnp.sin(_sh(o, h))) + jnp.sum(jnp.cos(l))

    def loss_r(a):
        o, l = MA.mau_attention_reference(
            jnp.take_along_axis(a[0], qpos[:, None, :, None], axis=2),
            a[1], a[2], a[3], km, ivg, oh, a[4], a[5], a[6], a[7],
            causal=causal, diag_reset=diag, qpos=qpos)
        return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(l))

    a = (q, k, v, t, wd, bd, w, sc)
    gk = jax.grad(loss_k)(a)
    gr = jax.grad(loss_r)(a)
    for x, y, name in zip(gk, gr, ("dq", "dk", "dv", "dt", "dwd", "dbd",
                                   "dw", "dscaling")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_mau_module_query_positions(rng, impl):
    """MAU module query_positions fast path == full path gathered at those
    rows (both XLA and fused kernel implementations)."""
    from easydgl_tpu.nn.temporal import BiMAU
    b, t, c, h, e = 3, 7, 16, 2, 5
    x = jnp.asarray(rng.randn(b, t, 2 * c).astype(np.float32))
    km = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.float32))
    km = km.at[:, -2:].set(1.0)
    iv = jnp.asarray(rng.rand(b, t).astype(np.float32))
    oh = jnp.asarray((rng.rand(b, t, e) > 0.5).astype(np.float32))
    qpos = jnp.asarray(np.stack([np.sort(rng.choice(t, 3, replace=False))
                                 for _ in range(b)]).astype(np.int32))

    mod = BiMAU(c, h, e, 0.0, intensity_impl=impl)
    params = mod.init(jax.random.key(0), x, x, km, iv, oh,
                      deterministic=True)
    o_full, l_full = mod.apply(params, x, x, km, iv, oh,
                               deterministic=True)
    o_g, l_g = mod.apply(params, x, x, km, iv, oh, deterministic=True,
                         query_positions=qpos)
    np.testing.assert_allclose(
        np.asarray(o_g),
        np.asarray(jnp.take_along_axis(o_full, qpos[:, :, None], axis=1)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(l_g),
        np.asarray(jnp.take_along_axis(l_full, qpos[:, None, :, None],
                                       axis=2)),
        rtol=1e-5, atol=1e-5)


def test_catalog_nll_grads_twopass_fallback(rng, monkeypatch):
    """The huge-N two-pass backward (taken when the fused kernel's d_hidden
    accumulator would not fit VMEM) must match the reference too."""
    import easydgl_tpu.kernels.scoring as S
    hidden, table, bias, labels = _data(rng, n=8, c=8, v=32)
    monkeypatch.setattr(S, "_FUSED_BWD_VMEM_BYTES", 0)

    def loss_k(h, t, b):
        lse, ll = S.catalog_nll(h, t, b, labels, 8, 16)
        return jnp.sum(-jnp.log(jnp.exp(ll - lse) + 1e-5) *
                       jnp.arange(1, 9))

    def loss_r(h, t, b):
        lse, ll = S.catalog_nll_reference(h, t, b, labels)
        return jnp.sum(-jnp.log(jnp.exp(ll - lse) + 1e-5) *
                       jnp.arange(1, 9))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(hidden, table, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(hidden, table, bias)
    for a, b_, name in zip(gk, gr, ("dhidden", "dtable", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
