"""Production pipeline parallelism (train/pp.py): a real model training
under a (data, pipe) mesh from config-level wiring.

Locks, on the forced 8-device CPU platform:
* pp_partition/pp_merge round-trip the sequential param layout exactly;
* the PP forward+loss equals the sequential one (rate 0);
* PP GRADS equal sequential grads leaf-for-leaf after pp_merge;
* a full optimizer step runs with stage params sharded over the pipe
  axis and the batch sharded over data (dp=2, pp=4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easydgl_tpu.config import MeshConfig, preset
from easydgl_tpu.core.mesh import make_mesh, pipe_axis_info
from easydgl_tpu.data.loader import BatchLoader
from easydgl_tpu.data.synthetic import synthetic_split
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.pp import (build_pp_apply, build_pp_train_step,
                                  init_pp_state, pp_merge, pp_partition)
from easydgl_tpu.train.steps import compute_loss, init_state

V, L, B = 60, 12, 16


def _setup(num_blocks=5, batch_size=B):
    cfg = preset("SASREC").replace(
        num_items=V, seqslen=L, num_units=16, num_heads=2,
        num_blocks=num_blocks, batch_size=batch_size,
        hidden_dropout_rate=0.0, attention_probs_dropout_rate=0.0)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=2 * batch_size, num_items=V, seqslen=L,
                         seed=5)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=batch_size,
                     masklen=cfg.masklen, is_training=True)
    f, lab, _ = next(ld.epoch(0))
    feats = {k: jnp.asarray(v) for k, v in f.items()}
    return cfg, model, feats, jnp.asarray(lab)


def test_pp_partition_roundtrip():
    cfg, model, feats, _ = _setup()
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    pp = pp_partition(params, cfg.num_blocks, 4)  # blocks 1..4 pipelined
    back = pp_merge(pp, cfg.num_blocks)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dp,pp,m", [(2, 4, 8), (1, 4, 4), (4, 2, 3)])
def test_pp_matches_sequential(dp, pp, m):
    """loss AND grads equality vs the sequential model (rate 0).
    (dp=4, pp=2, m=3) also exercises the M % S != 0 replicated-IO
    fallback path of pipeline_apply."""
    cfg, model, feats, labels = _setup(batch_size=12 if m == 3 else B)
    mesh = make_mesh(MeshConfig(dp=dp, mp=1, pp=pp),
                     devices=jax.devices()[:dp * pp])
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    rngs = {"dropout": jax.random.key(2)}

    loss_seq, grads_seq = jax.value_and_grad(
        lambda p: compute_loss(model, p, feats, labels, rngs))(params)

    pp_params = pp_partition(params, cfg.num_blocks, pp)
    pipe_ax, _ = pipe_axis_info(mesh)
    pp_apply = build_pp_apply(model, mesh, m, pipe_axis=pipe_ax)
    loss_pp, grads_pp = jax.value_and_grad(
        lambda p: compute_loss(model, p, feats, labels, rngs,
                               apply_fn=pp_apply))(pp_params)

    np.testing.assert_allclose(float(loss_pp), float(loss_seq),
                               rtol=1e-5, atol=1e-6)
    gm = pp_merge(grads_pp, cfg.num_blocks)
    for (pa, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(grads_seq),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gm),
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(pa))


def test_pp_train_step_runs_sharded():
    """Full production step: init_pp_state places stage params over the
    pipe axis; two steps run and the loss decreases-or-moves; stage
    leaves stay pipe-sharded after the update."""
    cfg, model, feats, labels = _setup()
    mesh = make_mesh(MeshConfig(dp=2, mp=1, pp=4))
    state = init_pp_state(model, feats, mesh)
    leaf = jax.tree.leaves(state.params["stages"])[0]
    assert "pipe" in str(leaf.sharding.spec)
    step = build_pp_train_step(model, mesh, num_microbatches=8,
                               donate=False)
    s1, l1 = step(state, feats, labels, jax.random.key(0))
    s2, l2 = step(s1, feats, labels, jax.random.key(0))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) != float(l1)
    leaf2 = jax.tree.leaves(s2.params["stages"])[0]
    assert "pipe" in str(leaf2.sharding.spec)
    # the PP-trained params keep converting to the sequential layout
    seq = pp_merge(s2.params, cfg.num_blocks)
    assert "block3_attn" in seq["params"]


def test_pp_with_dropout_runs():
    """Dropout ON through the pipelined blocks (per-(microbatch, block)
    deterministic streams): loss finite, grads finite."""
    cfg, model, feats, labels = _setup()
    cfg = cfg.replace(hidden_dropout_rate=0.2,
                      attention_probs_dropout_rate=0.2)
    model = build_model(cfg)
    mesh = make_mesh(MeshConfig(dp=2, mp=1, pp=4))
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        feats, is_training=True)
    pp_params = pp_partition(params, cfg.num_blocks, 4)
    pp_apply = build_pp_apply(model, mesh, 8)
    loss, grads = jax.value_and_grad(
        lambda p: compute_loss(model, p, feats, labels,
                               {"dropout": jax.random.key(3)},
                               apply_fn=pp_apply))(pp_params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(grads))
