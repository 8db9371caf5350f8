"""Jitted train / eval step builders.

Replaces the reference's graph-building in Sequential.train/eval
(src/model/Base.py:119-207). Each step is a pure function compiled once by
XLA; under a multi-device mesh the batch rides the "data" axis and the
embedding/softmax tables the "model" axis, with gradient psums and
vocab-sharded matmuls inserted by the partitioner.

Loss modes:
* softmax_eps — full-catalog ``-log(softmax(logits) + 1e-5)`` at the label,
  label-weight mask on padding id 0, mean over non-pad labels
  (Base.py:119-131). Computed via logsumexp at the label position only;
  the +1e-5 epsilon makes this NOT plain cross-entropy, so it is applied
  exactly: loss_i = -log(exp(logit_y - lse) + 1e-5).
* sparse_ce — BERT4REC's masked-LM loss (BERT4REC.py:131-149).
* grec — unweighted-mean CE + 0.001 * mean over parameter tensors of
  l2_loss(v) (GREC.py:110-116).

L2: ``l2_reg * 0.5 * sum(w^2)`` over every param named ``lookup_table``
(the reference attaches an l2 regularizer to each Embedding it builds,
coding.py:48; get_regularization_loss sums them, Base.py:130).
TPP: CTSMA/EasyDGL add their biased-likelihood regularizer
(model.tpp_regularizer).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from easydgl_tpu.eval.metrics import mask_seen_logits, metric_sums
from easydgl_tpu.models.base import SequentialModel
from easydgl_tpu.train.optim import build_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def l2_lookup_tables(params) -> jnp.ndarray:
    """0.5 * sum(w^2) over every 'lookup_table' leaf."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[-1] == "lookup_table":
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total


def l2_mean_all(params) -> jnp.ndarray:
    """mean over parameter TENSORS of 0.5*sum(w^2) (GREC.py:115)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(0.5 * jnp.sum(jnp.square(w)) for w in leaves) / len(leaves)


def _round8(x: int) -> int:
    return (x + 7) // 8 * 8


def _round128(x: int) -> int:
    return (x + 127) // 128 * 128


def _label_nll(logits: jnp.ndarray, labels: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lse - logit_at_label, logit_at_label) without materializing one-hots."""
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return lse - label_logit, label_logit


from easydgl_tpu.models.base import kernel_enabled as _kernel_enabled


def compute_loss(model: SequentialModel, params, features: Dict, labels,
                 rngs: Optional[Dict] = None, apply_fn=None) -> jnp.ndarray:
    """``apply_fn`` overrides ``model.apply`` (same signature) for
    alternative forward layouts — e.g. the pipeline-parallel one
    (train/pp.py), whose params tree is {"rest", "stages"}. Everything
    downstream (streaming catalog NLL, loss modes, the path-keyed l2
    regularizers) is layout-agnostic."""
    cfg = model.cfg
    from easydgl_tpu.nn.layers import use_compute_dtype
    with use_compute_dtype(cfg.matmul_dtype):
        logits, aux = (apply_fn or model.apply)(params, features,
                                                is_training=True, rngs=rngs)
    flat = labels.reshape(-1)
    from easydgl_tpu.models.base import SCORING
    if SCORING in aux and _kernel_enabled(cfg):
        # fused tile-streamed catalog NLL (Pallas); the logits einsum above
        # becomes dead code and is eliminated by XLA
        from easydgl_tpu.core.mesh import spmd_mesh
        from easydgl_tpu.kernels.scoring import catalog_nll
        hidden, table, bias = aux[SCORING]
        v = table.shape[0]
        dt = cfg.matmul_dtype
        if dt is not None:
            hidden, table = hidden.astype(dt), table.astype(dt)
        mesh = spmd_mesh()
        if mesh is not None:
            # vocab-sharded kernel: rows on the data axis, table rows on the
            # model axis, exact lse/label psum merge (kernels/spmd.py)
            from easydgl_tpu.kernels.spmd import catalog_nll_spmd
            mp = mesh.shape[mesh.axis_names[1]]
            dp = mesh.shape[mesh.axis_names[0]]
            shard_vocab = mp > 1 and v % mp == 0
            v_loc = v // mp if shard_vocab else v
            n_loc = hidden.shape[0] // dp
            lse, ll = catalog_nll_spmd(
                hidden, table, bias, flat, mesh,
                min(512, _round8(n_loc)), min(2048, _round128(v_loc)),
                shard_vocab=shard_vocab)
        else:
            block_n = min(512, _round8(hidden.shape[0]))
            block_v = min(2048, _round128(v))
            lse, ll = catalog_nll(hidden, table, bias, flat, block_n,
                                  block_v)
        ce = lse - ll
    else:
        ce, _ = _label_nll(logits, flat)

    if model.loss_mode == "grec":
        # the reference's mean CE (GREC.py:110-116) has no label-weight
        # mask, so all-zero PAD rows (train tail batches, loader.py) would
        # shift it — mask them via in-batch row validity instead. Real rows
        # always have >=1 nonzero token, so this is exact on full batches.
        v_row = (jnp.abs(features["seqs_i"]).sum(axis=1) > 0)
        v = jnp.broadcast_to(v_row[:, None],
                             labels.shape).reshape(-1).astype(jnp.float32)
        loss = (jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
                + 0.001 * l2_mean_all(params))
        return loss

    if model.loss_mode == "softmax_eps":
        # -log(p + 1e-5) with p = exp(-ce) (Base.py:121-127)
        per_example = -jnp.log(jnp.exp(-ce) + 1e-5)
    else:  # sparse_ce
        per_example = ce
    w = (flat != 0).astype(jnp.float32)
    loss = jnp.sum(w * per_example) / (jnp.sum(w) + 1e-5)
    if cfg.l2_reg:
        loss = loss + cfg.l2_reg * l2_lookup_tables(params)
    if model.uses_tpp and cfg.ct_reg:
        loss = loss + model.tpp_regularizer(
            aux, features, labels, features["next_marks"])
    return loss


def device_marks(features, labels, mark_table, *, is_training: bool):
    """On-device mark lookup, same math as the loader's host path
    (loader.py::_marks_of — ids beyond the table, incl. the MASK id, map
    to row 0). The (B, L+1, E) float indicators are ~64x the id volume;
    materializing them on device from a resident table instead of
    shipping them per batch removes the dominant host->device transfer of
    the production loop (measured 12.4 ms per 4 MB marks tensor over the
    remote-relay link vs ~0 for the ids already being sent). No-op when
    the loader already supplied marks or no table is configured."""
    if mark_table is None or "seqs_marks" in features:
        return features
    features = dict(features)

    def look(ids):
        safe = jnp.where(ids >= mark_table.shape[0], 0, ids)
        return jnp.take(mark_table, safe, axis=0)

    features["seqs_marks"] = look(features["seqs_i"])
    if is_training:
        features["next_marks"] = look(labels)
    return features


def build_train_step(model: SequentialModel, donate: bool = True,
                     mark_table=None):
    """Returns jitted (state, features, labels, rng) -> (state, loss).
    ``mark_table``: optional (V, E) float32 array closed over as a
    device-resident constant for in-step mark lookups (device_marks)."""
    tx = build_optimizer(model.cfg.optim)
    mt = None if mark_table is None else jnp.asarray(mark_table)

    def step(state: TrainState, features, labels, rng):
        features = device_marks(features, labels, mt, is_training=True)
        dropout_rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(model, p, features, labels,
                                   {"dropout": dropout_rng}))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_multi_step(model: SequentialModel, donate: bool = True):
    """K train steps in ONE dispatch: lax.scan over a stacked batch pytree
    ((K, B, ...) features / (K, B, ...) labels). Amortizes per-step launch
    overhead — the TPU-side equivalent of the reference's sess.run hot loop
    (src/main.py:115-122) without the per-step Python/runtime crossing.

    Returns jitted (state, stacked_features, stacked_labels, rng) ->
    (state, (K,) losses).
    """
    tx = build_optimizer(model.cfg.optim)

    def one(state: TrainState, batch, rng):
        features, labels = batch
        dropout_rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(model, p, features, labels,
                                   {"dropout": dropout_rng}))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def multi(state: TrainState, features, labels, rng):
        # per-step dropout = fold_in(rng, global step): seed-dependent AND
        # step-unique, matching the single-step path (build_train_step)
        return jax.lax.scan(lambda s, b: one(s, b, rng), state,
                            (features, labels))

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def stack_batches(batches):
    """[(features, labels), ...] -> stacked pytrees with a leading K dim."""
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *[b[0] for b in batches])
    labels = jnp.stack([b[1] for b in batches])
    return feats, labels


def init_state(model: SequentialModel, sample_features: Dict,
               seed: int = 0) -> TrainState:
    tx = build_optimizer(model.cfg.optim)
    params = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        sample_features, is_training=True)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def build_eval_step(model: SequentialModel, mark_table=None):
    """Returns jitted (params, features, labels, valid) -> metric sums.

    Mirrors Sequential.eval (Base.py:150-207): last-position logits,
    optional mask_seen, top-100 HR/NDCG sums.
    """
    mask_seen = model.cfg.mask_seen
    mt = None if mark_table is None else jnp.asarray(mark_table)

    def step(params, features, labels, valid):
        features = device_marks(features, labels, mt, is_training=False)
        from easydgl_tpu.nn.layers import use_compute_dtype
        with use_compute_dtype(model.cfg.matmul_dtype):
            logits, _ = model.apply(params, features, is_training=False)
        if mask_seen:
            logits = mask_seen_logits(logits, features["seqs_i"])
        true_items = labels[:, -1]   # eval truth = last position (Base.py:169)
        return logits, metric_sums(logits, true_items, valid)

    def sums_only(params, features, labels, valid):
        return step(params, features, labels, valid)[1]

    return jax.jit(sums_only)


def build_analytics_step(model: SequentialModel):
    """Eval step that ALSO returns the raw logits — the reference's
    "ANALYTICS" collection (Base.py:154, analytics.py:90-100)."""
    mask_seen = model.cfg.mask_seen

    def step(params, features, labels, valid):
        from easydgl_tpu.nn.layers import use_compute_dtype
        with use_compute_dtype(model.cfg.matmul_dtype):
            logits, _ = model.apply(params, features, is_training=False)
        ranked = mask_seen_logits(logits, features["seqs_i"]) if mask_seen \
            else logits
        return logits, metric_sums(ranked, labels[:, -1], valid)

    return jax.jit(step)
