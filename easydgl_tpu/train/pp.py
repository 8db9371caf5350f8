"""Production pipeline parallelism: train a model under a (data, pipe)
mesh with its block stack split into GPipe stages.

The reference is single-GPU with no parallelism (SURVEY.md §2.6 names
SP/CP/PP as first-class components of the new framework); the PP
MECHANISM (skewed fill-drain loop, ppermute hops, microbatch-sharded IO)
lives in dist/pipeline.py — this module is the POLICY layer that makes a
real model trainable under it from a config:

* ``pp_partition`` re-keys the sequential param tree into
  ``{"rest": <embed/head params>, "stages": <(S, blocks/S, ...)-stacked
  block params>}`` and ``pp_merge`` inverts it, so checkpoints, eval and
  parity tooling keep the sequential layout while the TRAIN STATE holds
  stage params sharded over the pipe axis (each device materializes only
  its own stage's blocks — the dimension PP exists to relieve).
* ``build_pp_train_step`` assembles embed -> pipeline_apply(stages) ->
  head and reuses ``compute_loss`` via its ``apply_fn`` hook, so every
  loss mode, the streaming catalog NLL and the path-keyed l2
  regularizers apply unchanged. The batch axis composes: microbatches
  ride P(pipe, data).

Supported models: SASREC — the plain-MHA family whose blocks are
position-local (models/sasrec.py::SASRECBlock is the stage body; the
PP-vs-sequential equality test in tests/test_pp.py locks the two block
definitions together). The registry (``_PP_MODELS``) takes one
(embed, head) pair per family to grow. Dropout inside pipelined blocks uses a
deterministic per-(microbatch, block) fold of the step rng — a different
stream than nn.Dropout's path-dependent one, so exact-parity tests pin
rate 0 (the same contract as the flash/ring/blocked kernels).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from easydgl_tpu.config import Config
from easydgl_tpu.dist.pipeline import (microbatch, pipeline_apply,
                                       unmicrobatch)
from easydgl_tpu.models.base import (SCORING, SequentialModel,
                                     prediction_rows, tied_logits)


# --- param-tree layout -----------------------------------------------------

_BLOCK_SUFFIXES = ("attn", "ffn", "ln0", "ln1")


def _block_names(i: int):
    return tuple(f"block{i}_{s}" for s in _BLOCK_SUFFIXES)


def pp_partition(params, num_blocks: int, stages: int):
    """Sequential param tree -> {"rest": ..., "stages": ...} with stage
    leaves stacked (S, blocks_per_stage, ...).

    Block 0 is SASREC's width adapter (2C-wide inputs from the CONCAT
    position coding, models/sasrec.py) — its param shapes differ from
    blocks 1+, so it stays in "rest" and runs inside the data-parallel
    embed section; blocks 1..N-1 are the pipelined stack, hence the
    (num_blocks - 1) % pp == 0 constraint."""
    n_piped = num_blocks - 1
    assert n_piped >= stages and n_piped % stages == 0, \
        f"num_blocks-1={n_piped} not divisible by pp={stages}"
    bps = n_piped // stages
    inner = dict(params["params"])
    per_block = []
    for i in range(1, num_blocks):
        per_block.append({c: inner.pop(n) for c, n in
                          zip(_BLOCK_SUFFIXES, _block_names(i))})
    stage_trees = [
        jax.tree.map(lambda *ls: jnp.stack(ls),
                     *per_block[s * bps:(s + 1) * bps])
        for s in range(stages)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *stage_trees)
    return {"rest": {"params": inner}, "stages": stacked}


def pp_merge(pp_params, num_blocks: int):
    """Inverse of ``pp_partition`` — back to the sequential layout (for
    checkpoints, eval, parity tooling)."""
    inner = dict(pp_params["rest"]["params"])
    stages = jax.tree.leaves(pp_params["stages"])[0].shape[0]
    bps = (num_blocks - 1) // stages
    for s in range(stages):
        for j in range(bps):
            i = 1 + s * bps + j
            blk = jax.tree.map(lambda l: l[s, j], pp_params["stages"])
            for c, n in zip(_BLOCK_SUFFIXES, _block_names(i)):
                inner[n] = blk[c]
    return {"params": inner}


def pp_state_shardings(pp_params, mesh: Mesh, pipe_axis: str):
    """stages: leading stage dim over the pipe axis; rest: the usual
    table-aware shardings (train/sharded.py::param_shardings)."""
    from easydgl_tpu.train.sharded import param_shardings
    stage_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, P(pipe_axis,
                                        *([None] * (l.ndim - 1)))),
        pp_params["stages"])
    return {"rest": param_shardings(pp_params["rest"], mesh),
            "stages": stage_sh}


# --- model decomposition ---------------------------------------------------
# Embed/head mirror the sequential __call__ pre/post-block code with the
# SAME submodule params (names cited per model); the block body is the
# standalone stage module. tests/test_pp.py locks PP == sequential
# (loss AND grads, rate 0), which is the drift guard for all three parts.

def _sasrec_embed(cfg: Config, rest, features, rng, deterministic):
    from easydgl_tpu.models.sasrec import SASRECBlock
    from easydgl_tpu.nn.coding import Embedding, PositionCoding
    ids = features["seqs_i"]
    emb = Embedding(cfg.num_items, cfg.num_units, zero_pad=True, scale=True)
    x = emb.apply({"params": rest["params"]["item_embs"]}, ids)
    x = PositionCoding(cfg.seqslen, cfg.num_units).apply(
        {"params": rest["params"]["pcoding"]}, x)
    if not deterministic and cfg.hidden_dropout_rate > 0.0:
        keep = jax.random.bernoulli(jax.random.fold_in(rng, 0),
                                    1.0 - cfg.hidden_dropout_rate, x.shape)
        x = x * keep / (1.0 - cfg.hidden_dropout_rate)
    mask = (ids != 0).astype(x.dtype)[:, :, None]
    x = x * mask
    # block 0: the 2C -> C width adapter runs data-parallel with the
    # embed (its param shapes differ from the pipelined blocks 1+)
    b0 = {c: rest["params"][n]
          for c, n in zip(_BLOCK_SUFFIXES, _block_names(0))}
    x = SASRECBlock(cfg).apply(
        {"params": b0}, x, mask, deterministic=deterministic,
        rngs={"dropout": jax.random.fold_in(rng, 2)})
    return x, mask


def _sasrec_head(cfg: Config, rest, h, features, is_training):
    from easydgl_tpu.nn.coding import Embedding
    from easydgl_tpu.nn.layers import ContribLayerNorm
    from easydgl_tpu.models.base import OutputBias
    x = ContribLayerNorm().apply({"params": rest["params"]["out_ln"]}, h)
    hidden = prediction_rows(x, is_training)
    emb = Embedding(cfg.num_items, cfg.num_units, zero_pad=True, scale=True)
    table = emb.apply({"params": rest["params"]["item_embs"]},
                      method=Embedding.table)
    bias = OutputBias(cfg.num_items).apply(
        {"params": rest["params"]["out_bias"]})
    aux = {SCORING: (hidden, table, bias)}
    return tied_logits(hidden, table, bias), aux


_PP_MODELS = {
    "SASREC": (_sasrec_embed, _sasrec_head),
}


def pp_supported(model: SequentialModel) -> bool:
    return type(model).__name__ in _PP_MODELS


# --- the train step --------------------------------------------------------

def build_pp_apply(model: SequentialModel, mesh: Mesh,
                   num_microbatches: int, pipe_axis: str = "pipe"):
    """(pp_params, features, is_training=..., rngs=...) -> (logits, aux),
    signature-compatible with ``model.apply`` so compute_loss's
    ``apply_fn`` hook consumes it directly."""
    from easydgl_tpu.models.sasrec import SASRECBlock
    cfg = model.cfg
    name = type(model).__name__
    embed_fn, head_fn = _PP_MODELS[name]
    s = mesh.shape[pipe_axis]
    assert (cfg.num_blocks - 1) % s == 0, \
        f"{name}: num_blocks-1={cfg.num_blocks - 1} not divisible by pp={s}"
    bps = (cfg.num_blocks - 1) // s
    data_axis = mesh.axis_names[0]
    block_mod = SASRECBlock(cfg)

    def pp_apply(pp_params, features, *, is_training: bool,
                 rngs: Optional[Dict] = None):
        det = not is_training
        rng = (rngs or {}).get("dropout", jax.random.key(0))
        x, mask = embed_fn(cfg, pp_params["rest"], features, rng, det)
        xs = microbatch(x, num_microbatches)
        ms = microbatch(mask, num_microbatches)
        seeds = jax.random.randint(
            jax.random.fold_in(rng, 1), (num_microbatches,), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

        def stage_fn(stage_params, h, ex):
            def blocks(h):
                for j in range(bps):
                    bp = jax.tree.map(lambda l: l[j], stage_params)
                    key = jax.random.fold_in(
                        jax.random.key(ex["seed"]),
                        jax.lax.axis_index(pipe_axis) * bps + j)
                    h = block_mod.apply({"params": bp}, h, ex["mask"],
                                        deterministic=det,
                                        rngs={"dropout": key})
                return h
            return (jax.checkpoint(blocks) if cfg.remat else blocks)(h)

        h = pipeline_apply(stage_fn, pp_params["stages"], xs, mesh,
                           pipe_axis=pipe_axis,
                           extra={"mask": ms, "seed": seeds},
                           batch_axis=data_axis)
        h = unmicrobatch(h)
        return head_fn(cfg, pp_params["rest"], h, features, is_training)

    return pp_apply


def init_pp_state(model: SequentialModel, sample_features: Dict,
                  mesh: Mesh, *, pipe_axis: str = "pipe", seed: int = 0,
                  params=None):
    """Init sequential params (or take ``params``), partition into the PP
    layout, and place: stage leaves sharded over the pipe axis, rest
    replicated (table-aware via train/sharded.py)."""
    from easydgl_tpu.train.optim import build_optimizer
    from easydgl_tpu.train.steps import TrainState, init_state
    s = mesh.shape[pipe_axis]
    if params is None:
        params = init_state(model, sample_features, seed=seed).params
    pp_params = pp_partition(params, model.cfg.num_blocks, s)
    tx = build_optimizer(model.cfg.optim)
    state = TrainState(pp_params, tx.init(pp_params),
                       jnp.zeros((), jnp.int32))
    sh = pp_state_shardings(pp_params, mesh, pipe_axis)
    # optax moments mirror the param tree shape-for-shape: give any
    # opt-state leaf whose shape matches a param the param's sharding
    # (the same heuristic as train/sharded.py::state_shardings)
    shapes = {}
    for leaf, lsh in zip(jax.tree.leaves(pp_params), jax.tree.leaves(sh)):
        shapes.setdefault(leaf.shape, lsh)
    opt_sh = jax.tree.map(
        lambda l: shapes.get(getattr(l, "shape", None),
                             NamedSharding(mesh, P())),
        state.opt_state)
    state_sh = TrainState(sh, opt_sh, NamedSharding(mesh, P()))
    return jax.tree.map(jax.device_put, state, state_sh)


def build_pp_train_step(model: SequentialModel, mesh: Mesh,
                        num_microbatches: int, *,
                        pipe_axis: str = "pipe", mark_table=None,
                        donate: bool = True):
    """jit-compiled (state, features, labels, rng) -> (state, loss) over
    the (data[, model], pipe) mesh; state.params in the PP layout
    (init_pp_state)."""
    import optax
    from easydgl_tpu.core.mesh import use_spmd_mesh
    from easydgl_tpu.train.optim import build_optimizer
    from easydgl_tpu.train.steps import (TrainState, compute_loss,
                                         device_marks)
    tx = build_optimizer(model.cfg.optim)
    mt = None if mark_table is None else jnp.asarray(mark_table)
    pp_apply = build_pp_apply(model, mesh, num_microbatches,
                              pipe_axis=pipe_axis)

    def step(state: TrainState, features, labels, rng):
        with use_spmd_mesh(mesh):
            features = device_marks(features, labels, mt, is_training=True)
            dropout_rng = jax.random.fold_in(rng, state.step)
            loss, grads = jax.value_and_grad(
                lambda p: compute_loss(model, p, features, labels,
                                       {"dropout": dropout_rng},
                                       apply_fn=pp_apply))(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
