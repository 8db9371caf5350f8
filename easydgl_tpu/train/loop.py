"""Training/evaluation loop (replaces reference src/main.py:78-151).

Per epoch: run the jitted train step over the shuffled train loader, then
stream validation and test metrics, feed EarlyStopping on validation H100,
checkpoint on improvement, stop on patience/NaN.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from easydgl_tpu.config import Config
from easydgl_tpu.data.loader import BatchLoader, PackedDataset
from easydgl_tpu.eval.metrics import MetricAccumulator
from easydgl_tpu.models.base import SequentialModel
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.checkpoint import Checkpointer
from easydgl_tpu.train.early_stopping import EarlyStopping
from easydgl_tpu.train.steps import (TrainState, build_eval_step,
                                     build_train_step, init_state)

log = logging.getLogger(__name__)


def make_loaders(cfg: Config, model: SequentialModel,
                 train: PackedDataset, valid: PackedDataset,
                 test: PackedDataset,
                 mark_table: Optional[np.ndarray] = None,
                 host_id: int = 0, num_hosts: int = 1,
                 marks_on_device: bool = False):
    """Per-host loaders. cfg.batch_size is the GLOBAL batch; each host
    loads batch_size/num_hosts rows of its disjoint shard and the batches
    are reassembled into global arrays by the multihost prefetcher."""
    assert cfg.batch_size % num_hosts == 0, \
        f"global batch {cfg.batch_size} not divisible by {num_hosts} hosts"
    kw = dict(data_mode=model.data_mode,
              batch_size=cfg.batch_size // num_hosts,
              masklen=cfg.masklen, seed=cfg.seed, mark_table=mark_table,
              needs_marks=model.uses_tpp, host_id=host_id,
              num_hosts=num_hosts, marks_on_device=marks_on_device)
    return (BatchLoader(train, is_training=True, **kw),
            BatchLoader(valid, is_training=False, **kw),
            BatchLoader(test, is_training=False, **kw))


def device_prefetch(iterator, size: int = 2, shardings=None,
                    multihost: bool = False):
    """Keep ``size`` batches in flight on-device (async device_put) so host
    batch assembly and H2D transfer overlap device compute — the pipeline
    role of the reference's tf.data prefetch (dataloader.py:245).
    ``shardings``: optional fn(pytree) -> sharding pytree for SPMD meshes.
    ``multihost``: each host's iterator yields its LOCAL shard of the batch;
    assemble per-host shards into global arrays (the DCN-spanning form)."""
    import collections
    buf = collections.deque()

    def put(item):
        if multihost:
            sh = shardings(item)
            return jax.tree.map(
                lambda x, s: jax.make_array_from_process_local_data(
                    s, np.asarray(x)), item, sh)
        if shardings is not None:
            sh = shardings(item)
            return jax.tree.map(
                lambda x, s: jax.device_put(jnp.asarray(x), s), item, sh)
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x)), item)

    for item in iterator:
        buf.append(put(item))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def evaluate(eval_step, params, loader: BatchLoader,
             shardings=None, multihost: bool = False) -> Dict[str, float]:
    acc = MetricAccumulator()
    for features, labels, valid in device_prefetch(loader.epoch(),
                                                   shardings=shardings,
                                                   multihost=multihost):
        acc.update(eval_step(params, features, labels, valid))
    return acc.result()


def train_model(cfg: Config, train_ds: PackedDataset, valid_ds: PackedDataset,
                test_ds: PackedDataset,
                mark_table: Optional[np.ndarray] = None,
                ckpt_dir: Optional[str] = None,
                num_epochs: Optional[int] = None,
                resume: bool = False,
                mesh=None
                ) -> Tuple[TrainState, Dict[str, float]]:
    """Train with early stopping. With ``mesh`` (jax.sharding.Mesh over
    (data, model) axes), the SPMD path is used: DP batches, row-sharded
    item table, distributed full-catalog eval."""
    from easydgl_tpu.core.runtime import host_shard_info
    model = build_model(cfg)
    host_id, num_hosts = host_shard_info()
    multihost = num_hosts > 1
    if multihost and mesh is None:
        # multi-host requires a global mesh for cross-host batch assembly
        from easydgl_tpu.core.mesh import make_mesh
        mesh = make_mesh(cfg.mesh)
    # mark indicators are looked up ON DEVICE from a resident table
    # (train/steps.py::device_marks) — the host loop then ships only ids
    dev_marks = mark_table is not None and model.uses_tpp
    mt = (np.asarray(mark_table).astype(np.float32) if dev_marks else None)
    tr_loader, vl_loader, te_loader = make_loaders(
        cfg, model, train_ds, valid_ds, test_ds, mark_table,
        host_id=host_id, num_hosts=num_hosts, marks_on_device=dev_marks)

    # init from one sample batch (host-local shapes are fine for shapes of
    # params; the step consumes GLOBAL batches)
    features, labels, _ = next(tr_loader.epoch(0))
    sample = {k: jnp.asarray(v) for k, v in features.items()}
    if dev_marks:
        from easydgl_tpu.train.steps import device_marks
        sample = device_marks(sample, jnp.asarray(labels),
                              jnp.asarray(mt), is_training=True)
    state = init_state(model, sample, cfg.seed)
    batch_sh = None
    to_eval_params = lambda p: p
    if mesh is not None:
        from easydgl_tpu.eval.evaluator import build_distributed_eval_step
        from easydgl_tpu.core.mesh import pipe_axis_info
        from easydgl_tpu.train.sharded import (batch_shardings,
                                               build_sharded_train_step,
                                               shard_state)
        pipe_ax, pp = pipe_axis_info(mesh)
        if pipe_ax is not None:
            # pipeline parallelism (train/pp.py): stage params sharded
            # over the pipe axis, GPipe microbatching; eval/checkpoints
            # convert through pp_merge to the sequential layout on demand
            from easydgl_tpu.train.pp import (build_pp_train_step,
                                              init_pp_state, pp_merge,
                                              pp_supported)
            if not pp_supported(model):
                raise ValueError(
                    f"{cfg.model}: no pipeline decomposition registered "
                    "(train/pp.py::_PP_MODELS); drop --pp or pick a "
                    "supported model")
            mb = cfg.pp_microbatches
            if mb <= 0:  # auto: >=4*S keeps the bubble under 20%; each
                # microbatch's rows must still shard over the data axis
                b = cfg.batch_size
                dp_size = mesh.shape[mesh.axis_names[0]]
                mb = next((m for m in (4 * pp, 2 * pp, pp)
                           if b % m == 0 and (b // m) % dp_size == 0), 1)
            state = init_pp_state(model, sample, mesh, pipe_axis=pipe_ax,
                                  seed=cfg.seed, params=state.params)
            train_step = build_pp_train_step(model, mesh, mb,
                                             pipe_axis=pipe_ax,
                                             mark_table=mt)
            to_eval_params = lambda p: pp_merge(p, cfg.num_blocks)
        else:
            state = shard_state(state, mesh)
            train_step = build_sharded_train_step(model, mesh, None,
                                                  mark_table=mt)
        mp = mesh.shape[mesh.axis_names[1]]
        if mp > 1 and model.vocab_size % mp == 0:
            eval_step = build_distributed_eval_step(model, mesh,
                                                    mark_table=mt)
        else:
            from easydgl_tpu.train.sharded import build_sharded_eval_step
            eval_step = build_sharded_eval_step(model, mesh, mark_table=mt)
        batch_sh = lambda item: batch_shardings(item, mesh)
    else:
        train_step = build_train_step(model, mark_table=mt)
        eval_step = build_eval_step(model, mark_table=mt)
    rng = jax.random.key(cfg.seed, impl=cfg.resolved_prng_impl())

    ckpt = Checkpointer(ckpt_dir) if ckpt_dir else None
    start_epoch = 0
    if resume and ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        steps_per_epoch = max(tr_loader.num_batches(), 1)
        start_epoch = int(state.step) // steps_per_epoch
        log.info("resumed from step %d (epoch %d)", int(state.step),
                 start_epoch)
    state_ref = [state]
    stopper = EarlyStopping(
        cfg.model, cfg.patience,
        save_fn=(lambda: ckpt.save(state_ref[0])) if ckpt else None)

    epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for features, labels, _ in device_prefetch(tr_loader.epoch(epoch),
                                                   shardings=batch_sh,
                                                   multihost=multihost):
            state, loss = train_step(state, features, labels, rng)
            losses.append(loss)
        state_ref[0] = state
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else np.nan
        log.info("%03d: Loss=%.4f (%.1fs)", epoch, mean_loss,
                 time.time() - t0)

        if epoch % cfg.eval_per_steps:
            continue
        vl = evaluate(eval_step, to_eval_params(state.params), vl_loader,
                      batch_sh, multihost)
        te = evaluate(eval_step, to_eval_params(state.params), te_loader,
                      batch_sh, multihost)
        log.info("%03d: valid %s", epoch,
                 {k: f"{v:.5f}" for k, v in vl.items()})
        if stopper.step(mean_loss, vl.get("H100", 0.0), vl, te):
            break
    return state, stopper.summary()
