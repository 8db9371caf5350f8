"""Orbax checkpointing of the flat train-state pytree.

Replaces tf.train.Saver(max_to_keep=1) saved on validation improvement
(reference src/util.py:26,49,53-55) and the cuDNN opaque-buffer
canonicalization machinery (compat/cudnn_rnn_ops.py:724-908) — unnecessary
here since the GRU weights are a plain pytree.
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from easydgl_tpu.train.steps import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, state: TrainState, step: Optional[int] = None):
        step = int(state.step) if step is None else step
        self.manager.save(step, args=ocp.args.StandardSave(state._asdict()))
        self.manager.wait_until_finished()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.manager.latest_step() if step is None else step
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(template._asdict()))
        return TrainState(**restored)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()
