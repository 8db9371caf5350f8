"""Shared model protocol for the 11-model zoo.

Replaces the reference's ``Sequential`` abstract base
(src/model/Base.py:90-207). In the TPU design, models are pure flax modules:
``apply(params, features, is_training, rngs) -> (logits, aux)`` where ``aux``
carries per-layer TPP intensities (the reference's "LLE_PP" graph collection,
src/model/CTSMA.py:76-77) as explicit outputs instead of TF collections.
Loss/eval/optimizer logic lives in ``train/`` and ``eval/`` (the reference
bakes it into the model class; here it is harness-level so it can be pjit'd
and sharded once for every model).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.nn.layers import mxu_einsum

from easydgl_tpu.config import Config

# Aux dict keys
INTENSITIES = "intensities"   # tuple of (B, H, T, E) per block (LLE_PP)
TIME_BIAS = "time_bias"       # TimelyREC per-row logit bias (N, 1)
SCORING = "scoring"           # (hidden, table, bias) for the fused NLL kernel


def kernel_enabled(cfg: Config) -> bool:
    """Resolve the use_pallas flag (None = auto -> XLA path; the train CLI
    flips it on for accelerator backends, cli/train.py). When a sharded
    step is tracing (core/mesh.use_spmd_mesh), kernel call sites wrap
    themselves in shard_map (kernels/spmd.py), so the flag is valid under
    a mesh too."""
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return False


def mau_impl(cfg: Config) -> str:
    """MAU/BiMAU implementation for the self-modulating models
    (CTSMA/EasyDGL). ``attention_impl == "flash"`` is the framework's
    long-context switch; for this family it selects the two-sweep
    schedule — O(T * block) memory like the MHA family's flash kernel —
    as Pallas kernels (kernels/mau_streamed.py) when kernels are enabled,
    else the blockwise-XLA scans (kernels/mau_blocked.py, the same math
    on any backend). Otherwise the fused Pallas chain kernel when
    kernels are enabled, else the materialized XLA chain."""
    if cfg.attention_impl == "flash":
        return "streamed" if kernel_enabled(cfg) else "blocked"
    return "fused" if kernel_enabled(cfg) else "xla"


class OutputBias(nn.Module):
    """Learned per-item bias with a -1000 pad on item 0
    (reference Base.py:106-113)."""
    vocab_size: int
    inf_pad: bool = True

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        if self.inf_pad:
            b = self.param("output_bias", nn.initializers.zeros,
                           (self.vocab_size - 1,))
            return jnp.concatenate(
                [jnp.full((1,), -1000.0, b.dtype), b])
        return self.param("output_bias", nn.initializers.zeros,
                          (self.vocab_size,))


def prediction_rows(x: jnp.ndarray, is_training: bool,
                    masked_positions: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """Select which per-position states become prediction rows.

    Training: all positions (AR models) or the masked positions (BERT-style
    batch_gather, reference BERT4REC.py:120-121); eval: last position only
    (reference SASREC.py:69-70).
    Returns (N, C) with N = B*T, B*masklen, or B.
    """
    if not is_training:
        return x[:, -1, :]
    if masked_positions is not None:
        b = x.shape[0]
        rows = jnp.take_along_axis(
            x, masked_positions[:, :, None].astype(jnp.int32), axis=1)
        return rows.reshape(b * masked_positions.shape[1], x.shape[-1])
    return x.reshape(-1, x.shape[-1])


def tied_logits(hidden: jnp.ndarray, table: jnp.ndarray,
                bias: jnp.ndarray) -> jnp.ndarray:
    """Full-catalog scoring via the tied input/output embedding table
    (reference SASREC.py:73-74 and friends): (N, C) @ (V, C)^T + bias.

    This is THE hot matmul of the framework ((B*masklen) x C x V); under
    pjit the table arrives row-sharded over the "model" axis and XLA emits
    a vocab-sharded matmul.
    """
    return mxu_einsum("nc,vc->nv", hidden, table) + bias


class SequentialModel(nn.Module):
    """Base class: subclasses set cfg and implement
    ``__call__(features, is_training) -> (logits, aux)``."""
    cfg: Config

    # --- class-level behavior descriptors (consumed by the harness) ---
    data_mode: str = "regressive"   # regressive | masked | grec | mau |
    #                                 regressive_datetime | regressive_entire
    loss_mode: str = "softmax_eps"  # softmax_eps | sparse_ce | grec
    uses_tpp: bool = False          # CTSMA / EasyDGL TPP regularizer

    @property
    def vocab_size(self) -> int:
        """Logit width; BERT4REC uses +2, GREC +2, EasyDGL +1."""
        return self.cfg.num_items

    @property
    def model_seqslen(self) -> int:
        """Sequence length consumed at train time (masked models use L+1)."""
        return self.cfg.seqslen

    def __call__(self, features: Dict[str, jnp.ndarray], *,
                 is_training: bool) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        raise NotImplementedError
