"""Differential-parity bridge to the reference TF implementation.

Loads the reference sources (default /root/reference/src, override with
$EASYDGL_REFERENCE_SRC) under ``tensorflow.compat.v1`` graph mode, builds a
reference model graph at an arbitrary config, initializes its variables, and
exposes:

* the initialized TF trainable variables as a ``{name: np.ndarray}`` dict,
  for transplant into this framework's flax params (see ``mapping.py``);
* callables evaluating the reference eval logits (``Sequential.__call__``
  with is_training=False, reference src/model/Base.py:150-154) and the raw
  per-batch train loss (``Sequential.train`` with ``trainOp`` patched to the
  identity, so ``train_op`` IS the pre-optimizer loss tensor,
  src/model/Base.py:119-144).

Environment notes:
* TF >= 2.9 moved ``tensorflow.python.training.tracking`` to
  ``tensorflow.python.trackable``; a sys.modules shim restores the old paths
  the reference's vendored compat wrappers import.
* ``CudnnGRU`` bottoms out in GPU-only kernels; ``build_ref`` swaps it for a
  CPU stack of the reference's own ``CudnnCompatibleGRUCell`` (documented
  math-identical to cuDNN, cudnn_rnn_ops.py:81-116) via ``tf.nn.dynamic_rnn``
  in time-major form, preserving the (time-major in/out) call contract of
  ``CudnnGRU.call`` (cudnn_rnn.py:381-444).
"""
from __future__ import annotations

import os
import sys
import types
from typing import Dict, Optional

import numpy as np

# Must precede the first tensorflow import in the process: the oneDNN
# grappler remapper fuses the last-axis-LN pattern into an op that IGNORES
# the graph's epsilon (uses 1e-3), silently breaking numeric parity.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

REFERENCE_SRC = os.environ.get("EASYDGL_REFERENCE_SRC", "/root/reference/src")

_LOADED: dict = {}


def reference_available() -> bool:
    if not os.path.isdir(REFERENCE_SRC):
        return False
    try:
        import tensorflow.compat.v1  # noqa: F401
        return True
    except Exception:
        return False


def _install_tracking_shim() -> None:
    """Restore tensorflow.python.training.tracking.* import paths."""
    if "tensorflow.python.training.tracking.base" in sys.modules:
        return
    from tensorflow.python.trackable import autotrackable as _at
    from tensorflow.python.trackable import base as _tb
    pkg = types.ModuleType("tensorflow.python.training.tracking")
    sys.modules[pkg.__name__] = pkg
    for name, target in (
            ("tensorflow.python.training.tracking.base", _tb),
            ("tensorflow.python.training.tracking.tracking", _at)):
        mod = types.ModuleType(name)
        for k in dir(target):
            setattr(mod, k, getattr(target, k))
        sys.modules[name] = mod


def _install_layers_shim(tf) -> None:
    """tf.compat.v1.layers lazy-loads into Keras 3 (which dropped the v1
    layers); point it at the still-shipped legacy implementations
    (tensorflow.python.keras.legacy_tf_layers)."""
    from tensorflow.python.keras.legacy_tf_layers import (convolutional,
                                                          core)
    layers = types.ModuleType("tf.layers")
    layers.dense = core.dense
    layers.dropout = core.dropout
    layers.Dense = core.Dense
    layers.Dropout = core.Dropout
    layers.Conv1D = convolutional.Conv1D
    layers.conv1d = convolutional.conv1d
    tf.layers = layers


def load_ref():
    """Import the reference package once; returns (tf, model_pkg)."""
    if "tf" in _LOADED:
        return _LOADED["tf"], _LOADED["model"]
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    _install_tracking_shim()
    _install_layers_shim(tf)
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import model as model_pkg  # the reference's src/model package
    _LOADED["tf"] = tf
    _LOADED["model"] = model_pkg
    return tf, model_pkg


def make_flags(cfg, model_name: str, mark_file: Optional[str] = None):
    """Reference argparse namespace (src/main.py:22-75) from a Config."""
    ns = types.SimpleNamespace()
    ns.model = model_name
    ns.num_items = cfg.num_items
    ns.num_units = cfg.num_units
    ns.num_heads = cfg.num_heads
    ns.num_blocks = cfg.num_blocks
    ns.seqslen = cfg.seqslen
    ns.time_scale = cfg.time_scale
    ns.masklen = cfg.masklen
    ns.filter_width = cfg.filter_width
    ns.dilations = ",".join(str(d) for d in cfg.dilations)
    ns.timelen = cfg.timelen
    ns.window_ratio = cfg.window_ratio
    ns.mark = mark_file
    ns.ct_reg = cfg.ct_reg
    ns.batch_size = cfg.batch_size
    ns.num_epochs = cfg.num_epochs
    ns.learning_rate = cfg.optim.learning_rate
    ns.l2_reg = cfg.l2_reg
    ns.hidden_dropout_rate = cfg.hidden_dropout_rate
    ns.attention_probs_dropout_rate = cfg.attention_probs_dropout_rate
    ns.num_train_steps = cfg.optim.num_train_steps
    ns.num_warmup_steps = cfg.optim.num_warmup_steps
    ns.eval_per_steps = cfg.eval_per_steps
    ns.mask_seen = cfg.mask_seen
    return ns


def write_mark_pickle(table: np.ndarray, path: str) -> str:
    """Write a mark table in the reference's format: pickled scipy CSR whose
    .toarray() is the dense [num_items, num_events] multi-hot
    (reference CTSMA.py:24-25)."""
    import pickle

    import scipy.sparse as sp
    # int64: the reference feeds the table values straight into
    # tf.nn.embedding_lookup (EasyDGL.py:87), which rejects int8
    with open(path, "wb") as f:
        pickle.dump(sp.csr_matrix(table.astype(np.int64)), f)
    return path


def _patch_gpu_gather_semantics(tf):
    """Make tf.nn.embedding_lookup on CPU behave like the GPU the reference
    ran on: out-of-bound indices produce ZERO vectors instead of raising.

    TiSASREC clips interval buckets to [0, timelen] INCLUSIVE while its
    TimeIntervalCoding table has only ``timelen`` rows (TiSASREC.py:59 vs
    :31-32), so the edge bucket Δt >= timelen is an out-of-range gather.
    tf.gather documents "On GPU, if an out of bound index is found, a 0 is
    stored in the corresponding output value"; on CPU it errors — the
    published Netflix numbers therefore embody the zero-vector semantics,
    which this shim reproduces exactly (and the TPU build mirrors in
    nn/coding.py::TimeIntervalCoding)."""
    orig = tf.nn.embedding_lookup
    if getattr(orig, "_gpu_like", False):   # idempotent across RefModels
        return

    def gpu_like(params, ids, *a, **kw):
        if isinstance(params, (list, tuple)) and len(params) == 1:
            params = params[0]
        if isinstance(params, (list, tuple)):
            return orig(params, ids, *a, **kw)   # partitioned: untouched
        v = params.shape[0]
        if v is None or not np.issubdtype(
                np.dtype(ids.dtype.as_numpy_dtype), np.integer):
            return orig(params, ids, *a, **kw)
        safe = tf.clip_by_value(ids, 0, int(v) - 1)
        out = orig(params, safe, *a, **kw)
        ok = tf.cast(tf.logical_and(ids >= 0, ids < tf.cast(int(v),
                                                            ids.dtype)),
                     out.dtype)
        return out * tf.expand_dims(ok, -1)

    gpu_like._gpu_like = True
    tf.nn.embedding_lookup = gpu_like


def _patch_cudnn_gru(tf):
    """Replace compat.cudnn_rnn.CudnnGRU with a CPU-runnable equivalent.

    The replacement stacks the reference's own CudnnCompatibleGRUCell
    (cudnn_rnn_ops.py:62-180 — the cuDNN math variant with reset-after-
    recurrent-matmul and two bias vectors) via dynamic_rnn, keeping the
    time-major (T, B, C) in/out contract of CudnnGRU.call.

    INIT matches the real GPU CudnnGRU build (cudnn_rnn.py:341-355 with
    GRU4REC.py:29's ``kernel_initializer=tf.orthogonal_initializer()``):
    every CANONICAL matrix — W_r/W_u/W_h of shape (num_units, in) and
    R_r/R_u/R_h of (num_units, num_units) — is an independent orthogonal
    draw, and ALL biases are 0. The compat cell's defaults (glorot over the
    concatenated gates kernel, gate bias 1.0) are distributions the GPU
    reference never produces and measurably change convergence speed at
    harness scale, so they must not leak into end-to-end comparisons.
    """
    from model.compat import cudnn_rnn, cudnn_rnn_ops

    def cudnn_like_kernel_init(num_units):
        orth = tf.orthogonal_initializer()

        def init(shape, dtype=None, partition_info=None):
            del partition_info
            c = num_units
            rows, cols = int(shape[0]), int(shape[1])
            if cols == 2 * c and rows > c:
                # gates kernel [[W_r|W_u],[R_r|R_u]] over concat([x, h])
                in_c = rows - c
                top = tf.concat([tf.transpose(orth((c, in_c), dtype)),
                                 tf.transpose(orth((c, in_c), dtype))], 1)
                bot = tf.concat([tf.transpose(orth((c, c), dtype)),
                                 tf.transpose(orth((c, c), dtype))], 1)
                return tf.concat([top, bot], axis=0)
            # candidate input (in, c) / hidden (c, c) projection: one
            # canonical (c, in) orthogonal, applied transposed
            return tf.transpose(orth((cols, rows), dtype))

        return init

    class CompatGRU:
        def __init__(self, num_layers, num_units, direction="unidirectional",
                     name=None, **kw):
            assert direction == "unidirectional"
            self.num_layers = num_layers
            self.num_units = num_units
            self.name = name or "cudnn_gru"

        def __call__(self, inputs, initial_state=None, training=True):
            # tf.nn.rnn_cell is Keras-3-gated; use the TF-internal originals
            from tensorflow.python.ops import rnn, rnn_cell_impl
            cells = []
            for _ in range(self.num_layers):
                cell = cudnn_rnn_ops.CudnnCompatibleGRUCell(
                    self.num_units,
                    kernel_initializer=cudnn_like_kernel_init(
                        self.num_units))
                # cuDNN build() zero-initializes every bias
                # (cudnn_rnn.py:344-346); the cell ctor exposes no bias
                # hook and would default the GATE bias to 1.0
                cell._bias_initializer = tf.zeros_initializer()
                cells.append(cell)
            multi = rnn_cell_impl.MultiRNNCell(cells)
            with tf.variable_scope(self.name):
                outputs, state = rnn.dynamic_rnn(
                    multi, inputs, dtype=tf.float32, time_major=True)
            return outputs, state

    # GRU4REC/S2PNM look up cudnn_rnn.CudnnGRU on the shared module object
    # at constructor time, so patching the module attribute covers both.
    cudnn_rnn.CudnnGRU_orig = getattr(cudnn_rnn, "CudnnGRU_orig",
                                      cudnn_rnn.CudnnGRU)
    cudnn_rnn.CudnnGRU = CompatGRU


class RefModel:
    """A built + initialized reference model graph.

    Attributes:
      variables: {var_name: np.ndarray} of the initialized trainables.
    Methods:
      eval_logits(features) -> (B, num_items) np.ndarray
      train_loss(features, labels) -> float (raw pre-optimizer loss)
    """

    def __init__(self, model_name: str, cfg, feature_specs: Dict[str, tuple],
                 mark_file: Optional[str] = None, seed: int = 1234,
                 build_train: bool = True, train_mode: str = "loss"):
        """train_mode:
        * "loss" — trainOp patched to identity; ``train_loss`` fetches the
          raw pre-optimizer loss (no variables are updated).
        * "step" — the model's REAL trainOp (its own optimizer: plain Adam
          for the Sequential default, beta2=0.98/eps=1e-9/clip-5 for
          GRU4REC/S2PNM/TGREC, Base.py:142-144 + GRU4REC.py:60-71);
          ``train_step`` runs one update and returns the pre-update loss —
          used by the trajectory-parity tests.
        """
        tf, model_pkg = load_ref()
        _patch_cudnn_gru(tf)
        _patch_gpu_gather_semantics(tf)
        self._tf = tf
        tf.reset_default_graph()
        tf.set_random_seed(seed)
        np.random.seed(seed)

        flags = make_flags(cfg, model_name, mark_file)
        self._placeholders = {}
        with tf.variable_scope("main"):
            from util import ranking
            self.model = ranking(flags)
            feats = {}
            for name, (shape, dtype) in feature_specs.items():
                ph = tf.placeholder(dtype, [None] + list(shape), name=name)
                feats[name] = ph
                self._placeholders[name] = ph
            self._labels_ph = tf.placeholder("int32", [None, None],
                                             name="labels")

            if build_train:
                # patch trainOp on the CONCRETE class (GRU4REC/S2PNM
                # override it): "loss" mode replaces it with the identity so
                # train_op IS the raw loss tensor; "step" mode wraps the real
                # one to capture the loss tensor alongside the update op
                cls = type(self.model)
                sentinel = object()
                orig = cls.__dict__.get("trainOp", sentinel)
                if train_mode == "loss":
                    cls.trainOp = lambda self_, loss: loss
                else:
                    captured = {}
                    real = cls.trainOp  # resolved via the MRO

                    def _capture(self_, loss, _real=real, _c=captured):
                        _c["loss"] = loss
                        return _real(self_, loss)

                    cls.trainOp = _capture
                try:
                    built, _, _ = self.model.train(feats, self._labels_ph)
                finally:
                    if orig is sentinel:
                        del cls.trainOp
                    else:
                        cls.trainOp = orig
                if train_mode == "loss":
                    self._loss_t, self._train_op = built, None
                else:
                    self._loss_t, self._train_op = captured["loss"], built
                tf.get_variable_scope().reuse_variables()
            self._logits_t = self.model(feats, is_training=False)

        # Belt-and-braces vs the oneDNN LN fusion (see module docstring):
        # disable grappler remapping for this session.
        from tensorflow.core.protobuf import rewriter_config_pb2
        rewrite = rewriter_config_pb2.RewriterConfig(
            remapping=rewriter_config_pb2.RewriterConfig.OFF)
        config = tf.ConfigProto(
            graph_options=tf.GraphOptions(rewrite_options=rewrite))
        self.session = tf.Session(config=config)
        self.session.run(tf.global_variables_initializer())
        self.variables = {
            v.name: self.session.run(v) for v in tf.trainable_variables()}

    def _feed(self, features: Dict[str, np.ndarray],
              labels: Optional[np.ndarray] = None):
        feed = {self._placeholders[k]: v for k, v in features.items()
                if k in self._placeholders}
        if labels is not None:
            feed[self._labels_ph] = labels
        return feed

    def eval_logits(self, features: Dict[str, np.ndarray]) -> np.ndarray:
        return self.session.run(self._logits_t, self._feed(features))

    def train_loss(self, features: Dict[str, np.ndarray],
                   labels: np.ndarray) -> float:
        return float(self.session.run(
            self._loss_t, self._feed(features, labels)))

    def train_step(self, features: Dict[str, np.ndarray],
                   labels: np.ndarray) -> float:
        """One optimizer update (train_mode='step'); returns the PRE-update
        loss (TF fetches in a single run see pre-update variable values)."""
        assert self._train_op is not None, "built with train_mode='loss'"
        loss, _ = self.session.run([self._loss_t, self._train_op],
                                   self._feed(features, labels))
        return float(loss)

    def close(self):
        self.session.close()
