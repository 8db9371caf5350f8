"""TF-variable -> flax-params transplant maps, one per reference model.

Each ``map_<model>(tf_vars, cfg)`` returns ``{flax_path: np.ndarray}`` where
``flax_path`` is a "/"-joined path inside this framework's params pytree
(without the leading "params" collection). ``transplant`` writes the map
into an initialized params tree and REFUSES partial coverage — every leaf
must be written and every mapped path must exist — so a silent architecture
drift fails loudly instead of producing garbage comparisons.

TF variable naming comes from the reference's variable_scope layout (e.g.
"main/num_blocks_0/attention/multihead_attention/dense/kernel:0"; Q, K, V
are dense / dense_1 / dense_2 in creation order, sequential.py:42-44).
tf.layers Conv1D kernels carry a leading width-1 axis; they map onto Dense
kernels by squeezing it (reference FeedForward, Base.py:70-87).
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def transplant(params, mapping: Dict[str, np.ndarray]):
    """Overwrite every leaf of ``params`` from ``mapping``; assert exact,
    total coverage (no unmapped leaves, no unknown paths, shapes equal)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {}
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[0] == "params":
            names = names[1:]
        paths["/".join(names)] = leaf
    missing = sorted(set(paths) - set(mapping))
    unknown = sorted(set(mapping) - set(paths))
    if missing or unknown:
        raise AssertionError(
            f"transplant mismatch:\n  unmapped flax leaves: {missing}\n"
            f"  unknown mapped paths: {unknown}")
    out = {}
    for key, leaf in paths.items():
        val = np.asarray(mapping[key], dtype=np.asarray(leaf).dtype)
        if val.shape != leaf.shape:
            raise AssertionError(
                f"shape mismatch at {key}: tf {val.shape} vs flax {leaf.shape}")
        out[key] = val

    def rebuild(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[0] == "params":
            names = names[1:]
        return jax.numpy.asarray(out["/".join(names)])

    return jax.tree_util.tree_map_with_path(rebuild, params)


class TV:
    """Accessor over the TF variable dict with ':0' and 'main/' handling."""

    def __init__(self, tf_vars: Dict[str, np.ndarray]):
        self.vars = {k.removeprefix("main/").removesuffix(":0"): v
                     for k, v in tf_vars.items()}
        self.used = set()

    def __call__(self, name: str) -> np.ndarray:
        self.used.add(name)
        return self.vars[name]

    def assert_all_used(self, ignore=()):
        left = set(self.vars) - self.used
        left = {n for n in left
                if not any(n.startswith(p) for p in ignore)}
        if left:
            raise AssertionError(f"unused TF variables: {sorted(left)}")


def _ln(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    out[f"{flax_prefix}/beta"] = tv(f"{tf_prefix}/beta")
    out[f"{flax_prefix}/gamma"] = tv(f"{tf_prefix}/gamma")


def _dense(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    out[f"{flax_prefix}/kernel"] = tv(f"{tf_prefix}/kernel")
    out[f"{flax_prefix}/bias"] = tv(f"{tf_prefix}/bias")


def _conv1d_dense(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    """tf.layers.Conv1D width-1 kernel (1, in, out) -> Dense (in, out)."""
    out[f"{flax_prefix}/kernel"] = tv(f"{tf_prefix}/kernel")[0]
    out[f"{flax_prefix}/bias"] = tv(f"{tf_prefix}/bias")


def _mha(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    """Q/K/V denses = dense / dense_1 / dense_2 (sequential.py:42-44)."""
    _dense(tv, f"{tf_prefix}/dense", f"{flax_prefix}/q", out)
    _dense(tv, f"{tf_prefix}/dense_1", f"{flax_prefix}/k", out)
    _dense(tv, f"{tf_prefix}/dense_2", f"{flax_prefix}/v", out)


def _ffn(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    _conv1d_dense(tv, f"{tf_prefix}/Inner", f"{flax_prefix}/inner", out)
    _conv1d_dense(tv, f"{tf_prefix}/Readout", f"{flax_prefix}/readout", out)


def map_sasrec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("SASREC/item_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("SASREC/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("SASREC/output_bias")
    for i in range(cfg.num_blocks):
        blk = f"num_blocks_{i}"
        _ln(tv, f"{blk}/attention/LayerNorm", f"block{i}_ln0", out)
        _mha(tv, f"{blk}/attention/multihead_attention",
             f"block{i}_attn", out)
        _ln(tv, f"{blk}/feedforward/LayerNorm", f"block{i}_ln1", out)
        _ffn(tv, f"{blk}/feedforward", f"block{i}_ffn", out)
    _ln(tv, "output_ln/LayerNorm", "out_ln", out)
    tv.assert_all_used()
    return out


MAPPERS = {
    "SASREC": map_sasrec,
}
