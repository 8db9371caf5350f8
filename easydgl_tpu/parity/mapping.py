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


def map_tgat(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("TGAT/item_embs/lookup_table")
    out["pcoding_k/pembs/lookup_table"] = \
        tv("TGAT/pcoding_K/embedding/lookup_table")
    out["tcoding_k/basis_freq"] = tv("TGAT/tcoding_K/basis_freq")
    out["tcoding_k/phase"] = tv("TGAT/tcoding_K/phase")
    out["out_bias/output_bias"] = tv("TGAT/output_bias")
    for i in range(cfg.num_blocks):
        blk = f"num_blocks_{i}"
        _ln(tv, f"{blk}/attention/LayerNorm", f"block{i}_ln0", out)
        _mha(tv, f"{blk}/attention/attention/timeinterval",
             f"block{i}_attn", out)
        _ln(tv, f"{blk}/feedforward/LayerNorm", f"block{i}_ln1", out)
        _ffn(tv, f"{blk}/feedforward", f"block{i}_ffn", out)
    _ln(tv, "out_ln/LayerNorm", "out_ln", out)
    tv.assert_all_used()
    return out


def map_tisasrec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("TiSASRec/item_embs/lookup_table")
    for tf_n, fx_n in (("pcoding_K", "pcoding_k"), ("pcoding_V", "pcoding_v"),
                       ("tcoding_K", "tcoding_k"), ("tcoding_V", "tcoding_v")):
        out[f"{fx_n}/pembs/lookup_table"] = \
            tv(f"TiSASRec/{tf_n}/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("TiSASRec/output_bias")
    for i in range(cfg.num_blocks):
        blk = f"num_blocks_{i}"
        _ln(tv, f"{blk}/attention/LayerNorm", f"block{i}_ln0", out)
        _mha(tv, f"{blk}/attention/attention/timeinterval",
             f"block{i}_attn", out)
        _ln(tv, f"{blk}/feedforward/LayerNorm", f"block{i}_ln1", out)
        _ffn(tv, f"{blk}/feedforward", f"block{i}_ffn", out)
    _ln(tv, "out_ln/LayerNorm", "out_ln", out)
    tv.assert_all_used()
    return out


def _gru_cell(tv: TV, prefix: str, layer: int, in_c: int, h: int, out: dict):
    """CudnnCompatibleGRUCell canonical weights -> this repo's fused scan-GRU
    layout (w=(in,3h) [W_r|W_u|W_h], r=(h,3h), bw/br=(3h,)).

    Cell layout (cudnn_rnn_ops.py:124-180): gates/kernel (in+h, 2h) with
    column order [r|u]; candidate input/hidden projections each with their
    own bias (the cuDNN two-bias variant). The merged gate bias maps to bw
    with br's gate slots zero (bw+br is all the math sees for r/u)."""
    gk = tv(f"{prefix}/gates/kernel")
    gb = tv(f"{prefix}/gates/bias")
    wh = tv(f"{prefix}/candidate/input_projection/kernel")
    bwh = tv(f"{prefix}/candidate/input_projection/bias")
    rh = tv(f"{prefix}/candidate/hidden_projection/kernel")
    brh = tv(f"{prefix}/candidate/hidden_projection/bias")
    out[f"gru/w_{layer}"] = np.concatenate(
        [gk[:in_c, :h], gk[:in_c, h:], wh], axis=1)
    out[f"gru/r_{layer}"] = np.concatenate(
        [gk[in_c:, :h], gk[in_c:, h:], rh], axis=1)
    out[f"gru/bw_{layer}"] = np.concatenate([gb[:h], gb[h:], bwh])
    out[f"gru/br_{layer}"] = np.concatenate(
        [np.zeros(h, gb.dtype), np.zeros(h, gb.dtype), brh])


def map_gru4rec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("GRU4REC/item_embs/lookup_table")
    out["out_bias/output_bias"] = tv("GRU4REC/output_bias")
    c = cfg.num_units
    for l in range(cfg.num_blocks):
        # NOTE the reference builds the GRU inside scope "S2PNM" even in
        # GRU4REC (GRU4REC.py:27 copy-paste); names preserved as-is.
        _gru_cell(tv, "S2PNM/Reccurency/GRU4REC/GRU/rnn/multi_rnn_cell/"
                      f"cell_{l}/cudnn_compatible_gru_cell", l, c, c, out)
    tv.assert_all_used()
    return out


def map_s2pnm(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("S2PNM/item_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("S2PNM/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("S2PNM/output_bias")
    c = cfg.num_units
    _gru_cell(tv, "S2PNM/Reccurency/S2PNM/GRU/rnn/multi_rnn_cell/"
                  "cell_0/cudnn_compatible_gru_cell", 0, c, c, out)
    _ln(tv, "S2PNM/Attention/LayerNorm", "attn_ln", out)
    _mha(tv, "S2PNM/Attention/multihead_attention", "attn", out)
    _ln(tv, "S2PNM/fforward/LayerNorm", "ffn_ln", out)
    _ffn(tv, "S2PNM/fforward", "ffn", out)
    _ln(tv, "S2PNM/Dictionary/LayerNorm", "dict_ln", out)
    _dense(tv, "S2PNM/Dictionary/dense", "dict0", out)
    _dense(tv, "S2PNM/Dictionary/dense_1", "dict1", out)
    tv.assert_all_used()
    return out


def map_bert4rec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("BERT4REC/item_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("BERT4REC/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("BERT4REC/output_bias")
    _ln(tv, "embeddings/LayerNorm", "emb_ln", out)
    for i in range(cfg.num_blocks):
        lyr = f"layer_{i}"
        for tf_n, fx_n in (("Q", "q"), ("K", "k"), ("V", "v")):
            _dense(tv, f"{lyr}/attention/self/BERTAttention/{tf_n}",
                   f"block{i}_attn/{fx_n}", out)
        _dense(tv, f"{lyr}/attention/output/dense", f"block{i}_attn_out", out)
        _ln(tv, f"{lyr}/attention/output/LayerNorm", f"block{i}_ln0", out)
        _dense(tv, f"{lyr}/intermediate/dense", f"block{i}_inter", out)
        _dense(tv, f"{lyr}/output/dense", f"block{i}_out", out)
        _ln(tv, f"{lyr}/output/LayerNorm", f"block{i}_ln1", out)
    _dense(tv, "cls/predictions/transform/dense", "transform", out)
    _ln(tv, "cls/predictions/transform/LayerNorm", "transform_ln", out)
    tv.assert_all_used()
    return out


def _masked_cnn(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    """GREC residual dilated-CNN block: two atrous convs (4-D (1,k,in,out)
    kernels -> (k,in,out)) + two LNs (sequential.py:177-207)."""
    for j in (0, 1):
        out[f"{flax_prefix}/dconv{j}/weight"] = \
            tv(f"{tf_prefix}/dconv{j}/weight")[0]
        out[f"{flax_prefix}/dconv{j}/bias"] = tv(f"{tf_prefix}/dconv{j}/bias")
        _ln(tv, f"{tf_prefix}/ln{j}", f"{flax_prefix}/ln{j}", out)


def map_grec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["enc_embs/lookup_table"] = tv("GREC/enc_embs/lookup_table")
    out["dec_embs/lookup_table"] = tv("GREC/decc_embs/lookup_table")
    for i in range(len(cfg.dilations)):
        _masked_cnn(tv, f"block_{i}/regudCNN_{i}", f"regu_cnn{i}", out)
        _masked_cnn(tv, f"block_{i}/maskedCNN_{i}", f"mask_cnn{i}", out)
    _dense(tv, "projector/dense", "proj0", out)
    _dense(tv, "projector/dense_1", "proj1", out)
    out["head_kernel"] = tv("cls/predictions/transform/dense/kernel")
    out["head_bias"] = tv("cls/predictions/transform/dense/bias")
    tv.assert_all_used()
    return out


def map_timelyrec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("TimelyREC/item_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("TimelyREC/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("TimelyREC/output_bias")
    out["te_weight"] = tv("TimelyREC/te_weight")
    for unit in ("month", "day", "weekday", "hour"):
        out[f"{unit}_embs/lookup_table"] = \
            tv(f"TimelyREC/{unit}_embs/lookup_table")
    att = "TimelyREC/attention/TimelyREC"
    _ln(tv, f"{att}/Atttention/LayerNorm", "user_attn_ln", out)
    _mha(tv, f"{att}/Atttention/multihead_attention", "user_attn", out)
    _ln(tv, f"{att}/fforward/LayerNorm", "user_ffn_ln", out)
    _ffn(tv, f"{att}/fforward", "user_ffn", out)
    _ln(tv, f"{att}/out/LayerNorm", "user_out_ln", out)
    # MATE user projections (no bias); reference scope names: month_mate,
    # daymate (sic), weekday_mate, hour_mate (TimelyREC.py:108-124)
    for tf_n, fx_n in (("month_mate", "month_mate"), ("daymate", "day_mate"),
                       ("weekday_mate", "weekday_mate"),
                       ("hour_mate", "hour_mate")):
        out[f"{fx_n}/user_proj/kernel"] = \
            tv(f"TimelyREC/mate/{tf_n}/dense/kernel")
    out["period_q/kernel"] = tv("TimelyREC/mate/dense/kernel")
    _dense(tv, "TimelyREC/prediction/dense", "dict0", out)
    _dense(tv, "TimelyREC/prediction/dense_1", "dict1", out)
    tv.assert_all_used()
    return out


def map_tgrec(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("TGREC/item_embs/lookup_table")
    out["out_bias/output_bias"] = tv("TGREC/output_bias")
    out["pcoding/pembs/lookup_table"] = \
        tv("TGREC/pcoding/embedding/lookup_table")
    out["tcoding/basis_freq"] = tv("TGREC/tcoding/basis_freq")
    out["tcoding/phase"] = tv("TGREC/tcoding/phase")
    for i in range(cfg.num_blocks):
        blk = f"num_blocks_{i}/attention/TgMultiHeadAttention"
        _dense(tv, f"{blk}/dense", f"block{i}_attn/q", out)
        _dense(tv, f"{blk}/dense_1", f"block{i}_attn/k", out)
        _dense(tv, f"{blk}/dense_2", f"block{i}_attn/v", out)
        _dense(tv, f"{blk}/dense_3", f"block{i}_attn/merge", out)
        _ln(tv, f"{blk}/ln", f"block{i}_attn/ln", out)
        _dense(tv, f"num_blocks_{i}/dense", f"block{i}_inter", out)
        _dense(tv, f"num_blocks_{i}/dense_1", f"block{i}_out", out)
    tv.assert_all_used()
    return out


def _mau_intensity(tv: TV, tf_prefix: str, flax_prefix: str, out: dict):
    """MAU intensity head (temporal.py:281-315):
    sequential_temporal_combined/{dense,weight,scaling}."""
    stc = f"{tf_prefix}/sequential_temporal_combined"
    out[f"{flax_prefix}/intensity_dense_kernel"] = tv(f"{stc}/dense/kernel")
    out[f"{flax_prefix}/intensity_dense_bias"] = tv(f"{stc}/dense/bias")
    out[f"{flax_prefix}/intensity_weight"] = tv(f"{stc}/weight")
    out[f"{flax_prefix}/intensity_scaling"] = tv(f"{stc}/scaling")


def map_ctsma(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    out["item_embs/lookup_table"] = tv("CSTMA/item_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("CSTMA/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("CSTMA/output_bias")
    for i in range(cfg.num_blocks):
        blk = f"num_blocks_{i}"
        mau = f"{blk}/attention/modulating_attention"
        _ln(tv, f"{blk}/attention/LayerNorm", f"block{i}_ln0", out)
        # Q/K/V/T in creation order (temporal.py:340-343)
        _dense(tv, f"{mau}/dense", f"block{i}_mau/q", out)
        _dense(tv, f"{mau}/dense_1", f"block{i}_mau/k", out)
        _dense(tv, f"{mau}/dense_2", f"block{i}_mau/v", out)
        _dense(tv, f"{mau}/dense_3", f"block{i}_mau/t", out)
        _mau_intensity(tv, mau, f"block{i}_mau", out)
        _ln(tv, f"{blk}/feed-forward/LayerNorm", f"block{i}_ln1", out)
        _ffn(tv, f"{blk}/feed-forward", f"block{i}_ffn", out)
    _ln(tv, "outln/LayerNorm", "out_ln", out)
    tv.assert_all_used()
    return out


def map_easydgl(tf_vars, cfg):
    tv = TV(tf_vars)
    out = {}
    # reference EasyDGL builds under scope "CSTMA" (EasyDGL.py:47 reuse)
    out["item_embs/lookup_table"] = tv("CSTMA/item_embs/lookup_table")
    out["mark_embs/lookup_table"] = tv("CSTMA/mark_embs/lookup_table")
    out["pcoding/pembs/lookup_table"] = \
        tv("CSTMA/spatial_embs/embedding/lookup_table")
    out["out_bias/output_bias"] = tv("CSTMA/output_bias")
    for i in range(cfg.num_blocks):
        lyr = f"layer_{i}"
        tmau = f"{lyr}/attention/self/TMAU"
        _dense(tv, f"{tmau}/dense", f"block{i}_bimau/qkvt", out)
        _mau_intensity(tv, tmau, f"block{i}_bimau", out)
        _dense(tv, f"{lyr}/attention/output/dense", f"block{i}_attn_out", out)
        _ln(tv, f"{lyr}/attention/output/LayerNorm", f"block{i}_ln0", out)
        _dense(tv, f"{lyr}/intermediate/dense", f"block{i}_inter", out)
        _dense(tv, f"{lyr}/output/dense", f"block{i}_out", out)
        _ln(tv, f"{lyr}/output/LayerNorm", f"block{i}_ln1", out)
    _dense(tv, "cls/predictions/transform/dense", "transform", out)
    _ln(tv, "cls/predictions/transform/LayerNorm", "transform_ln", out)
    tv.assert_all_used()
    return out


MAPPERS = {
    "SASREC": map_sasrec,
    "TGAT": map_tgat,
    "TiSASREC": map_tisasrec,
    "GRU4REC": map_gru4rec,
    "S2PNM": map_s2pnm,
    "BERT4REC": map_bert4rec,
    "GREC": map_grec,
    "TimelyREC": map_timelyrec,
    "TGREC": map_tgrec,
    "CTSMA": map_ctsma,
    "EasyDGL": map_easydgl,
}
