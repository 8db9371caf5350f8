"""Serving-path tests: batched top-k recommendation."""
import jax
import jax.numpy as jnp
import numpy as np

from easydgl_tpu.config import preset
from easydgl_tpu.data.synthetic import synthetic_mark_table, synthetic_split
from easydgl_tpu.eval.recommender import Recommender
from easydgl_tpu.models.registry import build_model
from easydgl_tpu.train.loop import train_model

V, L = 40, 10


def test_recommend_shapes_and_mask_seen():
    cfg = preset("SASREC").replace(num_items=V, seqslen=L, num_units=16,
                                   num_heads=2, num_blocks=1, batch_size=8,
                                   mask_seen=True)
    model = build_model(cfg)
    ds = synthetic_split(num_rows=8, num_items=V, seqslen=L, seed=1)
    # params straight from init (scores arbitrary but valid)
    from easydgl_tpu.data.masking import make_protocol
    proto = make_protocol("regressive", masklen=3, mask_id=V)
    features, _ = proto({k: v for k, v in ds.arrays.items()}, False, None)
    feats = {k: jnp.asarray(v) for k, v in features.items()}
    params = model.init({"params": jax.random.key(0)}, feats,
                        is_training=False)
    rec = Recommender(cfg, params)
    ids, scores = rec.recommend(ds.arrays, k=5)
    assert ids.shape == (8, 5) and scores.shape == (8, 5)
    assert (scores[:, :-1] >= scores[:, 1:]).all()  # sorted descending
    # mask_seen: no recommended item appears in the user's input
    inputs = features["seqs_i"]
    for r in range(8):
        assert not set(ids[r]) & set(inputs[r].tolist())


def test_recommend_from_trained_checkpoint(tmp_path):
    cfg = preset("GRU4REC").replace(num_items=V, seqslen=L, num_units=16,
                                    num_heads=1, num_blocks=1, batch_size=16,
                                    patience=100, mask_seen=True)
    tr = synthetic_split(num_rows=64, num_items=V, seqslen=L, seed=1)
    vl = synthetic_split(num_rows=16, num_items=V, seqslen=L, seed=2)
    te = synthetic_split(num_rows=16, num_items=V, seqslen=L, seed=3)
    train_model(cfg, tr, vl, te, ckpt_dir=str(tmp_path), num_epochs=2)
    rec = Recommender.from_checkpoint(
        cfg, str(tmp_path), {k: v[:4] for k, v in te.arrays.items()})
    ids, scores = rec.recommend({k: v[:4] for k, v in te.arrays.items()},
                                k=10)
    assert ids.shape == (4, 10)
    assert (ids > 0).all()  # padding item never recommended (bias -1000)
