"""Masking-protocol and loader tests (SURVEY.md §2.2 semantics)."""
import numpy as np
import pytest

from easydgl_tpu.data.loader import BatchLoader, PackedDataset
from easydgl_tpu.data.masking import (grec_protocol, masked_protocol,
                                      regressive_protocol)
from easydgl_tpu.data.synthetic import synthetic_mark_table, synthetic_split


def _arrays(rng, b=8, total=11, v=50):
    return {"seqs_i": rng.randint(1, v, (b, total)).astype(np.int32),
            "seqs_t": np.sort(rng.rand(b, total).astype(np.float32), axis=1)}


def test_masked_protocol_train(rng):
    a = _arrays(rng)
    g = np.random.default_rng(0)
    f, labels = masked_protocol(a, masklen=3, mask_id=99, is_training=True,
                                rng=g)
    assert f["masked_positions"].shape == (8, 3)
    for r in range(8):
        pos = f["masked_positions"][r]
        assert len(set(pos.tolist())) == 3          # distinct
        assert (f["seqs_i"][r, pos] == 99).all()     # masked
        np.testing.assert_array_equal(labels[r], a["seqs_i"][r, pos])
        untouched = np.setdiff1d(np.arange(11), pos)
        np.testing.assert_array_equal(f["seqs_i"][r, untouched],
                                      a["seqs_i"][r, untouched])


def test_masked_protocol_eval(rng):
    a = _arrays(rng)
    f, labels = masked_protocol(a, masklen=3, mask_id=99, is_training=False,
                                rng=np.random.default_rng(0))
    assert (f["seqs_i"][:, -1] == 99).all()
    np.testing.assert_array_equal(f["seqs_i"][:, :-1], a["seqs_i"][:, :-1])
    np.testing.assert_array_equal(labels, a["seqs_i"])


def test_mau_protocol_never_masks_head(rng):
    a = _arrays(rng)
    for trial in range(10):
        f, _ = masked_protocol(a, masklen=3, mask_id=99, is_training=True,
                               rng=np.random.default_rng(trial),
                               ignore_head=1)
        assert (f["seqs_i"][:, 0] != 99).all()


def test_regressive_protocol(rng):
    a = _arrays(rng)
    f, labels = regressive_protocol(a, is_training=True)
    np.testing.assert_array_equal(f["seqs_i"], a["seqs_i"][:, :-1])
    np.testing.assert_array_equal(labels, a["seqs_i"][:, 1:])
    assert f["seqs_t"].shape == (8, 11)  # FULL timestamps kept
    f, labels = regressive_protocol(a, is_training=False)
    np.testing.assert_array_equal(labels, a["seqs_i"])


def test_grec_protocol_shift(rng):
    a = _arrays(rng)
    f, labels = grec_protocol(a, masklen=3, mask_id=99, is_training=True,
                              rng=np.random.default_rng(0))
    # prediction positions are masked positions - 1 (dataloader.py:136)
    masked_cols = np.where(f["seqs_m"] == 99)
    for r in range(8):
        pos = np.sort(masked_cols[1][masked_cols[0] == r])
        np.testing.assert_array_equal(
            np.sort(f["masked_positions"][r]) + 1, pos)
        assert (pos >= 1).all()  # head never masked
    f, labels = grec_protocol(a, masklen=3, mask_id=99, is_training=False,
                              rng=np.random.default_rng(0))
    assert f["seqs_i"].shape == (8, 10)
    np.testing.assert_array_equal(labels, a["seqs_i"][:, -1:])


def test_loader_determinism_and_shapes():
    ds = synthetic_split(num_rows=37, num_items=50, seqslen=10, seed=3)
    ld = BatchLoader(ds, data_mode="masked", batch_size=8, masklen=3,
                     is_training=True, seed=42)
    b1 = [f["seqs_i"].copy() for f, _, _ in ld.epoch(0)]
    b2 = [f["seqs_i"].copy() for f, _, _ in ld.epoch(0)]
    b3 = [f["seqs_i"].copy() for f, _, _ in ld.epoch(1)]
    # training includes the partial tail batch (reference map_and_batch
    # keeps the remainder), padded to fixed shape with all-zero rows
    assert len(b1) == -(-37 // 8)
    tail_feats, tail_labels, tail_valid = list(ld.epoch(0))[-1]
    n_real = 37 % 8
    assert tail_valid.tolist() == [True] * n_real + [False] * (8 - n_real)
    assert (tail_labels[n_real:] == 0).all()
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)          # same epoch == same
    assert any((x != y).any() for x, y in zip(b1, b3))  # epochs differ


def test_loader_eval_padding():
    ds = synthetic_split(num_rows=10, num_items=50, seqslen=10, seed=3)
    ld = BatchLoader(ds, data_mode="regressive", batch_size=8,
                     is_training=False)
    batches = list(ld.epoch())
    assert len(batches) == 2
    _, _, valid = batches[-1]
    assert valid.sum() == 2 and valid.shape == (8,)


def test_loader_host_sharding():
    ds = synthetic_split(num_rows=64, num_items=50, seqslen=10, seed=3)
    rows = []
    for host in range(4):
        ld = BatchLoader(ds, data_mode="regressive", batch_size=4,
                         is_training=False, host_id=host, num_hosts=4)
        rows.append(set(ld.rows.tolist()))
    assert set().union(*rows) == set(range(64))
    for i in range(4):
        for j in range(i + 1, 4):
            assert not rows[i] & rows[j]


def test_loader_marks():
    ds = synthetic_split(num_rows=16, num_items=50, seqslen=10, seed=3)
    table = synthetic_mark_table(50, 6, seed=1)
    ld = BatchLoader(ds, data_mode="mau", batch_size=8, masklen=3,
                     is_training=True, mark_table=table, needs_marks=True)
    f, labels, _ = next(ld.epoch(0))
    assert f["seqs_marks"].shape == (8, 11, 6)
    assert f["next_marks"].shape == (8, 3, 6)
    # MASK id (50) maps to mark row 0 == zeros
    masked_rows = f["seqs_i"] == 50
    assert (f["seqs_marks"][masked_rows] == 0).all()
    np.testing.assert_array_equal(f["next_marks"][0, 0], table[labels[0, 0]])


def test_native_loader_contract():
    """C++ batcher path must satisfy the same protocol contract as NumPy."""
    from easydgl_tpu.data import native
    if not native.available():
        pytest.skip("native library not built")
    ds = synthetic_split(num_rows=32, num_items=50, seqslen=10, seed=3)
    table = synthetic_mark_table(50, 6, seed=1)
    for mode, ignore in (("masked", 0), ("mau", 1), ("grec", 1)):
        ld = BatchLoader(ds, data_mode=mode, batch_size=8, masklen=3,
                         is_training=True, mark_table=table,
                         needs_marks=(mode == "mau"), use_native=True)
        assert ld.native
        f, labels, _ = next(ld.epoch(0))
        tokens = ds.arrays["seqs_i"]
        if mode == "grec":
            pos = f["masked_positions"] + 1
            masked = f["seqs_m"]
        else:
            pos = f["masked_positions"]
            masked = f["seqs_i"]
        for r in range(8):
            assert len(set(pos[r].tolist())) == 3
            assert (pos[r] >= ignore).all()
            assert (masked[r, pos[r]] == 50).all()
        # determinism across replays of the same epoch
        f2, _, _ = next(ld.epoch(0))
        np.testing.assert_array_equal(f2["seqs_i"], f["seqs_i"])
        # different epochs differ
        f3, _, _ = next(ld.epoch(1))
        assert (f3["seqs_i"] != f["seqs_i"]).any()


def test_etl_raw_pipeline(tmp_path):
    """Raw triplets -> filter -> user holdout -> packed splits."""
    import pandas as pd
    from easydgl_tpu.data.etl import prepare_raw
    rng = np.random.default_rng(0)
    rows = []
    for uid in range(40):
        n = rng.integers(6, 15)
        t0 = 1e9 + uid
        for j in range(n):
            rows.append((uid, int(rng.integers(0, 12)), t0 + j * 3600))
    df = pd.DataFrame(rows, columns=["uid", "sid", "time"])
    fin = tmp_path / "raw.csv"
    df.to_csv(fin, index=False)
    num_items = prepare_raw(str(fin), str(tmp_path / "out"), seqslen=8,
                            min_uc=3, min_sc=5, n_heldout_users=8)
    out = tmp_path / "out"
    for name in ("train", "validation", "test"):
        ds = PackedDataset.load(str(out / f"{name}.npz"))
        assert ds.num_items == num_items
        assert ds.arrays["seqs_i"].shape[1] == 9
        assert ds.arrays["seqs_i"].max() < num_items
        assert (ds.arrays["seqs_i"] >= 0).all()
    tr = PackedDataset.load(str(out / "train.npz"))
    vl = PackedDataset.load(str(out / "validation.npz"))
    te = PackedDataset.load(str(out / "test.npz"))
    assert vl.num_rows <= 8 and te.num_rows <= 8
    assert tr.num_rows >= 40 - 16 - 10  # most users survive filtering
