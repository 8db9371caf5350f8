"""CLI smoke tests (VERDICT r2 Next #5): `cli.train --synthetic` end to end,
then `cli.analytics` restoring that run's checkpoint, writing the logits
pickle, and reproducing the training run's test metrics — the reference's
analytics contract (src/analytics.py:90-100: restore ckpt, run test eval,
dump the ANALYTICS collection)."""
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_flags():
    return ["--num_items", "201", "--num_units", "32", "--num_heads", "2",
            "--num_blocks", "1", "--batch_size", "64", "--num_events", "8"]


def test_train_then_analytics_roundtrip(tmp_path_factory, tiny_flags):
    tmp_path = tmp_path_factory.mktemp("cli")
    from easydgl_tpu.cli import analytics as analytics_cli
    from easydgl_tpu.cli import train as train_cli
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)

    ckpt_dir = str(tmp_path / "ckpt")
    summary = train_cli.main([
        "--model", "EasyDGL", "--synthetic", "--synthetic_rows", "256",
        "--num_epochs", "2", "--ckpt_dir", ckpt_dir, *tiny_flags])
    assert summary, "train CLI returned an empty summary"
    assert np.isfinite(summary["H100"])
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # regenerate the CLI's deterministic synthetic test split (seed=3 in
    # cli/train.py load_data) and mark table (seed=4), save them the way
    # cli/prep.py would, and point analytics at the checkpoint
    cfg = preset("EasyDGL", num_items=201, num_events=8)
    synthetic_split(num_rows=256 // 8, seed=3, num_items=cfg.num_items,
                    seqslen=cfg.seqslen, with_datetime=True).save(
                        str(tmp_path / "test.npz"))
    np.save(str(tmp_path / "mark.npy"),
            synthetic_mark_table(cfg.num_items, 8, seed=4))

    out = str(tmp_path / "res")
    res = analytics_cli.main([
        "--ckpt", ckpt_dir, "--model", "EasyDGL",
        "--data_dir", str(tmp_path), "--mark", str(tmp_path / "mark.npy"),
        "--out", out, *tiny_flags])

    # the checkpoint is saved at the best-validation epoch, and the tracked
    # metric's (H100) test value in the summary comes from exactly that
    # epoch — so the restored model's test eval must reproduce it
    assert res["H100"] == pytest.approx(summary["H100"], rel=1e-6)

    assert os.path.exists(out)
    with open(out, "rb") as f:
        batches = pickle.load(f)
    rows = sum(b.shape[0] for b in batches)
    assert rows == 32  # every (valid) test row got a logits dump
    assert all(b.shape[1] == cfg.num_items + 1 for b in batches)


def test_train_cli_gru4rec_synthetic_smoke(tmp_path_factory):
    # a second model family through the same CLI path (regressive protocol,
    # scan-GRU) — no marks, no checkpoint
    from easydgl_tpu.cli import train as train_cli
    summary = train_cli.main([
        "--model", "GRU4REC", "--synthetic", "--synthetic_rows", "256",
        "--num_epochs", "1", "--num_items", "201", "--num_units", "32",
        "--batch_size", "64"])
    assert summary and np.isfinite(summary["H100"])
