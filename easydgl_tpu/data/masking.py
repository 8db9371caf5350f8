"""The four masking/post-processing protocols, as pure batched NumPy.

Replaces the reference's per-example tf.data post-processors
(src/dataloader.py:39-207), whose random choices cross into Python via
``tf.py_func`` (dataloader.py:62,122,183). Here masking is a vectorized
host-side transform over whole batches with an explicit ``np.random.Generator``
— deterministic per (seed, epoch, host) and free of per-example Python.

Protocols (train / eval):
* masked    (BERT4REC,  dataloader.py:39-85):  random masklen positions /
  mask-last, labels = originals at masked positions / full tokens.
* regressive (AR models, dataloader.py:88-108): features tokens[:-1] +
  FULL timestamps; labels tokens[1:] / full tokens.
* grec      (GREC,      dataloader.py:111-156): encoder sees masked seq,
  decoder the original; prediction positions = masked - 1; eval drops last.
* mau       (EasyDGL,   dataloader.py:159-207): masked but never masks
  position 0 (ignore_head=1).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Batch = Tuple[Dict[str, np.ndarray], np.ndarray]


def _choice_batch(rng: np.random.Generator, n_rows: int, seqslen: int,
                  ignore_head: int, masklen: int) -> np.ndarray:
    """Per-row sample of ``masklen`` distinct positions in
    [ignore_head, seqslen) — vectorized argpartition-of-uniforms replacement
    for the reference's per-example np.random.choice (dataloader.py:34-36)."""
    u = rng.random((n_rows, seqslen - ignore_head))
    pos = np.argpartition(u, masklen - 1, axis=1)[:, :masklen]
    return (pos + ignore_head).astype(np.int32)


def _apply_mask(tokens: np.ndarray, positions: np.ndarray,
                mask_id: int) -> np.ndarray:
    """Replace tokens at ``positions`` with ``mask_id`` via the reference's
    one-hot arithmetic ``ind * (mask - t) + t`` (dataloader.py:66-68)."""
    masked = tokens.copy()
    np.put_along_axis(masked, positions, mask_id, axis=1)
    return masked


def _mask_last(tokens: np.ndarray, mask_id: int) -> np.ndarray:
    masked = tokens.copy()
    masked[:, -1] = mask_id
    return masked


def masked_protocol(arrays: Dict[str, np.ndarray], *, masklen: int,
                    mask_id: int, is_training: bool,
                    rng: np.random.Generator, ignore_head: int = 0) -> Batch:
    """BERT4REC (ignore_head=0) / EasyDGL-MAU (ignore_head=1) protocol."""
    tokens = arrays["seqs_i"]
    seqslen = tokens.shape[1]
    if not is_training:
        features = {"seqs_i": _mask_last(tokens, mask_id),
                    "seqs_t": arrays["seqs_t"]}
        return features, tokens
    positions = _choice_batch(rng, tokens.shape[0], seqslen, ignore_head,
                              masklen)
    labels = np.take_along_axis(tokens, positions, axis=1)
    features = {"seqs_i": _apply_mask(tokens, positions, mask_id),
                "masked_positions": positions,
                "seqs_t": arrays["seqs_t"]}
    return features, labels


def regressive_protocol(arrays: Dict[str, np.ndarray], *, is_training: bool,
                        has_datetime: bool = False) -> Batch:
    tokens = arrays["seqs_i"]
    features = {"seqs_i": tokens[:, :-1], "seqs_t": arrays["seqs_t"]}
    labels = tokens[:, 1:] if is_training else tokens
    if has_datetime:
        for k in ("seqs_month", "seqs_day", "seqs_weekday", "seqs_hour"):
            features[k] = arrays[k][:, :-1]
    return features, labels


def grec_protocol(arrays: Dict[str, np.ndarray], *, masklen: int,
                  mask_id: int, is_training: bool,
                  rng: np.random.Generator) -> Batch:
    tokens = arrays["seqs_i"]
    if not is_training:
        trimmed = tokens[:, :-1]
        return ({"seqs_i": trimmed, "seqs_m": trimmed}, tokens[:, -1:])
    positions = _choice_batch(rng, tokens.shape[0], tokens.shape[1], 1,
                              masklen)
    labels = np.take_along_axis(tokens, positions, axis=1)
    features = {"seqs_i": tokens,
                "seqs_m": _apply_mask(tokens, positions, mask_id),
                # AR-style prediction positions (dataloader.py:136)
                "masked_positions": positions - 1}
    return features, labels


def make_protocol(data_mode: str, *, masklen: int, mask_id: int):
    """Returns fn(arrays, is_training, rng) -> (features, labels)."""
    if data_mode == "masked":
        return lambda a, t, r: masked_protocol(
            a, masklen=masklen, mask_id=mask_id, is_training=t, rng=r)
    if data_mode == "mau":
        return lambda a, t, r: masked_protocol(
            a, masklen=masklen, mask_id=mask_id, is_training=t, rng=r,
            ignore_head=1)
    if data_mode == "grec":
        return lambda a, t, r: grec_protocol(
            a, masklen=masklen, mask_id=mask_id, is_training=t, rng=r)
    if data_mode == "regressive_datetime":
        return lambda a, t, r: regressive_protocol(
            a, is_training=t, has_datetime=True)
    if data_mode in ("regressive", "regressive_entire"):
        return lambda a, t, r: regressive_protocol(a, is_training=t)
    raise ValueError(f"unknown data_mode {data_mode}")
