"""Full-catalog ranking metrics.

Parity with reference src/model/Base.py:150-207:
* optional ``mask_seen``: every item id appearing in the user's input
  sequence is forced to -inf before ranking (Base.py:156-163);
* top-100 over the full catalog (Base.py:181);
* HR@k = 1 if the held-out item is in the top-k (Base.py:187-189);
* NDCG@k with gain 1/log2(rank+2) (Base.py:195-198);
* streaming means — represented here as (sum, count) pairs accumulated
  host-side and reduced across hosts (the reference's tf.metrics.mean local
  variables, Base.py:190-207).

Ranking uses raw logits: softmax (Base.py:164) is monotone, so top-k order
is identical and the extra exp/normalize is skipped.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

TOPK = (10, 50, 100)
MAX_K = 100
NEG_MASK = -1.0e30


def mask_seen_logits(logits: jnp.ndarray, seen_ids: jnp.ndarray
                     ) -> jnp.ndarray:
    """Scatter -inf over every input item id (Base.py:156-163). ``seen_ids``
    includes padding id 0 and (for masked models) the MASK id — exactly as
    the reference scatters features['seqs_i']. ADDs like the reference's
    sparse-to-dense += (duplicate ids accumulate), keeping tie-break order
    identical to the distributed shard-local variant."""
    b = logits.shape[0]
    rows = jnp.arange(b)[:, None]
    return logits.at[rows, seen_ids].add(NEG_MASK)


def label_rank(logits: jnp.ndarray, true_items: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of the true item under descending-logit order with
    lax.top_k's tie-break (equal logits ranked by ascending index):
    rank = #{j: logit_j > logit_true} + #{j < true: logit_j == logit_true}.
    One vectorized pass over (B, V) — identical results to materializing
    top_k(V) but without the multi-pass sort (the eval-throughput hot spot
    at catalog width)."""
    ti = true_items.astype(jnp.int32)
    ll = jnp.take_along_axis(logits, ti[:, None], axis=1)     # (B, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    gt = jnp.sum((logits > ll).astype(jnp.int32), axis=-1)
    eq_before = jnp.sum(((logits == ll) & (col < ti[:, None])
                         ).astype(jnp.int32), axis=-1)
    return gt + eq_before


def metric_sums(logits: jnp.ndarray, true_items: jnp.ndarray,
                valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch metric sums + row count over the valid rows.

    logits: (B, V); true_items: (B,) held-out item ids; valid: (B,) bool.
    HR@k / NDCG@k depend only on the true item's rank (the reference's
    top-100 membership test + 1/log2(rank+2) gain, Base.py:181-198), so
    the rank is counted directly instead of sorting the catalog.
    """
    max_k = min(MAX_K, logits.shape[-1])  # small-vocab (test) safety
    rank = label_rank(logits, true_items)                     # (B,)
    v = valid.astype(jnp.float32)
    out = {"count": jnp.sum(v)}
    gain = jnp.where(rank < max_k,
                     1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0), 0.0)
    for k in TOPK:
        kk = min(k, max_k)
        ink = (rank < kk).astype(jnp.float32)
        out[f"H{k}"] = jnp.sum(ink * v)
        out[f"N{k}"] = jnp.sum(jnp.where(rank < kk, gain, 0.0) * v)
    return out


class MetricAccumulator:
    """Host-side streaming mean of metric sums (replaces tf.metrics.mean +
    its init ops, Base.py:190-207)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.count = 0.0

    def update(self, sums: Dict[str, jnp.ndarray]):
        s = jax.device_get(sums)
        self.count += float(s.pop("count"))
        for k, val in s.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(val)

    def result(self) -> Dict[str, float]:
        if self.count == 0:
            return {k: 0.0 for k in self.sums}
        return {k: v / self.count for k, v in self.sums.items()}
