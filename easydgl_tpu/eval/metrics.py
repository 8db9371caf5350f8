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


_GAIN = (1.0 / np.log2(np.arange(2, MAX_K + 2))).astype(np.float32)


def metric_sums(logits: jnp.ndarray, true_items: jnp.ndarray,
                valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch metric sums + row count over the valid rows.

    logits: (B, V); true_items: (B,) held-out item ids; valid: (B,) bool.
    """
    max_k = min(MAX_K, logits.shape[-1])  # small-vocab (test) safety
    _, top_idx = jax.lax.top_k(logits, max_k)          # (B, max_k)
    hit = (top_idx == true_items[:, None]).astype(jnp.float32)
    v = valid.astype(jnp.float32)
    out = {"count": jnp.sum(v)}
    gain = jnp.asarray(_GAIN)
    for k in TOPK:
        kk = min(k, max_k)
        hk = jnp.sign(jnp.sum(hit[:, :kk], axis=-1))
        nk = jnp.sum(hit[:, :kk] * gain[:kk], axis=-1)
        out[f"H{k}"] = jnp.sum(hk * v)
        out[f"N{k}"] = jnp.sum(nk * v)
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
