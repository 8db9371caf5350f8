"""SPMD wrappers putting the Pallas kernels under a (data, model) mesh.

XLA's auto-partitioner cannot split a custom call, so under a mesh the raw
kernels would be replicated (with full gathers of their operands). These
wrappers shard_map them instead:

* ``catalog_nll_spmd`` — rows ride the data axis, the tied table/bias ride
  the model (vocab) axis. Each shard runs the fused streaming-NLL kernel on
  its vocab slice with shard-local label ids (out-of-shard labels simply
  never match a tile column, contributing 0 — kernels/scoring.py:64-69),
  then the shards merge with a psum for the label logit and a max-shifted
  exp/psum/log for the logsumexp — the same exact merge the distributed
  evaluator uses (dist/topk.py).
* ``mau_attention_spmd`` — the fused self-modulating attention kernel is
  per-batch-row independent, so it shard_maps over the data axis with
  replicated intensity weights; the AD transpose inserts the weight-grad
  psums automatically.

Both compose with jax.custom_vjp inside shard_map, so the hand-written
backwards run per shard and gradients arrive with the input shardings.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from easydgl_tpu.kernels.mau_attention import mau_attention
from easydgl_tpu.kernels.scoring import catalog_nll


def catalog_nll_spmd(hidden, table, bias, labels, mesh,
                     block_n: int = 256, block_v: int = 2048,
                     shard_vocab: bool = True):
    """Vocab- and row-sharded fused catalog NLL.

    hidden (N, C) sharded over data; table (V, C) / bias (V,) row-sharded
    over model when ``shard_vocab`` (V must divide by the model-axis size;
    pass False when it doesn't — the table is then replicated and only the
    rows are sharded); labels (N,) int32 GLOBAL ids.
    Returns (lse (N,), label_logit (N,)) sharded over data.
    """
    data_ax, model_ax = mesh.axis_names

    if not shard_vocab:
        def local_rows(h, t, b, lab):
            return catalog_nll(h, t, b, lab.astype(jnp.int32),
                               block_n, block_v)

        return jax.shard_map(
            local_rows, mesh=mesh, check_vma=False,
            in_specs=(P(data_ax, None), P(None, None), P(None), P(data_ax)),
            out_specs=(P(data_ax), P(data_ax)))(hidden, table, bias, labels)

    def local(h, t, b, lab):
        vj = jax.lax.axis_index(model_ax)
        v_local = t.shape[0]
        lab_local = lab.astype(jnp.int32) - vj * v_local
        # out-of-shard labels -> -1 (matches no column, contributes 0);
        # without this they could land in the kernel's PADDED vocab columns
        # and pick up the NEG pad bias
        lab_local = jnp.where((lab_local >= 0) & (lab_local < v_local),
                              lab_local, -1)
        lse_l, ll_l = catalog_nll(h, t, b, lab_local, block_n, block_v)
        # exact cross-shard merge (max-shifted logsumexp + label psum);
        # stop_gradient BEFORE pmax — pmax has no AD rule, and the shift
        # cancels in the gradient anyway
        m = jax.lax.pmax(jax.lax.stop_gradient(lse_l), model_ax)
        lse = m + jnp.log(jax.lax.psum(jnp.exp(lse_l - m), model_ax))
        ll = jax.lax.psum(ll_l, model_ax)
        return lse, ll

    return jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(P(data_ax, None), P(model_ax, None), P(model_ax),
                  P(data_ax)),
        out_specs=(P(data_ax), P(data_ax)))(hidden, table, bias, labels)


def flash_attention_spmd(q, k, v, key_mask, mesh, *, causal: bool,
                         scale=None, dropout_rate: float = 0.0, seed=0,
                         block_q: int = 1024, block_k: int = 512,
                         interpret: bool = False):
    """Data- and head-sharded blockwise (flash) attention.

    q/k/v: (B, H, T, D); batch rides the data axis; whole heads ride the
    model axis when it divides H (the kernel is per-(b, h) independent, so
    both splits are exact). The per-shard dropout seed is offset by both
    mesh coordinates so no two shards share a PRNG stream (same scheme as
    ``mau_attention_spmd``)."""
    from easydgl_tpu.kernels.flash_attention import flash_attention
    data_ax, model_ax = mesh.axis_names[0], mesh.axis_names[1]
    mp = mesh.shape[model_ax]
    h = q.shape[1]
    shard_heads = mp > 1 and h % mp == 0
    heads = model_ax if shard_heads else None

    def local(q_, k_, v_, km_, seed_):
        di = jax.lax.axis_index(data_ax)
        shard_seed = seed_ + (di + 1) * jnp.int32(104729)
        if shard_heads:
            mi = jax.lax.axis_index(model_ax)
            shard_seed = shard_seed + (mi + 1) * jnp.int32(15485863)
        return flash_attention(q_, k_, v_, km_, causal=causal, scale=scale,
                               dropout_rate=dropout_rate, seed=shard_seed,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)

    d4 = P(data_ax, heads, None, None)
    return jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(d4, d4, d4, P(data_ax, None), P()),
        out_specs=d4)(q, k, v, key_mask, jnp.asarray(seed, jnp.int32))


def mau_attention_spmd(q, k, v, t, key_mask, intervals, onehot,
                       wd, bd, w, scaling, seed, mesh,
                       causal: bool, diag_reset: bool, dropout_rate: float,
                       num_heads: int, qpos=None):
    """Data- AND head-sharded fused MAU/BiMAU attention.

    q/k/v/t ride in the natural (B, T, C) projection layout, which makes
    TENSOR PARALLELISM a pure channel split: head h owns channel block
    [h*dh:(h+1)*dh], so sharding the LAST dim over the model axis hands
    each shard a contiguous group of whole heads — every per-head
    computation (QK^T, softmax, the dominant (rows, E*dh) intensity head)
    is channel-block-local, so each shard just runs the unmodified kernel
    on num_heads/mp heads. This is the Megatron column-parallel attention
    pattern: activations split across the model axis with the small
    intensity weights replicated (their grads arrive via the psums
    shard_map's AD transpose inserts), and XLA re-gathers the (B, Tq, C)
    output over ICI where the merge projection consumes it. Per-chip MAU
    kernel work — the step's dominant cost — divides by mp.

    Head sharding engages when the model axis divides num_heads (else the
    heads stay replicated and only the batch is split). Batch must divide
    by the data-axis size. The per-shard dropout seed is offset by BOTH
    mesh coordinates so no two shards reuse a PRNG stream.
    ``qpos``: optional (B, Tq) original positions of gathered query rows
    (rides the data axis like the other per-row tensors).
    """
    data_ax, model_ax = mesh.axis_names[0], mesh.axis_names[1]
    mp = mesh.shape[model_ax]
    shard_heads = mp > 1 and num_heads % mp == 0
    h_local = num_heads // mp if shard_heads else num_heads
    if qpos is None:
        b, tq, _ = q.shape
        qpos = jnp.broadcast_to(
            jnp.arange(tq, dtype=jnp.float32)[None], (b, tq))

    def local(q_, k_, v_, t_, km_, iv_, oh_, qp_, wd_, bd_, w_, sc_, seed_):
        di = jax.lax.axis_index(data_ax)
        shard_seed = seed_ + (di + 1) * jnp.int32(104729)
        if shard_heads:
            mi = jax.lax.axis_index(model_ax)
            shard_seed = shard_seed + (mi + 1) * jnp.int32(15485863)
        return mau_attention(q_, k_, v_, t_, km_, iv_, oh_, wd_, bd_, w_,
                             sc_, shard_seed, causal, diag_reset,
                             dropout_rate, num_heads=h_local, qpos=qp_)

    heads = model_ax if shard_heads else None
    d3 = P(data_ax, None, heads)
    lam4 = P(data_ax, heads, None, None)
    return jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(d3, d3, d3, d3, P(data_ax, None), P(data_ax, None),
                  P(data_ax, None, None), P(data_ax, None), P(None, None),
                  P(None), P(None, None), P(None), P()),
        out_specs=(d3, lam4))(
        q, k, v, t, key_mask, intervals, onehot,
        qpos.astype(jnp.float32), wd, bd, w, scaling,
        jnp.asarray(seed, jnp.int32))
