"""Sequence/context parallelism: ring attention (CP) and Ulysses (SP).

The reference has no parallelism of any kind and L=30 needs none
(SURVEY.md §2.6 last row); these are the NEW framework's long-context
scaling components, designed TPU-first:

* ``ring_attention_spmd`` — context parallelism: Q/K/V/mask arrive
  sequence-sharded over a mesh axis; each device keeps its Q shard pinned
  while the K/V/mask chunks rotate around the ring via ``lax.ppermute``
  (XLA lowers neighbor permutes onto ICI). Softmax is accumulated online
  (running max / normalizer / weighted sum), so the merge across chunks is
  EXACT — and because the ring visits every chunk, the TF-reference mask
  semantics (finite -2^32+1 constant, fully-masked rows softmax to
  uniform — nn/attention.py::attention_probs) are reproduced bit-for-bit
  including on left-pad rows. Per-device attention memory is
  O(T/cp * T/cp), per-device FLOPs divide by cp.

* ``ulysses_attention_spmd`` — sequence parallelism by head re-sharding:
  two tiled ``lax.all_to_all``s swap the shard axis from sequence to heads
  and back (requires num_heads % sp == 0), with full-sequence attention on
  H/sp local heads in between. Cheaper in collective volume than a ring
  when heads divide evenly; the local step is the unmodified production
  attention (so any local impl — XLA or the flash kernel — slots in).
  ``cfg.cp_impl`` selects ring vs ulysses from the models.

* ``mau_ring_attention_spmd`` — the same ring treatment for the
  SELF-MODULATING attention family (MAU/BiMAU, reference
  temporal.py:267-452): two sweeps, because the mark-intensity lambda
  depends on the full-row normalized probs through seq_units = probs @ T
  (see the function docstring). This is what makes the flagship
  EasyDGL/CTSMA models context-parallel.

Both are differentiable through ``shard_map`` AD (ppermute/all_to_all
transpose to their inverses; the running-max is stop_gradient'ed — it
cancels analytically), so they serve training, not just eval. Gradients
are equality-tested against the dense path in tests/test_context.py.

Dropout on attention probs keeps the reference's normalize-then-drop
order: the online form accumulates a SEPARATE dropped numerator next to
the undropped normalizer, each chunk's keep-mask drawn from a
``jax.random`` stream folded with (query-shard, key-chunk owner), so the
pattern is deterministic in the seed but differs from the single-device
stream (tests pin rate=0 for exact parity, statistics otherwise).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from easydgl_tpu.nn.layers import NEG_INF_LOGIT


def _online_update(carry, s, v, keep):
    """One exact online-softmax accumulation step.

    carry = (acc, m, l); s: (..., Tq, Tk) masked logits (finite NEG at
    masked entries); v: (..., Tk, D); keep: dropout keep-mask (or None).
    """
    acc, m, l = carry
    m_new = jnp.maximum(m, jax.lax.stop_gradient(
        jnp.max(s, axis=-1, keepdims=True)))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = p if keep is None else p * keep
    acc = acc * corr + jnp.einsum("...qk,...kd->...qd", pv, v,
                                  preferred_element_type=jnp.float32)
    return acc, m_new, l


def _chunk_logits(q, k, km, qpos, kpos, *, scale, causal):
    """Masked logits for one (Q-shard x K-chunk) block, TF semantics:
    bias-free scaled QK^T with the finite -2^32+1 mask constant
    (reference sequential.py:50-63 via nn/attention.py)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = (km > 0)[:, None, None, :]
    if causal:
        mask = jnp.logical_and(mask, (kpos[None, :] <= qpos[:, None]))
    return jnp.where(mask, s, NEG_INF_LOGIT)


def _ring_local(q, k, v, km, seed, *, seq_axis: str, causal: bool,
                scale: Optional[float], rate: float,
                data_axis: Optional[str] = None):
    """Per-shard ring attention body (runs inside shard_map)."""
    cp = jax.lax.axis_size(seq_axis)
    my = jax.lax.axis_index(seq_axis)
    if data_axis is not None:
        # distinct dropout streams per data shard (same hygiene as
        # kernels/spmd.py's per-coordinate seed offsets)
        seed = seed + (jax.lax.axis_index(data_axis) + 1) * jnp.int32(104729)
    b, h, tl, d = q.shape
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    qpos = my * tl + jnp.arange(tl)

    acc = jnp.zeros((b, h, tl, d), jnp.float32)
    m = jnp.full((b, h, tl, 1), -1.0e38, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    # the ring: after j rotations this device holds the chunk that
    # started on device (my - j) % cp
    fwd_perm = [(i, (i + 1) % cp) for i in range(cp)]
    for step in range(cp):
        src = (my - step) % cp
        kpos = src * tl + jnp.arange(tl)
        s = _chunk_logits(qf, kf, km, qpos, kpos, scale=scale,
                          causal=causal)
        keep = None
        if rate > 0.0:
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(0), seed), my * cp + step)
            keep = jax.random.bernoulli(
                key, 1.0 - rate, (b, h, tl, tl)) / (1.0 - rate)
        acc, m, l = _online_update((acc, m, l), s, vf, keep)
        if step + 1 < cp:
            kf, vf, km = (jax.lax.ppermute(x, seq_axis, fwd_perm)
                          for x in (kf, vf, km))
    return (acc / l).astype(q.dtype)


def ring_attention_spmd(q, k, v, key_mask, mesh: Mesh, *, seq_axis: str,
                        causal: bool, data_axis: Optional[str] = None,
                        scale: Optional[float] = None,
                        dropout_rate: float = 0.0, seed=0):
    """Context-parallel attention over ``mesh[seq_axis]``.

    q/k/v: (B, H, T, D) with T sharded over the seq axis (and optionally B
    over ``data_axis``); key_mask: (B, T) sharded the same way. Returns
    (B, H, T, D) with the input sharding. Exactly equal (modulo float
    accumulation order) to the dense attention_probs path at rate 0.
    """
    d3 = P(data_axis, None, seq_axis, None)
    dm = P(data_axis, seq_axis)
    body = partial(_ring_local, seq_axis=seq_axis, causal=causal,
                   scale=scale, rate=float(dropout_rate),
                   data_axis=data_axis)
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(d3, d3, d3, dm, P()),
        out_specs=d3)(q, k, v, key_mask.astype(jnp.float32),
                      jnp.asarray(seed, jnp.int32))


def _mau_ring_local(q, k, v, t, km, iv, oh, wd, bd, w, scaling, seed, *,
                    seq_axis: str, causal: bool, diag_reset: bool,
                    rate: float, data_axis: Optional[str]):
    """Per-shard ring MAU (self-modulating attention, reference
    temporal.py:267-452) — TWO ring sweeps:

    1. online-softmax stats (m, l) + the exp-weighted T accumulation,
       giving seq_units = softmax(probs) @ T exactly;
    2. the intensity head runs SHARD-LOCALLY on seq_units (it only needs
       the q rows), then the second sweep recomputes each probs chunk
       from (m, l) and accumulates (intensity_qk * probs [* drop]) @ V.

    The mark intensity lambda depends on the FULL-row normalized probs
    (through seq_units), which is why a single online pass cannot fuse it
    — the two-sweep split is the minimal exact decomposition.
    """
    cp = jax.lax.axis_size(seq_axis)
    my = jax.lax.axis_index(seq_axis)
    if data_axis is not None:
        seed = seed + (jax.lax.axis_index(data_axis) + 1) * jnp.int32(104729)
    b, h, tl, dh = q.shape
    e = w.shape[0]
    scale = 1.0 / (dh ** 0.5)
    qf = q.astype(jnp.float32)
    qpos = my * tl + jnp.arange(tl)
    fwd_perm = [(i, (i + 1) % cp) for i in range(cp)]

    # ---- sweep 1: softmax stats + seq_units ----
    m = jnp.full((b, h, tl, 1), -1.0e38, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    su = jnp.zeros((b, h, tl, dh), jnp.float32)
    kf, tf, kmf = k.astype(jnp.float32), t.astype(jnp.float32), km
    for step in range(cp):
        src = (my - step) % cp
        kpos = src * tl + jnp.arange(tl)
        s = _chunk_logits(qf, kf, kmf, qpos, kpos, scale=scale,
                          causal=causal)
        su, m, l = _online_update((su, m, l), s, tf, None)
        if step + 1 < cp:
            kf, tf, kmf = (jax.lax.ppermute(x, seq_axis, fwd_perm)
                           for x in (kf, tf, kmf))
    seq_units = su / l
    # NOTE: sweep 2 recomputes probs as exp(s - m) / l, NOT exp(s - lse):
    # on fully-masked (dead) rows every logit is the -2^32+1 constant,
    # whose f32 ulp (512) swallows log(T) — exp(s - (m + log l)) would be
    # exp(+-ulp) garbage there, while exp(s - m) is exactly exp(0) -> the
    # dense path's uniform fallback (same fix as kernels/mau_blocked.py).

    # ---- intensity head (q-shard local; reference temporal.py:281-315) --
    x = jnp.concatenate(
        [seq_units, jnp.broadcast_to(iv[:, None, :, None],
                                     (b, h, tl, 1)).astype(jnp.float32)],
        axis=-1)
    z = jnp.einsum("bhqc,cd->bhqd", x, wd.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(z + bd).reshape(b, h, tl, e, dh)
    raw = jnp.einsum("bhqed,ed->bhqe", sig, w.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    s_e = jnp.exp(scaling)
    lam = s_e * jax.nn.softplus(raw / s_e)          # (B, H, Tl, E)

    # ---- sweep 2: modulated output ----
    acc = jnp.zeros((b, h, tl, dh), jnp.float32)
    kf, vf, ohf, kmf = (k.astype(jnp.float32), v.astype(jnp.float32),
                        oh.astype(jnp.float32), km)
    for step in range(cp):
        src = (my - step) % cp
        kpos = src * tl + jnp.arange(tl)
        s = _chunk_logits(qf, kf, kmf, qpos, kpos, scale=scale,
                          causal=causal)
        p = jnp.exp(s - m) / l                      # normalized probs
        iqk = jnp.einsum("bhqe,bke->bhqk", lam, ohf,
                         preferred_element_type=jnp.float32)
        if diag_reset:  # BiMAU: intensity diagonal := 1 (temporal.py:438)
            is_diag = (kpos[None, None, None, :]
                       == qpos[None, None, :, None])
            iqk = jnp.where(is_diag, 1.0, iqk)
        mod = iqk * p
        if rate > 0.0:
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(2), seed), my * cp + step)
            keep = jax.random.bernoulli(
                key, 1.0 - rate, mod.shape) / (1.0 - rate)
            mod = mod * keep
        acc = acc + jnp.einsum("bhqk,bhkd->bhqd", mod, vf,
                               preferred_element_type=jnp.float32)
        if step + 1 < cp:
            kf, vf, ohf, kmf = (jax.lax.ppermute(x, seq_axis, fwd_perm)
                                for x in (kf, vf, ohf, kmf))
    return acc.astype(q.dtype), lam


def mau_ring_attention_spmd(q, k, v, t, key_mask, intervals, onehot,
                            wd, bd, w, scaling, seed, mesh: Mesh, *,
                            seq_axis: str, causal: bool, diag_reset: bool,
                            dropout_rate: float = 0.0,
                            data_axis: Optional[str] = None):
    """Context-parallel MAU/BiMAU: q/k/v/t (B, H, T, dh) and
    key_mask/intervals (B, T) sequence-sharded over ``mesh[seq_axis]``;
    onehot (B, T, E) likewise; intensity params replicated (their grads
    arrive via shard_map AD's psums). Returns (out (B,H,T,dh),
    mark_intensity (B,H,T,E)) with the input shardings — exactly the XLA
    MAU module path (nn/temporal.py) up to float accumulation order."""
    d4 = P(data_axis, None, seq_axis, None)
    d2 = P(data_axis, seq_axis)
    d3 = P(data_axis, seq_axis, None)
    body = partial(_mau_ring_local, seq_axis=seq_axis, causal=causal,
                   diag_reset=diag_reset, rate=float(dropout_rate),
                   data_axis=data_axis)
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(d4, d4, d4, d4, d2, d2, d3,
                  P(None, None), P(None), P(None, None), P(None), P()),
        out_specs=(d4, d4))(
        q, k, v, t, key_mask.astype(jnp.float32),
        intervals.astype(jnp.float32), onehot.astype(jnp.float32),
        wd, bd, w, scaling, jnp.asarray(seed, jnp.int32))


def _ulysses_local(q, k, v, km, seed, *, seq_axis: str, causal: bool,
                   scale: Optional[float], rate: float,
                   data_axis: Optional[str] = None):
    """Per-shard Ulysses body: seq-shard -> head-shard -> attention ->
    seq-shard (runs inside shard_map)."""
    from easydgl_tpu.nn.attention import attention_probs
    a2a = partial(jax.lax.all_to_all, axis_name=seq_axis, tiled=True)
    qh = a2a(q, split_axis=1, concat_axis=2)   # (B, H/sp, T, D)
    kh = a2a(k, split_axis=1, concat_axis=2)
    vh = a2a(v, split_axis=1, concat_axis=2)
    km_full = jax.lax.all_gather(km, seq_axis, axis=1, tiled=True)
    probs = attention_probs(qh, kh, key_mask=km_full, causal=causal,
                            scale=scale)
    if rate > 0.0:
        my = jax.lax.axis_index(seq_axis)
        if data_axis is not None:
            seed = seed + (jax.lax.axis_index(data_axis) + 1) * \
                jnp.int32(104729)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(1), seed), my)
        keep = jax.random.bernoulli(key, 1.0 - rate, probs.shape)
        probs = probs * keep / (1.0 - rate)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return a2a(ctx, split_axis=2, concat_axis=1)


def ulysses_attention_spmd(q, k, v, key_mask, mesh: Mesh, *, seq_axis: str,
                           causal: bool, data_axis: Optional[str] = None,
                           scale: Optional[float] = None,
                           dropout_rate: float = 0.0, seed=0):
    """Ulysses sequence-parallel attention over ``mesh[seq_axis]``.

    Same contract as ``ring_attention_spmd``; additionally requires
    num_heads % mesh.shape[seq_axis] == 0 (the all_to_all re-shards heads).
    """
    sp = mesh.shape[seq_axis]
    assert q.shape[1] % sp == 0, \
        f"ulysses needs heads ({q.shape[1]}) divisible by sp ({sp})"
    d3 = P(data_axis, None, seq_axis, None)
    dm = P(data_axis, seq_axis)
    body = partial(_ulysses_local, seq_axis=seq_axis, causal=causal,
                   scale=scale, rate=float(dropout_rate),
                   data_axis=data_axis)
    return jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(d3, d3, d3, dm, P()),
        out_specs=d3)(q, k, v, key_mask.astype(jnp.float32),
                      jnp.asarray(seed, jnp.int32))
