"""Continuous-time attention modules.

Parity notes vs reference ``src/module/temporal.py``:

* ``TiMultiHeadAttention`` (temporal.py:15-105, TiSASREC) — attention logits
  get two additive relative biases (``Q @ K_pos^T`` and ``einsum(Q, K_int)``,
  ``:55-59``) and values get two additive relative values (``:93-97``); the
  post-softmax query-mask multiply (``:84-88``) zeroes padded query rows.
* ``TfMultiHeadAttention`` (temporal.py:108-184, TGAT) — same logit biases,
  plain values.
* ``TgMultiHeadAttention`` (temporal.py:187-264, TGREC) — per-(q,k)
  time-coded keys concatenated with item states; output is a 2C-wide
  dense+residual+LN over the concatenated query.
* ``MAU`` / ``BiMAU`` / ``MGAU`` (temporal.py:267-508, CTSMA/EasyDGL) —
  self-modulating attention: a 4th projection T feeds a Hawkes-style
  intensity head; attention probs are modulated elementwise by the per-(q,k)
  mark intensity. ``BiMAU`` is bidirectional with the intensity diagonal
  reset to 1 (``:438-439``); ``MGAU`` is the gated variant (defined but
  unused by any reference model).

The position/interval codings are computed ONCE by the model and passed in as
tensors (the reference shares the coding variables across blocks by passing
module objects; computing the codes up front is the functional equivalent and
avoids per-block recompute).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.nn.layers import (mxu_einsum,
                                   Dense, NEG_INF_LOGIT, glorot, merge_heads,
                                   split_heads)

# reference WEIGHT_INITIALIZER = tf.random_normal_initializer(stddev=0.02)
normal002 = nn.initializers.normal(stddev=0.02)


def _mask_logits(logits, key_mask, causal, qpos=None):
    """qpos: optional (B, Tq) ORIGINAL positions of (gathered) query rows;
    the causal horizon is then col <= qpos instead of the square tril."""
    if key_mask is not None:
        logits = jnp.where(key_mask.astype(bool)[:, None, None, :],
                           logits, NEG_INF_LOGIT)
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        if qpos is None:
            keep = jnp.tril(jnp.ones((tq, tk), bool))[None, None]
        else:
            keep = (jnp.arange(tk)[None, None, None, :]
                    <= qpos[:, None, :, None])
        logits = jnp.where(keep, logits, NEG_INF_LOGIT)
    return logits


def _split_heads_4d(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, Tq, Tk, C) -> (B, H, Tq, Tk, C/H), channel-block head split."""
    b, tq, tk, c = x.shape
    return x.reshape(b, tq, tk, num_heads, c // num_heads).transpose(0, 3, 1, 2, 4)


class TiMultiHeadAttention(nn.Module):
    """Time-interval-aware attention (reference temporal.py:15-105).

    Two exact implementations of the interval terms:

    * DENSE (default, the reference layout): the model materializes the
      gathered (B, Tq, Tk, C) interval codes — O(L^2 * C) memory, fine at
      the published L=30.
    * FACTORED (long-context; pass ``interval_buckets`` (B, Tq, Tk) int32
      and ``interval_tables`` = the EXTENDED (S+1, C) k/v tables from
      TimeIntervalCoding.table_extended): by linearity of the gather,
      ``q . T[bucket]`` equals a gather from the per-query bucket
      projections ``q @ T^T`` (a (B, H, Tq, S+1) tensor), and
      ``sum_k probs * T_v[bucket]`` equals a bucket segment-sum of probs
      followed by ONE (S+1, dh) matmul. No (Tq, Tk, C) tensor exists —
      the x C factor drops out of the memory bill, which is what makes
      TiSASREC runnable at L in the thousands. Bit-equal to the dense
      path up to float reassociation (tests/test_long_context.py).
    """
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, queries, keys, k_pos, v_pos, k_int, v_int, *,
                 deterministic: bool, causality: bool,
                 interval_buckets=None, interval_tables=None):
        """k_pos/v_pos: (B, T, C) position codes; k_int/v_int: (B, Tq, Tk, C)
        interval codes (dense path; pass None with the factored args)."""
        h = self.num_heads
        q = split_heads(Dense(self.num_units, name="q")(queries), h)
        k = split_heads(Dense(self.num_units, name="k")(keys), h)
        v = split_heads(Dense(self.num_units, name="v")(keys), h)
        kp = split_heads(k_pos, h)
        vp = split_heads(v_pos, h)
        d = q.shape[-1]
        factored = interval_buckets is not None

        logits = (mxu_einsum("bhqd,bhkd->bhqk", q, k)
                  + mxu_einsum("bhqd,bhkd->bhqk", q, kp))
        if factored:
            tab_k, tab_v = interval_tables
            s_ext = tab_k.shape[0]
            tabs_k = tab_k.reshape(s_ext, h, d)
            # per-query bucket projections, then a (Tq, Tk) gather
            q_tab = mxu_einsum("bhqd,shd->bhqs", q, tabs_k)
            idx = jnp.broadcast_to(interval_buckets[:, None],
                                   q_tab.shape[:3] + interval_buckets.shape[-1:])
            logits = logits + jnp.take_along_axis(q_tab, idx, axis=-1)
        else:
            ki = _split_heads_4d(k_int, h)
            logits = logits + mxu_einsum("bhqkd,bhqd->bhqk", ki, q)
        logits = logits / (d ** 0.5)
        key_mask = jnp.sign(jnp.sum(jnp.abs(keys), axis=-1))  # temporal.py:65
        logits = _mask_logits(logits, key_mask, causality)
        probs = jax.nn.softmax(logits, axis=-1)

        # post-softmax query masking (temporal.py:84-88)
        query_mask = jnp.sign(jnp.sum(jnp.abs(queries), axis=-1))  # (B, Tq)
        probs = probs * query_mask[:, None, :, None]
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)

        out = (mxu_einsum("bhqk,bhkd->bhqd", probs, v)
               + mxu_einsum("bhqk,bhkd->bhqd", probs, vp))
        if factored:
            tabs_v = interval_tables[1].reshape(s_ext, h, d)
            seg = functools.partial(jax.ops.segment_sum,
                                    num_segments=s_ext)
            probsum = jax.vmap(jax.vmap(jax.vmap(seg)))(
                probs, jnp.broadcast_to(interval_buckets[:, None],
                                        probs.shape))
            out = out + mxu_einsum("bhqs,shd->bhqd", probsum, tabs_v)
        else:
            vi = _split_heads_4d(v_int, h)
            out = out + mxu_einsum("bhqk,bhqkd->bhqd", probs, vi)
        return merge_heads(out) + queries


class TfMultiHeadAttention(nn.Module):
    """Functional-time-encoding attention (reference temporal.py:108-184).

    Two exact forms of the time-feature logit term
    ``sum_c q_c * cos(w_c*(tq - tk) + phi_c)``:

    * DENSE (default): the model materializes the (B, Tq, Tk, C) coded
      tensor ``k_int`` — the reference layout, fine at L=30.
    * FACTORED (long-context; pass ``time_factors`` from
      TimeFunctionCoding.factors instead of ``k_int``): by the angle-
      addition identity the term becomes an augmented inner product
      ``[q, q, q*cq, q*sq] . [k, kp, ck, sk]`` — plain attention over
      4d-wide heads, O(L*C) memory, exact on every unmasked entry (event
      times are nondecreasing, so the reference's (tq - tk)+ clamp is
      inactive wherever the causal+key mask admits). This also makes the
      family eligible for:
      - ``impl="flash"`` — the augmented q/k ride the blockwise Pallas
        kernel (kernels/flash_attention.py) with the ORIGINAL 1/sqrt(d)
        scale: O(T) memory long context for TGAT;
      - a cp>1 SEQUENCE mesh — ring/Ulysses CP (dist/context.py) over the
        augmented q/k, since the factored form is mask-plus-QK^T
        attention, which is all the ring assumes.
    """
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0
    impl: str = "xla"      # xla | flash (flash requires time_factors)
    cp_impl: str = "ring"  # ring | ulysses (under a cp>1 mesh)

    @nn.compact
    def __call__(self, queries, keys, k_pos, k_int, *,
                 deterministic: bool, causality: bool, time_factors=None):
        h = self.num_heads
        q = split_heads(Dense(self.num_units, name="q")(queries), h)
        k = split_heads(Dense(self.num_units, name="k")(keys), h)
        v = split_heads(Dense(self.num_units, name="v")(keys), h)
        kp = split_heads(k_pos, h)
        d = q.shape[-1]
        key_mask = jnp.sign(jnp.sum(jnp.abs(keys), axis=-1))
        rate = 0.0 if deterministic else float(self.dropout_rate)

        if time_factors is not None:
            cq, sq, ck, sk = time_factors
            qa = jnp.concatenate(
                [q, q, q * split_heads(cq, h).astype(q.dtype),
                 q * split_heads(sq, h).astype(q.dtype)], axis=-1)
            ka = jnp.concatenate(
                [k, kp, split_heads(ck, h).astype(k.dtype),
                 split_heads(sk, h).astype(k.dtype)], axis=-1)

            from easydgl_tpu.core.mesh import spmd_mesh, seq_axis_info
            mesh = spmd_mesh()
            seq_ax, _ = seq_axis_info(mesh)
            if seq_ax is not None or self.impl == "flash":
                if rate > 0.0:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                else:
                    seed = jnp.zeros((), jnp.int32)
                if seq_ax is not None:
                    from easydgl_tpu.dist.context import (
                        ring_attention_spmd, ulysses_attention_spmd)
                    cp_fn = (ulysses_attention_spmd
                             if self.cp_impl == "ulysses"
                             else ring_attention_spmd)
                    ctx = cp_fn(qa, ka, v, key_mask, mesh, seq_axis=seq_ax,
                                data_axis=mesh.axis_names[0],
                                causal=causality, scale=1.0 / (d ** 0.5),
                                dropout_rate=rate, seed=seed)
                else:
                    # the blockwise kernel streams q/k/v through one block
                    # width — zero-pad v to the augmented width (zero
                    # columns are exact pass-throughs with zero grads)
                    vpad = jnp.concatenate(
                        [v, jnp.zeros(v.shape[:-1]
                                      + (qa.shape[-1] - v.shape[-1],),
                                      v.dtype)], axis=-1)
                    if mesh is not None:
                        from easydgl_tpu.kernels.spmd import \
                            flash_attention_spmd
                        ctx = flash_attention_spmd(
                            qa, ka, vpad, key_mask, mesh, causal=causality,
                            scale=1.0 / (d ** 0.5), dropout_rate=rate,
                            seed=seed)
                    else:
                        from easydgl_tpu.kernels.flash_attention import \
                            flash_attention
                        ctx = flash_attention(
                            qa, ka, vpad, key_mask, causal=causality,
                            scale=1.0 / (d ** 0.5), dropout_rate=rate,
                            seed=seed)
                    ctx = ctx[..., :v.shape[-1]]
                    # uniform-fallback patch for fully-masked rows (same
                    # contract as nn/attention.py::MultiHeadAttention)
                    if causality:
                        vis = jnp.cumsum(key_mask, axis=1) > 0
                    else:
                        vis = jnp.broadcast_to(
                            jnp.any(key_mask > 0, axis=1, keepdims=True),
                            key_mask.shape)
                    mean_v = jnp.mean(v, axis=2, keepdims=True)
                    ctx = jnp.where(vis[:, None, :, None], ctx, mean_v)
                return merge_heads(ctx) + queries
            logits = mxu_einsum("bhqd,bhkd->bhqk", qa, ka)
        else:
            ki = _split_heads_4d(k_int, h)
            logits = (mxu_einsum("bhqd,bhkd->bhqk", q, k)
                      + mxu_einsum("bhqd,bhkd->bhqk", q, kp)
                      + mxu_einsum("bhqkd,bhqd->bhqk", ki, q))
        logits = logits / (d ** 0.5)
        logits = _mask_logits(logits, key_mask, causality)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        out = mxu_einsum("bhqk,bhkd->bhqd", probs, v)
        return merge_heads(out) + queries


class TgMultiHeadAttention(nn.Module):
    """Temporal-graph collaborative attention (reference temporal.py:187-264).

    Output width is 2*num_units (dense over merged heads + residual with the
    time-concatenated query + last-axis LN, temporal.py:261-263).

    FULLY factorable (long-context mode; pass ``time_factors`` from
    TimeFunctionCoding.factors instead of ``k_time``): the reference's
    per-(q, k) keys/values ``Dense([items_k, coding(tq - tk)])`` are
    linear, so they split as ``A_k + coding(tq - tk) @ W[C:]`` — and the
    coding factors per position by the angle-addition identity. The logit
    becomes an augmented inner product and the value mix becomes
    ``probs @ [A, ck, sk]`` recombined per query, so NO (B, Tq, Tk, 2C)
    tensor exists (the reference's is the heaviest O(L^2*C) object in the
    zoo, temporal.py:209-215). Exact: same Dense parameters ("q"/"k"/"v"
    kernels split by basis application), same masked softmax, same
    normalize-then-drop order (the dropped probs feed all three value
    streams, exactly like the dense path's single probs tensor).
    """
    num_units: int
    num_heads: int
    dropout_rate: float = 0.0
    impl: str = "xla"  # "flash" streams the augmented q/k/v blockwise

    @nn.compact
    def __call__(self, queries, keys, key_mask, q_time, k_time, *,
                 deterministic: bool, causality: bool, time_factors=None):
        """q_time: (B, Tq, 1, C) coding at Δt=0; k_time: (B, Tq, Tk, C)
        (dense path; pass None with ``time_factors`` instead)."""
        from easydgl_tpu.nn.layers import LastAxisLayerNorm
        h = self.num_heads
        b, tq, c = queries.shape
        tk = keys.shape[1]
        d_q = Dense(self.num_units, name="q")
        d_k = Dense(self.num_units, name="k")
        d_v = Dense(self.num_units, name="v")
        q4 = jnp.concatenate([queries[:, :, None, :], q_time], axis=-1)

        if time_factors is not None:
            cq, sq, ck, sk = (f.astype(jnp.float32) for f in time_factors)
            dh = self.num_units // h
            q = _split_heads_4d(d_q(q4), h)[:, :, :, 0, :]  # (B, H, Tq, d)
            zc = jnp.zeros_like(keys)
            # items part A = W[:C] @ keys + bias (bias rides this half);
            # basis application extracts the coding half W[C:] exactly
            ka = d_k(jnp.concatenate([keys, zc], axis=-1))  # (B, Tk, U)
            va = d_v(jnp.concatenate([keys, zc], axis=-1))
            eye2 = jnp.concatenate(
                [jnp.zeros((c, c)), jnp.eye(c)], axis=-1).astype(keys.dtype)
            zrow = jnp.zeros((1, 2 * c), keys.dtype)
            wk2 = (d_k(eye2) - d_k(zrow)).reshape(c, h, dh)
            wv2 = (d_v(eye2) - d_v(zrow)).reshape(c, h, dh)

            u = mxu_einsum("bhqd,chd->bhqc", q, wk2)        # (B, H, Tq, C)

            if self.impl == "flash":
                # O(T) memory: logits AND the three value streams ride the
                # blockwise kernel as one augmented attention —
                # q~ = [q, u*cq, u*sq], k~ = v~-keys = [A, ck, sk]; the
                # kernel returns [probs@A, probs@ck, probs@sk] stacked.
                from easydgl_tpu.kernels.flash_attention import \
                    flash_attention
                rate = 0.0 if deterministic else float(self.dropout_rate)
                if rate > 0.0:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                else:
                    seed = jnp.zeros((), jnp.int32)
                ckh = jnp.broadcast_to(ck[:, None], (b, h, tk, c))
                skh = jnp.broadcast_to(sk[:, None], (b, h, tk, c))
                uf = u.astype(jnp.float32)
                qa = jnp.concatenate(
                    [q.astype(jnp.float32), uf * cq[:, None],
                     uf * sq[:, None]], axis=-1)
                ka_aug = jnp.concatenate(
                    [split_heads(ka, h).astype(jnp.float32), ckh, skh],
                    axis=-1)
                va_aug = jnp.concatenate(
                    [split_heads(va, h).astype(jnp.float32), ckh, skh],
                    axis=-1)
                ctx = flash_attention(qa, ka_aug, va_aug,
                                      key_mask.astype(jnp.float32),
                                      causal=causality,
                                      scale=1.0 / (dh ** 0.5),
                                      dropout_rate=rate, seed=seed)
                # uniform fallback for fully-masked rows (dense semantics)
                if causality:
                    vis = jnp.cumsum(key_mask, axis=1) > 0
                else:
                    vis = jnp.broadcast_to(
                        jnp.any(key_mask > 0, axis=1, keepdims=True),
                        key_mask.shape)
                mean_v = jnp.mean(va_aug, axis=2, keepdims=True)
                ctx = jnp.where(vis[:, None, :, None], ctx, mean_v)
                out = ctx[..., :dh]
                tm = (cq[:, None] * ctx[..., dh:dh + c]
                      + sq[:, None] * ctx[..., dh + c:])
                # clamp parity on dead rows (see the xla branch): the
                # uniform fallback's time mean must use the CLAMPED
                # features — prefix (k <= q+1) factored sums via cumsum
                # plus (Tk - q - 2)+ copies of coding(0) = q_time.
                qt0 = q_time[:, :, 0, :].astype(jnp.float32)
                pos = jnp.arange(tq)
                upto = jnp.minimum(pos + 1, tk - 1)
                pre_c = jnp.cumsum(ck, axis=1)[:, upto]  # (B, Tq, C)
                pre_s = jnp.cumsum(sk, axis=1)[:, upto]
                nfut = jnp.maximum(tk - 2 - pos, 0).astype(jnp.float32)
                tm_dead = (cq * pre_c + sq * pre_s
                           + nfut[None, :, None] * qt0) / tk
                tm = jnp.where(vis[:, None, :, None], tm, tm_dead[:, None])
                out = out + mxu_einsum("bhqc,chd->bhqd", tm, wv2)
                out = merge_heads(out.astype(queries.dtype))
                out = Dense(2 * self.num_units, name="merge")(out)
                out = out + q4[:, :, 0, :]
                return LastAxisLayerNorm(name="ln")(out)

            # Clamp parity. The models feed Δ[q,k] = ts[q+1] - ts[k]
            # through the reference's (Δt)+ clamp (models/tgrec.py): for
            # k <= q+1 the clamp is inactive (event times nondecreasing;
            # ties hit coding(0) from both sides), while for k > q+1 the
            # dense feature is exactly coding(0) = q_time. Under the
            # causal mask prob mass reaches k > q only on DEAD
            # (fully-masked pad-query) rows — the band split keeps
            # factored == dense on those rows too, and under
            # causality=False as well. The (Tq, Tk) band costs no memory
            # class the O(L^2) probs don't already pay; the factored
            # win — no (B, Tq, Tk, C) tensor — is untouched.
            band = (jnp.arange(tk)[None, :]
                    <= jnp.arange(tq)[:, None] + 1)[None, None]
            qt0 = q_time[:, :, 0, :].astype(u.dtype)  # coding(0), (B,Tq,C)
            t_fact = (mxu_einsum("bhqc,bkc->bhqk",
                                 u * cq[:, None].astype(u.dtype), ck)
                      + mxu_einsum("bhqc,bkc->bhqk",
                                   u * sq[:, None].astype(u.dtype), sk))
            t_fut = mxu_einsum("bhqc,bqc->bhq", u, qt0)[..., None]
            logits = (mxu_einsum("bhqd,bhkd->bhqk", q, split_heads(ka, h))
                      + jnp.where(band, t_fact, t_fut))
            logits = logits / (dh ** 0.5)
            logits = _mask_logits(logits, key_mask, causality)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(self.dropout_rate,
                               deterministic=deterministic)(probs)
            out = mxu_einsum("bhqk,bhkd->bhqd", probs, split_heads(va, h))
            pb = probs * band
            pc = mxu_einsum("bhqk,bkc->bhqc", pb, ck)
            ps = mxu_einsum("bhqk,bkc->bhqc", pb, sk)
            rest = jnp.sum(probs - pb, axis=-1)  # beyond-band prob mass
            tm = (cq[:, None].astype(pc.dtype) * pc
                  + sq[:, None].astype(ps.dtype) * ps
                  + rest[..., None] * qt0[:, None].astype(pc.dtype))
            out = out + mxu_einsum("bhqc,chd->bhqd", tm, wv2)
            out = merge_heads(out)  # (B, Tq, C)
        else:
            k4 = jnp.concatenate(
                [jnp.broadcast_to(keys[:, None, :, :], (b, tq, tk, c)),
                 k_time], axis=-1)  # (B, Tq, Tk, 2C)

            q = _split_heads_4d(d_q(q4), h)   # (B, H, Tq, 1, d)
            k = _split_heads_4d(d_k(k4), h)   # (B, H, Tq, Tk, d)
            v = _split_heads_4d(d_v(k4), h)
            d = q.shape[-1]

            logits = mxu_einsum("bhqod,bhqkd->bhqk", q, k) / (d ** 0.5)
            logits = _mask_logits(logits, key_mask, causality)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(self.dropout_rate,
                               deterministic=deterministic)(probs)
            out = mxu_einsum("bhqk,bhqkd->bhqd", probs, v)
            out = merge_heads(out)  # (B, Tq, C)

        out = Dense(2 * self.num_units, name="merge")(out)
        out = out + q4[:, :, 0, :]  # residual with (B, Tq, 2C) query
        return LastAxisLayerNorm(name="ln")(out)


class MAU(nn.Module):
    """Self-modulating attention unit (reference temporal.py:267-390).

    Returns (outputs, mark_intensity) where mark_intensity is
    (B, H, Tq, E) — per-head intensities for every event type, consumed by
    the TPP regularizer (``biased_likelihood``).
    """
    num_units: int
    num_heads: int
    num_events: int
    dropout_rate: float = 0.0
    fused_qkvt: bool = False          # BiMAU/MGAU: single 4C projection
    causal_default: bool = True
    diag_reset: bool = False          # BiMAU: intensity diagonal := 1
    # "xla" (materialized einsum chain) | "fused" (whole-chain Pallas
    # kernel, kernels/mau_attention.py) | "blocked" (key-block-streaming
    # two-sweep schedule, kernels/mau_blocked.py — O(T * block) memory,
    # the single-chip LONG-CONTEXT mode) | "streamed" (the same two-sweep
    # decomposition as Pallas kernels, kernels/mau_streamed.py — the
    # long-context mode when kernels are enabled; models select
    # streamed/blocked under cfg.attention_impl == "flash" by
    # models/base.py::mau_impl). A standalone intensity-head-only
    # kernel existed through round 2 but was production-unreachable once
    # the full-chain kernel landed, and was deleted (round-3 keep-or-
    # delete; the chain kernel covers every accelerated call site).
    intensity_impl: str = "xla"
    blocked_block_k: int = 512        # key-block size of the blocked mode

    def setup(self):
        if self.fused_qkvt:
            self.qkvt = Dense(4 * self.num_units, kernel_init=normal002,
                              name="qkvt")
        else:
            self.q_proj = Dense(self.num_units, name="q")
            self.k_proj = Dense(self.num_units, name="k")
            self.v_proj = Dense(self.num_units, name="v")
            self.t_proj = Dense(self.num_units, name="t")
        dh = self.num_units // self.num_heads
        # intensity head (reference temporal.py:281-315): shared dense over
        # heads, per-event readout weight + learned log-scaling temperature.
        # Dense params declared directly so the fused Pallas chain kernel
        # (kernels/mau_attention.py) can consume them too.
        self.intensity_kernel = self.param(
            "intensity_dense_kernel", glorot(), (dh + 1, dh * self.num_events))
        self.intensity_bias = self.param(
            "intensity_dense_bias", nn.initializers.zeros,
            (dh * self.num_events,))
        self.intensity_weight = self.param(
            "intensity_weight", glorot(), (self.num_events, dh))
        self.intensity_scaling = self.param(
            "intensity_scaling", nn.initializers.zeros, (self.num_events,))
        self.dropout = nn.Dropout(self.dropout_rate)

    def intensity(self, h_units: jnp.ndarray, intervals: jnp.ndarray,
                  mark_onehot: jnp.ndarray):
        """h_units: (B, H, Tq, dh); intervals: (B, Tq); mark_onehot: (B, Tk, E).

        Returns (intensity_qk (B,H,Tq,Tk), mark_intensity (B,H,Tq,E)).
        The scaled softplus ``s * log(1 + exp(x / s))`` with ``s = exp(p)``
        reproduces temporal.py:299-306.
        """
        b, h, tq, dh = h_units.shape
        e = self.num_events
        iv = jnp.broadcast_to(intervals[:, None, :, None], (b, h, tq, 1))
        x = jnp.concatenate([h_units, iv.astype(h_units.dtype)], axis=-1)
        z = mxu_einsum("bhqc,cd->bhqd", x, self.intensity_kernel)
        sig = jax.nn.sigmoid(z + self.intensity_bias)       # (B,H,Tq,dh*E)
        sig = sig.reshape(b, h, tq, e, dh)                  # event-major
        raw = mxu_einsum("bhqed,ed->bhqe", sig, self.intensity_weight)
        s = jnp.exp(self.intensity_scaling)             # (E,)
        mark_intensity = s * jax.nn.softplus(raw / s)   # (B,H,Tq,E)
        intensity_qk = mxu_einsum("bhqe,bke->bhqk", mark_intensity, mark_onehot.astype(mark_intensity.dtype))
        return intensity_qk, mark_intensity

    @staticmethod
    def biased_likelihood(mark_intensity: jnp.ndarray,
                          next_mark_onehot: jnp.ndarray,
                          intervals: jnp.ndarray) -> jnp.ndarray:
        """Biased TPP log-likelihood (reference temporal.py:317-333).

        mark_intensity: (..., Tq, E); next_mark_onehot: same shape
        (already broadcast across heads as the reference tiles it);
        intervals: (..., Tq).
        """
        has_event = jnp.sign(jnp.sum(next_mark_onehot, axis=-1, keepdims=True))
        mark_intensity = mark_intensity * has_event
        event_intensity = jnp.sum(mark_intensity * next_mark_onehot, axis=-1)
        event_ll = jnp.sum(jnp.log(jnp.where(event_intensity == 0.0, 1.0,
                                             event_intensity)))
        entire_intensity = jnp.sum(mark_intensity, axis=-1)
        non_event_ll = jnp.sum(entire_intensity * intervals * 0.5)
        num_events = jnp.sum(next_mark_onehot)
        return -(event_ll - non_event_ll) / num_events

    def __call__(self, queries, keys, key_mask, intervals, mark_onehot, *,
                 deterministic: bool, causality: Optional[bool] = None,
                 query_positions: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """key_mask: (B, Tk) — nonzero where the key position is valid
        (the reference receives it pre-tiled to (h*N, Tq, Tk); models build
        it from ``seqs_id != 0``).

        query_positions: optional (B, M) int positions — compute attention
        for ONLY those query rows (attention rows are independent, so
        out[:, i] equals the full computation's row query_positions[:, i]
        exactly). Queries/intervals stay FULL-length; the gather happens
        after the projections (gather-of-projection == projection-of-gather
        for a row-wise Dense). This is the masked-training / last-position-
        eval fast path: every per-query cost — above all the (rows, E*dh)
        intensity head — shrinks by M/Tq.
        """
        h = self.num_heads
        causality = self.causal_default if causality is None else causality
        gathered = query_positions is not None
        if self.fused_qkvt:
            # queries is keys for BiMAU/MGAU self-attention; project once.
            # The gathered path projects `keys` (full length) and gathers Q
            # rows afterwards — only valid for self-attention, so insist.
            if gathered and queries is not keys:
                raise ValueError(
                    "query_positions with fused_qkvt requires self-attention"
                    " (queries is keys); got distinct query/key arrays")
            qkvt = self.qkvt(keys if gathered else queries)
            qq, kk, vv, tt = jnp.split(qkvt, 4, axis=-1)
        else:
            qq, kk = self.q_proj(queries), self.k_proj(keys)
            vv, tt = self.v_proj(keys), self.t_proj(keys)
        if gathered:
            qpos_i = query_positions.astype(jnp.int32)
            qq = jnp.take_along_axis(qq, qpos_i[:, :, None], axis=1)
            q_res = jnp.take_along_axis(
                queries, qpos_i[:, :, None], axis=1)[:, :, :self.num_units]
            intervals = jnp.take_along_axis(intervals, qpos_i, axis=1)
        else:
            qpos_i = None
            q_res = queries[:, :, :self.num_units]

        from easydgl_tpu.core.mesh import seq_axis_info, spmd_mesh
        cp_mesh = spmd_mesh()
        seq_ax, _ = seq_axis_info(cp_mesh)
        if seq_ax is not None and qpos_i is None:
            # context parallelism: ring MAU over the sequence mesh axis
            # (dist/context.py). Gathered-query calls (Tq << Tk) keep the
            # non-CP path — their q rows are not sequence-aligned.
            from easydgl_tpu.dist.context import mau_ring_attention_spmd
            rate = 0.0 if deterministic else float(self.dropout_rate)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out4, mark_intensity = mau_ring_attention_spmd(
                split_heads(qq, h), split_heads(kk, h),
                split_heads(vv, h), split_heads(tt, h),
                key_mask, intervals, mark_onehot.astype(jnp.float32),
                self.intensity_kernel, self.intensity_bias,
                self.intensity_weight, self.intensity_scaling, seed,
                cp_mesh, seq_axis=seq_ax, causal=causality,
                diag_reset=self.diag_reset, dropout_rate=rate,
                data_axis=cp_mesh.axis_names[0])
            return merge_heads(out4) + q_res, mark_intensity

        if self.intensity_impl == "streamed" and qpos_i is None:
            # single-chip long context, Pallas engine: the same two-sweep
            # decomposition as "blocked" but with every (Tq, Tk) tile kept
            # in VMEM (kernels/mau_streamed.py) — the scan version's
            # per-block temporaries round-trip HBM and cap it at ~4% of
            # the MXU rate. Gathered-query calls fall through like the
            # blocked mode. interpret=True on CPU so the module is
            # host-testable (the HLO interpreter has no Mosaic).
            from easydgl_tpu.kernels.mau_streamed import mau_streamed
            rate = 0.0 if deterministic else float(self.dropout_rate)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out4, mark_intensity = mau_streamed(
                split_heads(qq, h), split_heads(kk, h),
                split_heads(vv, h), split_heads(tt, h),
                key_mask, intervals, mark_onehot.astype(jnp.float32),
                self.intensity_kernel, self.intensity_bias,
                self.intensity_weight, self.intensity_scaling, seed,
                causal=causality, diag_reset=self.diag_reset,
                dropout_rate=rate,
                interpret=jax.default_backend() == "cpu")
            return merge_heads(out4) + q_res, mark_intensity

        if self.intensity_impl == "blocked" and qpos_i is None:
            # single-chip long context: the two-sweep blocked schedule
            # (kernels/mau_blocked.py) — the decomposition the ring MAU
            # proves exact, as a lax.scan over key blocks. Gathered-query
            # calls (Tq << Tk) fall through to the dense path below: their
            # per-query memory is already O(M * Tk).
            from easydgl_tpu.kernels.mau_blocked import mau_blocked
            rate = 0.0 if deterministic else float(self.dropout_rate)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            out4, mark_intensity = mau_blocked(
                split_heads(qq, h), split_heads(kk, h),
                split_heads(vv, h), split_heads(tt, h),
                key_mask, intervals, mark_onehot.astype(jnp.float32),
                self.intensity_kernel, self.intensity_bias,
                self.intensity_weight, self.intensity_scaling, seed,
                causal=causality, diag_reset=self.diag_reset,
                dropout_rate=rate, block_k=self.blocked_block_k)
            return merge_heads(out4) + q_res, mark_intensity

        if self.intensity_impl == "fused":
            # one Pallas kernel for the whole chain (kernels/mau_attention):
            # QK^T -> mask -> softmax -> probs@T -> intensity head ->
            # modulate (+ diag reset) -> dropout -> @V, fwd + bwd.
            # The kernel consumes/produces the projections' NATURAL
            # (B, T, C) layout — no split_heads/merge_heads copies.
            from easydgl_tpu.kernels.mau_attention import mau_attention
            rate = 0.0 if deterministic else float(self.dropout_rate)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            from easydgl_tpu.core.mesh import spmd_mesh
            mesh = spmd_mesh()
            if mesh is not None:
                from easydgl_tpu.kernels.spmd import mau_attention_spmd
                out, mark_intensity = mau_attention_spmd(
                    qq, kk, vv, tt, key_mask, intervals,
                    mark_onehot.astype(jnp.float32),
                    self.intensity_kernel, self.intensity_bias,
                    self.intensity_weight, self.intensity_scaling, seed,
                    mesh, causality, self.diag_reset, rate, h,
                    qpos=qpos_i)
            else:
                out, mark_intensity = mau_attention(
                    qq, kk, vv, tt, key_mask, intervals,
                    mark_onehot.astype(jnp.float32),
                    self.intensity_kernel, self.intensity_bias,
                    self.intensity_weight, self.intensity_scaling, seed,
                    causality, self.diag_reset, rate, num_heads=h,
                    qpos=qpos_i)
            return out + q_res, mark_intensity

        q, k = split_heads(qq, h), split_heads(kk, h)
        v, t = split_heads(vv, h), split_heads(tt, h)
        d = q.shape[-1]

        logits = mxu_einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        logits = _mask_logits(logits, key_mask, causality, qpos=qpos_i)
        probs = jax.nn.softmax(logits, axis=-1)

        seq_units = mxu_einsum("bhqk,bhkd->bhqd", probs, t)
        intensity_qk, mark_intensity = self.intensity(
            seq_units, intervals, mark_onehot)

        if self.diag_reset:  # BiMAU (temporal.py:438-439)
            tq, tk = intensity_qk.shape[-2], intensity_qk.shape[-1]
            if qpos_i is None:
                is_diag = jnp.eye(tq, dtype=bool)[None, None]
            else:
                is_diag = (jnp.arange(tk)[None, None, None, :]
                           == qpos_i[:, None, :, None])
            intensity_qk = jnp.where(is_diag, 1.0, intensity_qk)

        modulated = intensity_qk * probs
        modulated = self.dropout(modulated, deterministic=deterministic)
        out = mxu_einsum("bhqk,bhkd->bhqd", modulated, v)
        out = merge_heads(out) + q_res
        return out, mark_intensity


def BiMAU(num_units, num_heads, num_events, dropout_rate=0.0, name=None,
          intensity_impl="xla", blocked_block_k=512):
    """Bidirectional MAU (reference temporal.py:396-452): fused QKVT
    projection, no causal mask, intensity diagonal reset to 1."""
    return MAU(num_units, num_heads, num_events, dropout_rate,
               fused_qkvt=True, causal_default=False, diag_reset=True,
               intensity_impl=intensity_impl,
               blocked_block_k=blocked_block_k, name=name)


def MGAU(num_units, num_heads, num_events, dropout_rate=0.0, name=None,
         intensity_impl="xla", blocked_block_k=512):
    """Gated variant (reference temporal.py:455-508); defined but unused by
    any reference model — provided for API completeness."""
    return MAU(num_units, num_heads, num_events, dropout_rate,
               fused_qkvt=True, causal_default=False, diag_reset=False,
               intensity_impl=intensity_impl,
               blocked_block_k=blocked_block_k, name=name)
