"""Fully-fused MAU/BiMAU self-modulating attention (Pallas TPU, fwd + bwd).

One kernel covers the whole hot chain of reference temporal.py:267-452 after
the Q/K/V/T projections (which stay in XLA — single large MXU matmuls):

    logits = QK^T / sqrt(dh) -> key/causal mask -> softmax            (:352-371)
    seq_units = probs @ T                                             (:375)
    x = [seq_units | interval]; z = x @ Wd; sig = sigmoid(z + bd)     (:281-299)
    raw[e] = sum_d sig[e*dh+d] * w[e,d]; lam = s*softplus(raw/s)      (:299-306)
    intensity_qk = lam @ onehot^T  (+ diagonal := 1 for BiMAU)        (:311-313, 438-439)
    modulated = dropout(intensity_qk * probs)                         (:379-380)
    out = modulated @ V                                               (:381)

Every intermediate — including the (rows, E*dh) sigmoid activation that
dominates HBM traffic in the XLA path (2.1 GB fp32 at the flagship config) —
lives only in VMEM. The custom_vjp backward recomputes the forward tile and
emits dq/dk/dv/dt per tile plus weight grads accumulated across the
sequential grid. Dropout uses the TPU PRNG with a per-program seed, so the
backward regenerates the identical mask without materializing it.

NATURAL (B, T, C) WIRE FORMAT — q/k/v/t arrive exactly as the projections
produce them (C = H*dh channels, head h in channel block [h*dh:(h+1)*dh],
matching the reference's concat-on-batch head split, sequential.py:39-41),
and out/dq/dk/dv/dt leave the same way. The head split, the MXU tile
packing, and their inverses are VMEM register shuffles inside the kernel
(lane rolls + concats), so XLA never materializes a transposed or
channel-padded copy in HBM — at the flagship shape that removes ~1.3 ms of
pure copy/pad traffic per step that the previous (B, H, T, dh) wire format
forced (4 head-split transposes re-done in the backward, f32 grad
relayouts, the E->128 cotangent pad). Only the sequence axis is padded by
the caller (31 -> 32, one cheap fused pad per tensor).

RECTANGULAR QUERIES — queries and keys may have different lengths. The
caller may gather the query rows down to just the prediction positions
(BERT-style masked training predicts ``masklen`` of ``L`` positions; eval
predicts only the last) and pass the original positions via ``qpos``:
attention rows are independent, so out[b, i, :] equals the full-length
result's row ``qpos[b, i]`` exactly, while every per-query cost — the
dominant (rows, E*dh) intensity passes above all — shrinks by Tq/Tk.
``qpos`` (float32 ints) drives BOTH the causal mask (col <= qpos) and the
BiMAU diagonal reset (col == qpos), so the square case (qpos = iota) is
bit-identical to the always-square kernel it replaced.

Grid: one program per BLOCK of batch rows (auto-sized: the largest of
8/4/2/1 rows whose working set fits VMEM). Two packing levels feed the MXU
full tiles:

* BATCH BLOCKING — each program processes all H heads of BB rows with the
  leading (rows, heads) dims merged, so the big intensity matmuls see
  BB*H*Tq-row operands and per-program overhead is amortized.
* TILE PACKING — p = 128/Tkp heads are packed per (p*Tkp)-row attention
  operand (in-VMEM sublane concat of lane-rolled head slices), turning the
  tiny per-head (Tqp, Tkp) QK^T/modulation/@V matmuls into near-full
  128-wide MXU tiles; cross-head tile entries are masked to PAD_NEG so
  their softmax probabilities are EXACTLY zero and every contraction over
  keys ignores them (forward and backward).

Dropout is seeded PER BATCH ROW (seed + absolute row index) with a mask
shape that depends only on (H, Tqp, Tkp), so the backward regenerates
identical masks even at a different batch block size.

``mau_attention_reference`` is the jnp parity implementation (same math,
materialized, in the conventional (B, H, T, dh) head layout) used by the
kernel parity tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2.0 ** 32) + 1.0
# Padded key columns get a strictly lower value than the mask constant so a
# fully-masked REAL row softmaxes to uniform over the real columns only
# (exactly what the XLA path produces), not over the padding.
PAD_NEG = -1.0e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _auto_bb(b: int, h: int, tqp: int, ed_p: int, live: int,
             budget: int) -> int:
    """Largest batch-rows-per-program of (8,4,2,1) dividing b whose ``live``
    simultaneous (h*tqp, ed_p) fp32 temporaries fit the VMEM ``budget``."""
    per_row = live * h * tqp * ed_p * 4
    bb = 1
    for cand in (2, 4, 8):
        if b % cand == 0 and cand * per_row <= budget:
            bb = cand
    return bb


def _sel_matrix(num_events: int, dh: int, ed_p: int, e_p: int):
    """(EDp, Ep) 0/1 selector: flattened column e*dh+d sums into event e."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ed_p, e_p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ed_p, e_p), 1)
    ok = (rows < num_events * dh) & (rows // dh == cols)
    return ok.astype(jnp.float32)


def _pack_structure(nq: int, nk: int, tqp: int, tkp: int, tk_real: int):
    """(nq, nk) bool: col c is a REAL key position for query row r under
    packing — same head block (p blocks share one tile) and within the
    real key length. Everything outside gets PAD_NEG (strictly below the
    key-mask constant NEG), so off-block probs are EXACTLY zero (exp
    underflow) and a fully-masked REAL row still softmaxes uniform over
    its own block's real columns — matching the XLA path."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    return (cols // tkp == rows // tqp) & (cols % tkp < tk_real)


def _causal_keep(qp, nq: int, nk: int, tqp: int, tkp: int):
    """(G, nq, nk) bool: key col within the causal horizon of the query's
    ORIGINAL position (col_pos <= qpos)."""
    colk = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) % tkp
    return colk.astype(jnp.float32)[None] <= qp[:, :, None]


def _diag_mask(qp, nq: int, nk: int, tqp: int, tkp: int):
    """(G, nq, nk) bool: key col IS the query's original position (and in
    the query's own packed block)."""
    colk = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    same = (colk // tkp == rowq // tqp)
    return same[None] & ((colk % tkp).astype(jnp.float32)[None]
                         == qp[:, :, None])


# ---------------------------------------------------------------------------
# In-VMEM head split / merge (the wire format is (B, T, C)).
# Mosaic rejects sublane concats of lane-slices at non-zero lane offsets
# ("result/input offset mismatch on non-concat dimension"), so each head
# block is first lane-ROLLED to offset 0; the rolls and concats are pure
# register shuffles, far cheaper than the HBM transpose copies they replace.
# ---------------------------------------------------------------------------


def _split_pack(blk, dh: int, hp: int, p: int):
    """(bb, tp, C=hp*p*dh) -> (g=bb*hp, p*tp, dh); g is b-major
    (g = b*hp + hg), packed row j*tp+t holds head hg*p+j.

    Lane rotates only exist for 32-bit data on the VPU, so sub-fp32 blocks
    take an fp32 detour (bit-exact for bf16->f32->bf16; the cast passes are
    tiny next to the block's matmuls)."""
    bb, tp, c = blk.shape
    dt = blk.dtype
    if dt.itemsize < 4:
        blk = blk.astype(jnp.float32)
    pieces = []
    for hg in range(hp):
        parts = []
        for j in range(p):
            h = hg * p + j
            rolled = pltpu.roll(blk, (c - h * dh) % c, 2) if h else blk
            parts.append(rolled[:, :, :dh])
        pieces.append(jnp.concatenate(parts, axis=1))      # (bb, p*tp, dh)
    x = jnp.concatenate([pc[:, None] for pc in pieces], axis=1)
    return x.reshape(bb * hp, p * tp, dh).astype(dt)


def _merge_pack(x, bb: int, hp: int, p: int, tp: int, dh: int):
    """Inverse of ``_split_pack``: (g, p*tp, dh) -> (bb, tp, hp*p*dh)."""
    x4 = x.reshape(bb, hp, p * tp, dh)
    parts = []
    for hg in range(hp):
        for j in range(p):
            parts.append(x4[:, hg, j * tp:(j + 1) * tp, :])
    return jnp.concatenate(parts, axis=2)                  # (bb, tp, C)


def _pack_rows(x4, hp: int, p: int, tp: Optional[int] = None,
               pad_to: Optional[int] = None):
    """(bb, H, t_real, e) -> (g, p*tp, e[,pad]): sublane-concat of per-head
    slices (no lane shuffles — the last dim is shared), zero row-padding
    each head block to ``tp`` in VMEM, optionally zero-padded on the lane
    dim to ``pad_to``."""
    bb, h, t_real, e = x4.shape
    tp = t_real if tp is None else tp
    rpad = (jnp.zeros((bb, tp - t_real, e), x4.dtype)
            if tp > t_real else None)
    pieces = []
    for hg in range(hp):
        parts = []
        for j in range(p):
            part = x4[:, hg * p + j]
            if rpad is not None:
                part = jnp.concatenate([part, rpad], axis=1)
            parts.append(part)
        pieces.append(jnp.concatenate(parts, axis=1))      # (bb, p*tp, e)
    x = jnp.concatenate([pc[:, None] for pc in pieces], axis=1)
    x = x.reshape(bb * hp, p * tp, e)
    if pad_to is not None and pad_to > e:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:2] + (pad_to - e,), x.dtype)], axis=2)
    return x


def _probs_block(q, k, key_mask, qp, *, scale, causal, tk_real, tqp, tkp):
    """(Gp, nq, nk) masked softmax probabilities."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    nq, nk = s.shape[-2], s.shape[-1]
    s = jnp.where(key_mask[:, None, :] != 0, s, NEG)
    if causal:
        s = jnp.where(_causal_keep(qp, nq, nk, tqp, tkp), s, NEG)
    s = jnp.where(_pack_structure(nq, nk, tqp, tkp, tk_real)[None], s,
                  PAD_NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _assemble_x(su, iv, cp: int, dh: int):
    """x = [seq_units | interval | 0-pad] as an in-VMEM lane concat:
    su (G, Tq, dh) fp32, iv (G, Tq) -> (G, Tq, cp) with iv at channel dh
    (reference temporal.py:281: x = concat([seq_units, interval], -1))."""
    g, tq, _ = su.shape
    pad = cp - dh
    col = jax.lax.broadcasted_iota(jnp.int32, (g, tq, pad), 2)
    ivc = jnp.where(col == 0, iv[:, :, None], 0.0)
    return jnp.concatenate([su, ivc], axis=2)


def _intensity_block(probs, t, iv, wd, bd, wf, sel_w, scaling, *, dh, cp):
    """seq_units -> sigmoid head -> scaled softplus intensities.

    ``sel_w`` is the wf-FOLDED selector (``_sel_matrix() * wf[:, None]``):
    raw = (sig*wf) @ sel == sig @ (wf*sel), and folding removes a full
    (rows, EDp) VPU multiply pass from the forward AND the backward's
    recompute — the elementwise passes over the (rows, EDp) activation,
    not the matmuls, dominate this block's time on the VPU.

    Returns (lam (G,Tq,Ep), raw (G,Tq,Ep), sig (G*Tq,EDp) in the compute
    dtype, x (G,Tq,cp)). Matmuls run in the weight/input dtype (bf16 in
    mixed-precision mode, the MXU fast path) with fp32 accumulation; the
    sigmoid is EVALUATED in fp32 and stored once in the compute dtype
    (exactly the rounding the old (sig*wf).astype(cdt) applied).
    """
    cdt = t.dtype
    seq_units = jax.lax.dot_general(
        probs.astype(cdt), t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, Tq, dh)
    x = _assemble_x(seq_units, iv, cp, dh)               # (G, Tq, cp)
    hh, tq, _ = x.shape
    # collapse (G, Tq) -> rows: ONE large MXU matmul instead of G batched
    # small ones (Tq is sublane-aligned so the reshape is layout-free)
    x2 = x.reshape(hh * tq, cp)
    # the (rows, EDp) intermediates are the kernel's VMEM-bandwidth hot
    # spot (2.1GB-equivalent per fp32 pass at the flagship shape). Mosaic
    # requires 32-bit matmul ACCUMULATORS, so z stays fp32 out of the MXU;
    # the sigmoid is evaluated in fp32 and stored ONCE in the compute
    # dtype (the same rounding the pre-fold (sig*wf).astype(cdt) applied),
    # keeping every later pass over (rows, EDp) in bf16 in mixed mode.
    z = jax.lax.dot(x2.astype(cdt), wd,
                    preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(z + bd[None, :]).astype(cdt)    # (G*Tq, EDp) cdt
    raw2 = jax.lax.dot(sig, sel_w.astype(cdt),
                       preferred_element_type=jnp.float32)
    raw = raw2.reshape(hh, tq, raw2.shape[-1])
    s = jnp.exp(scaling)[None, None, :]                  # (1, 1, Ep)
    lam = s * jax.nn.softplus(raw / s)
    return lam, raw, sig, x


def _modulation(lam, onehot, probs, qp, *, diag_reset, tqp, tkp):
    """intensity_qk (+ diag reset at col == qpos) * probs. onehot:
    (G, Tk, Ep) or broadcastable to lam's leading dim."""
    hh, nq, nk = probs.shape
    intensity_qk = jax.lax.dot_general(
        lam, jnp.broadcast_to(onehot, lam.shape[:1] + onehot.shape[1:]),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, Tq, Tk)
    if diag_reset:
        intensity_qk = jnp.where(_diag_mask(qp, nq, nk, tqp, tkp), 1.0,
                                 intensity_qk)
    return intensity_qk, intensity_qk * probs


def _drop_mask(shape, rate: float):
    """Scaled keep-mask from the (already seeded) TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)
    keep_prob = 1.0 - rate
    # clamp: at rate==0 the uint32 threshold would wrap to 0 and drop
    # everything (call sites guard rate > 0, but keep the trap closed)
    thresh = jnp.uint32(min(int(keep_prob * (2.0 ** 32)), 2 ** 32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) < thresh
    return jnp.where(keep, 1.0 / keep_prob, 0.0)


def _pack_factor(h: int, tqp: int, tkp: int) -> int:
    """Head blocks packed per MXU tile: the largest divisor of H with
    p*Tkp <= 128 (and p*Tqp <= 128 so query rows stay one tile tall).
    Packing p consecutive heads of one batch row into one (p*Tkp)-row
    operand turns the tiny per-head (Tqp, Tkp) attention matmuls into
    near-full MXU tiles; off-diagonal (cross-head) blocks are masked to
    PAD_NEG so their softmax probs are EXACTLY zero and every downstream
    contraction over keys ignores them. p depends only on (H, Tqp, Tkp) —
    never on the batch block size — so dropout masks regenerate
    identically in forward and backward."""
    p = 1
    for cand in (2, 4, 8):
        if h % cand == 0 and cand * tkp <= 128 and cand * tqp <= 128:
            p = cand
    return p


def _merge_aux(km_ref, iv_ref, qp_ref, oh_ref, bb, hp, nq, nk):
    """Broadcast the per-batch-row tensors across head groups and merge
    the (BB, H/p) leading dims into Gp = BB*H/p (b-major, matching
    ``_split_pack``)."""
    g = bb * hp
    km = jnp.broadcast_to(km_ref[...], (bb, hp, nk)).reshape(g, nk)
    iv = jnp.broadcast_to(iv_ref[...], (bb, hp, nq)).reshape(g, nq)
    qp = jnp.broadcast_to(qp_ref[...], (bb, hp, nq)).reshape(g, nq)
    e_p = oh_ref.shape[-1]
    oh = jnp.broadcast_to(oh_ref[...][:, None],
                          (bb, hp, nk, e_p)).reshape(g, nk, e_p)
    return km, iv, qp, oh


def _block_drop_mask(seed0, bb: int, shape_per_row, rate: float):
    """Per-BATCH-ROW seeded keep-masks, concatenated along the merged G dim.
    Seeding by absolute row index makes the mask independent of the block
    size, so forward and backward may use different BB. ``shape_per_row``
    is the PACKED (H/p, p*Tqp, p*Tkp) shape — a function of (H, Tqp, Tkp)
    only."""
    base = seed0 + pl.program_id(0) * bb
    rows = []
    for j in range(bb):
        pltpu.prng_seed(base + j)
        rows.append(_drop_mask(shape_per_row, rate))
    return jnp.concatenate(rows, axis=0) if bb > 1 else rows[0]


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, t_ref, km_ref, iv_ref,
                qp_ref, oh_ref, wd_ref, bd_ref, wf_ref, sc_ref,
                out_ref, lam_ref, probs_ref, raw_ref, *,
                scale, causal, diag_reset, dropout_rate, tk_real, tqp, tkp,
                dh, hp, p, num_events, cp, ed_p, e_p):
    bb = q_ref.shape[0]
    nq, nk = p * tqp, p * tkp
    q = _split_pack(q_ref[...], dh, hp, p)
    k = _split_pack(k_ref[...], dh, hp, p)
    v = _split_pack(v_ref[...], dh, hp, p)
    t = _split_pack(t_ref[...], dh, hp, p)
    km, iv, qp, oh = _merge_aux(km_ref, iv_ref, qp_ref, oh_ref,
                                bb, hp, nq, nk)
    probs = _probs_block(q, k, km, qp, scale=scale, causal=causal,
                         tk_real=tk_real, tqp=tqp, tkp=tkp)
    wf = wf_ref[:]
    sel_w = _sel_matrix(num_events, dh, ed_p, e_p) * wf[:, None]
    lam, raw, _, _ = _intensity_block(probs, t, iv, wd_ref[:],
                                      bd_ref[:], wf, sel_w, sc_ref[:],
                                      dh=dh, cp=cp)
    _, modulated = _modulation(lam, oh, probs, qp, diag_reset=diag_reset,
                               tqp=tqp, tkp=tkp)
    if dropout_rate > 0.0:
        modulated = modulated * _block_drop_mask(
            seed_ref[0], bb, (hp, nq, nk), dropout_rate)
    out = jax.lax.dot_general(
        modulated.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, nq, dh)
    out_ref[...] = _merge_pack(out, bb, hp, p, tqp, dh
                               ).astype(out_ref.dtype)
    lam_ref[...] = lam.reshape(bb, hp, nq, e_p)
    # residuals for the backward (~134 MB at the flagship shape, a ~0.3 ms
    # HBM round-trip that lets the backward skip the QK^T/softmax recompute
    # AND the 137-GFLOP selector matmul — only z/sigmoid are recomputed)
    probs_ref[...] = probs.reshape(bb, hp, nq, nk)
    raw_ref[...] = raw.reshape(bb, hp, nq, e_p)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, t_ref, km_ref, iv_ref,
                qp_ref, oh_ref, wd_ref, bd_ref, wf_ref, sc_ref,
                probs_ref, raw_ref, go_ref,
                gl_ref, dq_ref, dk_ref, dv_ref, dt_ref, dwd_ref, dbd_ref,
                dwf_ref, dsc_ref, dwd_acc, dbd_acc, dwf_acc, dsc_acc, *,
                scale, causal, diag_reset, dropout_rate, tk_real, tqp, tkp,
                dh, hp, p, num_events, cp, ed_p, e_p, num_b):
    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _init():
        dwd_acc[:] = jnp.zeros_like(dwd_acc)
        dbd_acc[:] = jnp.zeros_like(dbd_acc)
        dwf_acc[:] = jnp.zeros_like(dwf_acc)
        dsc_acc[:] = jnp.zeros_like(dsc_acc)

    bb = q_ref.shape[0]
    nq, nk = p * tqp, p * tkp
    q = _split_pack(q_ref[...], dh, hp, p)
    k = _split_pack(k_ref[...], dh, hp, p)
    v = _split_pack(v_ref[...], dh, hp, p)
    t = _split_pack(t_ref[...], dh, hp, p)
    km, iv, qp, onehot = _merge_aux(km_ref, iv_ref, qp_ref, oh_ref,
                                    bb, hp, nq, nk)
    wd, bd, wf, sc = wd_ref[:], bd_ref[:], wf_ref[:], sc_ref[:]
    # ---- forward tile from stored residuals (probs/raw saved by the
    # forward, so the expensive QK^T/softmax pass and the 137-GFLOP
    # selector matmul are NOT recomputed); only z/sigmoid — too large to
    # stash (1 GB+ at the flagship shape) — are recomputed below.
    probs = probs_ref[...].reshape(bb * hp, nq, nk)
    raw = raw_ref[...].reshape(bb * hp, nq, e_p)
    sel = _sel_matrix(num_events, dh, ed_p, e_p)
    cdt0 = t.dtype
    seq_units = jax.lax.dot_general(
        probs.astype(cdt0), t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, Tq, dh)
    x = _assemble_x(seq_units, iv, cp, dh)               # (G, Tq, cp)
    x2r = x.reshape(bb * hp * nq, cp)
    z = jax.lax.dot(x2r.astype(cdt0), wd,
                    preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(z + bd[None, :]).astype(cdt0)   # (G*Tq, EDp)
    s_sc = jnp.exp(sc)[None, None, :]
    lam = s_sc * jax.nn.softplus(raw / s_sc)
    intensity_qk, _ = _modulation(lam, onehot, probs, qp,
                                  diag_reset=diag_reset, tqp=tqp, tkp=tkp)

    go = _split_pack(go_ref[...], dh, hp, p
                     ).astype(jnp.float32)               # (Gp, nq, dh)
    # ---- out = (modulated * drop) @ v
    if dropout_rate > 0.0:
        drop = _block_drop_mask(seed_ref[0], bb, (hp, nq, nk), dropout_rate)
    else:
        drop = None
    modulated = intensity_qk * probs
    dropped = modulated * drop if drop is not None else modulated
    cdt = v.dtype
    dv = jax.lax.dot_general(
        dropped.astype(cdt), go.astype(cdt), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, nk, dh)
    dv_ref[...] = _merge_pack(dv, bb, hp, p, tkp, dh).astype(dv_ref.dtype)
    dmod = jax.lax.dot_general(
        go.astype(cdt), v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, Tq, Tk)
    if drop is not None:
        dmod = dmod * drop
    dint = dmod * probs                                  # d/d intensity_qk
    dprobs = dmod * intensity_qk
    # ---- intensity_qk = lam @ onehot^T (diag entries overwritten -> no
    # grad). Under packing the reset entries are exactly col == qpos within
    # the query's own block.
    if diag_reset:
        dint = jnp.where(_diag_mask(qp, nq, nk, tqp, tkp), 0.0, dint)
    dlam = jax.lax.dot_general(
        dint, jnp.broadcast_to(onehot, dint.shape[:1] + onehot.shape[1:]),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, Tq, Ep)
    # TPP-side cotangent: (bb, H, tqp, E) natural -> packed (G, nq, Ep)
    dlam = dlam + _pack_rows(gl_ref[...], hp, p, tp=tqp,
                             pad_to=e_p)
    # ---- lam = s * softplus(raw / s), s = exp(scaling)
    s = jnp.exp(sc)[None, None, :]
    sig_r = jax.nn.sigmoid(raw / s)
    draw = dlam * sig_r
    # d lam / d scaling = (softplus(raw/s) - sig(raw/s)*raw/s) * s
    dsc_acc[:, :] += jnp.sum(
        dlam * (jax.nn.softplus(raw / s) - sig_r * raw / s) * s,
        axis=(0, 1))[None, :]
    # ---- raw = (sig * wf) @ sel. As in the forward, every (rows, EDp)
    # intermediate stays in the compute dtype (bf16 in mixed precision) to
    # halve the VMEM-bandwidth passes; weight-grad ACCUMULATION is fp32.
    hh, tq_n, e_pp = draw.shape
    draw2 = draw.reshape(hh * tq_n, e_pp)
    dsw = jax.lax.dot_general(
        draw2.astype(cdt), sel.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)  # (G*Tq, EDp)
    dwf_acc[:, :] += jnp.sum((dsw * sig).astype(jnp.float32),
                             axis=0)[None, :]
    dsig = dsw * wf.astype(cdt)[None, :]
    dz = dsig * sig * (1.0 - sig)                        # (G*Tq, EDp) cdt
    # ---- z = x @ wd + bd (rows collapsed: one MXU matmul per program)
    dx2 = jax.lax.dot_general(
        dz.astype(cdt), wd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (G*Tq, cp)
    dx = dx2.reshape(hh, tq_n, dx2.shape[-1])
    x2 = x.reshape(hh * tq_n, x.shape[-1])
    dwd_acc[:, :] += jax.lax.dot_general(
        x2.astype(cdt), dz.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbd_acc[:, :] += jnp.sum(dz.astype(jnp.float32), axis=0)[None, :]
    # ---- x = [seq_units | interval]: the interval column is a non-diff
    # input, so d seq_units is just the first dh channels of dx
    dseq = dx[:, :, :dh]
    # ---- seq_units = probs @ t
    dprobs = dprobs + jax.lax.dot_general(
        dseq.astype(cdt), t, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dt = jax.lax.dot_general(
        probs.astype(cdt), dseq.astype(cdt), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, nk, dh)
    dt_ref[...] = _merge_pack(dt, bb, hp, p, tkp, dh).astype(dt_ref.dtype)
    # ---- softmax backward. Masked entries usually have probs == 0, but a
    # FULLY-masked row softmaxes to uniform (probs != 0); the forward's
    # where(mask, s, NEG) blocks gradient flow there, so zero dlogit on
    # every masked entry explicitly (off-block packed entries have
    # probs == 0 exactly, so they contribute nothing either way).
    dlogit = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                       keepdims=True))
    valid = ((km[:, None, :] != 0)
             & _pack_structure(nq, nk, tqp, tkp, tk_real)[None])
    if causal:
        valid = valid & _causal_keep(qp, nq, nk, tqp, tkp)
    dlogit = jnp.where(valid, dlogit, 0.0)
    dlogit = dlogit * scale
    dq = jax.lax.dot_general(
        dlogit.astype(cdt), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, nq, dh)
    dq_ref[...] = _merge_pack(dq, bb, hp, p, tqp, dh).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        dlogit.astype(cdt), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, nk, dh)
    dk_ref[...] = _merge_pack(dk, bb, hp, p, tkp, dh).astype(dk_ref.dtype)

    @pl.when(bi == num_b - 1)
    def _store():
        dwd_ref[:] = dwd_acc[:]
        dbd_ref[:] = dbd_acc[:]
        dwf_ref[:] = dwf_acc[:]
        dsc_ref[:] = dsc_acc[:]


def _prep(q, k, v, t, key_mask, intervals, qpos, onehot, *, h, tqp, tkp,
          e_p, p):
    """Sequence-axis pads only (the head split/pack is in-VMEM now).
    The per-batch-row tensors (key mask, intervals, query positions,
    one-hots) are tiled p times along the sequence axis so every packed
    block sees its row's values. Padded QUERY rows get qpos = -1 so they
    match no causal horizon and no diagonal (their outputs are discarded
    at unpad; their cotangents are zero-padded)."""
    b, tq_real, _ = q.shape
    tk_real = k.shape[1]
    e = onehot.shape[-1]

    def padt(xx, tp):
        return jnp.pad(xx, ((0, 0), (0, tp - xx.shape[1]), (0, 0)))

    qp_ = padt(q, tqp)
    kp_, vp_, tp_ = padt(k, tkp), padt(v, tkp), padt(t, tkp)
    # (B, 1, n): TPU block shapes need the last two dims to equal the
    # array dims (or be (8,128)-divisible); 2D (1, n) blocks are rejected
    km = jnp.pad(key_mask.astype(jnp.float32),
                 ((0, 0), (0, tkp - tk_real)))
    iv = jnp.pad(intervals.astype(jnp.float32),
                 ((0, 0), (0, tqp - tq_real)))
    qpos_f = jnp.pad(qpos.astype(jnp.float32),
                     ((0, 0), (0, tqp - tq_real)), constant_values=-1.0)
    km = jnp.tile(km, (1, p))[:, None, :]
    iv = jnp.tile(iv, (1, p))[:, None, :]
    qpos_f = jnp.tile(qpos_f, (1, p))[:, None, :]
    oh = jnp.pad(onehot.astype(jnp.float32),
                 ((0, 0), (0, tkp - tk_real), (0, e_p - e)))
    oh = jnp.tile(oh, (1, p, 1))
    return qp_, kp_, vp_, tp_, km, iv, qpos_f, oh


def _pad_weights(wd, bd, w, scaling, cp, ed_p, e_p, cdt):
    e, dh = w.shape
    wdp = jnp.pad(wd.astype(cdt),
                  ((0, cp - wd.shape[0]), (0, ed_p - wd.shape[1])))
    bdp = jnp.pad(bd.astype(jnp.float32), (0, ed_p - bd.shape[0]))
    wfp = jnp.pad(w.reshape(e * dh).astype(jnp.float32),
                  (0, ed_p - e * dh))
    scp = jnp.pad(scaling.astype(jnp.float32), (0, e_p - e))
    return wdp, bdp, wfp, scp


def _specs(bb, c, tqp, tkp, nq, nk, cp, e_p, ed_p):
    """in_specs shared by fwd and bwd (minus the grad inputs); q/k/v/t are
    (B, Tp, C) natural-layout blocks."""
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),             # seed (1,)
        pl.BlockSpec((bb, tqp, c), lambda i: (i, 0, 0)),   # q
        pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),   # k
        pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),   # v
        pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),   # t
        pl.BlockSpec((bb, 1, nk), lambda i: (i, 0, 0)),    # key_mask
        pl.BlockSpec((bb, 1, nq), lambda i: (i, 0, 0)),    # intervals
        pl.BlockSpec((bb, 1, nq), lambda i: (i, 0, 0)),    # qpos
        pl.BlockSpec((bb, nk, e_p), lambda i: (i, 0, 0)),  # onehot
        pl.BlockSpec((cp, ed_p), lambda i: (0, 0)),        # wd
        pl.BlockSpec((ed_p,), lambda i: (0,)),             # bd
        pl.BlockSpec((ed_p,), lambda i: (0,)),             # wf
        pl.BlockSpec((e_p,), lambda i: (0,)),              # scaling
    ]


# VMEM budgets for the auto block-size chooser: the forward holds ~3
# (G*Tq, EDp) fp32 temporaries live (z, sig, sig*wf), the recompute
# backward ~6 (those plus dsw, dz, dx products). v5e VMEM is 128MB;
# leave headroom for weights, accumulators and double-buffered blocks.
_FWD_LIVE, _FWD_BUDGET = 3, 56 * 1024 * 1024
# the residual-stashed backward recomputes only z/sig; its live (rows, EDp)
# set is z, sig, dsw, dz (+ one product in flight)
_BWD_LIVE, _BWD_BUDGET = 5, 88 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _mau_attention(q, k, v, t, key_mask, intervals, onehot, qpos,
                   wd, bd, w, scaling, dropout_seed,
                   num_heads, causal, diag_reset, dropout_rate, interpret):
    out, _ = _mau_fwd(q, k, v, t, key_mask, intervals, onehot, qpos, wd, bd,
                      w, scaling, dropout_seed, num_heads, causal,
                      diag_reset, dropout_rate, interpret)
    return out


def mau_attention(q, k, v, t, key_mask, intervals, onehot,
                  wd, bd, w, scaling, dropout_seed,
                  causal: bool = False, diag_reset: bool = False,
                  dropout_rate: float = 0.0,
                  interpret: bool = False, *, num_heads: int,
                  qpos: Optional[jnp.ndarray] = None):
    """Fused self-modulating attention (natural-layout wire format).

    q: (B, Tq, C); k/v/t: (B, Tk, C) with C = num_heads*dh and head h in
    channel block [h*dh:(h+1)*dh] (the reference's concat-on-batch split,
    sequential.py:39-41); key_mask: (B, Tk); intervals: (B, Tq);
    onehot: (B, Tk, E); qpos: (B, Tq) original query positions (defaults
    to iota — the square self-attention case; pass the gathered prediction
    positions when Tq < Tk); wd: (dh+1, E*dh); bd: (E*dh,); w: (E, dh);
    scaling: (E,); dropout_seed: int32 scalar (traced — varies per step
    without recompile).
    Returns (out (B, Tq, C) in q.dtype, mark_intensity (B, H, Tq, E) fp32).
    """
    b, tq, _ = q.shape
    if qpos is None:
        qpos = jnp.broadcast_to(
            jnp.arange(tq, dtype=jnp.float32)[None], (b, tq))
    return _mau_attention(q, k, v, t, key_mask, intervals, onehot,
                          qpos.astype(jnp.float32), wd, bd, w, scaling,
                          dropout_seed, num_heads, causal, diag_reset,
                          dropout_rate, interpret)


def _geom(tq_real, tk_real, e, dh, num_heads):
    """The single source of padded-geometry truth — the forward's packing
    and the backward's residual unpacking / dropout-mask regeneration MUST
    agree bit-for-bit, so both derive from here."""
    tqp = max(_round_up(tq_real, 8), 8)
    tkp = max(_round_up(tk_real, 8), 8)
    # contraction dims only need sublane (8) alignment; padding to 128
    # would nearly double the dominant z-matmul FLOPs at dh=64
    cp = _round_up(dh + 1, 8)
    e_p = _round_up(e, 128)
    ed_p = _round_up(e * dh, 128)
    p = _pack_factor(num_heads, tqp, tkp)
    return tqp, tkp, cp, e_p, ed_p, p, num_heads // p


def _dims(q, k, w, num_heads):
    b, tq_real, c = q.shape
    tk_real = k.shape[1]
    e, dh = w.shape
    assert c == num_heads * dh, (c, num_heads, dh)
    tqp, tkp, cp, e_p, ed_p, p, hp = _geom(tq_real, tk_real, e, dh,
                                           num_heads)
    return (b, tq_real, tk_real, c, e, dh, tqp, tkp, cp, e_p, ed_p, p, hp)


def _mau_fwd(q, k, v, t, key_mask, intervals, onehot, qpos, wd, bd, w,
             scaling, dropout_seed, num_heads, causal, diag_reset,
             dropout_rate, interpret):
    (b, tq_real, tk_real, c, e, dh, tqp, tkp, cp, e_p, ed_p, p, hp) = \
        _dims(q, k, w, num_heads)
    nq, nk = p * tqp, p * tkp
    qp_, kp_, vp_, tpj, km, iv, qpf, oh = _prep(
        q, k, v, t, key_mask, intervals, qpos, onehot,
        h=num_heads, tqp=tqp, tkp=tkp, e_p=e_p, p=p)
    wdp, bdp, wfp, scp = _pad_weights(wd, bd, w, scaling, cp, ed_p,
                                      e_p, q.dtype)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    bb = _auto_bb(b, num_heads, tqp, ed_p, _FWD_LIVE, _FWD_BUDGET)

    kernel = functools.partial(
        _fwd_kernel, scale=1.0 / dh ** 0.5, causal=causal,
        diag_reset=diag_reset, dropout_rate=dropout_rate,
        tk_real=tk_real, tqp=tqp, tkp=tkp, dh=dh, hp=hp, p=p,
        num_events=e, cp=cp, ed_p=ed_p, e_p=e_p)

    out, lam, probs, raw = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=_specs(bb, c, tqp, tkp, nq, nk, cp, e_p, ed_p),
        out_specs=[
            pl.BlockSpec((bb, tqp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, hp, nq, e_p), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, hp, nq, nk), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, hp, nq, e_p), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tqp, c), q.dtype),
            jax.ShapeDtypeStruct((b, hp, nq, e_p), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, nq, nk), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, nq, e_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, qp_, kp_, vp_, tpj, km, iv, qpf, oh, wdp, bdp, wfp, scp)
    # residuals: the PADDED natural-layout operands (so the backward pads
    # nothing and XLA re-materializes no transposes), plus probs/raw
    res = (qp_, kp_, vp_, tpj, km, iv, qpf, oh, wdp, bdp, wfp, scp,
           key_mask, intervals, onehot, qpos, wd, bd, w, scaling,
           dropout_seed, probs, raw)
    # unpack lam (B, hp, nq, e_p) -> (B, H, Tq, E): head hg*p+j sits at
    # packed rows [j*tqp:(j+1)*tqp] of group hg, so a pure reshape suffices
    lam = lam.reshape(b, hp * p, tqp, e_p)
    return (out[:, :tq_real, :], lam[:, :, :tq_real, :e]), res


def _mau_bwd(num_heads, causal, diag_reset, dropout_rate, interpret, res,
             grads):
    (qp_, kp_, vp_, tpj, km, iv, qpf, oh, wdp, bdp, wfp, scp,
     key_mask, intervals, onehot, qpos, wd, bd, w, scaling,
     dropout_seed, probs_res, raw_res) = res
    go, gl = grads
    b, _, c = qp_.shape
    tq_real = go.shape[1]
    tk_real = key_mask.shape[1]
    e, dh = w.shape
    tqp, tkp, cp, e_p, ed_p, p, hp = _geom(tq_real, tk_real, e, dh,
                                           num_heads)
    assert (tqp, tkp) == (qp_.shape[1], kp_.shape[1])  # fwd/bwd geometry
    nq, nk = p * tqp, p * tkp
    gop = jnp.pad(go.astype(qp_.dtype),
                  ((0, 0), (0, tqp - tq_real), (0, 0)))
    # TPP cotangent stays natural UNPADDED (B, H, Tq, E); the kernel
    # row-pads it in VMEM during packing
    glp = gl.astype(jnp.float32)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    bb = _auto_bb(b, num_heads, tqp, ed_p, _BWD_LIVE, _BWD_BUDGET)

    kernel = functools.partial(
        _bwd_kernel, scale=1.0 / dh ** 0.5, causal=causal,
        diag_reset=diag_reset, dropout_rate=dropout_rate,
        tk_real=tk_real, tqp=tqp, tkp=tkp, dh=dh, hp=hp, p=p,
        num_events=e, cp=cp, ed_p=ed_p, e_p=e_p, num_b=b // bb)

    in_specs = _specs(bb, c, tqp, tkp, nq, nk, cp, e_p, ed_p) + [
        pl.BlockSpec((bb, hp, nq, nk), lambda i: (i, 0, 0, 0)),   # probs
        pl.BlockSpec((bb, hp, nq, e_p), lambda i: (i, 0, 0, 0)),  # raw
        pl.BlockSpec((bb, tqp, c), lambda i: (i, 0, 0)),          # go
        pl.BlockSpec((bb, num_heads, tq_real, e),
                     lambda i: (i, 0, 0, 0)),                     # gl
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, tqp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, tkp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((cp, ed_p), lambda i: (0, 0)),
            pl.BlockSpec((1, ed_p), lambda i: (0, 0)),
            pl.BlockSpec((1, ed_p), lambda i: (0, 0)),
            pl.BlockSpec((1, e_p), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tqp, c), qp_.dtype),
            jax.ShapeDtypeStruct((b, tkp, c), qp_.dtype),
            jax.ShapeDtypeStruct((b, tkp, c), qp_.dtype),
            jax.ShapeDtypeStruct((b, tkp, c), qp_.dtype),
            jax.ShapeDtypeStruct((cp, ed_p), jnp.float32),
            jax.ShapeDtypeStruct((1, ed_p), jnp.float32),
            jax.ShapeDtypeStruct((1, ed_p), jnp.float32),
            jax.ShapeDtypeStruct((1, e_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cp, ed_p), jnp.float32),
                        pltpu.VMEM((1, ed_p), jnp.float32),
                        pltpu.VMEM((1, ed_p), jnp.float32),
                        pltpu.VMEM((1, e_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the recompute backward holds z/sig/dsw/dz tiles + weight
            # accumulators live at once; the 16MB scoped default is a
            # compiler cap, not the physical VMEM
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, qp_, kp_, vp_, tpj, km, iv, qpf, oh, wdp, bdp, wfp, scp,
      probs_res, raw_res, gop, glp)
    dq, dk, dv, dt, dwd, dbd, dwf, dsc = outs

    dwd_out = dwd[:dh + 1, :e * dh].astype(wd.dtype)
    dbd_out = dbd[0, :e * dh].astype(bd.dtype)
    dw_out = dwf[0, :e * dh].reshape(e, dh).astype(w.dtype)
    dsc_out = dsc[0, :e].astype(scaling.dtype)
    return (dq[:, :tq_real], dk[:, :tk_real], dv[:, :tk_real],
            dt[:, :tk_real],
            jnp.zeros_like(key_mask), jnp.zeros_like(intervals),
            jnp.zeros_like(onehot), jnp.zeros_like(qpos), dwd_out, dbd_out,
            dw_out, dsc_out,
            jnp.zeros_like(jnp.asarray(dropout_seed)))


_mau_attention.defvjp(_mau_fwd, _mau_bwd)


def mau_attention_reference(q, k, v, t, key_mask, intervals, onehot,
                            wd, bd, w, scaling, *, causal=False,
                            diag_reset=False, dropout_rate=0.0, qpos=None):
    """Pure-jnp parity implementation in the conventional (B, H, T, dh)
    head layout (no dropout support — parity tests run at rate 0; the
    kernel's TPU-PRNG dropout is validated statistically)."""
    assert dropout_rate == 0.0
    b, h, tq_real, dh = q.shape
    tk_real = k.shape[2]
    e = w.shape[0]
    if qpos is None:
        qpos = jnp.broadcast_to(jnp.arange(tq_real)[None], (b, tq_real))
    qpos = qpos.astype(jnp.int32)
    kpos = jnp.arange(tk_real, dtype=jnp.int32)
    scale = 1.0 / dh ** 0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(key_mask[:, None, None, :] != 0, s, NEG)
    if causal:
        keep = kpos[None, None, None, :] <= qpos[:, None, :, None]
        s = jnp.where(keep, s, NEG)
    probs = jax.nn.softmax(s, axis=-1)
    seq_units = jnp.einsum("bhqk,bhkd->bhqd", probs, t,
                           preferred_element_type=jnp.float32)
    x = jnp.concatenate(
        [seq_units, jnp.broadcast_to(intervals[:, None, :, None],
                                     (b, h, tq_real, 1))], axis=-1)
    z = jnp.einsum("bhqc,cd->bhqd", x, wd,
                   preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(z + bd)
    raw = jnp.einsum("bhqed,ed->bhqe", sig.reshape(b, h, tq_real, e, dh), w,
                     preferred_element_type=jnp.float32)
    sc = jnp.exp(scaling)
    lam = sc * jax.nn.softplus(raw / sc)
    intensity_qk = jnp.einsum("bhqe,bke->bhqk", lam,
                              onehot.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
    if diag_reset:
        is_diag = kpos[None, None, None, :] == qpos[:, None, :, None]
        intensity_qk = jnp.where(is_diag, 1.0, intensity_qk)
    out = jnp.einsum("bhqk,bhkd->bhqd", intensity_qk * probs, v,
                     preferred_element_type=jnp.float32)
    return out, lam
