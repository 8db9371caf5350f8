"""Literal-transcription parity tests: modules vs NumPy implementations of
the reference TF math (SURVEY.md §4a, the hard parts of §7.3)."""
import jax
import jax.numpy as jnp
import numpy as np

from easydgl_tpu.nn.mate import MATEncoder, TAHEncoder
from easydgl_tpu.nn.temporal import BiMAU, TiMultiHeadAttention


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def test_timha_full_forward(rng):
    """TiMultiHeadAttention vs a literal transcription of temporal.py:36-105
    (logit biases, post-softmax query mask, value biases, residual)."""
    b, t, c, h = 2, 5, 8, 2
    q_in = rng.randn(b, t, c).astype(np.float32)
    q_in[0, :2] = 0.0  # padded query rows
    k_in = q_in.copy()
    k_pos = rng.randn(b, t, c).astype(np.float32)
    v_pos = rng.randn(b, t, c).astype(np.float32)
    k_int = rng.randn(b, t, t, c).astype(np.float32)
    v_int = rng.randn(b, t, t, c).astype(np.float32)

    mod = TiMultiHeadAttention(c, h, dropout_rate=0.0)
    params = mod.init(jax.random.key(0), jnp.asarray(q_in), jnp.asarray(k_in),
                      jnp.asarray(k_pos), jnp.asarray(v_pos),
                      jnp.asarray(k_int), jnp.asarray(v_int),
                      deterministic=True, causality=True)
    out = np.asarray(mod.apply(params, jnp.asarray(q_in), jnp.asarray(k_in),
                               jnp.asarray(k_pos), jnp.asarray(v_pos),
                               jnp.asarray(k_int), jnp.asarray(v_int),
                               deterministic=True, causality=True))

    p = jax.tree.map(np.asarray, params["params"])
    dh = c // h
    NEG = -(2.0 ** 32) + 1.0

    def dense(x, name):
        return x @ p[name]["kernel"] + p[name]["bias"]

    def split(x):  # (b, t, c) -> (b, h, t, dh)
        return x.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

    Q = split(dense(q_in, "q"))
    K = split(dense(k_in, "k"))
    V = split(dense(k_in, "v"))
    KP, VP = split(k_pos), split(v_pos)
    KI = k_int.reshape(b, t, t, h, dh).transpose(0, 3, 1, 2, 4)
    VI = v_int.reshape(b, t, t, h, dh).transpose(0, 3, 1, 2, 4)

    logits = (np.einsum("bhqd,bhkd->bhqk", Q, K)
              + np.einsum("bhqd,bhkd->bhqk", Q, KP)
              + np.einsum("bhqkd,bhqd->bhqk", KI, Q)) / np.sqrt(dh)
    key_mask = np.sign(np.abs(k_in).sum(-1))          # (b, t)
    logits = np.where(key_mask[:, None, None, :] != 0, logits, NEG)
    tril = np.tril(np.ones((t, t), bool))
    logits = np.where(tril[None, None], logits, NEG)
    probs = _softmax(logits)
    qm = np.sign(np.abs(q_in).sum(-1))
    probs = probs * qm[:, None, :, None]
    ref = (np.einsum("bhqk,bhkd->bhqd", probs, V)
           + np.einsum("bhqk,bhkd->bhqd", probs, VP)
           + np.einsum("bhqk,bhqkd->bhqd", probs, VI))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, c) + q_in
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bimau_full_forward(rng):
    """BiMAU vs literal temporal.py:404-452: fused QKVT, no causal mask,
    intensity modulation with diagonal reset."""
    b, t, c, h, e = 2, 4, 8, 2, 3
    x = rng.randn(b, t, 3 * c).astype(np.float32)  # 3C-wide like EasyDGL
    key_mask = np.ones((b, t), np.float32)
    key_mask[0, 0] = 0.0
    spans = np.abs(rng.randn(b, t)).astype(np.float32)
    marks = (rng.rand(b, t, e) < 0.5).astype(np.float32)

    mod = BiMAU(c, h, e, dropout_rate=0.0)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(key_mask), jnp.asarray(spans),
                      jnp.asarray(marks), deterministic=True)
    out, mi = mod.apply(params, jnp.asarray(x), jnp.asarray(x),
                        jnp.asarray(key_mask), jnp.asarray(spans),
                        jnp.asarray(marks), deterministic=True)
    out, mi = np.asarray(out), np.asarray(mi)

    p = jax.tree.map(np.asarray, params["params"])
    dh = c // h
    NEG = -(2.0 ** 32) + 1.0
    qkvt = x @ p["qkvt"]["kernel"] + p["qkvt"]["bias"]
    Q, K, V, T = np.split(qkvt, 4, axis=-1)

    def split(z):
        return z.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

    Q, K, V, T = map(split, (Q, K, V, T))
    logits = np.einsum("bhqd,bhkd->bhqk", Q, K) / np.sqrt(dh)
    logits = np.where(key_mask[:, None, None, :] != 0, logits, NEG)
    probs = _softmax(logits)
    seq_units = np.einsum("bhqk,bhkd->bhqd", probs, T)

    # intensity (temporal.py:281-315)
    iv = np.broadcast_to(spans[:, None, :, None], (b, h, t, 1))
    xin = np.concatenate([seq_units, iv], -1)
    wd, bd = p["intensity_dense_kernel"], p["intensity_dense_bias"]
    sg = _sig(xin @ wd + bd).reshape(b, h, t, e, dh)
    raw = np.einsum("bhqed,ed->bhqe", sg, p["intensity_weight"])
    s = np.exp(p["intensity_scaling"])
    ref_mi = s * np.log1p(np.exp(raw / s))
    np.testing.assert_allclose(mi, ref_mi, rtol=1e-4, atol=1e-5)

    qk = np.einsum("bhqe,bke->bhqk", ref_mi, marks)
    eye = np.eye(t, dtype=bool)
    qk = np.where(eye[None, None], 1.0, qk)           # diag reset
    ref = np.einsum("bhqk,bhkd->bhqd", qk * probs, V)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, c) + x[:, :, :c]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_mate_encoder(rng):
    """MATEncoder vs literal sequential.py:220-237."""
    b, s, w, hdim = 2, 3, 4, 6
    q = rng.randn(b, s, 1, hdim).astype(np.float32)
    k = rng.randn(b, s, w, hdim).astype(np.float32)
    u = rng.randn(b, s, hdim).astype(np.float32)
    mod = MATEncoder()
    params = mod.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(k),
                      jnp.asarray(u))
    out = np.asarray(mod.apply(params, jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(u)))
    wproj = np.asarray(params["params"]["user_proj"]["kernel"])
    users = (u @ wproj)[:, :, None, :]
    Q = q * users
    K = k * users
    logits = np.einsum("bsoh,bswh->bsow", Q, K) / np.sqrt(hdim)
    probs = _softmax(logits)
    ref = np.einsum("bsow,bswh->bsoh", probs, K)[:, :, 0, :]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tahe_encoder(rng):
    """TAHEncoder vs literal sequential.py:247-265: (1+cos)/2 weights,
    multiplicative causal mask."""
    b, s, hdim = 2, 4, 6
    q = rng.randn(b, s, hdim).astype(np.float32)
    hist = rng.randn(b, s, hdim).astype(np.float32)
    mod = TAHEncoder()
    out = np.asarray(mod.apply({}, jnp.asarray(q), jnp.asarray(q),
                               jnp.asarray(hist)))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    cos = np.einsum("bqh,bkh->bqk", qn, qn)
    wgt = (1.0 + cos) / 2.0 * np.tril(np.ones((s, s)))[None]
    ref = np.einsum("bqk,bkh->bqh", wgt, hist)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_timelyrec_timeslot_windows():
    """Window sizes from window_ratio match the reference's
    max(int(r*R+.5),1)+1 rule (TimelyREC.py:58)."""
    from easydgl_tpu.config import preset
    from easydgl_tpu.models.timelyrec import TimelyREC
    cfg = preset("TimelyREC").replace(num_items=20, seqslen=4, num_units=8)
    assert max(int(12 * cfg.window_ratio + 0.5), 1) + 1 == 3   # month
    assert max(int(31 * cfg.window_ratio + 0.5), 1) + 1 == 7   # day
    assert max(int(7 * cfg.window_ratio + 0.5), 1) + 1 == 2    # weekday
    assert max(int(24 * cfg.window_ratio + 0.5), 1) + 1 == 6   # hour
