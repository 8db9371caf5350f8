"""Unit tests for the NN module library against hand-computed values
(SURVEY.md §4a)."""
import jax
import jax.numpy as jnp
import numpy as np

from easydgl_tpu.nn.attention import MultiHeadAttention, attention_probs
from easydgl_tpu.nn.coding import (Embedding, PositionCoding,
                                   TimeFunctionCoding, TimeSinusoidCoding)
from easydgl_tpu.nn.layers import (ContribLayerNorm, FeedForward,
                                   LastAxisLayerNorm, merge_heads,
                                   split_heads)
from easydgl_tpu.nn.rnn import CudnnGRU
from easydgl_tpu.nn.temporal import MAU


def test_contrib_layernorm_norm_axes(rng):
    """Base.py LN normalizes over ALL non-batch axes (params last-axis)."""
    x = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    ln = ContribLayerNorm()
    params = ln.init(jax.random.key(0), x)
    out = np.asarray(ln.apply(params, x))
    ref = (np.asarray(x) - np.asarray(x).mean(axis=(1, 2), keepdims=True))
    ref = ref / np.sqrt(np.asarray(x).var(axis=(1, 2), keepdims=True) + 1e-12)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_lastaxis_layernorm(rng):
    x = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    ln = LastAxisLayerNorm()
    params = ln.init(jax.random.key(0), x)
    out = np.asarray(ln.apply(params, x))
    xs = np.asarray(x)
    ref = (xs - xs.mean(-1, keepdims=True)) / np.sqrt(
        xs.var(-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_embedding_zero_pad_and_scale(rng):
    emb = Embedding(vocab_size=7, num_units=4, zero_pad=True, scale=True)
    ids = jnp.asarray([[0, 1, 6]])
    params = emb.init(jax.random.key(0), ids)
    out = np.asarray(emb.apply(params, ids))
    table = np.asarray(params["params"]["lookup_table"])
    np.testing.assert_allclose(out[0, 0], np.zeros(4), atol=0)  # padded row
    np.testing.assert_allclose(out[0, 1], table[1] * 2.0, rtol=1e-6)  # sqrt(4)


def test_interval_coding_edge_bucket_is_zero(rng):
    """TiSASREC's clip produces bucket == timelen while the table has
    timelen rows; the reference-on-GPU gather stores ZEROS for that
    out-of-bound index (nn/coding.py::TimeIntervalCoding docstring) —
    in-range buckets look up normally."""
    from easydgl_tpu.nn.coding import TimeIntervalCoding
    tc = TimeIntervalCoding(vocab_size=5, num_units=4)
    ids = jnp.asarray([[0, 4, 5, 7]])
    params = tc.init(jax.random.key(0), ids, method=tc.code)
    out = np.asarray(tc.apply(params, ids, method=tc.code))
    table = np.asarray(params["params"]["pembs"]["lookup_table"])
    np.testing.assert_allclose(out[0, 0], table[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], table[4], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], np.zeros(4), atol=0)   # == vocab
    np.testing.assert_allclose(out[0, 3], np.zeros(4), atol=0)   # beyond


def test_position_coding_concat(rng):
    pc = PositionCoding(vocab_size=10, num_units=3)
    x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    params = pc.init(jax.random.key(0), x)
    out = pc.apply(params, x)
    assert out.shape == (2, 5, 6)
    np.testing.assert_allclose(np.asarray(out)[:, :, :3], np.asarray(x))
    # same position rows across batch
    o = np.asarray(out)[:, :, 3:]
    np.testing.assert_allclose(o[0], o[1])


def test_sinusoid_coding_matches_formula():
    d = 6
    tc = TimeSinusoidCoding(d)
    t = jnp.asarray([[0.0, 1.0, 2.5]])
    code = np.asarray(tc.apply({}, t, method=tc.code))
    scale = np.power(10000.0, np.arange(0, d, 2) / d)
    for j, tv in enumerate([0.0, 1.0, 2.5]):
        x = tv / scale
        expected = np.stack([np.sin(x), np.cos(x)], -1).reshape(-1)
        np.testing.assert_allclose(code[0, j], expected, rtol=1e-5, atol=1e-6)


def test_bochner_coding_init_and_formula(rng):
    tc = TimeFunctionCoding(num_units=4)
    t = jnp.asarray(rng.rand(2, 3).astype(np.float32))
    params = tc.init(jax.random.key(0), t, method=tc.code)
    freqs = np.asarray(params["params"]["basis_freq"])
    np.testing.assert_allclose(freqs, np.linspace(0, 9, 4), rtol=1e-6)
    out = np.asarray(tc.apply(params, t, method=tc.code))
    expected = np.cos(np.asarray(t)[:, :, None, None] * freqs)
    assert out.shape == (2, 3, 1, 4)  # rank-2 input -> (B, T, 1, d)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    # pairwise-interval (B, Tq, Tk) input -> (B, Tq, Tk, d)
    spans = jnp.asarray(rng.rand(2, 3, 3).astype(np.float32))
    out2 = tc.apply(params, spans, method=tc.code)
    assert out2.shape == (2, 3, 3, 4)


def test_attention_probs_causal_and_keymask(rng):
    q = jnp.asarray(rng.randn(1, 1, 4, 2).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 4, 2).astype(np.float32))
    key_mask = jnp.asarray([[1.0, 1.0, 0.0, 1.0]])
    p = np.asarray(attention_probs(q, k, key_mask=key_mask, causal=True))
    # rows sum to 1
    np.testing.assert_allclose(p.sum(-1), np.ones((1, 1, 4)), rtol=1e-5)
    # masked key gets ~0 prob wherever other options exist
    assert p[0, 0, 2, 2] < 1e-6 and p[0, 0, 3, 2] < 1e-6
    # causal: no future attention
    assert abs(p[0, 0, 0, 1]) < 1e-9 and abs(p[0, 0, 1, 3]) < 1e-9


def test_split_merge_heads_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    y = merge_heads(split_heads(x, 4))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    # channel-block semantics: head 0 = channels 0..1
    s = split_heads(x, 4)
    np.testing.assert_allclose(np.asarray(s[:, 0]), np.asarray(x[..., :2]))


def test_gru_cudnn_gate_math(rng):
    """Scan GRU vs a literal NumPy implementation of the cuDNN equations."""
    b, t, c = 2, 4, 3
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    gru = CudnnGRU(num_layers=1, num_units=c)
    params = gru.init(jax.random.key(0), x)
    out, final = gru.apply(params, x)

    p = jax.tree.map(np.asarray, params["params"])
    w, r, bw, br = p["w_0"], p["r_0"], p["bw_0"], p["br_0"]
    h = np.zeros((b, c), np.float32)
    xs = np.asarray(x)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    ref_out = []
    for step in range(t):
        xw = xs[:, step] @ w + bw
        hr = h @ r + br
        rg = sig(xw[:, :c] + hr[:, :c])
        ug = sig(xw[:, c:2 * c] + hr[:, c:2 * c])
        cand = np.tanh(xw[:, 2 * c:] + rg * hr[:, 2 * c:])
        h = (1 - ug) * cand + ug * h
        ref_out.append(h.copy())
    np.testing.assert_allclose(np.asarray(out),
                               np.stack(ref_out, 1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final[0]), h, rtol=1e-5, atol=1e-5)


def test_mau_intensity_math(rng):
    """Intensity head vs a literal transcription of temporal.py:281-315."""
    b, h, tq, dh, e = 2, 2, 3, 4, 3
    mau = MAU(num_units=h * dh, num_heads=h, num_events=e)
    hu = jnp.asarray(rng.randn(b, h, tq, dh).astype(np.float32))
    iv = jnp.asarray(rng.rand(b, tq).astype(np.float32))
    marks = jnp.asarray(
        (rng.rand(b, tq, e) < 0.5).astype(np.float32))
    params = mau.init(jax.random.key(0), hu, iv, marks,
                      method=mau.intensity)
    qk, mi = mau.apply(params, hu, iv, marks, method=mau.intensity)

    p = jax.tree.map(np.asarray, params["params"])
    wd = p["intensity_dense_kernel"]; bd = p["intensity_dense_bias"]
    wt = p["intensity_weight"]; sc = np.exp(p["intensity_scaling"])
    xin = np.concatenate([np.asarray(hu),
                          np.broadcast_to(np.asarray(iv)[:, None, :, None],
                                          (b, h, tq, 1))], -1)
    sig = 1.0 / (1.0 + np.exp(-(xin @ wd + bd)))       # (b,h,tq,dh*e)
    sig = sig.reshape(b, h, tq, e, dh)
    raw = np.einsum("bhqed,ed->bhqe", sig, wt)
    ref_mi = sc * np.log1p(np.exp(raw / sc))
    np.testing.assert_allclose(np.asarray(mi), ref_mi, rtol=1e-4, atol=1e-5)
    ref_qk = np.einsum("bhqe,bke->bhqk", ref_mi, np.asarray(marks))
    np.testing.assert_allclose(np.asarray(qk), ref_qk, rtol=1e-4, atol=1e-5)


def test_biased_likelihood_manual():
    """TPP loss vs hand computation (temporal.py:317-333)."""
    mi = jnp.asarray([[[[2.0, 1.0], [0.5, 0.5], [3.0, 1.0]]]])  # (1,1,3,2)
    onehot = jnp.asarray([[[[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]]])
    iv = jnp.asarray([[[1.0, 2.0, 0.5]]])
    out = float(MAU.biased_likelihood(mi, onehot, iv))
    # row 1 has no event -> masked out of both terms
    event_ll = np.log(2.0) + np.log(1.0)
    non_event = (3.0 * 1.0 * 0.5) + (4.0 * 0.5 * 0.5)
    expected = -(event_ll - non_event) / 2.0
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_feedforward_residual(rng):
    x = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
    ffn = FeedForward((8, 4), dropout_rate=0.0)
    params = ffn.init(jax.random.key(0), x, deterministic=True)
    out = ffn.apply(params, x, deterministic=True)
    assert out.shape == x.shape
    p = jax.tree.map(np.asarray, params["params"])
    xs = np.asarray(x)
    inner = np.maximum(xs @ p["inner"]["kernel"] + p["inner"]["bias"], 0.0)
    ref = inner @ p["readout"]["kernel"] + p["readout"]["bias"] + xs
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_tah_encoder_grad_safe_at_zero_rows(rng):
    """tf.nn.l2_normalize parity: a row of EXACTLY zero queries/keys must
    carry finite gradients (jnp.linalg.norm's backward is 0/0 = NaN there;
    real TimelyREC training hit it — see nn/mate.py::_l2_normalize)."""
    import jax
    import jax.numpy as jnp
    from easydgl_tpu.nn.mate import TAHEncoder

    b, s, h = 2, 4, 8
    q = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    q = q.at[0, 1].set(0.0)  # an exactly-zero row
    hist = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    enc = TAHEncoder()
    params = enc.init(jax.random.key(0), q, q, hist)

    def loss(q_):
        return jnp.sum(enc.apply(params, q_, q_, hist) ** 2)

    val, grad = jax.value_and_grad(loss)(q)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
