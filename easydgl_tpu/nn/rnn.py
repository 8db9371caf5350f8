"""TPU-native GRU replacing the vendored cuDNN GRU.

The reference wraps TF's native CUDA kernel (src/model/compat/cudnn_rnn.py:567
-> gen_cudnn_rnn_ops, cudnn_rnn_ops.py:1132-1145). The cuDNN GRU is NOT the
textbook GRU (documented at cudnn_rnn_ops.py:81-116): the reset gate is
applied AFTER the candidate's recurrent matmul, and there are two bias
vectors:

    r  = sigmoid(x W_r + h R_r + bW_r + bR_r)
    u  = sigmoid(x W_u + h R_u + bW_u + bR_u)
    h' = tanh(x W_h + bW_h + r * (h R_h + bR_h))
    h  = (1 - u) * h' + u * h

TPU design: the input projections ``x @ [W_r|W_u|W_h]`` for ALL timesteps are
one large MXU matmul hoisted out of the recurrence; ``lax.scan`` then carries
only the (B, C) state with a per-step (C, 3C) recurrent matmul. Weights are a
plain pytree (no opaque-buffer canonicalization layer needed — the reference's
CudnnOpaqueParamsSaveable, cudnn_rnn_ops.py:724-908, exists only because
cuDNN's buffer is opaque).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def per_gate_orthogonal(gates: int):
    """Each gate's matrix is an INDEPENDENT orthogonal init, matching the
    reference's per-canonical-tensor ``tf.orthogonal_initializer()``
    (cudnn_rnn.py:347-350 initializes 2*gates separate (num_units, in)
    matrices per layer). A single orthogonal over the concatenated
    (in, gates*C) block would give each gate block ~sqrt(C/(gates*C))
    effective gain instead of 1.0 — measurably slower convergence at the
    harness level (GRU4REC end-to-end parity caught this). TF draws shape
    (num_units, input_size); we draw its transpose, so non-square layers
    transpose to match the distribution exactly."""
    orth = nn.initializers.orthogonal()

    def init(key, shape, dtype=jnp.float32):
        in_c, total = shape
        c = total // gates
        keys = jax.random.split(key, gates)
        blocks = [orth(k, (c, in_c), dtype).T for k in keys]
        return jnp.concatenate(blocks, axis=1)

    return init


class BlockLSTM(nn.Module):
    """Fused-gate LSTM, the TPU equivalent of the reference's vendored
    ``lstm_ops`` block LSTM (compat/lstm_ops.py:122,208,654 — native
    gen_rnn_ops kernels). No reference model consumes LSTM directly (it
    backs the cuDNN compat cells only); provided for API completeness.

    Gate math matches LSTMBlockCell (forget_bias added to f, no peepholes):
        i,c',f,o = split(x W + h R + b); c = sigma(f + fb)*c + sigma(i)*tanh(c')
        h = sigma(o) * tanh(c)
    """
    num_units: int
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, init=None):
        b, t, in_c = x.shape
        c_ = self.num_units
        orth = per_gate_orthogonal(4)
        w = self.param("w", orth, (in_c, 4 * c_))
        r = self.param("r", orth, (c_, 4 * c_))
        bias = self.param("b", nn.initializers.zeros, (4 * c_,))

        from easydgl_tpu.nn.layers import compute_dtype, mxu_einsum
        xw = mxu_einsum("btc,cd->btd", x, w) + bias
        cdt = compute_dtype()
        r_c = r.astype(cdt) if cdt is not None else r

        if init is None:
            init = (jnp.zeros((b, c_), xw.dtype), jnp.zeros((b, c_), xw.dtype))

        def step(carry, xw_t, r=r_c, c_units=c_):
            c_prev, h_prev = carry
            hc = h_prev.astype(r.dtype) if h_prev.dtype != r.dtype else h_prev
            gates = xw_t + jnp.dot(hc, r, preferred_element_type=jnp.float32)
            i, cc, f, o = jnp.split(gates, 4, axis=-1)
            c_new = (jax.nn.sigmoid(f + self.forget_bias) * c_prev +
                     jax.nn.sigmoid(i) * jnp.tanh(cc))
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (c_new, h_new), h_new

        (c_fin, h_fin), outs = jax.lax.scan(step, init, xw.transpose(1, 0, 2))
        return outs.transpose(1, 0, 2), (c_fin, h_fin)


class CudnnGRU(nn.Module):
    """Multi-layer unidirectional GRU with cuDNN gate math.

    Replaces reference cudnn_rnn.CudnnGRU (GRU4REC.py:27-29, S2PNM.py:29-31);
    kernel init orthogonal, matching the reference's
    ``kernel_initializer=tf.orthogonal_initializer()``.
    """
    num_layers: int
    num_units: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 h0: jnp.ndarray | None = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, T, C_in) batch-major (the time-major transpose the
        reference does at GRU4REC.py:44-45 is an implementation detail of
        cuDNN; we keep batch-major and scan over time).

        Returns (outputs (B, T, C), final_state (L, B, C)).
        """
        b, t, _ = x.shape
        c = self.num_units
        orth = per_gate_orthogonal(3)
        finals = []
        for layer in range(self.num_layers):
            in_c = x.shape[-1]
            w = self.param(f"w_{layer}", orth, (in_c, 3 * c))
            r = self.param(f"r_{layer}", orth, (c, 3 * c))
            bw = self.param(f"bw_{layer}", nn.initializers.zeros, (3 * c,))
            br = self.param(f"br_{layer}", nn.initializers.zeros, (3 * c,))

            # Hoist all input projections into one MXU matmul: (B, T, 3C)
            from easydgl_tpu.nn.layers import compute_dtype, mxu_einsum
            xw = mxu_einsum("btc,cd->btd", x, w) + bw
            cdt = compute_dtype()
            r_c = r.astype(cdt) if cdt is not None else r

            init = (h0[layer] if h0 is not None
                    else jnp.zeros((b, c), xw.dtype))

            def step(h, xw_t, r=r_c, br=br, c=c):
                hc = h.astype(r.dtype) if h.dtype != r.dtype else h
                hr = jnp.dot(hc, r,
                             preferred_element_type=jnp.float32) + br
                xr_g, xu_g, xh_g = jnp.split(xw_t, 3, axis=-1)
                hr_g, hu_g, hh_g = jnp.split(hr, 3, axis=-1)
                rg = jax.nn.sigmoid(xr_g + hr_g)
                ug = jax.nn.sigmoid(xu_g + hu_g)
                cand = jnp.tanh(xh_g + rg * hh_g)    # cuDNN variant
                h_new = (1.0 - ug) * cand + ug * h
                return h_new, h_new

            final, outs = jax.lax.scan(step, init, xw.transpose(1, 0, 2))
            x = outs.transpose(1, 0, 2)              # (B, T, C)
            finals.append(final)
        return x, jnp.stack(finals)
