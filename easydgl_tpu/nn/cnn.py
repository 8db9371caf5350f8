"""Dilated convolution stack for GREC.

Parity notes vs reference ``src/module/sequential.py:140-207``:

* ``DilatedConv1D`` — atrous conv via ``lax.conv_general_dilated``; causal
  variant left-pads ``(filter_width-1)*dilation`` then VALID
  (sequential.py:164-169); non-causal uses SAME.
* ``MaskedCNN`` — two dilated convs (dilation, 2*dilation) each followed by
  last-axis LN + relu, then residual (sequential.py:177-207).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from easydgl_tpu.nn.layers import LastAxisLayerNorm, truncated_normal


class DilatedConv1D(nn.Module):
    filter_width: int
    out_channels: int
    dilation: int
    causality: bool

    @nn.compact
    def __call__(self, x):
        """x: (B, T, C) -> (B, T, out_channels)."""
        in_c = x.shape[-1]
        w = self.param("weight", truncated_normal(0.02),
                       (self.filter_width, in_c, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.causality:
            pad = (self.filter_width - 1) * self.dilation
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        return out + b


class MaskedCNN(nn.Module):
    filter_width: int
    out_channels: int
    dilation: int
    causality: bool

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = DilatedConv1D(self.filter_width, self.out_channels,
                          self.dilation, self.causality, name="dconv0")(x)
        h = jax.nn.relu(LastAxisLayerNorm(name="ln0")(h))
        h = DilatedConv1D(self.filter_width, self.out_channels,
                          2 * self.dilation, self.causality, name="dconv1")(h)
        h = jax.nn.relu(LastAxisLayerNorm(name="ln1")(h))
        return h + x
