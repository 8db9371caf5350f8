"""Pipeline parallelism (dist/pipeline.py) vs the sequential chain:
values and gradients, plus a SASREC-block integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from easydgl_tpu.dist.pipeline import (microbatch, pipeline_apply,
                                       stack_stage_params, unmicrobatch)


def _mesh(eight_devices, s):
    return Mesh(np.asarray(eight_devices[:s]), ("pipe",))


def _mlp_stage(params, h):
    w1, b1, w2, b2 = params["w1"], params["b1"], params["w2"], params["b2"]
    y = jnp.tanh(h @ w1 + b1)
    return h + y @ w2 + b2


def _mlp_params(rng, c, hidden):
    return {"w1": jnp.asarray(rng.randn(c, hidden).astype(np.float32) * .2),
            "b1": jnp.zeros((hidden,), jnp.float32),
            "w2": jnp.asarray(rng.randn(hidden, c).astype(np.float32) * .2),
            "b2": jnp.zeros((c,), jnp.float32)}


@pytest.mark.parametrize("s,m", [(4, 8), (2, 4), (8, 8)])
def test_pipeline_matches_sequential(rng, eight_devices, s, m):
    mesh = _mesh(eight_devices, s)
    b, c = 16, 12
    x = jnp.asarray(rng.randn(b, c).astype(np.float32))
    per_stage = [_mlp_params(rng, c, 24) for _ in range(s)]
    stacked = stack_stage_params(per_stage)

    ref = x
    for p in per_stage:
        ref = _mlp_stage(p, ref)

    out = unmicrobatch(pipeline_apply(_mlp_stage, stacked, microbatch(x, m),
                                      mesh, pipe_axis="pipe"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_sequential(rng, eight_devices):
    s, m, b, c = 4, 8, 16, 12
    mesh = _mesh(eight_devices, s)
    x = jnp.asarray(rng.randn(b, c).astype(np.float32))
    co = jnp.asarray(rng.randn(b, c).astype(np.float32))
    per_stage = [_mlp_params(rng, c, 24) for _ in range(s)]
    stacked = stack_stage_params(per_stage)

    def loss_pipe(params, x_):
        out = unmicrobatch(pipeline_apply(
            _mlp_stage, params, microbatch(x_, m), mesh, pipe_axis="pipe"))
        return jnp.sum(out * co)

    def loss_seq(params, x_):
        h = x_
        for i in range(s):
            h = _mlp_stage(jax.tree.map(lambda l: l[i], params), h)
        return jnp.sum(h * co)

    gp, gxp = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
    gs, gxs = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxs),
                               rtol=1e-5, atol=1e-5)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5, err_msg=str(pa))


def test_pipeline_sasrec_blocks(rng, eight_devices):
    """Four identical SASREC encoder blocks (MHA + FFN + LNs) run as a
    4-stage pipeline == the sequential stack (the model-zoo integration:
    stage_fn is the block's flax apply, params stacked per block)."""
    from easydgl_tpu.nn.attention import MultiHeadAttention
    from easydgl_tpu.nn.layers import ContribLayerNorm, FeedForward
    from flax import linen as nn

    c, h, b, t, s, m = 16, 2, 8, 8, 4, 4
    mesh = _mesh(eight_devices, s)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, mask):
            x = MultiHeadAttention(c, h, 0.0, name="attn")(
                ContribLayerNorm(name="ln0")(x), x,
                deterministic=True, causality=True)
            x = FeedForward((c, c), 0.0, name="ffn")(
                ContribLayerNorm(name="ln1")(x), deterministic=True)
            return x * mask

    block = Block()
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, t, 1) > 0.2).astype(np.float32))
    per_stage = [block.init(jax.random.key(i), x, mask) for i in range(s)]

    ref = x
    for p in per_stage:
        ref = block.apply(p, ref, mask)

    out = unmicrobatch(pipeline_apply(
        block.apply, stack_stage_params(per_stage), microbatch(x, m),
        mesh, pipe_axis="pipe", extra=microbatch(mask, m)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
