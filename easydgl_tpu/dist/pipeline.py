"""Pipeline parallelism (GPipe fill-drain) over a mesh axis.

The reference is single-GPU with no parallelism (SURVEY.md §2.6); this is
the PP entry of the new framework's distributed layer, closing the
"SP/CP/ring/Ulysses/PP" inventory row together with dist/context.py.

TPU-native design: the schedule is a statically-unrolled skew loop inside
``shard_map`` — each device owns one STAGE (a contiguous group of
identical blocks), activations hop to the next stage via neighbor
``lax.ppermute`` (ICI transfers), and every device runs the same traced
program (SPMD): devices outside the fill/drain window compute on garbage
that is masked out of the result, which is how XLA pipelines are written
(compiler-friendly control flow, no data-dependent branching).

Differentiable end-to-end: ppermute transposes to the reverse permute,
the masking ``where``s zero the inactive bubbles' gradients, and stage
parameters arrive stacked on a leading stage axis sharded over the pipe
axis, so their gradients come back with the same sharding (tested against
the sequential chain in tests/test_pipeline.py, values AND grads).

With S stages and M microbatches the bubble fraction is (S-1)/(M+S-1);
choose M >= 4*S for >80% utilization. This module provides mechanism, not
policy: models with num_blocks % S == 0 can stack their per-block params
with ``stack_stage_params`` and pass the block apply as ``stage_fn``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def microbatch(x, num_microbatches: int):
    """(B, ...) -> (M, B/M, ...) microbatched view (B % M == 0)."""
    def split(leaf):
        b = leaf.shape[0]
        assert b % num_microbatches == 0, \
            f"batch {b} not divisible by {num_microbatches} microbatches"
        return leaf.reshape((num_microbatches, b // num_microbatches)
                            + leaf.shape[1:])
    return jax.tree.map(split, x)


def unmicrobatch(x):
    """Inverse of ``microbatch``."""
    return jax.tree.map(
        lambda l: l.reshape((l.shape[0] * l.shape[1],) + l.shape[2:]), x)


def stack_stage_params(per_stage_params):
    """[stage0_tree, stage1_tree, ...] -> one tree with leading stage dim
    (all stages must be structurally identical)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *per_stage_params)


def pipeline_apply(stage_fn: Callable[[Any, Any], Any], stage_params,
                   x, mesh: Mesh, *, pipe_axis: str,
                   extra: Optional[Any] = None,
                   batch_axis: Optional[str] = None):
    """Run ``x`` through S pipelined stages: stage i applies
    ``stage_fn(params_i, h[, extra])`` and forwards to stage i+1.

    stage_params: pytree whose leaves carry a leading stage dim == S =
    mesh.shape[pipe_axis] (see ``stack_stage_params``).
    x: microbatched input, leaves (M, mb, ...) — see ``microbatch``.
    extra: optional per-microbatch side input consumed by EVERY stage
    (e.g. the padding mask), leaves (M, mb, ...). ``extra`` stays
    replicated — every stage reads a skew-dependent slice of it each
    tick; keep it to O(C)-smaller side inputs like masks.
    Returns the final stage's outputs, (M, mb, ...).

    MEMORY: when M % S == 0 the microbatch axis of ``x`` AND of the
    output is SHARDED over the pipe axis — no device ever stores the full
    batch (each holds M/S input + M/S output microbatches, plus the one
    in-flight activation). The feed/collect hops ride per-tick psums over
    the pipe axis whose payload is exactly one microbatch activation —
    the same order as the stage-to-stage ppermute itself. When M % S != 0
    the inputs/outputs fall back to replicated (correct, memory-naive;
    pick M as a multiple of S to avoid it).
    """
    s = mesh.shape[pipe_axis]
    m = jax.tree.leaves(x)[0].shape[0]
    shard_io = m % s == 0
    m_loc = m // s if shard_io else m
    p_specs = jax.tree.map(
        lambda l: P(pipe_axis, *([None] * (l.ndim - 1))), stage_params)
    # batch_axis (dp composition): microbatch ROWS stay sharded over the
    # data axis end to end — specs are (M over pipe, mb over data)
    io_spec = (P(pipe_axis, batch_axis) if shard_io
               else P(None, batch_axis))
    # extra leaves can be per-microbatch scalars (ndim 1) — name the data
    # axis only on leaves that HAVE a row dim
    ex_specs = (P() if extra is None else jax.tree.map(
        lambda l: P(None, batch_axis) if l.ndim >= 2 else P(), extra))

    def local(params, xs, ex):
        params = jax.tree.map(lambda l: l[0], params)  # this stage's slice
        i = jax.lax.axis_index(pipe_axis)
        fwd = [(d, d + 1) for d in range(s - 1)]

        state = jax.tree.map(lambda l: jnp.zeros_like(l[0]), xs)
        outs = jax.tree.map(lambda l: jnp.zeros_like(l), xs)
        for t in range(m + s - 1):
            mb = min(t, m - 1)
            if shard_io:
                # stage 0's feed: the owner shard contributes its slice,
                # the pipe-psum (one microbatch payload) delivers it
                feed = jax.tree.map(
                    lambda xl: jax.lax.psum(
                        jnp.where(i == mb // m_loc, xl[mb % m_loc],
                                  jnp.zeros_like(xl[0])), pipe_axis), xs)
            else:
                feed = jax.tree.map(lambda xl: xl[mb], xs)
            inp = jax.tree.map(
                lambda fl, sl: jnp.where(i == 0, fl, sl), feed, state)
            if ex is None:
                args = (inp,)
            else:
                # stage i processes microbatch (t - i) at tick t, so its
                # side input must follow the skew (dynamic in axis_index)
                mb_i = jnp.clip(t - i, 0, m - 1)
                args = (inp, jax.tree.map(
                    lambda l: jax.lax.dynamic_index_in_dim(
                        l, mb_i, keepdims=False), ex))
            y = stage_fn(params, *args)
            ot = t - (s - 1)
            if 0 <= ot < m:
                if shard_io:
                    # collect: the last stage contributes, the owner shard
                    # stores (everyone else keeps its buffer untouched)
                    got = jax.tree.map(
                        lambda yl: jax.lax.psum(
                            jnp.where(i == s - 1, yl, jnp.zeros_like(yl)),
                            pipe_axis), y)
                    outs = jax.tree.map(
                        lambda ol, gl: ol.at[ot % m_loc].set(
                            jnp.where(i == ot // m_loc, gl,
                                      ol[ot % m_loc])), outs, got)
                else:
                    write = (i == s - 1)
                    outs = jax.tree.map(
                        lambda ol, yl: ol.at[ot].set(
                            jnp.where(write, yl, ol[ot])), outs, y)
            if s > 1:
                state = jax.tree.map(
                    lambda yl: jax.lax.ppermute(yl, pipe_axis, fwd), y)
        if not shard_io:
            # only the last stage holds real outputs; zero elsewhere +
            # psum replicates them (and keeps out_specs simple)
            outs = jax.tree.map(
                lambda ol: jax.lax.psum(
                    jnp.where(jax.lax.axis_index(pipe_axis) == s - 1, ol,
                              jnp.zeros_like(ol)), pipe_axis), outs)
        return outs

    return jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(p_specs, io_spec, ex_specs),
        out_specs=io_spec)(stage_params, x, extra)
