"""Configuration system for the TPU-native sequential recommendation framework.

Replaces the reference's argparse flag namespaces (reference: src/main.py:22-75,
src/analytics.py:23-67) and the per-model shell launch configs (reference:
runme.sh:15-115) with a single typed dataclass plus per-model presets.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: `data` is the DP axis, `model` shards the
    item-embedding/softmax tables by rows (vocab dim).

    The reference is single-GPU with no parallelism (SURVEY.md §2.6); these are
    new, first-class components of the TPU build.
    """
    data_axis: str = "data"
    model_axis: str = "model"
    seq_axis: str = "seq"
    pipe_axis: str = "pipe"
    # -1 means "use all devices on that axis"; (dp, mp, cp, pp) product
    # must divide the device count.
    dp: int = -1
    mp: int = 1
    # context-parallel degree: shards the SEQUENCE over a "seq" mesh axis;
    # attention runs as a ring (dist/context.py). Only useful for
    # long-context configs — the reference's L=30 needs none.
    cp: int = 1
    # pipeline-parallel degree: shards the BLOCK stack over a "pipe" mesh
    # axis (GPipe fill-drain, dist/pipeline.py; production wiring in
    # train/pp.py — models with num_blocks % pp == 0 stack per-block
    # params on a stage axis).
    pp: int = 1


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer settings.

    Defaults mirror the reference's plain Adam path (src/model/Base.py:142-144).
    GRU models use beta2=0.98, eps=1e-9 and global-norm clip 5.0
    (src/model/GRU4REC.py:60-71, src/model/S2PNM.py:80-90).
    The `adamw_warmup` name mirrors src/optimization.py:27-84 (unused by the
    reference default path but part of its API surface).
    """
    name: str = "adam"  # adam | adamw_warmup
    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    clip_norm: float = 0.0            # 0 = no clipping
    weight_decay: float = 0.01        # adamw only
    num_train_steps: int = 100000     # adamw schedule horizon
    num_warmup_steps: int = 10000     # adamw linear warmup


@dataclass(frozen=True)
class Config:
    """Full experiment configuration (model + data + optim + eval + mesh)."""
    model: str = "EasyDGL"
    num_items: int = 17771            # catalog size incl. the padding id 0
    seqslen: int = 30                 # model sequence length (runme.sh --seqslen)

    # --- architecture (reference flags src/main.py:35-39)
    num_units: int = 512
    num_heads: int = 8
    num_blocks: int = 1

    # --- temporal
    time_scale: float = 1.0           # divide raw timestamps (src/main.py:42)
    timelen: int = 256                # TiSASREC interval buckets (src/main.py:52)
    window_ratio: float = 0.2         # TimelyREC (src/main.py:55)

    # --- masking (BERT-style pipelines, src/main.py:45)
    masklen: int = 6

    # --- GREC (src/main.py:48-49)
    filter_width: int = 3
    dilations: Tuple[int, ...] = (1, 2, 2, 4)

    # --- CTSMA / EasyDGL TPP
    ct_reg: float = 0.0               # TPP likelihood weight (src/main.py:59)
    num_events: int = 0               # event-mark vocabulary (0 = from mark table)

    # --- regularization / dropout
    l2_reg: float = 0.0
    hidden_dropout_rate: float = 0.0
    attention_probs_dropout_rate: float = 0.0

    # --- optimization
    batch_size: int = 512
    num_epochs: int = 100
    optim: OptimConfig = field(default_factory=OptimConfig)

    # --- evaluation (src/model/Base.py:150-207)
    mask_seen: bool = False
    # NOTE: despite the name, this is an EPOCH period — faithful to the
    # reference flag of the same name (src/main.py:72) which gates eval with
    # ``if epoch % FLAGS.eval_per_steps: continue`` (src/main.py:126).
    eval_per_steps: int = 1
    patience: int = 10                # EarlyStopping (src/util.py:16)
    topk: Tuple[int, ...] = (10, 50, 100)

    # --- runtime
    seed: int = 9876                  # reference seed (src/main.py:157)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    param_dtype: str = "float32"
    compute_dtype: str = "float32"    # set "bfloat16" for throughput runs
    use_pallas: Optional[bool] = None  # None = auto (True on TPU)
    # opt-in production fast path (EasyDGL): final-block attention /
    # intensities for ONLY the prediction rows. ~1.6x train throughput;
    # NOT reference-exact (per-example LayerNorm moments see only those
    # rows — models/easydgl.py docstring). Off for parity/benchmarks.
    gather_queries: bool = False
    # attention implementation: "xla" materializes the (T, T) probs
    # (reference semantics, right for L=30); "flash" is the LONG-CONTEXT
    # mode — the MHA family (SASREC & co) streams key blocks through the
    # blockwise Pallas kernel (kernels/flash_attention.py) and the
    # self-modulating family (CTSMA/EasyDGL) takes the two-sweep MAU
    # schedule — streamed Pallas kernels (kernels/mau_streamed.py) when
    # use_pallas, else the blockwise-XLA scans (kernels/mau_blocked.py)
    # — all O(T) memory; "factored"
    # rewrites per-pair coding tensors into per-position factors for the
    # temporal-bias family (TiSASREC interval tables; TGAT/TGREC Bochner
    # features via the cosine angle-addition identity) — exact, O(L*C)
    # instead of O(L^2*C) memory. Under a cp>1 mesh the ring path takes
    # over regardless of this flag.
    attention_impl: str = "xla"
    # key-block length of the blocked MAU schedule (the analogue of the
    # flash kernel's block_k; tuned on-chip, scripts/longctx_bench.py)
    mau_block_k: int = 512
    # context-parallel attention algorithm under a cp>1 mesh:
    # "ring" rotates K/V chunks via ppermute (no head-count constraint);
    # "ulysses" re-shards sequence<->heads with two all_to_alls (needs
    # num_heads % cp == 0; cheaper collective volume when heads divide).
    cp_impl: str = "ring"
    # rematerialize each encoder block in the backward pass
    # (jax.checkpoint via flax nn.remat): trades ~1 extra forward of block
    # FLOPs for dropping every intra-block residual — the long-context
    # memory lever (param names are unchanged; checkpoints interchange).
    remat: bool = False
    # GPipe microbatch count under a pp>1 mesh (train/pp.py). 0 = auto:
    # the largest of (4*pp, 2*pp, pp) dividing batch_size — >=4*pp keeps
    # the fill/drain bubble under 20%.
    pp_microbatches: int = 0
    # dropout PRNG: "auto" = the hardware rbg generator on TPU (threefry's
    # per-step u32 fusions cost ~0.7 ms/step at the flagship shape),
    # threefry2x32 elsewhere (keeps CPU goldens/determinism fixtures
    # stable). Both are deterministic functions of the seed.
    prng_impl: str = "auto"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def resolved_prng_impl(self) -> str:
        if self.prng_impl != "auto":
            return self.prng_impl
        import jax
        return ("rbg" if jax.default_backend() not in ("cpu",)
                else "threefry2x32")

    @property
    def head_dim(self) -> int:
        assert self.num_units % self.num_heads == 0
        return self.num_units // self.num_heads

    @property
    def matmul_dtype(self):
        """None (= fp32 everywhere) or the reduced matmul dtype for mixed
        precision (params stay fp32; accumulation is fp32)."""
        if self.compute_dtype in ("float32", None, ""):
            return None
        import jax.numpy as jnp
        return jnp.dtype(self.compute_dtype)


def _p(model: str, **kw) -> Config:
    optim_kw = {}
    for k in ("learning_rate", "beta2", "eps", "clip_norm"):
        if k in kw:
            optim_kw[k] = kw.pop(k)
    cfg = Config(model=model, **kw)
    if optim_kw:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, **optim_kw))
    return cfg


# Per-model presets reproducing the published Netflix table; values transcribed
# from the reference launch script (runme.sh:15-115). TGREC is not present in
# runme.sh; its preset mirrors the argparse defaults (src/main.py:35-75).
PRESETS = {
    "EasyDGL": _p("EasyDGL", num_units=512, hidden_dropout_rate=0.1,
                  attention_probs_dropout_rate=0.1, learning_rate=5e-4,
                  batch_size=512, l2_reg=1e-4, ct_reg=1e-7, num_blocks=1,
                  num_heads=8, mask_seen=True, time_scale=86400.0),
    "BERT4REC": _p("BERT4REC", num_units=512, hidden_dropout_rate=0.2,
                   attention_probs_dropout_rate=0.2, learning_rate=5e-5,
                   batch_size=512, l2_reg=1e-4, num_blocks=3, num_heads=8,
                   mask_seen=True),
    "SASREC": _p("SASREC", num_units=512, hidden_dropout_rate=0.0,
                 attention_probs_dropout_rate=0.0, learning_rate=5e-4,
                 batch_size=512, l2_reg=0.0, num_blocks=2, num_heads=8,
                 mask_seen=True),
    "S2PNM": _p("S2PNM", num_units=512, hidden_dropout_rate=0.2,
                attention_probs_dropout_rate=0.2, learning_rate=1e-4,
                batch_size=512, l2_reg=1e-4, num_blocks=1, num_heads=1,
                mask_seen=True, beta2=0.98, eps=1e-9, clip_norm=5.0),
    "GRU4REC": _p("GRU4REC", num_units=512, hidden_dropout_rate=0.1,
                  learning_rate=5e-4, batch_size=512, l2_reg=1e-4,
                  num_blocks=1, mask_seen=True, beta2=0.98, eps=1e-9,
                  clip_norm=5.0),
    "GREC": _p("GREC", num_units=512, hidden_dropout_rate=0.1,
               learning_rate=5e-4, batch_size=512, l2_reg=1e-4,
               dilations=(1, 4, 1, 4), mask_seen=True),
    "TGAT": _p("TGAT", num_units=512, hidden_dropout_rate=0.1,
               attention_probs_dropout_rate=0.1, learning_rate=5e-5,
               batch_size=512, l2_reg=1e-4, num_blocks=3, num_heads=1,
               mask_seen=True, time_scale=86400.0),
    "TiSASREC": _p("TiSASREC", num_units=512, hidden_dropout_rate=0.1,
                   attention_probs_dropout_rate=0.1, learning_rate=5e-4,
                   batch_size=512, l2_reg=1e-4, timelen=256, num_blocks=2,
                   num_heads=8, mask_seen=True, time_scale=86400.0),
    "TimelyREC": _p("TimelyREC", num_units=512, hidden_dropout_rate=0.1,
                    attention_probs_dropout_rate=0.1, learning_rate=1e-3,
                    batch_size=512, l2_reg=1e-4, num_blocks=2, num_heads=4,
                    mask_seen=True, time_scale=86400.0),
    "CTSMA": _p("CTSMA", num_units=512, hidden_dropout_rate=0.1,
                attention_probs_dropout_rate=0.2, learning_rate=5e-4,
                batch_size=512, l2_reg=1e-4, ct_reg=1e-7, num_blocks=2,
                num_heads=4, mask_seen=True, time_scale=86400.0),
    "TGREC": _p("TGREC", num_units=50, num_heads=1, num_blocks=3,
                learning_rate=1e-3, batch_size=128, l2_reg=0.0,
                mask_seen=True, time_scale=86400.0),
    # Long-context SASREC: NEW capability beyond the reference's L=30
    # ceiling (SURVEY.md §5 long-context row) — blockwise flash attention
    # (O(T) memory); combine with --cp N for ring context parallelism.
    "SASREC-LC": _p("SASREC", num_units=512, hidden_dropout_rate=0.1,
                    attention_probs_dropout_rate=0.1, learning_rate=5e-4,
                    # B=32 fits the axon relay's effective HBM budget
                    # (B=64 ResourceExhausted even with remat; the relay
                    # grants ~4 GB of the chip's 16 — BASELINE.md round 4).
                    # remat measured +21% step time at this size (169.3 vs
                    # 139.7 ms) and B=32 fits without it, so it stays the
                    # opt-in --remat lever for bigger configs.
                    batch_size=32, seqslen=2048, num_blocks=2, num_heads=8,
                    mask_seen=True, attention_impl="flash",
                    compute_dtype="bfloat16"),
    # Long-context EasyDGL — the FLAGSHIP at 64x the reference's L=30
    # ceiling on ONE chip: two-sweep BiMAU (streamed Pallas
    # kernels/mau_streamed.py under use_pallas — 35 ms/step measured;
    # blockwise-XLA kernels/mau_blocked.py otherwise, O(T * mau_block_k)
    # memory both) + the masked objective, whose catalog
    # scoring touches only masklen rows per example (vs every position for
    # the AR protocol — the SASREC-LC step budget's 31%-of-step lever,
    # BASELINE.md). seqslen=2047 -> model length 2048 (EasyDGL consumes
    # L+1). B sized to the axon relay's ~4 GB HBM grant.
    "EasyDGL-LC": _p("EasyDGL", num_units=512, hidden_dropout_rate=0.1,
                     attention_probs_dropout_rate=0.1, learning_rate=5e-4,
                     batch_size=8, seqslen=2047, masklen=256, num_blocks=1,
                     num_heads=8, l2_reg=1e-4, ct_reg=1e-7, mask_seen=True,
                     time_scale=86400.0, attention_impl="flash",
                     compute_dtype="bfloat16"),
    # Long-context CTSMA — the causal self-modulating model at L=2048:
    # same streamed two-sweep MAU engines as EasyDGL-LC, with the causal
    # DMA clamps cutting the tile work ~2x (measured fwd+bwd 23.6 vs
    # 44.2 ms at this shape), but the REGRESSIVE protocol scores every
    # position against the catalog (the SASREC-LC budget's 31% term), so
    # B matches SASREC-LC's relay-grant sizing rather than EasyDGL-LC's.
    "CTSMA-LC": _p("CTSMA", num_units=512, hidden_dropout_rate=0.1,
                   attention_probs_dropout_rate=0.1, learning_rate=5e-4,
                   batch_size=8, seqslen=2048, num_blocks=1, num_heads=8,
                   l2_reg=1e-4, ct_reg=1e-7, mask_seen=True,
                   time_scale=86400.0, attention_impl="flash",
                   compute_dtype="bfloat16"),
    # Long-context BERT4REC — the masked-objective counterpart of
    # SASREC-LC: same flash attention core, but the catalog-scoring matmul
    # shrinks by L/masklen = 8x because only masked rows are scored
    # (reference dataloader.py:39-85 masking + BERT4REC.py:120-121 gather
    # head). Demonstrates the "scoring shrinks with fewer supervised
    # positions" lever the SASREC-LC budget documents.
    "BERT4REC-LC": _p("BERT4REC", num_units=512, hidden_dropout_rate=0.1,
                      attention_probs_dropout_rate=0.1, learning_rate=5e-5,
                      batch_size=32, seqslen=2047, masklen=256,
                      num_blocks=2, num_heads=8, l2_reg=1e-4,
                      mask_seen=True, attention_impl="flash",
                      compute_dtype="bfloat16"),
}


def preset(model: str, **overrides) -> Config:
    cfg = PRESETS[model]
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
