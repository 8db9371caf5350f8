"""Per-section roofline of the flagship train step (VERDICT r2 Next #4).

Compiles + profiles the faithful EasyDGL train step (bf16, Pallas kernels),
maps every profiled device op to a model section via its HLO ``op_name``
metadata, and prints measured-vs-achievable per section:

  measured ms   — device self time from a 5-step jax.profiler trace
  GFLOP         — analytic FLOPs of the section at the flagship shape
  mxu ms        — GFLOP / (peak bf16 * contraction-derate); the derate is
                  k_eff/128 for sub-128 contractions (the MXU pays the
                  full 128-lane pass regardless of output width <= 128)
  hbm MB/ms     — analytic steady-state HBM traffic and its time at peak BW
  vpu ms        — elementwise/transcendental pass estimate where dominant
  achievable    — max(mxu, hbm) + serial vpu (VPU and MXU of one program
                  do not overlap on a dependent chain)

Usage: python scripts/roofline.py [tracedir]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

PEAK_BF16 = 197e12          # v5e MXU
HBM_BW = 819e9              # v5e
VPU_F32 = 1.5e12            # elementwise elems/s (measured-informed)

# flagship shape
B, T, C, H, DH, E, V, M = 512, 31, 512, 8, 64, 64, 17772, 6
TP = 32                      # padded seq
ROWS = B * H * TP            # intensity rows
ED = E * DH                  # 4096
CP = 72                      # dh+1 -> 8-aligned
TC = 3 * C                   # input concat width
QKVT = 4 * C


def build_step():
    from easydgl_tpu.config import preset
    from easydgl_tpu.data.loader import BatchLoader
    from easydgl_tpu.data.synthetic import (synthetic_mark_table,
                                            synthetic_split)
    from easydgl_tpu.models.registry import build_model
    from easydgl_tpu.train.steps import build_train_step, init_state

    cfg = preset("EasyDGL").replace(
        num_events=E, compute_dtype="bfloat16",
        use_pallas=os.environ.get("ROOFLINE_XLA_ONLY", "") != "1")
    model = build_model(cfg)
    ds = synthetic_split(num_rows=cfg.batch_size, num_items=cfg.num_items,
                         seqslen=cfg.seqslen, seed=0)
    table = synthetic_mark_table(cfg.num_items, cfg.num_events, seed=0)
    loader = BatchLoader(ds, data_mode="mau", batch_size=cfg.batch_size,
                         masklen=cfg.masklen, is_training=True,
                         mark_table=table, needs_marks=True)
    features, labels, _ = next(loader.epoch(0))
    feats = {k: jax.device_put(jnp.asarray(v)) for k, v in features.items()}
    labels = jax.device_put(jnp.asarray(labels))
    state = init_state(model, feats, seed=0)
    step = jax.jit(build_train_step(model, donate=False))
    rng = jax.random.key(0)
    return step, (state, feats, labels, rng)


def profile(step, args, outdir):
    state, feats, labels, rng = args
    state, loss = step(state, feats, labels, rng)
    float(loss)
    with jax.profiler.trace(outdir):
        for _ in range(5):
            state, loss = step(state, feats, labels, rng)
        float(loss)
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pname = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pname.get(e.get("pid"), ""):
            continue
        nm = e.get("name", "")
        if nm.startswith("jit_") or nm.isdigit():
            continue
        agg[nm] += float(e.get("dur", 0))
    return {k: v / 5e3 for k, v in agg.items()}     # ms/step


def hlo_opnames(step, args):
    txt = jax.jit(step).lower(*args).compile().as_text() \
        if not hasattr(step, "lower") else step.lower(*args).compile().as_text()
    names = {}
    for ln in txt.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*=.*?op_name=\"([^\"]+)\"", ln)
        if m and m.group(1) not in names:
            names[m.group(1)] = m.group(2)
    return names


SECTION_RULES = [
    (r"block\d+_bimau\.\d+$|bimau.*pallas", None),   # resolved by name below
    (r"", None),
]


def classify(prof_name, op_name):
    if re.match(r"block\d+_bimau\.\d+$", prof_name):
        # Mosaic kernels keep their flax scope name; .2=fwd, .3=bwd (by size)
        return "mau kernel (bwd)" if prof_name.endswith(".3") else \
               "mau kernel (fwd)"
    o = op_name or ""
    if "pallas_call" in o:
        return ("scoring kernel (bwd)" if "transpose(" in o
                else "scoring kernel (fwd)")
    if "/qkvt/" in o:
        return "qkvt projection (xla)"
    if re.search(r"block\d+_(attn_out|inter|out)/|/transform/", o):
        return "ffn/out projections (xla)"
    if re.search(r"_ln\d?/|transform_ln/", o):
        return "layernorm (xla)"
    if "Dropout" in o:
        return "dropout select (xla)"
    if "item_embs" in o or "pcoding" in o or "mark_embs" in o:
        return "embedding gather/scatter"
    if "tcoding" in o:
        return "time coding"
    if "tpp_regularizer" in o:
        return "tpp regularizer"
    if "convert_element_type" in o:
        return "dtype converts"
    if re.search(r"jit\(step\)/jit\(step\)/(add|mul|sub|div|integer_pow|"
                 r"sqrt|select_n|reduce|broadcast)", o):
        return "optimizer/update (xla)"
    return "other fusions"


def analytic():
    """(GFLOP, contraction-derate, HBM MB, VPU Melem-passes) per section."""
    g = {}
    # mau fwd: z (R,72)x(72,4096); sel (R,4096)x(4096,128); attn 4x ~(G,128,128,64|128)
    attn = 4 * (B * H * TP * TP * DH * 2) / 1e9
    mod = (B * H * TP * TP * 128 * 2) / 1e9
    z = ROWS * CP * ED * 2 / 1e9
    sel = ROWS * ED * 128 * 2 / 1e9
    # derate: z/sel contractions stream at full MXU rate (the noselector
    # ablation measures the whole wide pipeline at 1.86 ms vs 1.73
    # analytic); the small (128,128,64) attention matmuls run ~50%.
    # vpu ops/elem over the (ROWS, ED) activation: 1.8 for the fp32
    # sigmoid (calibrated against the nosigmoid ablation: 0.64 ms), +3.0
    # in the backward (dsw*sig, dsig*wf, dz, dwf fp32 mul+reduce).
    g["mau kernel (fwd)"] = dict(
        gflop=z + sel + (attn + mod) * 2,  # *2 == 50% derate on attn
        derate=1.0,
        mb=(4 * B * TP * C * 2 + B * H * TP * (TP + 2 * E) * 4
            + B * TP * C * 2) / 1e6,
        vpu_me=ROWS * ED * 1.8 / 1e6 + 200)    # sigmoid + packing rolls
    g["mau kernel (bwd)"] = dict(
        gflop=3 * z + sel + (2 * attn + 2 * mod + attn / 2) * 2,
        derate=1.0,
        mb=(9 * B * TP * C * 2 + 2 * B * H * TP * (TP + E) * 4
            + B * H * TP * E * 4) / 1e6,
        vpu_me=ROWS * ED * 4.8 / 1e6 + 400)
    rows_s = B * M
    g["scoring kernel (fwd)"] = dict(
        gflop=rows_s * C * V * 2 / 1e9, derate=1.0,
        mb=(V * C * 2 + rows_s * C * 2) / 1e6, vpu_me=rows_s * V / 1e6)
    g["scoring kernel (bwd)"] = dict(
        gflop=2 * rows_s * C * V * 2 / 1e9, derate=1.0,
        mb=(2 * V * C * 2 + V * C * 4 + rows_s * C * 6) / 1e6,
        vpu_me=rows_s * V * 2 / 1e6)
    rows_p = B * T
    g["qkvt projection (xla)"] = dict(
        gflop=3 * rows_p * TC * QKVT * 2 / 1e9, derate=1.0,
        mb=(3 * rows_p * TC * 2 + 3 * rows_p * QKVT * 2
            + 3 * TC * QKVT * 2 + TC * QKVT * 4) / 1e6, vpu_me=0)
    ffn = rows_p * (C * C + C * 2 * C + 2 * C * C + C * C) * 2 / 1e9
    g["ffn/out projections (xla)"] = dict(
        gflop=3 * ffn, derate=1.0,
        mb=3 * rows_p * C * 2 * 8 / 1e6, vpu_me=rows_p * 2 * C * 2 / 1e6)
    g["dropout select (xla)"] = dict(
        gflop=0, derate=1.0,
        mb=(rows_p * TC * (2 + 4 + 2) + 3 * rows_p * C * 8) / 1e6,
        vpu_me=rows_p * TC * 3 / 1e6)      # threefry bits ~3 ops/elem amort
    g["embedding gather/scatter"] = dict(
        gflop=0, derate=1.0,
        mb=(2 * rows_p * C * 4 + 2 * V * C * 4) / 1e6, vpu_me=0)
    g["optimizer/update (xla)"] = dict(
        gflop=0, derate=1.0,
        mb=(V * C + TC * QKVT + 8 * C * C) * 4 * 8 / 1e6, vpu_me=0)
    return g


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/roofline_prof"
    os.makedirs(outdir, exist_ok=True)
    step, args = build_step()
    lowered = step.lower(*args)
    txt = lowered.compile().as_text()
    opname = {}
    for ln in txt.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*=.*?op_name=\"([^\"]+)\"", ln)
        if m and m.group(1) not in opname:
            opname[m.group(1)] = m.group(2)
    prof = profile(step, args, outdir)

    sect = collections.Counter()
    for nm, ms in prof.items():
        sect[classify(nm, opname.get(nm, ""))] += ms
    total = sum(sect.values())
    ana = analytic()

    print(f"{'section':30s} {'meas ms':>8s} {'GFLOP':>7s} {'mxu':>6s} "
          f"{'MB':>6s} {'hbm':>6s} {'vpu':>6s} {'achv':>6s} {'eff':>5s}")
    for name, ms in sorted(sect.items(), key=lambda kv: -kv[1]):
        a = ana.get(name)
        if a:
            mxu = a["gflop"] / (PEAK_BF16 / 1e12) / a["derate"]
            hbm = a["mb"] / (HBM_BW / 1e9)
            vpu = a["vpu_me"] / (VPU_F32 / 1e9)
            achv = max(mxu, hbm) + vpu
            eff = achv / ms if ms else 0
            print(f"{name:30s} {ms:8.2f} {a['gflop']:7.0f} {mxu:6.2f} "
                  f"{a['mb']:6.0f} {hbm:6.2f} {vpu:6.2f} {achv:6.2f} "
                  f"{eff:5.0%}")
        else:
            print(f"{name:30s} {ms:8.2f} {'—':>7s}")
    print(f"{'TOTAL':30s} {total:8.2f}")
    gf = sum(a["gflop"] for a in ana.values())
    tfs = gf / total  # GFLOP/ms == TFLOP/s
    print(f"\nstep GFLOP (analytic) = {gf:.0f}; measured "
          f"{tfs:.1f} TFLOP/s = {tfs / (PEAK_BF16 / 1e12):.0%} of bf16 peak")


if __name__ == "__main__":
    main()
