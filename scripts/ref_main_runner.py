"""Run the reference's src/main.py VERBATIM (CPU) inside a prepared workdir.

Usage:
    python scripts/ref_main_runner.py WORKDIR [reference main.py flags...]

This is the subprocess target of scripts/harness_parity.py: it sets up the
environment the reference expects (conf/logging.conf + ckpt/ relative to
cwd, src/ on sys.path, the TF-2.21 import shims from parity/refbridge.py,
and the CPU-runnable CudnnGRU swap), then executes the ACTUAL reference
entry point (/root/reference/src/main.py:154-175 -> main() :78-151) via
runpy — the epoch loop, eval cadence, EarlyStopping (util.py:14-58) and
checkpoint selection are all the reference's own code, untouched.

The EarlyStopping summary lands in WORKDIR/model.log ("SUMMARY: {...}",
util.py:57-58); harness_parity.py parses it from there.
"""
import os
import runpy
import shutil
import sys

# must precede the first tensorflow import (oneDNN LN fusion ignores the
# graph epsilon — see parity/refbridge.py module docstring)
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")


def main():
    workdir = os.path.abspath(sys.argv[1])
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_src = os.environ.get("EASYDGL_REFERENCE_SRC", "/root/reference/src")
    ref_root = os.path.dirname(ref_src)

    os.makedirs(os.path.join(workdir, "ckpt"), exist_ok=True)
    conf_dst = os.path.join(workdir, "conf")
    if not os.path.isdir(conf_dst):
        shutil.copytree(os.path.join(ref_root, "conf"), conf_dst)
    os.chdir(workdir)
    sys.path.insert(0, repo_root)   # easydgl_tpu (for the refbridge shims)
    sys.path.insert(0, ref_src)     # util, dataloader, model

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    from easydgl_tpu.parity.refbridge import (_install_layers_shim,
                                              _install_tracking_shim,
                                              _patch_cudnn_gru,
                                              _patch_gpu_gather_semantics)
    _install_tracking_shim()
    _install_layers_shim(tf)
    _patch_cudnn_gru(tf)
    _patch_gpu_gather_semantics(tf)

    sys.argv = ["main.py"] + sys.argv[2:]
    runpy.run_path(os.path.join(ref_src, "main.py"), run_name="__main__")


if __name__ == "__main__":
    main()
