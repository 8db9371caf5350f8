#!/usr/bin/env bash
# Train every model of the zoo with its published-config preset
# (the TPU equivalent of the reference's runme.sh launch script).
#
# Usage: scripts/runme.sh DATA_DIR [MARK_NPY]
#   DATA_DIR must hold train.npz / validation.npz / test.npz from
#   `python -m easydgl_tpu.cli.prep`. MARK_NPY is required for CTSMA/EasyDGL.
set -euo pipefail

DATA_HOME=${1:?usage: runme.sh DATA_DIR [MARK_NPY]}
MARK=${2:-${DATA_HOME}/mark.npy}

run() {
  local model=$1; shift
  echo "=== ${model} ==="
  python -m easydgl_tpu.cli.train --model "${model}" \
      --data_dir "${DATA_HOME}" --ckpt_dir "ckpt/${model}" "$@"
}

# flagship first (runme.sh:15-23)
run EasyDGL  --mark "${MARK}"

# time-independent baselines (runme.sh:30-75)
run BERT4REC
run SASREC
run S2PNM
run GRU4REC
run GREC

# time-conditioned baselines (runme.sh:82-115)
run TGAT
run TiSASREC
run TimelyREC
run CTSMA    --mark "${MARK}"

# TGREC is absent from the reference launch script; argparse-default preset
run TGREC
