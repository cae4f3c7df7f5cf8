#!/usr/bin/env bash
# Sparse capacity sweep (parity: eval_scripts capacity/vb sweeps): decode
# t/s across top-k capacities at fixed group size.
set -euo pipefail
MODEL=${1:?usage: run_capacity_sweep.sh SPARSE_MODEL.gguf}
for CAP in ${CAPS:-4 8 12 16}; do
  echo "== capacity_groups=$CAP =="
  python -m sparkinfer_tpu.tools.bench_matrix -m "$MODEL" --sparse \
    --capacity-groups "$CAP" -n "${N:-128}" || true
done
