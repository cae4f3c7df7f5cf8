#!/usr/bin/env bash
# DFR / hot-set convergence sweep (parity: eval_scripts dfr sweeps):
# runs the tiered engine over HBM budgets, logging miss rates + swap counts.
set -euo pipefail
MODEL=${1:?usage: run_dfr_sweep.sh SPARSE_MODEL.gguf [SPLIT.gguf]}
SPLIT=${2:-}
for VB in 2 4 8; do
  echo "== hbm-budget ${VB} GiB =="
  SPIF_DFR_DEBUG=1 python -m sparkinfer_tpu.tools.cli -m "$MODEL" \
    ${SPLIT:+--spif-ms "$SPLIT"} -vb "$VB" -p "The quick brown fox" -n 64 \
    --temp 0 --verbose || true
done
