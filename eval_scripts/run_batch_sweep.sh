#!/usr/bin/env bash
# Serving batch sweep (parity: eval_scripts batch sweeps): aggregate
# decode throughput across slot counts.
set -euo pipefail
MODEL=${1:?usage: run_batch_sweep.sh MODEL.gguf}
for B in ${BATCHES:-1 2 4 8}; do
  echo "== batch=$B =="
  python -m sparkinfer_tpu.tools.bench_matrix -m "$MODEL" -b "$B" -n "${N:-128}" || true
done
