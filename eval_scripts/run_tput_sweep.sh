#!/usr/bin/env bash
# Throughput sweep harness (parity: the reference's eval_scripts/*.sh tput
# sweeps over models x vram-budgets x modes writing logs for figures).
#
# Usage: eval_scripts/run_tput_sweep.sh MODEL.gguf [OUTDIR]
# Sweeps: dense vs sparse (when predictors present), pp/tg matrix, batch sizes.
set -euo pipefail
MODEL=${1:?usage: run_tput_sweep.sh MODEL.gguf [OUTDIR]}
OUT=${2:-eval_out}
mkdir -p "$OUT"
STAMP=$(date +%Y%m%d_%H%M%S)

echo "== bench matrix (dense) =="
python -m sparkinfer_tpu.tools.bench_matrix -m "$MODEL" \
  -pp 512,2048 -tg 32 -b 1,4,8 -o json | tee "$OUT/dense_$STAMP.json"

echo "== headline (sparse vs dense ratio) =="
python bench.py | tee "$OUT/headline_$STAMP.json"

echo "== per-prompt bench (llama-cli -nps analogue) =="
if [ -f "$OUT/prompts.txt" ]; then
  python -m sparkinfer_tpu.tools.cli -m "$MODEL" -f "$OUT/prompts.txt" \
    -nps 10 -n 64 --json | tee "$OUT/prompts_$STAMP.json"
fi
echo "results in $OUT/"
