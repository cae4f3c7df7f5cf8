#!/usr/bin/env bash
# Quality-delta sweep (parity: the reference gates sparsity with
# perplexity/HellaSwag/KL — tools/perplexity/perplexity.cpp:173,741):
# PPL + KL-vs-dense (+ HellaSwag when a tasks file is given) for the
# dense, sparse (predictor-gated), and tiered-drop paths of ONE model.
#
# usage: run_quality_sweep.sh SPARSE_MODEL.gguf CORPUS.txt [HELLASWAG.json] [SPLIT]
set -euo pipefail
MODEL=${1:?usage: run_quality_sweep.sh MODEL.gguf CORPUS.txt [TASKS.json] [SPLIT]}
CORPUS=${2:?corpus file required}
TASKS=${3:-}
SPLIT=${4:-}
OUT=${OUT:-quality_sweep.jsonl}
PPX="python -m sparkinfer_tpu.tools.perplexity -m $MODEL -f $CORPUS -c ${CTX:-512} --group-size ${GS:-128}"
HS=${TASKS:+--hellaswag $TASKS}

echo "== dense (base logits) =="
$PPX --save-logits /tmp/qs_base.npz $HS | sed 's/^/{"mode": "dense", "out": /;s/$/}/' | tee -a "$OUT"

echo "== sparse (predictor-gated) =="
$PPX --sparse --capacity-groups "${CAP:-12}" $HS | sed 's/^/{"mode": "sparse", "out": /;s/$/}/' | tee -a "$OUT"
$PPX --sparse --capacity-groups "${CAP:-12}" --kl-divergence /tmp/qs_base.npz \
  | sed 's/^/{"mode": "sparse-kl", "out": /;s/$/}/' | tee -a "$OUT"

for HOT in ${HOTS:-8 16}; do
  echo "== tiered-drop hot=$HOT =="
  $PPX --hot-groups "$HOT" --cold-mode drop ${SPLIT:+--split "$SPLIT"} $HS \
    | sed "s/^/{\"mode\": \"tiered-drop-$HOT\", \"out\": /;s/\$/}/" | tee -a "$OUT"
  $PPX --hot-groups "$HOT" --cold-mode drop ${SPLIT:+--split "$SPLIT"} \
    --kl-divergence /tmp/qs_base.npz \
    | sed "s/^/{\"mode\": \"tiered-drop-$HOT-kl\", \"out\": /;s/\$/}/" | tee -a "$OUT"
done
