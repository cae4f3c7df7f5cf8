#!/usr/bin/env bash
# KV-cache dtype sweep (parity: -ctk/-ctv matrices): decode t/s + memory
# for bf16 vs int8 KV.
set -euo pipefail
MODEL=${1:?usage: run_kv_dtype_sweep.sh MODEL.gguf}
for KV in bf16 int8; do
  echo "== kv=$KV =="
  python -m sparkinfer_tpu.tools.bench_matrix -m "$MODEL" --kv-dtype "$KV" \
    -n "${N:-128}" || true
done
