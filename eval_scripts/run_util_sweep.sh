#!/usr/bin/env bash
# Chip-utilization sweep (the reference's gpu_util_*.sh analogue):
# achieved HBM bandwidth per decode mode vs peak, from bench.py t/s and
# the calibrated byte model.
set -euo pipefail
SIZE="${1:-}"
python bench.py ${SIZE} 2>&1 | python eval_scripts/chip_util.py
python bench.py tiered ${SIZE} 2>&1 | python eval_scripts/chip_util.py
