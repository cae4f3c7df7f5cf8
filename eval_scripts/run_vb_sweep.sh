#!/usr/bin/env bash
# HBM-budget sweep (the reference's vb_*.sh analogue): -vb GiB ->
# hot-group apportioning -> tiered decode t/s per budget vs dense.
set -euo pipefail
python eval_scripts/vb_sweep.py "$@"
