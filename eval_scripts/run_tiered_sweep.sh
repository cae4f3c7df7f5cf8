#!/usr/bin/env bash
# Tiered hot-fraction sweep on-chip (the reference's hbm-budget sweeps):
# tiered vs dense decode across hot fractions + miss trajectories.
set -euo pipefail
python bench.py tiered
