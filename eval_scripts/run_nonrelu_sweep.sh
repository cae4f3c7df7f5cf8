#!/usr/bin/env bash
# Activation-family sweep (the reference's non_relu_*.sh analogue):
# sparse-vs-dense across fatrelu/dReLU/relu archs incl. the
# sparseqwen2-style dReLU-qwen2 and ungated-relu families.
set -euo pipefail
python eval_scripts/nonrelu_sweep.py "$@"
