#!/bin/bash
# =============================================================================
# Second-pass rescoring sweep (lambda x length-bonus gamma) over a CACHED
# n-best — decode once, re-rank many — TPU rendition of the reference
# launcher (reference: scripts/slurm/sweep_rescore_weight.sh).
#
# Usage: sweep_rescore_weight.sh <config.yaml> <checkpoint> [split] [read_out]
# Env:   HMASR_REPO, PYTHON
# =============================================================================

#SBATCH --job-name=hmasr_rescore_sweep
#SBATCH --cpus-per-task=16
#SBATCH --time=4:00:00

set -euo pipefail
CONFIG="${1:?usage: sweep_rescore_weight.sh <config.yaml> <ckpt> [split] [read_out]}"
CKPT="${2:?usage: sweep_rescore_weight.sh <config.yaml> <ckpt> [split] [read_out]}"
SPLIT="${3:-dev-clean}"
READOUT="${4:-joint}"
REPO="${HMASR_REPO:-$(cd "$(dirname "$0")/../.." && pwd)}"
PY="${PYTHON:-python}"
cd "$REPO"
echo "[$(date)] host=$(hostname) rescore sweep $READOUT on $SPLIT"

"$PY" scripts/analysis/sweep_rescore_weight.py --config "$CONFIG" \
  --checkpoint "$CKPT" --split "$SPLIT" --read-out "$READOUT"
echo "[$(date)] rescore sweep done"
