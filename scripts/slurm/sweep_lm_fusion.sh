#!/bin/bash
# =============================================================================
# Dev-only sweep of the first-pass LM-fusion weight (lambda) for the
# ctc_beam_lm cell on a RANDOM dev subset — TPU rendition of the reference
# launcher (reference: scripts/slurm/sweep_lm_fusion.sh; its rationale —
# never tune on the longest utterances — is inherited by the random-subset
# default of scripts/analysis/sweep_lm_fusion.py).
#
# Usage: sweep_lm_fusion.sh <config.yaml> <checkpoint> [split]
# Env:   HMASR_REPO, PYTHON, SWEEP_N (subset size, default 200)
# =============================================================================

#SBATCH --job-name=hmasr_lm_sweep
#SBATCH --cpus-per-task=16
#SBATCH --time=4:00:00

set -euo pipefail
CONFIG="${1:?usage: sweep_lm_fusion.sh <config.yaml> <checkpoint> [split]}"
CKPT="${2:?usage: sweep_lm_fusion.sh <config.yaml> <checkpoint> [split]}"
SPLIT="${3:-dev-clean}"
REPO="${HMASR_REPO:-$(cd "$(dirname "$0")/../.." && pwd)}"
PY="${PYTHON:-python}"
cd "$REPO"
echo "[$(date)] host=$(hostname) sweep lambda on $SPLIT"

"$PY" scripts/analysis/sweep_lm_fusion.py --config "$CONFIG" \
  --checkpoint "$CKPT" --split "$SPLIT" --n "${SWEEP_N:-200}"
echo "[$(date)] fusion sweep done"
