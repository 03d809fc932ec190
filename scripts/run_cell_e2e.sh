#!/usr/bin/env bash
# End-to-end pipeline for one experiment cell: train -> decode -> score ->
# efficiency -> interp, guarded by stage marker files so a requeued/restarted
# job skips finished stages (the TPU rendition of the reference's
# run_cell_e2e_4gpu.sh; no NCCL pinning or CUDA preflight needed — SPMD over
# the mesh replaces torchrun, and static shapes make memory deterministic).
#
# Usage: scripts/run_cell_e2e.sh <config.yaml> [exp_name]
set -euo pipefail
CONFIG="${1:?usage: run_cell_e2e.sh <config.yaml> [exp_name]}"
NAME="${2:-$(basename "$CONFIG" .yaml)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
EXP="$REPO/experiments/$NAME"
MARK="$EXP/markers"
mkdir -p "$MARK"

stage() {            # stage <name> <cmd...>: run once, marker-guarded
  local name="$1"; shift
  if [[ -f "$MARK/$name.done" ]]; then
    echo "[e2e] $name: already done, skipping"
    return 0
  fi
  echo "[e2e] $name: starting"
  "$@"
  touch "$MARK/$name.done"
  echo "[e2e] $name: done"
}

BEST_CKPT="$EXP/checkpoints/valid.wer.ave.ckpt"
[[ -f "$BEST_CKPT" ]] || BEST_CKPT="$EXP/checkpoints/valid.loss.ave.ckpt"
[[ -f "$BEST_CKPT" ]] || BEST_CKPT="$EXP/checkpoints/latest.ckpt"

stage train      python "$REPO/scripts/train.py" --config "$CONFIG" --resume auto
stage decode     python "$REPO/scripts/decode.py" --config "$CONFIG" \
                   --checkpoint "$BEST_CKPT"
stage score      python "$REPO/scripts/score_wer.py" \
                   --decode-dir "$EXP/decode" --config "$CONFIG"
stage efficiency python "$REPO/scripts/efficiency.py" --config "$CONFIG" \
                   --out "$EXP/efficiency.json"
stage interp_boundaries python "$REPO/scripts/run_interp.py" --config "$CONFIG" \
                   --checkpoint "$BEST_CKPT" --mode boundaries
echo "[e2e] pipeline complete: $EXP"
