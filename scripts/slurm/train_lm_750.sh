#!/bin/bash
# =============================================================================
# External Transformer LM, 750-vocab ablation arm — TPU rendition of the
# reference launcher (reference: scripts/slurm/train_lm_750.sh).
#
# The reference uses torchrun x2 GPUs; here ONE process per TPU host joins the
# job via jax.distributed (scripts/train_lm.py calls maybe_init_distributed —
# on Cloud TPU pods the env is auto-detected; for manual launches set
# JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Batching is
# token-budget (exact-length packing = hard memory bound), epoch-resumable
# (--resume auto survives preemption/requeue).
#
# Site knobs come from the environment, not hardcoded paths:
#   HMASR_REPO (default: this script's repo), HMASR_LOGDIR, PYTHON
# =============================================================================

#SBATCH --job-name=hmasr_lm750
#SBATCH --cpus-per-task=16
#SBATCH --time=36:00:00
#SBATCH --requeue

set -euo pipefail
REPO="${HMASR_REPO:-$(cd "$(dirname "$0")/../.." && pwd)}"
PY="${PYTHON:-python}"
cd "$REPO"
echo "[$(date)] host=$(hostname) repo=$REPO"

"$PY" scripts/train_lm.py --config configs/lm_transformer_750.yaml --resume auto
echo "[$(date)] lm750 training done"
