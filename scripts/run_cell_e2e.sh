#!/usr/bin/env bash
# End-to-end pipeline for one experiment cell: train -> decode (per split) ->
# score -> efficiency -> interp, guarded by stage markers so a requeued or
# restarted job skips finished stages. TPU rendition of the reference's
# run_cell_e2e_4gpu.sh with its preemption machinery kept and its CUDA-era
# parts retired (no NCCL pinning; SPMD replaces torchrun; static shapes make
# memory deterministic):
#
#   - USR1/TERM drain: SIGTERM the live training process (never a pattern
#     kill), wait bounded, escalate to KILL — a requeued job must never start
#     a second writer while the old one is alive (the reference documents a
#     dual-writer incident that co-wrote metrics.jsonl for ~18 min).
#   - Requeue: `scontrol requeue` under SLURM; outside SLURM exit 75
#     (EX_TEMPFAIL) so a supervising loop can relaunch.
#   - Bounded restarts: SLURM_RESTART_COUNT or a local counter under the
#     marker dir; gives up past MAX_RESTARTS.
#   - Device preflight: jax must actually initialize a backend (the analog of
#     the reference's "nvidia-smi can lie" torch preflight); bad node =>
#     requeue, bounded.
#   - Writer-integrity check before marking train done: within each segment
#     between explicit resume markers, metrics.jsonl steps must be
#     non-decreasing and train-step records must be strictly increasing (a
#     duplicate train step inside one segment = two concurrent writers); the
#     checkpoint must load.
#
# Usage: scripts/run_cell_e2e.sh <config.yaml> [exp_name]
# Env:   MAX_RESTARTS (default 5), E2E_SPLITS (default from config eval_splits)
set -uo pipefail
CONFIG="${1:?usage: run_cell_e2e.sh <config.yaml> [exp_name]}"
NAME="${2:-$(basename "$CONFIG" .yaml)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
EXP="${EXP_DIR:-$REPO/experiments/$NAME}"
MARK="$EXP/markers"
MAX_RESTARTS="${MAX_RESTARTS:-5}"
PY="${PYTHON:-python}"
mkdir -p "$MARK"

plog() { echo "[$(date '+%F %T')] $*" | tee -a "$MARK/pipeline.log"; }

# ── restart accounting (SLURM_RESTART_COUNT when present, else local file) ───
if [[ -n "${SLURM_RESTART_COUNT:-}" ]]; then
  RESTARTS="$SLURM_RESTART_COUNT"
else
  RESTARTS=$(cat "$MARK/restarts" 2>/dev/null || echo 0)
  echo $((RESTARTS + 1)) > "$MARK/restarts"
fi
plog "attempt start: restarts=$RESTARTS host=$(hostname) job=${SLURM_JOB_ID:-local}"
if [[ "$RESTARTS" -gt "$MAX_RESTARTS" ]]; then
  plog "restart budget exhausted ($RESTARTS > $MAX_RESTARTS) — giving up"
  exit 1
fi

requeue_self() {
  if [[ -n "${SLURM_JOB_ID:-}" ]]; then
    for _try in 1 2 3; do
      scontrol requeue "$SLURM_JOB_ID" && exit 0
      plog "scontrol requeue failed (attempt $_try), retrying"
      sleep 15
    done
    plog "WARNING: requeue failed 3x — chain broken, resubmit manually"
    exit 1
  fi
  plog "no SLURM: exiting 75 (EX_TEMPFAIL) for the supervising loop"
  exit 75
}

TRAIN_PID=""
drain() {
  plog "preemption signal — draining training before requeue"
  # kill the trainer's whole PROCESS GROUP by PID (never a pattern kill): an
  # orphaned worker surviving the parent is exactly the dual-writer incident
  # the reference documents. Checkpoints are epoch-boundary atomic, so a
  # clean TERM loses at most the in-flight epoch, which --resume auto redoes.
  if [[ -n "$TRAIN_PID" ]] && kill -0 "$TRAIN_PID" 2>/dev/null; then
    kill -TERM -- "-$TRAIN_PID" 2>/dev/null || kill -TERM "$TRAIN_PID" 2>/dev/null
    for _i in $(seq 1 20); do
      kill -0 "$TRAIN_PID" 2>/dev/null || break
      sleep 3
    done
    kill -KILL -- "-$TRAIN_PID" 2>/dev/null || kill -KILL "$TRAIN_PID" 2>/dev/null
    wait "$TRAIN_PID" 2>/dev/null || true
  fi
  plog "training drained; requeueing"
  requeue_self
}
trap drain USR1 TERM

stage_done() { [[ -f "$MARK/$1.done" ]]; }
mark_done()  { touch "$MARK/$1.done"; plog "STAGE $1 DONE"; }

# ── device preflight: the backend must really initialize ─────────────────────
# Bounded: a wedged accelerator transport can leave jax.devices() hanging
# forever (observed on a remote-attached TPU relay) — a hang here must count
# as a failed node and requeue, same as an init error.
PREFLIGHT_TIMEOUT="${PREFLIGHT_TIMEOUT:-120}"
if ! stage_done preflight_ok; then
  if ! timeout "$PREFLIGHT_TIMEOUT" "$PY" -c "import jax; n = len(jax.devices()); print(f'preflight: jax sees {n} device(s)'); raise SystemExit(0 if n >= 1 else 1)"; then
    plog "PREFLIGHT FAILED on $(hostname): jax cannot initialize a backend (or hung ${PREFLIGHT_TIMEOUT}s)"
    requeue_self
  fi
  mark_done preflight_ok
fi

# ── 1) TRAIN (background so the trap can drain it; --resume auto chains) ─────
if ! stage_done train; then
  plog "STAGE train"
  # setsid makes the trainer its own process group so drain can kill the
  # whole tree (workers included) without pattern-matching process names
  if command -v setsid >/dev/null; then
    setsid "$PY" "$REPO/scripts/train.py" --config "$CONFIG" --exp-dir "$EXP" \
      --resume auto &
  else
    "$PY" "$REPO/scripts/train.py" --config "$CONFIG" --exp-dir "$EXP" \
      --resume auto &
  fi
  TRAIN_PID=$!
  wait "$TRAIN_PID"; E=$?
  TRAIN_PID=""
  if [[ "$E" -ne 0 ]]; then plog "TRAIN_EXIT=$E"; exit "$E"; fi
  # writer-integrity verification before the marker: per resume-marker
  # segment, steps monotone AND train-step records strictly increasing (two
  # writers logging the same step in lockstep is the dual-writer symptom);
  # checkpoint loadable
  if ! "$PY" - "$EXP" "$REPO" <<'VERIFY'
import json, sys
from pathlib import Path
exp = Path(sys.argv[1])
sys.path.insert(0, sys.argv[2])
rows = [json.loads(l) for l in
        (exp / "metrics.jsonl").read_text().splitlines() if l.strip()]
segments, seg = [], []
for r in rows:
    if r.get("event") == "resume":   # resumed runs may re-log recent steps
        segments.append(seg); seg = []
    else:
        seg.append(r)
segments.append(seg)
n_steps = 0
for si, seg in enumerate(segments):
    steps = [r["step"] for r in seg]
    n_steps += len(steps)
    bad = [i for i in range(1, len(steps)) if steps[i] < steps[i - 1]]
    assert not bad, (
        f"segment {si}: steps jump backwards at rows {bad[:5]} (dual writer?)")
    tr = [r["step"] for r in seg if "loss/total" in r]
    dup = [i for i in range(1, len(tr)) if tr[i] <= tr[i - 1]]
    assert not dup, (
        f"segment {si}: duplicate train step at {[tr[i] for i in dup[:5]]} "
        f"with no resume marker — two concurrent writers?")
assert n_steps, "no metrics written"
from hnet_mamba_asr_tpu.training.checkpoint import load_checkpoint  # noqa: E402
state = load_checkpoint(exp / "checkpoints" / "latest.ckpt")
assert "params" in state and "global_step" in state
print(f"train verified: {n_steps} metric rows across {len(segments)} "
      f"segment(s), step {state['global_step']}")
VERIFY
  then
    plog "TRAIN VERIFY FAILED — not marking done"
    exit 1
  fi
  mark_done train
fi

BEST_CKPT="$EXP/checkpoints/valid.wer.ave.ckpt"
[[ -f "$BEST_CKPT" ]] || BEST_CKPT="$EXP/checkpoints/valid.loss.ave.ckpt"
[[ -f "$BEST_CKPT" ]] || BEST_CKPT="$EXP/checkpoints/latest.ckpt"

# ── 2) DECODE: one marker per split so requeue resumes mid-matrix ────────────
SPLITS="${E2E_SPLITS:-$("$PY" - "$CONFIG" "$REPO" <<'SPL'
import sys
sys.path.insert(0, sys.argv[2])
from hnet_mamba_asr_tpu.utils.config import load_yaml
cfg = load_yaml(sys.argv[1])
print(" ".join((cfg.get("data", {}) or {}).get("eval_splits", ["test-clean"])))
SPL
)}"
for SPLIT in $SPLITS; do
  if ! stage_done "decode_$SPLIT"; then
    plog "STAGE decode_$SPLIT"
    "$PY" "$REPO/scripts/decode.py" --config "$CONFIG" \
      --checkpoint "$BEST_CKPT" --splits "$SPLIT" \
      --out-dir "$EXP/decode" || exit $?
    mark_done "decode_$SPLIT"
  fi
done

stage() {            # stage <name> <cmd...>: run once, marker-guarded
  local name="$1"; shift
  if stage_done "$name"; then
    plog "STAGE $name: already done, skipping"
    return 0
  fi
  plog "STAGE $name: starting"
  "$@" || exit $?
  mark_done "$name"
}

stage score      "$PY" "$REPO/scripts/score_wer.py" \
                   --decode-dir "$EXP/decode" --config "$CONFIG"
stage efficiency "$PY" "$REPO/scripts/efficiency.py" --config "$CONFIG" \
                   --out "$EXP/efficiency.json"
stage interp_boundaries "$PY" "$REPO/scripts/run_interp.py" --config "$CONFIG" \
                   --checkpoint "$BEST_CKPT" --mode boundaries
plog "pipeline complete: $EXP"
