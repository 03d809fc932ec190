"""Preemption machinery of scripts/run_cell_e2e.sh: USR1 drains the live
training process by PID and exits 75 (EX_TEMPFAIL) outside SLURM; a relaunch
resumes mid-pipeline via markers; the writer-integrity check blocks the train
marker on backward step jumps; the restart budget bounds the chain.

The heavy stages are stubbed through $PYTHON dispatch (the script's own
extension point) — stage INTEGRATION on real models is tests/test_scripts_e2e
and test_overfit_gate; this file tests the requeue choreography, which the
reference exercised operationally on SLURM (reference:
scripts/slurm/run_cell_e2e_4gpu.sh USR1 trap / preflight / bounded restarts)."""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "run_cell_e2e.sh"


def _write_stub(root: Path, train_mode: str) -> Path:
    """A $PYTHON stub: passes '-'/'-c' through to the real interpreter,
    fakes the stage scripts. train_mode: 'hang' (write state then sleep),
    'finish' (write state, exit 0), 'dual_writer' (backward step jump)."""
    stub = root / "pystub"
    state_writer = (
        f"import sys; sys.path.insert(0, {str(REPO)!r}); "
        "import json; from pathlib import Path; "
        "from hnet_mamba_asr_tpu.training.checkpoint import save_checkpoint; "
        "exp = Path(sys.argv[1]); exp.mkdir(parents=True, exist_ok=True); "
        "(exp / 'checkpoints').mkdir(exist_ok=True); "
        "steps = [0, 1, 2, 1] if sys.argv[2] == 'dual_writer' else [0, 1, 2]; "
        "(exp / 'metrics.jsonl').write_text("
        "'\\n'.join(json.dumps({'step': s, 'loss/total': 1.0}) for s in steps) + '\\n'); "
        "save_checkpoint(exp / 'checkpoints' / 'latest.ckpt', "
        "{'params': {'w': [1.0]}, 'opt_state': {}, 'epoch': 0, "
        "'global_step': steps[-1], 'metric_history': {}, 'config': {}, 'seed': 0})"
    )
    stub.write_text(f"""#!/usr/bin/env bash
real={sys.executable}
case "$1" in
  -|-c) exec "$real" "$@" ;;
esac
name=$(basename "$1")
case "$name" in
  train.py)
    exp=""
    prev=""
    for a in "$@"; do [[ "$prev" == "--exp-dir" ]] && exp="$a"; prev="$a"; done
    "$real" -c {state_writer!r} "$exp" "{train_mode}"
    if [[ "{train_mode}" == hang ]]; then sleep 300; fi
    exit 0 ;;
  decode.py|score_wer.py|efficiency.py|run_interp.py)
    echo "stub $name ok"; exit 0 ;;
esac
exit 0
""")
    stub.chmod(0o755)
    return stub


def _cfg(root: Path) -> Path:
    cfg = root / "cfg.yaml"
    cfg.write_text("experiment: {name: pre}\n"
                   "data: {eval_splits: [test-clean]}\n")
    return cfg


def _run(cfg, exp, stub, extra_env=None, timeout=150):
    env = dict(os.environ, PYTHON=str(stub), EXP_DIR=str(exp),
               JAX_PLATFORMS="cpu",   # preflight must not need the real chip
               PALLAS_AXON_POOL_IPS="")  # ...nor the relay (a wedged tunnel
                                         # blocks `import jax` in sitecustomize)
    env.pop("SLURM_JOB_ID", None)
    env.pop("SLURM_RESTART_COUNT", None)
    env.update(extra_env or {})
    return subprocess.run(["bash", str(SCRIPT), str(cfg), "pre"],
                          capture_output=True, text=True, env=env,
                          timeout=timeout)


def test_usr1_drains_and_exits_tempfail(tmp_path):
    stub = _write_stub(tmp_path, "hang")
    cfg = _cfg(tmp_path)
    exp = tmp_path / "exp"
    env = dict(os.environ, PYTHON=str(stub), EXP_DIR=str(exp),
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("SLURM_JOB_ID", None)
    proc = subprocess.Popen(["bash", str(SCRIPT), str(cfg), "pre"],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, env=env)
    # wait for training to be live (the stub writes metrics first)
    ckpt = exp / "checkpoints" / "latest.ckpt"
    deadline = time.time() + 150
    while time.time() < deadline and not ckpt.exists():
        time.sleep(0.3)
    assert ckpt.exists(), "stub train never started"
    time.sleep(1.0)
    proc.send_signal(signal.SIGUSR1)
    out, _ = proc.communicate(timeout=180)
    assert proc.returncode == 75, out           # EX_TEMPFAIL outside SLURM
    assert "draining training" in out
    assert not (exp / "markers" / "train.done").exists(), \
        "preempted train must not be marked done"
    log = (exp / "markers" / "pipeline.log").read_text()
    assert "requeueing" in log


def test_relaunch_resumes_and_completes(tmp_path):
    """After a preemption, a fresh launch finishes every stage and a THIRD
    launch skips them all via markers."""
    stub_hang = _write_stub(tmp_path, "hang")
    cfg = _cfg(tmp_path)
    exp = tmp_path / "exp"
    env = dict(os.environ, PYTHON=str(stub_hang), EXP_DIR=str(exp),
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("SLURM_JOB_ID", None)
    proc = subprocess.Popen(["bash", str(SCRIPT), str(cfg), "pre"],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, env=env)
    ckpt = exp / "checkpoints" / "latest.ckpt"
    deadline = time.time() + 150
    while time.time() < deadline and not ckpt.exists():
        time.sleep(0.3)
    time.sleep(1.0)
    proc.send_signal(signal.SIGUSR1)
    proc.communicate(timeout=180)

    stub_ok = _write_stub(tmp_path, "finish")
    r = _run(cfg, exp, stub_ok)
    assert r.returncode == 0, r.stdout + r.stderr
    marks = {p.name for p in (exp / "markers").glob("*.done")}
    assert {"preflight_ok.done", "train.done", "decode_test-clean.done",
            "score.done", "efficiency.done", "interp_boundaries.done"} <= marks
    r2 = _run(cfg, exp, stub_ok)
    assert r2.returncode == 0
    assert r2.stdout.count("already done") + r2.stdout.count("DONE") >= 1
    assert "STAGE train\n" not in r2.stdout      # train not re-run


def test_dual_writer_symptom_blocks_marker(tmp_path):
    """Backward step jumps in metrics.jsonl (the dual-writer incident) must
    fail the verify step and leave train unmarked."""
    stub = _write_stub(tmp_path, "dual_writer")
    cfg = _cfg(tmp_path)
    exp = tmp_path / "exp"
    r = _run(cfg, exp, stub)
    assert r.returncode != 0
    assert not (exp / "markers" / "train.done").exists()
    assert "jump backwards" in r.stdout + r.stderr


def test_restart_budget_bounds_chain(tmp_path):
    stub = _write_stub(tmp_path, "finish")
    cfg = _cfg(tmp_path)
    exp = tmp_path / "exp"
    (exp / "markers").mkdir(parents=True)
    (exp / "markers" / "restarts").write_text("99")
    r = _run(cfg, exp, stub, extra_env={"MAX_RESTARTS": "5"})
    assert r.returncode == 1
    assert "restart budget exhausted" in r.stdout