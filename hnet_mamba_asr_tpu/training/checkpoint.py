"""Checkpointing: atomic pickle of numpy-ified pytrees + selection utilities.

State = params + optimizer state + step/epoch + metric history + config + the
base PRNG seed. There is deliberately NO host-RNG state to capture: every
stochastic element (SpecAugment, dropout, sampler shuffles) is a pure function
of (seed, epoch, index | step), so restoring the integers restores the exact
stream — the TPU-side simplification of the reference's python/numpy/torch/
cuda RNG snapshots (reference: src/dcasr/training/trainer.py:62-73,515-519).

Files: epoch%04d.ckpt + latest.ckpt (atomic tmp + os.replace), best symlinks
{phase}.{metric}.best.ckpt, fp32 n-best averages {phase}.{metric}.ave.ckpt.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), jax.device_get(tree))


def save_checkpoint(path: str | Path, state: dict) -> None:
    """Atomic write: serialize to tmp, fsync, rename."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = dict(state)
    for key in ("params", "opt_state"):
        if key in payload:
            payload[key] = _to_host(payload[key])
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def average_checkpoints(paths: list[str | Path]) -> dict:
    """fp32 parameter average of several checkpoints -> {"params", "averaged"}."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc = None
    for p in paths:
        params = load_checkpoint(p)["params"]
        as32 = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
        acc = as32 if acc is None else jax.tree_util.tree_map(np.add, acc, as32)
    avg = jax.tree_util.tree_map(lambda x: x / len(paths), acc)
    return {"params": avg, "averaged": [str(p) for p in paths]}


def update_best_symlink(ckpt_dir: Path, phase: str, metric: str, epoch: int) -> None:
    link = ckpt_dir / f"{phase}.{metric}.best.ckpt"
    if link.exists() or link.is_symlink():
        link.unlink()
    link.symlink_to(f"epoch{epoch:04d}.ckpt")


def resolve_resume(ckpt_dir: Path, resume) -> Path | None:
    """'auto' -> latest (or newest epoch file); explicit missing path raises —
    a typo must never silently fresh-start a long run."""
    if resume in (None, "", False):
        return None
    if resume == "auto":
        latest = ckpt_dir / "latest.ckpt"
        if latest.exists():
            return latest
        epochs = sorted(ckpt_dir.glob("epoch*.ckpt"))
        return epochs[-1] if epochs else None
    p = Path(resume)
    if not p.exists():
        raise FileNotFoundError(f"--resume checkpoint not found: {p}")
    return p
