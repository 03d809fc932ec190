"""Numeric metrics sink: TensorBoard + append-only JSONL + atomic summary.json.

Process-0-only (non-main processes get a no-op instance), preemption-safe:
every JSONL record is flushed as written, summary.json is written atomically
via tmp+rename, and a resumed run appends while a fresh run truncates and
clears stale TensorBoard event files. Mirrors the channel layout of the
reference (reference: src/dcasr/metrics_logger.py) so downstream tooling
(emergence curves, run dashboards) reads the same files.
"""
from __future__ import annotations

import json
import math
import os
import time
from pathlib import Path

from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


def _tb_writer(log_dir: Path):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(str(log_dir))
    except Exception:  # pragma: no cover - TB optional
        return None


class MetricsLogger:
    """TB + metrics.jsonl + summary.json under ``run_dir``.

    ``is_main=False`` returns a functional no-op (all methods safe to call);
    this maps the reference's rank-0-only logging onto jax.process_index()==0.
    """

    def __init__(self, run_dir: str | os.PathLike, resume: bool = False,
                 is_main: bool = True, tensorboard: bool = True):
        self.is_main = is_main
        self.run_dir = Path(run_dir)
        self._jsonl = None
        self._tb = None
        self._summary: dict = {}
        if not is_main:
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        jsonl_path = self.run_dir / "metrics.jsonl"
        summary_path = self.run_dir / "summary.json"
        if resume and summary_path.exists():
            try:
                self._summary = json.loads(summary_path.read_text())
            except json.JSONDecodeError:
                self._summary = {}
        if not resume:
            # fresh run: truncate the JSONL and clear stale TB event files
            jsonl_path.write_text("")
            for ev in self.run_dir.glob("events.out.tfevents.*"):
                ev.unlink(missing_ok=True)
        self._jsonl = open(jsonl_path, "a")
        if resume and jsonl_path.stat().st_size:
            # Explicit resume marker: a resumed run may legitimately re-log
            # steps since the last checkpoint, so writer-integrity checks
            # (run_cell_e2e.sh) only require monotone steps WITHIN a segment
            # between markers. Without the marker, a step collision can only
            # mean two concurrent writers.
            self._jsonl.write(json.dumps({"event": "resume",
                                          "time": time.time()}) + "\n")
            self._jsonl.flush()
        if tensorboard:
            self._tb = _tb_writer(self.run_dir)

    # ---- scalars -------------------------------------------------------------
    def log_scalar(self, key: str, value: float, step: int, **meta) -> None:
        self.log_scalars({key: value}, step, **meta)

    def log_scalars(self, payload: dict, step: int, **meta) -> None:
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time(), **meta,
               **{k: _scalarize(v) for k, v in payload.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()                      # flushed per record: preemption-safe
        if self._tb is not None:
            for k, v in payload.items():
                v = _scalarize(v)
                if isinstance(v, (int, float)) and math.isfinite(v):
                    self._tb.add_scalar(k, v, int(step))

    def log_histogram(self, key: str, values, step: int) -> None:
        """Histogram to TB + summary stats to JSONL."""
        if not self.is_main:
            return
        import numpy as np
        arr = np.asarray(values, dtype=float).ravel()
        if arr.size == 0:
            return
        stats = {f"{key}/mean": float(arr.mean()), f"{key}/std": float(arr.std()),
                 f"{key}/min": float(arr.min()), f"{key}/max": float(arr.max()),
                 f"{key}/n": int(arr.size)}
        self.log_scalars(stats, step)
        if self._tb is not None:
            self._tb.add_histogram(key, arr, int(step))

    # ---- summary -------------------------------------------------------------
    def update_summary(self, **kv) -> None:
        if not self.is_main:
            return
        self._summary.update({k: _scalarize(v) for k, v in kv.items()})
        self._write_summary()

    def append_summary(self, key: str, record) -> None:
        """Append ``record`` to a list-valued summary key (accumulates across resumes)."""
        if not self.is_main:
            return
        self._summary.setdefault(key, []).append(record)
        self._write_summary()

    def _write_summary(self) -> None:
        path = self.run_dir / "summary.json"
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self._summary, indent=2, default=str))
        os.replace(tmp, path)                    # atomic: readers never see a torn file

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def _scalarize(v):
    """jax/numpy scalar -> python float/int; passthrough otherwise."""
    try:
        import numpy as np
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            v = v.item()
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, (np.integer,)):
            return int(v)
    except Exception:
        pass
    return v
