"""Run provenance: one JSON record capturing everything needed to reproduce a run.

Collects the resolved config, git state (commit/dirty/diff digest), environment
freeze (jax/flax/optax versions, device kind and count, hostname), determinism
inputs (seed, PRNG implementation), effective global-batch arithmetic, and
sha256 fingerprints of data artifacts (tokenizer model, CMVN stats, manifests).
Every collector is defensive — a provenance failure must never crash a run
(reference: src/dcasr/provenance.py keeps the same rule).
"""
from __future__ import annotations

import hashlib
import json
import os
import platform
import subprocess
import sys
import time
from pathlib import Path
from typing import Any, Mapping


def _safe(fn, default=None):
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 - by design: never crash the run
        return {"error": f"{type(e).__name__}: {e}"} if default is None else default


def git_info(repo_root: str | Path = ".") -> dict:
    def run(*args):
        return subprocess.run(["git", "-C", str(repo_root), *args],
                              capture_output=True, text=True, timeout=10).stdout.strip()

    def collect():
        commit = run("rev-parse", "HEAD")
        status = run("status", "--porcelain")
        info: dict[str, Any] = {"commit": commit, "dirty": bool(status)}
        if status:
            diff = run("diff")
            info["diff_sha256"] = hashlib.sha256(diff.encode()).hexdigest()[:16]
            info["n_dirty_files"] = len(status.splitlines())
        return info

    return _safe(collect)


def env_info() -> dict:
    def collect():
        info: dict[str, Any] = {
            "python": sys.version.split()[0],
            "platform": platform.platform(),
            "hostname": platform.node(),
            "argv": sys.argv,
        }
        try:
            import jax
            info["jax"] = jax.__version__
            devs = jax.devices()
            info["devices"] = {"count": len(devs),
                               "kind": devs[0].device_kind if devs else None,
                               "platform": devs[0].platform if devs else None}
            info["process_count"] = jax.process_count()
        except Exception as e:  # noqa: BLE001
            info["jax"] = f"unavailable: {e}"
        for mod in ("flax", "optax", "numpy"):
            try:
                info[mod] = __import__(mod).__version__
            except Exception:  # noqa: BLE001
                pass
        info["xla_flags"] = os.environ.get("XLA_FLAGS", "")
        return info

    return _safe(collect)


def batch_info(cfg: Mapping, n_devices: int = 1) -> dict:
    """Effective global-batch arithmetic: budget x accum x devices."""
    def collect():
        bins = int(cfg.get("batch_bins", 0))
        accum = int(cfg.get("accum_grad", 1))
        return {"batch_bins_per_device": bins, "accum_grad": accum,
                "n_devices": n_devices,
                "effective_global_frames": bins * accum * n_devices}

    return _safe(collect)


def fingerprint_file(path: str | Path) -> dict:
    def collect():
        p = Path(path)
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return {"path": str(p), "sha256": h.hexdigest(), "bytes": p.stat().st_size}

    return _safe(collect)


def collect_provenance(cfg: Mapping, *, repo_root: str | Path = ".",
                       n_devices: int = 1, seed: int | None = None,
                       artifacts: Mapping[str, str | Path] | None = None) -> dict:
    """The full provenance record (JSON-serializable)."""
    record = {
        "time": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "config": _safe(lambda: json.loads(json.dumps(dict(cfg), default=str)), {}),
        "git": git_info(repo_root),
        "env": env_info(),
        "batch": batch_info(cfg, n_devices),
        "seed": seed,
    }
    if artifacts:
        record["artifacts"] = {name: fingerprint_file(p)
                               for name, p in artifacts.items() if p}
    return record
