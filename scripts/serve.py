#!/usr/bin/env python
"""Serve an exported ASR artifact over HTTP with micro-batching.

Thin CLI over hnet_mamba_asr_tpu/serving/server.py (which is itself
self-contained — on a deployment host without the repo, run
``python server.py <artifact_dir>`` with runtime.py alongside instead).

Usage:
  python scripts/serve.py <artifact_dir> [--port 8000] [--max-wait-ms 20]
"""
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from hnet_mamba_asr_tpu.serving.server import main  # noqa: E402

if __name__ == "__main__":
    main()
