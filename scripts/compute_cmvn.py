#!/usr/bin/env python
"""Streaming fp64 global CMVN statistics over a manifest.

Usage:
    python scripts/compute_cmvn.py --manifest manifests/train-960.jsonl \
        --out data/cmvn.npz [--n-mels 80]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def run(argv=None) -> None:
    import numpy as np
    import jax.numpy as jnp

    from hnet_mamba_asr_tpu.data.audio import read_audio
    from hnet_mamba_asr_tpu.data.features import CMVNAccumulator
    from hnet_mamba_asr_tpu.data.manifests import load_manifest
    from hnet_mamba_asr_tpu.ops.melspec import log_mel_spectrogram
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-mels", type=int, default=80)
    args = ap.parse_args(argv)
    setup_logging("compute_cmvn")
    logger = get_logger("compute_cmvn")

    acc = CMVNAccumulator(n_mels=args.n_mels)
    entries = load_manifest(args.manifest)
    for i, e in enumerate(entries):
        wave, _ = read_audio(e["audio"])
        feats, flens = log_mel_spectrogram(jnp.asarray(wave[None].astype(np.float32)),
                                           n_mels=args.n_mels)
        acc.update(np.asarray(feats[0]), [int(flens[0])])
        if (i + 1) % 5000 == 0:
            logger.info("cmvn: %d/%d utterances", i + 1, len(entries))
    stats = acc.save(args.out)
    logger.info("mean[0:4]=%s std[0:4]=%s count=%d",
                stats["mean"][:4], stats["std"][:4], stats["count"])


if __name__ == "__main__":
    run()
