#!/usr/bin/env python
"""Analytic params + GFLOPs report for a config.

Usage:
    python scripts/efficiency.py --config <yaml> [--audio-seconds 10]
        [--kept-fractions 0.5 ...] [--out <json>] [key=value ...]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--audio-seconds", type=float, default=10.0)
    ap.add_argument("--kept-fractions", type=float, nargs="*", default=None)
    ap.add_argument("--vocab-size", type=int, default=None,
                    help="default: the config's tokenizer vocab")
    ap.add_argument("--out", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    from hnet_mamba_asr_tpu.eval.efficiency import efficiency_report, format_efficiency
    from hnet_mamba_asr_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    vocab = args.vocab_size
    if vocab is None:
        from hnet_mamba_asr_tpu.tasks.build import build_tokenizer
        vocab = build_tokenizer(cfg, REPO_ROOT).vocab_size
    report = efficiency_report(cfg, vocab, audio_seconds=args.audio_seconds,
                               kept_fractions=args.kept_fractions)
    print(format_efficiency(report))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    run(parse_args())
