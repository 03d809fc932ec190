#!/usr/bin/env python
"""Train the BPE tokenizer on manifest transcripts, with round-trip check.

Usage:
    python scripts/build_tokenizer.py --manifests manifests/train-960.jsonl \
        --out data/bpe500 [--vocab-size 500]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def run(argv=None) -> None:
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifests", nargs="+", required=True)
    ap.add_argument("--out", required=True, help="model prefix (writes .model/.vocab)")
    ap.add_argument("--vocab-size", type=int, default=500)
    ap.add_argument("--no-hard-limit", action="store_true")
    args = ap.parse_args(argv)
    setup_logging("build_tokenizer")
    logger = get_logger("build_tokenizer")

    lines = []
    for m in args.manifests:
        with open(m) as f:
            lines.extend(json.loads(l)["text"] for l in f if l.strip())
    tok = Tokenizer.train(lines, args.out, vocab_size=args.vocab_size,
                          hard_vocab_limit=not args.no_hard_limit)
    # round-trip verification over a sample — a lossy tokenizer must not ship
    bad = 0
    for text in lines[:2000]:
        if tok.decode(tok.encode(text)) != " ".join(text.split()):
            bad += 1
    if bad:
        raise SystemExit(f"round-trip failed on {bad}/2000 sampled transcripts")
    logger.info("tokenizer OK: vocab=%d, round-trip clean on %d samples",
                tok.vocab_size, min(2000, len(lines)))


if __name__ == "__main__":
    run()
