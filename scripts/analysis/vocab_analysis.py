#!/usr/bin/env python
"""Data-driven BPE vocabulary-size analysis.

Justifies the tokenizer vocab size V from transcripts using three bounds:
  (1) frequency floor — largest V before pieces go under-trained (singletons)
  (2) CTC length margin — tokens/utterance vs encoder frames at 25 Hz
  (3) fertility — tokens/word trend (diminishing returns)

Trains a BPE model per candidate V on the manifest transcripts, measures each,
prints a table + the defensible window. Analysis tool, not the production
tokenizer. (Reference counterpart: scripts/analysis/vocab_analysis.py.)

Usage:
    python scripts/analysis/vocab_analysis.py --manifest manifests/train-960.jsonl \
        [--candidates 128 256 500 750 1000] [--min-count 100]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from collections import Counter
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

SR = 16000
ENC_HZ = 25.0
WIN, HOP = 400, 160


def run(argv=None) -> None:
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--candidates", type=int, nargs="*",
                    default=[128, 256, 500, 750, 1000, 2000])
    ap.add_argument("--min-count", type=int, default=100,
                    help="a piece is well-trained if seen >= this many times")
    ap.add_argument("--sample", type=int, default=12000,
                    help="utterances sampled for token/duration stats")
    args = ap.parse_args(argv)

    with open(args.manifest) as f:
        entries = [json.loads(l) for l in f if l.strip()]
    texts = [e["text"] for e in entries]
    sample = entries[:args.sample]

    print(f"{'V':>6}{'pieces<min':>12}{'tok/utt p95':>13}{'min margin':>12}"
          f"{'fertility':>11}")
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for v in args.candidates:
            try:
                tok = Tokenizer.train(texts, Path(td) / f"v{v}", vocab_size=v,
                                      hard_vocab_limit=False)
            except ValueError as e:
                print(f"{v:>6}  unreachable ({e})")
                continue
            piece_counts: Counter = Counter()
            tok_per_utt, margins, fert_n, fert_d = [], [], 0, 0
            for e in sample:
                ids = tok.encode(e["text"])
                piece_counts.update(ids)
                tok_per_utt.append(len(ids))
                frames_100 = max(0, 1 + (e["frames"] - WIN) // HOP)
                enc_frames = max(((frames_100 - 1) // 2 - 1) // 2, 0)
                margins.append(enc_frames - len(ids))
                fert_n += len(ids)
                fert_d += len(e["text"].split())
            rare = sum(1 for p in range(4, tok.vocab_size)
                       if piece_counts.get(p, 0) < args.min_count)
            tok_sorted = sorted(tok_per_utt)
            p95 = tok_sorted[int(0.95 * len(tok_sorted))] if tok_sorted else 0
            row = {"V": tok.vocab_size, "under_trained": rare,
                   "tok_per_utt_p95": p95, "min_ctc_margin": min(margins, default=0),
                   "fertility": fert_n / max(1, fert_d)}
            rows.append(row)
            print(f"{row['V']:>6}{rare:>12}{p95:>13}{row['min_ctc_margin']:>12}"
                  f"{row['fertility']:>11.3f}")
    ok = [r for r in rows if r["min_ctc_margin"] > 0 and
          r["under_trained"] < 0.2 * r["V"]]
    if ok:
        print(f"\ndefensible window: V in [{ok[0]['V']}, {ok[-1]['V']}] "
              "(positive CTC margin, <20% under-trained pieces)")


if __name__ == "__main__":
    run()
