#!/usr/bin/env python
"""Ad-hoc transcription: WAV files -> transcripts, no manifest required.

The manifest-driven eval path is scripts/decode.py; this is the user-facing
"just transcribe these files" CLI the reference lacks: it loads a trained
checkpoint, batches the given WAVs (lengths rounded up to a 1 s grid so a
handful of compiles covers arbitrary inputs), runs one decode cell, and
prints ``<file>\t<hyp>`` (optionally writing a JSONL).

Usage:
  python scripts/transcribe.py --config configs/typeA_small_N1.yaml \
      --checkpoint exp/.../best.ckpt [--cell ctc_greedy] [--batch-size 8] \
      [--out hyps.jsonl] a.wav b.wav ... [key=value overrides]
"""
import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

CELLS = {"ctc_greedy": ("ctc", "greedy"), "ctc_beam": ("ctc", "beam"),
         "aed_beam": ("aed", "beam"), "joint_beam": ("joint", "beam")}


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cell", default="ctc_greedy", choices=sorted(CELLS))
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default=None, help="write {id, hyp} JSONL here")
    ap.add_argument("paths_and_overrides", nargs="+",
                    help="WAV paths; trailing key=value tokens are config "
                         "overrides")
    return ap.parse_args(argv)


def run(args) -> list[dict]:
    wavs = [p for p in args.paths_and_overrides if "=" not in p]
    overrides = [p for p in args.paths_and_overrides if "=" in p]
    if not wavs:
        raise SystemExit("no WAV paths given")

    from hnet_mamba_asr_tpu.data.audio import read_wav
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import (decode_batch,
                                                      load_model_params)
    from hnet_mamba_asr_tpu.utils.config import load_config

    cfg = load_config(args.config, overrides)
    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    cmvn = build_cmvn(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=cmvn)
    params, _ = load_model_params(args.checkpoint)

    ro, search = CELLS[args.cell]
    if ro in ("ctc", "joint") and model.ctc is None:
        raise SystemExit(f"cell {args.cell} needs a CTC head (model_conf."
                         "ctc_weight > 0)")
    if ro in ("aed", "joint") and model.aed is None:
        raise SystemExit(f"cell {args.cell} needs an AED head (model_conf."
                         "aed_weight > 0)")
    cell = {"read_out": ro, "search": search, "lm": False, "name": args.cell}
    dc = dict(cfg.get("decode", {}) or {})

    sr_expect = int((cfg.get("frontend_conf") or {}).get("sample_rate", 16000))
    utts = []
    for p in wavs:
        wave, sr = read_wav(p)
        if sr != sr_expect:
            raise SystemExit(f"{p}: sample rate {sr} != model rate "
                             f"{sr_expect}; resample first "
                             "(data/audio.resample_poly)")
        utts.append((p, wave.astype(np.float32)))

    # longest-first batching + 1 s length grid -> few static shapes
    utts.sort(key=lambda t: -t[1].shape[0])
    records = []
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i:i + args.batch_size]
        S = max(w.shape[0] for _, w in chunk)
        S = ((S + sr_expect - 1) // sr_expect) * sr_expect     # 1 s grid
        wave = np.zeros((len(chunk), S), np.float32)
        lens = np.zeros(len(chunk), np.int32)
        for j, (_, w) in enumerate(chunk):
            wave[j, :w.shape[0]] = w
            lens[j] = w.shape[0]
        batch = {"ids": [p for p, _ in chunk], "wave": wave,
                 "wave_lens": lens, "row_mask": np.ones(len(chunk), bool),
                 # no references in ad-hoc mode: decode_batch's record
                 # builder reads tokens/token_lens, so give empty rows
                 "tokens": np.zeros((len(chunk), 1), np.int32),
                 "token_lens": np.zeros(len(chunk), np.int32)}
        records.extend(decode_batch(model, params, tokenizer, batch, cell, dc))
    by_id = {r["id"]: r for r in records}
    return [by_id[p] for p in wavs]                   # original order


def main(argv=None):
    args = parse_args(argv)
    records = run(args)
    for r in records:
        print(f"{r['id']}\t{r['hyp']}")
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps({"id": r["id"], "hyp": r["hyp"]}) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
