#!/usr/bin/env python
"""Dev-only sweep of the first-pass LM shallow-fusion weight for ctc_beam_lm.

CTC is nearly language-blind per frame, so first-pass fusion adds real
information there (unlike the AED side, where the internal LM double-counts
the prior — that side tunes via sweep_rescore_weight.py). This sweeps
``lm_weight`` (lambda) for the CTC prefix beam on a seeded RANDOM dev subset:
sampling matters — tuning on the longest utterances overstates truncation and
over-generates on typical audio. Never tune on a test split.
(Reference counterpart: scripts/analysis/sweep_lm_fusion.py.)

Usage:
    python scripts/analysis/sweep_lm_fusion.py --config <yaml> \
        --checkpoint <ckpt> [--split dev-clean] [--n 200] \
        [--lambdas 0 0.1 0.2 0.3 0.5]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="dev-clean")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--lambdas", type=float, nargs="*",
                    default=[0.0, 0.1, 0.2, 0.3, 0.4, 0.5])
    ap.add_argument("--out", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
    from hnet_mamba_asr_tpu.data.manifests import load_manifest
    from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search
    from hnet_mamba_asr_tpu.eval.metrics import word_errors
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import load_lm_scorer, load_model_params
    from hnet_mamba_asr_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    dc = cfg.get("decode", {}) or {}
    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=build_cmvn(cfg, REPO_ROOT))
    params, _ = load_model_params(args.checkpoint)
    lm = load_lm_scorer(dc, REPO_ROOT, tokenizer)
    beam = int(dc.get("beam_size", 10))
    pre = int(dc.get("pre_beam", 30))

    mdir = REPO_ROOT / (cfg.get("data", {}) or {}).get("manifests_dir", "manifests")
    entries = load_manifest(mdir / f"{args.split}.jsonl")
    random.Random(args.seed).shuffle(entries)            # RANDOM subset, not longest
    entries = sorted(entries[:args.n], key=lambda e: e["id"])
    ds = ASRDataset(entries, tokenizer, augment=False)
    loader, _ = make_dataloader(ds, int(dc.get("batch_bins",
                                               cfg.get("batch_bins", 32000))))

    # one encoder pass caches CTC log-probs; the lambda sweep re-runs only the
    # cheap host-side prefix beam
    cached = []                                          # (ref, logp [T, V+1])
    for batch in loader:
        ids = batch.pop("ids")
        logp = np.asarray(model.ctc.apply(
            {"params": params["ctc"]},
            model.encode(params, batch, train=False).features,
            method="log_probs"))
        enc_lens = np.asarray(model.encode(params, batch, train=False).lengths)
        tokens = np.asarray(batch["tokens"])
        tlens = np.asarray(batch["token_lens"])
        for i in range(len(ids)):
            ref = tokenizer.decode(tokens[i, :tlens[i]].tolist())
            cached.append((ref, logp[i, :enc_lens[i]]))

    results = {"split": args.split, "n_utts": len(cached), "grid": []}
    for lam in args.lambdas:
        edits = words = 0
        for ref, lp in cached:
            hyp_ids = ctc_prefix_beam_search(
                lp[None], [lp.shape[0]], blank_id=tokenizer.blank_id,
                beam_size=beam, pre_beam=pre,
                lm=lm if lam > 0 else None, lm_weight=lam)[0]
            e, w = word_errors(tokenizer.decode(hyp_ids), ref)
            edits += e
            words += w
        results["grid"].append({"lambda": lam,
                                "wer": round(100.0 * edits / max(1, words), 3)})
        print(results["grid"][-1])
    results["best"] = min(results["grid"], key=lambda r: r["wer"])
    print(json.dumps(results["best"]))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    run(parse_args())
