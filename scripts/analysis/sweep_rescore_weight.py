#!/usr/bin/env python
"""Dev-only sweep of the second-pass rescoring weights (lambda, gamma).

The +LM AED/joint cells integrate the external LM by rescoring the completed
n-best: S(h) = (1-w)*AED + w*CTC + lambda*logP_LM + gamma*len. The acoustic
beam is LM-free, so the n-best and every component score are INDEPENDENT of
(lambda, gamma): decode ONCE, cache the n-best, then sweep as pure re-ranking —
the whole grid costs one decode pass and every point is compared on an
identical hypothesis set. Also reports lambda=0 (reproduces the no-LM cell)
and the oracle ceiling (lowest WER reachable by ANY re-ranking of this
n-best). Run on FULL dev splits, never test, never a length-biased sample.
(Reference counterpart: scripts/analysis/sweep_rescore_weight.py.)

Usage:
    python scripts/analysis/sweep_rescore_weight.py --config <yaml> \
        --checkpoint <ckpt> --split dev-clean [--read-out joint] \
        [--lambdas 0 0.2 0.4 0.6 0.8] [--gammas 0 1 2]
"""
from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--read-out", default="joint", choices=["aed", "joint"])
    ap.add_argument("--lambdas", type=float, nargs="*",
                    default=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0])
    ap.add_argument("--gammas", type=float, nargs="*", default=[0.0, 1.0, 2.0])
    ap.add_argument("--n", type=int, default=None, help="cap utterances (debug)")
    ap.add_argument("--out", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
    from hnet_mamba_asr_tpu.decoders.joint import joint_beam_search_nbest
    from hnet_mamba_asr_tpu.eval.metrics import word_errors
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import (
        AEDStepper, load_lm_scorer, load_model_params,
    )
    from hnet_mamba_asr_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    dc = cfg.get("decode", {}) or {}
    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=build_cmvn(cfg, REPO_ROOT))
    params, _ = load_model_params(args.checkpoint)
    lm = load_lm_scorer(dc, REPO_ROOT, tokenizer)
    ctc_w = 0.0 if args.read_out == "aed" else float(dc.get("ctc_weight", 0.3))
    beam = int(dc.get("beam_size", 10))

    mdir = REPO_ROOT / (cfg.get("data", {}) or {}).get("manifests_dir", "manifests")
    ds = ASRDataset(mdir / f"{args.split}.jsonl", tokenizer, augment=False)
    loader, _ = make_dataloader(ds, int(dc.get("batch_bins",
                                               cfg.get("batch_bins", 32000))))

    # ── decode once: cache n-best with component scores + LM scores ──────────
    cache = []                              # per utt: (ref, [(tokens, aed, ctc, lm)])
    n_done = 0
    for batch in loader:
        ids = batch.pop("ids")
        import jax
        enc = model.encode(params, batch, train=False)
        lengths = np.asarray(enc.lengths)
        stepper = AEDStepper(model.aed, params["aed"], enc.features, lengths)
        ctc_logp = (np.asarray(model.ctc.apply({"params": params["ctc"]},
                                               enc.features, method="log_probs"))
                    if ctc_w > 0 else None)
        n_real = int(np.asarray(batch["row_mask"]).sum())
        tokens = np.asarray(batch["tokens"])
        tlens = np.asarray(batch["token_lens"])
        for i in range(n_real):
            lp_i = ctc_logp[i:i + 1, :lengths[i]] if ctc_logp is not None else None
            nbest = joint_beam_search_nbest(
                None, lengths[i:i + 1],
                aed_next_logprobs=lambda _b, tl, i=i: stepper(i, tl),
                ctc_log_probs=lp_i, vocab_size=model.aed.vocab_size,
                beam_size=beam, ctc_weight=ctc_w, bos_id=tokenizer.bos_id,
                eos_id=tokenizer.eos_id, pad_id=tokenizer.pad_id,
                blank_id=model.ctc.blank_id if model.ctc else None,
                nbest=beam)[0]
            lm_scores = lm.sequence_logprob([h.tokens for h in nbest]) if nbest else []
            ref = tokenizer.decode(tokens[i, :tlens[i]].tolist())
            cache.append((ref, [(h.tokens, h.aed, h.ctc, float(s))
                                for h, s in zip(nbest, lm_scores)]))
            n_done += 1
            if args.n and n_done >= args.n:
                break
        if args.n and n_done >= args.n:
            break

    # ── sweep as pure re-ranking ───────────────────────────────────────────────
    def wer_for(select_fn):
        edits = words = 0
        for ref, hyps in cache:
            hyp_tokens = select_fn(hyps) if hyps else []
            e, w = word_errors(tokenizer.decode(hyp_tokens), ref)
            edits += e
            words += w
        return 100.0 * edits / max(1, words)

    results = {"split": args.split, "read_out": args.read_out,
               "n_utts": len(cache), "grid": []}
    for lam in args.lambdas:
        for gam in args.gammas:
            def pick(hyps, lam=lam, gam=gam):
                return max(hyps, key=lambda h: ((1 - ctc_w) * h[1] + ctc_w * h[2]
                                                + lam * h[3] + gam * len(h[0])))[0]
            results["grid"].append({"lambda": lam, "gamma": gam,
                                    "wer": round(wer_for(pick), 3)})

    def oracle(hyps_scored):
        return None  # placeholder for signature symmetry

    def oracle_pick(ref):
        def inner(hyps):
            from hnet_mamba_asr_tpu.eval.metrics import word_errors as we
            return min(hyps, key=lambda h: we(tokenizer.decode(h[0]), ref)[0])[0]
        return inner

    edits = words = 0
    for ref, hyps in cache:
        hyp_tokens = oracle_pick(ref)(hyps) if hyps else []
        e, w = word_errors(tokenizer.decode(hyp_tokens), ref)
        edits += e
        words += w
    results["oracle_wer"] = round(100.0 * edits / max(1, words), 3)
    best = min(results["grid"], key=lambda r: r["wer"])
    results["best"] = best
    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    run(parse_args())
