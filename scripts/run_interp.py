#!/usr/bin/env python
"""Interpretability over a trained checkpoint: boundaries / probes /
robustness / emergence.

Usage:
    python scripts/run_interp.py --config <yaml> --checkpoint <ckpt> \
        --mode boundaries|probes|robustness|emergence [key=value ...]

Writes per-mode JSONs + summary under
experiments/<run>/interp/<ckpt-stem>/<split>/. (Reference counterpart:
scripts/run_interp.py.)
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="boundaries",
                    choices=["boundaries", "probes", "robustness", "emergence"])
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def _make_encode_fn(model, params):
    def encode(batch):
        batch = {k: v for k, v in batch.items() if k != "ids"}
        return model.encode(params, batch, train=False)
    return encode


def run(args) -> None:
    from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
    from hnet_mamba_asr_tpu.data.manifests import load_manifest
    from hnet_mamba_asr_tpu.interp import driver as drv
    from hnet_mamba_asr_tpu.interp.alignments import load_alignments
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import load_model_params
    from hnet_mamba_asr_tpu.utils.config import load_config
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger

    cfg = load_config(args.config, args.overrides)
    ic = cfg.get("interp", {}) or {}
    name = (cfg.get("experiment", {}) or {}).get("name", Path(args.config).stem)
    ckpt = Path(args.checkpoint)
    split = ic.get("eval_split", "dev-clean")
    out_dir = (Path(args.out_dir) if args.out_dir else
               REPO_ROOT / "experiments" / name / "interp" / ckpt.stem / split)
    out_dir.mkdir(parents=True, exist_ok=True)
    setup_logging("run_interp", out_dir / "logs")
    logger = get_logger("run_interp")

    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    cmvn = build_cmvn(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=cmvn)
    params, _ = load_model_params(ckpt)
    encode_fn = _make_encode_fn(model, params)
    n_stages = 2 if str(cfg["encoder_conf"].get("arch_type", "A")) == "B" else 1

    mdir = REPO_ROOT / (cfg.get("data", {}) or {}).get("manifests_dir", "manifests")
    adir = REPO_ROOT / ic.get("alignments_dir", "alignments")
    align_path = adir / f"{split}.jsonl"
    alignments = {r["id"]: r for r in load_alignments(align_path)}
    entries = [e for e in load_manifest(mdir / f"{split}.jsonl")
               if e["id"] in alignments]
    durations = drv.durations_from_entries(entries)
    batch_bins = int(ic.get("batch_bins", 24000))
    tol = float(ic.get("tol_s", 0.02))

    def loader_for(ds_entries, perturbation=None, seed=1):
        if perturbation is None:
            ds = ASRDataset(ds_entries, tokenizer, augment=False)
        else:
            ds = drv.PerturbedDataset(ds_entries, tokenizer, perturbation, seed=seed)
        loader, _ = make_dataloader(ds, batch_bins, batch_multiple=1)
        return loader

    result: dict = {"mode": args.mode, "checkpoint": str(ckpt), "split": split}
    if args.mode == "boundaries":
        rep, _ = drv.boundary_report(
            encode_fn, loader_for(entries), alignments, durations, tol=tol,
            baseline_trials=int(ic.get("baseline_trials", 20)))
        result["boundaries"] = rep
    elif args.mode == "probes":
        pc = ic.get("probe", {}) or {}
        train_align_path = REPO_ROOT / ic["probe_train_alignments"]
        train_aligns = {r["id"]: r for r in load_alignments(train_align_path)}
        train_entries = [e for e in load_manifest(
            REPO_ROOT / ic["probe_train_manifest"]) if e["id"] in train_aligns]
        result["probes"] = drv.probe_report(
            encode_fn, loader_for(train_entries), loader_for(entries),
            train_aligns, alignments, n_stages=n_stages,
            levels=tuple(pc.get("levels", ("frames", "chunks"))),
            top_k_words=int(pc.get("top_k_words", 500)),
            train_cap=int(pc.get("train_cap", 50000)),
            test_cap=int(pc.get("test_cap", 20000)),
            max_iter=int(pc.get("max_iter", 1000)), C=float(pc.get("C", 1.0)),
            seed=int(pc.get("seed", 1)), backend=str(pc.get("backend", "sklearn")))
    elif args.mode == "robustness":
        rc = ic.get("robustness", {}) or {}
        perts = drv.perturbations_from_config(rc)
        _, clean = drv.boundary_report(
            encode_fn, loader_for(entries), alignments, durations, tol=tol,
            baseline_trials=int(rc.get("baseline_trials", 10)))
        seed = int(rc.get("seed", 1))

        def collect(pert):
            from hnet_mamba_asr_tpu.interp.boundary_align import collect_boundaries
            return collect_boundaries(encode_fn, loader_for(entries, pert, seed))

        result["robustness"] = drv.robustness_report(
            perts, collect, clean, alignments, durations, tol=tol,
            baseline_trials=int(rc.get("baseline_trials", 10)))
    else:                                                  # emergence
        ec = ic.get("emergence", {}) or {}
        ckpts = drv.list_epoch_checkpoints(ckpt.parent)
        mlogger = MetricsLogger(out_dir, resume=True)

        def make_encode(path):
            p, _ = load_model_params(path)
            return _make_encode_fn(model, p)

        result["emergence"] = drv.emergence_report(
            make_encode, ckpts, loader_for(entries), alignments, durations,
            tol=tol, baseline_trials=int(ec.get("baseline_trials", 10)),
            mlogger=mlogger)
        mlogger.close()

    out_path = out_dir / f"{args.mode}.json"
    out_path.write_text(json.dumps(result, indent=2, default=str))
    summary = out_dir / "summary.json"
    existing = json.loads(summary.read_text()) if summary.exists() else {}
    existing[args.mode] = str(out_path)
    summary.write_text(json.dumps(existing, indent=2))
    logger.info("interp %s -> %s", args.mode, out_path)


if __name__ == "__main__":
    run(parse_args())
