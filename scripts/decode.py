#!/usr/bin/env python
"""Decode eval splits through the full decode matrix (7 cells).

Usage:
    python scripts/decode.py --config <yaml> --checkpoint <ckpt> \
        [--splits test-clean test-other] [--out-dir ...] [key=value ...]

Writes per-utterance {id, ref, hyp, decode_s, audio_s} JSONL per cell x split
plus an atomic per-run summary.json (safe for concurrent per-split decodes).
(Reference counterpart: scripts/decode.py.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--splits", nargs="*", default=None,
                    help="default: config data.eval_splits or dev_splits")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    from hnet_mamba_asr_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()                 # joins a pod launch; no-op single-host
    from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import (
        audio_seconds_from_manifest, check_heads, decode_split, expand_cells,
        load_lm_scorer, load_model_params,
    )
    from hnet_mamba_asr_tpu.utils.config import load_config
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging
    from hnet_mamba_asr_tpu.utils.provenance import collect_provenance

    cfg = load_config(args.config, args.overrides)
    dc = cfg.get("decode", {}) or {}
    name = (cfg.get("experiment", {}) or {}).get("name", Path(args.config).stem)
    out_dir = Path(args.out_dir) if args.out_dir \
        else REPO_ROOT / "experiments" / name / "decode"
    setup_logging("decode", out_dir / "logs")
    logger = get_logger("decode")

    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    cmvn = build_cmvn(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=cmvn)
    params, meta = load_model_params(args.checkpoint)
    cells = expand_cells(dc)
    check_heads(model, cells)

    # multi-chip decode: dp-shard batches (+ optional tensor parallelism)
    mesh = None
    tp = int(dc.get("tp", 1))
    if dc.get("mesh") or tp > 1 or dc.get("n_devices"):
        from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, place_params
        n_dev = dc.get("n_devices")
        mesh = make_mesh(int(n_dev) if n_dev else None, tp=tp)
        params = place_params(params, mesh)
        logger.info("decode mesh: %s (tp=%d)", dict(zip(mesh.axis_names,
                                                        mesh.devices.shape)), tp)
    lm = None
    if any(c["lm"] for c in cells):
        lm = load_lm_scorer(dc, REPO_ROOT, tokenizer)

    data = cfg.get("data", {}) or {}
    splits = args.splits or data.get("eval_splits") or data.get("dev_splits") or []
    if not splits:
        raise ValueError("no splits: pass --splits or set data.eval_splits")
    mdir = REPO_ROOT / data.get("manifests_dir", "manifests")
    batch_bins = int(dc.get("batch_bins", cfg.get("batch_bins", 32000)))

    summaries = []
    for split in splits:
        manifest = mdir / f"{split}.jsonl"
        audio_s = audio_seconds_from_manifest(manifest)
        ds = ASRDataset(manifest, tokenizer, augment=False)
        loader, _ = make_dataloader(
            ds, batch_bins, batch_multiple=1,
            wire_dtype=str(data.get("wire_dtype", "float32")))
        if bool(dc.get("share_encoder", False)):
            # one encoder pass per batch fanned out to every cell (the
            # per-cell default keeps the reference's accounting)
            from hnet_mamba_asr_tpu.tasks.decode_task import decode_split_shared
            for s in decode_split_shared(model, params, tokenizer, loader,
                                         cells, dc, audio_seconds=audio_s,
                                         out_dir=out_dir, split=split,
                                         lm=lm, mesh=mesh):
                summaries.append({"split": split, **s})
        else:
            for cell in cells:
                out_path = out_dir / cell["name"] / f"{split}.jsonl"
                summaries.append({"split": split, **decode_split(
                    model, params, tokenizer, loader, cell, dc,
                    audio_seconds=audio_s, out_path=out_path, lm=lm,
                    mesh=mesh)})

    summary = {"checkpoint": str(args.checkpoint), "weights_meta": meta,
               "cells": summaries,
               "provenance": collect_provenance(cfg, repo_root=REPO_ROOT)}
    tmp = out_dir / f"summary.{os.getpid()}.tmp"
    tmp.write_text(json.dumps(summary, indent=2, default=str))
    os.replace(tmp, out_dir / "summary.json")           # atomic: concurrent decodes
    logger.info("decode complete: %d cell-splits -> %s", len(summaries), out_dir)


if __name__ == "__main__":
    run(parse_args())
