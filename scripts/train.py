#!/usr/bin/env python
"""Train a DC-ASR model from a YAML config (+ dotlist overrides).

Usage:
    python scripts/train.py --config configs/typeA_small_N1.yaml \
        [--resume auto] [key.path=value ...]

Thin orchestrator over tested library code: config -> tokenizer/CMVN/loaders
-> build_model -> Trainer.train. Artifacts land under
experiments/<experiment.name>/ (checkpoints, metrics.jsonl, summary.json,
provenance). (Reference counterpart: scripts/train.py.)
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", default=None,
                    help="'auto' = latest checkpoint; or an explicit path")
    ap.add_argument("--exp-dir", default=None, help="override experiments/<name>")
    ap.add_argument("overrides", nargs="*", help="key.path=value dotlist")
    return ap.parse_args(argv)


def run(args) -> None:
    # distributed init FIRST: library imports may touch the XLA backend, and
    # jax.distributed.initialize() must run before any backend use
    from hnet_mamba_asr_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()        # joins a pod launch; no-op single-host

    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import (
        build_cmvn, build_dataloaders, build_tokenizer,
    )
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    from hnet_mamba_asr_tpu.utils.config import flatten_config, load_config
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger
    from hnet_mamba_asr_tpu.utils.provenance import collect_provenance

    import jax

    cfg = load_config(args.config, args.overrides)
    name = (cfg.get("experiment", {}) or {}).get("name", Path(args.config).stem)
    exp_dir = Path(args.exp_dir) if args.exp_dir else REPO_ROOT / "experiments" / name
    setup_logging("train", exp_dir / "logs")
    logger = get_logger("train")
    seed = int((cfg.get("experiment", {}) or {}).get("seed", 0))

    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    cmvn = build_cmvn(cfg, REPO_ROOT)
    train_loader, _, dev_loaders = build_dataloaders(cfg, REPO_ROOT, tokenizer,
                                                     seed=seed)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=cmvn)
    from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, validate_planes
    flat = flatten_config(cfg)
    tp, sp, pp, ep, fsdp = validate_planes(flat)
    if sp > 1:
        # long-form sequence parallelism: (dp, sp) mesh + the SPModel adapter
        # (parallel/seq_parallel.py) — the Trainer itself is untouched
        from hnet_mamba_asr_tpu.parallel.seq_parallel import SPModel
        mesh = make_mesh(tp=sp, tp_axis="sp")
        model = SPModel(model, mesh)
    elif pp > 1:
        # layer-pipelined main stack: (dp, pp) mesh + the PPModel adapter
        from hnet_mamba_asr_tpu.parallel.pipeline import PPModel
        mesh = make_mesh(tp=pp, tp_axis="pp")
        model = PPModel(model, mesh)
    else:
        # tensor and/or expert parallelism: place_params shards projections
        # P(None, 'tp') and stacked MoE expert weights P('ep', ...); the
        # collectives (psum / all-to-all) are inserted by GSPMD. No model
        # adapter needed; the two planes compose on a (dp, tp, ep) mesh.
        if ep > 1 and getattr(model.aed, "moe_experts", 0) <= 0:
            raise ValueError("train.ep > 1 needs an MoE AED decoder "
                             "(set aed_conf.moe.n_experts)")
        mesh = make_mesh(tp=tp, ep=ep)
    is_main = jax.process_index() == 0
    metrics = MetricsLogger(exp_dir, resume=args.resume is not None,
                            is_main=is_main)
    prov = collect_provenance(cfg, repo_root=REPO_ROOT,
                              n_devices=jax.device_count(), seed=seed,
                              artifacts={"tokenizer": cfg.get("bpemodel"),
                                         "train_manifest": None})
    trainer = Trainer(model, train_loader, flat,
                      dev_loaders=dev_loaders, tokenizer=tokenizer,
                      metrics=metrics, ckpt_dir=exp_dir / "checkpoints",
                      mesh=mesh, seed=seed, provenance=prov)
    logger.info("training %s -> %s", name, exp_dir)
    trainer.train(resume=args.resume)
    metrics.close()
    return trainer


if __name__ == "__main__":
    run(parse_args())
