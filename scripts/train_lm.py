#!/usr/bin/env python
"""Train the external Transformer LM on the LM corpus (shared BPE vocab).

Usage:
    python scripts/train_lm.py --config configs/lm_transformer_500.yaml \
        [--resume auto] [key.path=value ...]

Same Trainer as ASR: the LMModel emits batch_weight = scored tokens, so
exp(valid/loss) is true token-weighted perplexity. (Reference counterpart:
scripts/train_lm.py.)
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
    ap.add_argument("--resume", default=None)
    ap.add_argument("--exp-dir", default=None)
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    import jax

    from hnet_mamba_asr_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()        # joins a pod launch; no-op single-host
    from hnet_mamba_asr_tpu.tasks.build import build_tokenizer
    from hnet_mamba_asr_tpu.tasks.lm_task import build_lm, build_lm_dataloaders
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    from hnet_mamba_asr_tpu.utils.config import flatten_config, load_config
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger
    from hnet_mamba_asr_tpu.utils.provenance import collect_provenance

    cfg = load_config(args.config, args.overrides)
    name = (cfg.get("experiment", {}) or {}).get("name", Path(args.config).stem)
    exp_dir = Path(args.exp_dir) if args.exp_dir else REPO_ROOT / "experiments" / name
    setup_logging("train_lm", exp_dir / "logs")
    logger = get_logger("train_lm")
    seed = int((cfg.get("experiment", {}) or {}).get("seed", 0))

    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    train_loader, _, dev_loaders = build_lm_dataloaders(cfg, REPO_ROOT, tokenizer,
                                                        seed=seed)
    model = build_lm(cfg, tokenizer.vocab_size)
    flat = flatten_config(cfg)
    # expert parallelism for MoE LMs (lm_conf.moe): (dp, ep) mesh — stacked
    # expert weights shard P('ep', ...) via place_params/ep_specs
    ep = int(flat.get("ep", 1))
    mesh = None
    if ep > 1:
        from hnet_mamba_asr_tpu.parallel.mesh import make_mesh
        if model.lm.moe_experts <= 0:
            raise ValueError("train.ep > 1 needs an MoE LM (lm_conf.moe)")
        mesh = make_mesh(tp=ep, tp_axis="ep")
    metrics = MetricsLogger(exp_dir, resume=args.resume is not None,
                            is_main=jax.process_index() == 0)
    prov = collect_provenance(cfg, repo_root=REPO_ROOT,
                              n_devices=jax.device_count(), seed=seed)
    trainer = Trainer(model, train_loader, flat,
                      dev_loaders=dev_loaders, tokenizer=None, metrics=metrics,
                      ckpt_dir=exp_dir / "checkpoints", seed=seed, mesh=mesh,
                      provenance=prov)
    logger.info("training LM %s -> %s", name, exp_dir)
    trainer.train(resume=args.resume)
    metrics.close()


if __name__ == "__main__":
    run(parse_args())
