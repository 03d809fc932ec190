"""LM task: config -> TransformerLM wired for the model-agnostic Trainer.

``LMModel`` adapts ``TransformerLM.loss`` to the Trainer contract and emits
``batch_weight`` = scored tokens (+1 eos per line), so the Trainer's weighted
loss aggregation makes ``exp(valid/loss)`` a true token-weighted perplexity
(behavioral spec: reference src/dcasr/tasks/lm_task.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.data.lm_text import LMTextDataset, make_lm_dataloader
from hnet_mamba_asr_tpu.models.lm import TransformerLM
from hnet_mamba_asr_tpu.tasks.build import _resolve, resolve_manifests
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


class LMModel:
    """Trainer-contract wrapper around TransformerLM.

    ``moe_aux_weight`` (> 0 iff lm_conf.moe is configured) folds the Switch
    load-balance loss sown by the MoE FFNs into the training objective."""

    def __init__(self, lm: TransformerLM, max_tokens: int = 512,
                 moe_aux_weight: float = 0.0):
        self.lm = lm
        self.max_tokens = max_tokens
        self.moe_aux_weight = moe_aux_weight

    def init_params(self, key) -> dict:
        tokens = jnp.zeros((1, 8), jnp.int32)
        return {"lm": self.lm.init(key, tokens)["params"]}

    def loss_fn(self, params, batch, step, train: bool):
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(23), step)} \
            if train else None
        tokens = batch["tokens"]
        lens = batch["token_lens"]
        row_mask = batch["row_mask"]
        moe = self.lm.moe_experts > 0
        out = self.lm.apply({"params": params["lm"]}, tokens, lens, True,
                            deterministic=not train, rngs=rngs,
                            row_mask=row_mask, method="loss",
                            mutable=["moe"] if moe else False)
        (loss, acc), mvars = out if moe else (out, {})
        scored = ((lens + 1) * row_mask).sum()
        stats = {"loss/total": jax.lax.stop_gradient(loss),
                 "lm/token_acc": jax.lax.stop_gradient(acc),
                 "batch_weight": scored}
        if moe:
            from hnet_mamba_asr_tpu.models.moe import moe_aux_from_vars
            aux, moe_stats = moe_aux_from_vars(mvars, self.moe_aux_weight)
            loss = loss + aux
            stats.update(moe_stats)
            stats["loss/total"] = jax.lax.stop_gradient(loss)
        return loss, stats


def build_lm(config: Mapping[str, Any], vocab_size: int,
             max_tokens: int | None = None) -> LMModel:
    lc = (config or {}).get("lm_conf", {}) or {}
    mc = lc.get("moe", {}) or {}
    lm = TransformerLM(vocab_size=int(vocab_size),
                       d_model=int(lc.get("d_model", 512)),
                       n_layers=int(lc.get("n_layers", 8)),
                       n_heads=int(lc.get("n_heads", 8)),
                       d_ff=int(lc.get("d_ff", 2048)),
                       dropout=float(lc.get("dropout", 0.1)),
                       lsm_weight=float(lc.get("lsm_weight", 0.0)),
                       moe_experts=int(mc.get("n_experts", 0)),
                       moe_top_k=int(mc.get("top_k", 2)),
                       moe_capacity_factor=float(
                           mc.get("capacity_factor", 1.25)))
    return LMModel(lm, max_tokens=int(max_tokens
                                      or lc.get("max_line_tokens", 512)),
                   moe_aux_weight=float(mc.get("aux_weight", 0.01)))


def build_lm_dataloaders(cfg, repo_root, tokenizer, *, n_devices: int | None = None,
                         seed: int = 0):
    """Train loader over the raw LM corpus + dev loaders from manifest text.

    Dev is never process-sharded (full-split perplexity on every process)."""
    data = cfg.get("data", {}) or {}
    batch_tokens = int(cfg["batch_tokens"])
    max_tokens = int((cfg.get("lm_conf", {}) or {}).get("max_line_tokens", 512))
    n_dev = n_devices if n_devices is not None else jax.device_count()

    corpus = _resolve(data["lm_corpus"], Path(repo_root))
    train_ds = LMTextDataset(tokenizer, corpus_path=corpus, max_tokens=max_tokens)
    train_loader, train_sampler = make_lm_dataloader(
        train_ds, batch_tokens, shuffle=True, seed=seed,
        num_replicas=jax.process_count(), rank=jax.process_index(),
        batch_multiple=max(1, n_dev), row_shard=jax.process_count() > 1)
    _, dev_manifests = resolve_manifests(cfg, repo_root)
    dev_loaders = {}
    for name, mpath in dev_manifests.items():
        ds = LMTextDataset.from_manifest(mpath, tokenizer, max_tokens=max_tokens)
        loader, _ = make_lm_dataloader(ds, batch_tokens, shuffle=False, seed=seed,
                                       batch_multiple=max(1, n_dev))
        dev_loaders[name] = loader
    logger.info("lm dataloaders: train=%d batches (%s), dev=%s", len(train_sampler),
                corpus.name, {k: len(v) for k, v in dev_loaders.items()})
    return train_loader, train_sampler, dev_loaders
