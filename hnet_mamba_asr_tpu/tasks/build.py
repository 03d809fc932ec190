"""Run assembly: resolved config -> tokenizer/CMVN/dataloaders + flat Trainer cfg.

Device-model-free (data + config only), so the data path imports and tests
without the encoder stack (reference: src/dcasr/tasks/build.py). The flat
Trainer config mapping lives in utils.config.flatten_config.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax

from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
from hnet_mamba_asr_tpu.data.features import GlobalCMVN
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
from hnet_mamba_asr_tpu.utils.config import flatten_config  # noqa: F401  (re-export)
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


def _resolve(path: str | Path, repo_root: Path) -> Path:
    p = Path(path)
    return p if p.is_absolute() else Path(repo_root) / p


def build_tokenizer(cfg: Mapping[str, Any], repo_root: str | Path) -> Tokenizer:
    bpemodel = cfg.get("bpemodel")
    if not bpemodel:
        raise ValueError("config needs a 'bpemodel' path")
    return Tokenizer(_resolve(bpemodel, Path(repo_root)))


def build_cmvn(cfg: Mapping[str, Any], repo_root: str | Path) -> GlobalCMVN | None:
    fc = cfg.get("frontend_conf", {}) or {}
    path = fc.get("cmvn")
    if not path:
        return None
    return GlobalCMVN.load(_resolve(path, Path(repo_root)))


def resolve_manifests(cfg: Mapping[str, Any], repo_root: str | Path):
    data = cfg.get("data", {}) or {}
    mdir = _resolve(data.get("manifests_dir", "manifests"), Path(repo_root))
    train = mdir / f"{data.get('train_manifest', 'train-960')}.jsonl"
    dev = {name: mdir / f"{name}.jsonl" for name in data.get("dev_splits", [])}
    return train, dev


def build_dataloaders(cfg, repo_root, tokenizer, *, n_devices: int | None = None,
                      seed: int = 0):
    """Train loader (sharded across processes, augmented) + one dev loader per
    dev split. Dev is NOT process-sharded: the equal-count trim would drop the
    longest batches and bias dev WER (reference: src/dcasr/tasks/build.py:121-129);
    every process scores the full split.

    Train sharding is by ROW slice of a shared global batch sequence
    (data/dataset.py DataLoader row_shard): unlike the reference's DDP
    batch-granularity sharding, jit SPMD needs every process to hold an
    identically-shaped slice of ONE global batch per step."""
    batch_bins = int(cfg["batch_bins"])
    train_cfg = cfg.get("train", {}) or {}
    speed = train_cfg.get("speed_perturb")
    # overlap host IO/collate with device compute (bounded queue; exceptions
    # propagate; order deterministic) — load-bearing on slim hosts
    prefetch = int(train_cfg.get("prefetch", 2))
    # int16 wire format halves the dominant host->device payload (the padded
    # waveform); the frontend rescales on device (ops/melspec.py)
    wire = str((cfg.get("data", {}) or {}).get("wire_dtype", "float32"))
    train_manifest, dev_manifests = resolve_manifests(cfg, repo_root)
    n_dev = n_devices if n_devices is not None else jax.device_count()

    # data.perturb_cache_dir: resample each (utt, factor) once to disk;
    # epochs >= 2 read back bit-identically (the polyphase resample is ~2/3
    # of the host pipeline cost — load-bearing on slim hosts)
    pcache = (cfg.get("data", {}) or {}).get("perturb_cache_dir")
    train_ds = ASRDataset(train_manifest, tokenizer, augment=True, seed=seed,
                          speed_perturb=speed,
                          perturb_cache_dir=_resolve(pcache, Path(repo_root))
                          if pcache else None)
    train_loader, train_sampler = make_dataloader(
        train_ds, batch_bins, shuffle=True, seed=seed,
        num_replicas=jax.process_count(), rank=jax.process_index(),
        batch_multiple=max(1, n_dev), row_shard=jax.process_count() > 1,
        prefetch=prefetch, wire_dtype=wire)
    dev_loaders = {}
    for name, mpath in dev_manifests.items():
        ds = ASRDataset(mpath, tokenizer, augment=False, seed=seed)
        loader, _ = make_dataloader(ds, batch_bins, shuffle=False, seed=seed,
                                    num_replicas=1, rank=0,
                                    batch_multiple=max(1, n_dev),
                                    wire_dtype=wire)
        dev_loaders[name] = loader
    logger.info("dataloaders: train=%d batches (%s), dev=%s", len(train_sampler),
                train_manifest.name, {k: len(v) for k, v in dev_loaders.items()})
    return train_loader, train_sampler, dev_loaders
