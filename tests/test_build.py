"""tasks/build: tokenizer/CMVN/manifest resolution, dataloader assembly,
dev-unsharded rule."""
import numpy as np
import pytest

from hnet_mamba_asr_tpu.data.audio import write_wav
from hnet_mamba_asr_tpu.data.features import CMVNAccumulator
from hnet_mamba_asr_tpu.data.manifests import write_manifest
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
from hnet_mamba_asr_tpu.tasks.build import (
    build_cmvn, build_dataloaders, build_tokenizer, resolve_manifests,
)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("build")
    rng = np.random.default_rng(0)
    (root / "manifests").mkdir()
    entries = []
    for i, text in enumerate(["aa bb", "bb cc", "cc", "aa bb cc", "bb"]):
        n = int(rng.integers(4000, 7000))
        write_wav(root / f"u{i}.wav", rng.normal(size=n) * 0.1, 16000)
        entries.append({"id": f"u{i}", "audio": str(root / f"u{i}.wav"),
                        "text": text, "frames": n})
    write_manifest(entries[:3], root / "manifests" / "train-960.jsonl")
    write_manifest(entries[3:], root / "manifests" / "dev-clean.jsonl")
    Tokenizer.train(["aa bb cc"] * 10, root / "bpe", vocab_size=12,
                    hard_vocab_limit=False)
    acc = CMVNAccumulator(n_mels=20)
    acc.update(rng.normal(size=(4, 30, 20)))
    acc.save(root / "cmvn.npz")
    return root


def test_build_tokenizer_and_cmvn(root):
    cfg = {"bpemodel": str(root / "bpe.model"),
           "frontend_conf": {"cmvn": str(root / "cmvn.npz")}}
    tok = build_tokenizer(cfg, root)
    assert tok.vocab_size <= 12
    cmvn = build_cmvn(cfg, root)
    assert cmvn is not None and cmvn.mean.shape == (20,)
    assert build_cmvn({"frontend_conf": {}}, root) is None
    with pytest.raises(ValueError, match="bpemodel"):
        build_tokenizer({}, root)


def test_resolve_manifests(root):
    cfg = {"data": {"manifests_dir": str(root / "manifests"),
                    "train_manifest": "train-960", "dev_splits": ["dev-clean"]}}
    train, dev = resolve_manifests(cfg, root)
    assert train.name == "train-960.jsonl" and train.exists()
    assert set(dev) == {"dev-clean"}


def test_build_dataloaders(root):
    cfg = {"data": {"manifests_dir": str(root / "manifests"),
                    "train_manifest": "train-960", "dev_splits": ["dev-clean"]},
           "batch_bins": 2000,
           "train": {"speed_perturb": [0.9, 1.0, 1.1]}}
    tok = build_tokenizer({"bpemodel": str(root / "bpe.model")}, root)
    train_loader, sampler, dev_loaders = build_dataloaders(cfg, root, tok,
                                                           n_devices=4)
    # train expands x3 via speed perturbation
    assert len(train_loader.dataset) == 9
    assert set(dev_loaders) == {"dev-clean"}
    # dev is NOT process-sharded: its sampler covers the full split
    dev = dev_loaders["dev-clean"]
    covered = {i for batch_idx in dev.sampler for i in batch_idx}
    assert covered == set(range(len(dev.dataset)))
    # batch rows pad to the device multiple
    batch = next(iter(train_loader))
    assert batch["wave"].shape[0] % 4 == 0
