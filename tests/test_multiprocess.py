"""Multi-process (multi-host) logic simulated on one process — the TPU analog
of the reference's fake-collective trick (reference tests/test_trainer.py:
296-339, which fakes world_size/_reduce to exercise rank logic without
torch.distributed). Here the rank surface is jax.process_index()/
process_count(): monkeypatching them exercises per-process sampler sharding,
process-0-only writers, and the dev-unsharded rule, without a multi-host
runtime."""
import json

import numpy as np
import pytest

import jax

from hnet_mamba_asr_tpu.data.dataset import BucketBatchSampler


def _fake_procs(monkeypatch, rank: int, count: int) -> None:
    monkeypatch.setattr(jax, "process_index", lambda: rank)
    monkeypatch.setattr(jax, "process_count", lambda: count)


# ── sampler sharding ──────────────────────────────────────────────────────────
def test_sampler_shards_disjoint_equal():
    """Per-rank batch lists: equal counts, disjoint items, union ⊆ full list
    (the equal-count trim may drop a remainder — never duplicates)."""
    rng = np.random.default_rng(0)
    lengths = rng.integers(50, 400, size=97).tolist()
    full = BucketBatchSampler(lengths, max_frames=2000, num_replicas=1, rank=0,
                              shuffle=True, seed=3)
    shards = [BucketBatchSampler(lengths, max_frames=2000, num_replicas=4,
                                 rank=r, shuffle=True, seed=3)
              for r in range(4)]
    counts = [len(s) for s in shards]
    assert len(set(counts)) == 1, f"unequal batches per rank: {counts}"
    items_per_rank = [set(i for b in s for i in b) for s in shards]
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (items_per_rank[a] & items_per_rank[b]), (a, b)
    all_items = set().union(*items_per_rank)
    full_items = set(i for b in full for i in b)
    assert all_items <= full_items
    assert sum(counts) == (len(full) // 4) * 4       # trim, not duplication

    # epoch reshuffle must keep the shard properties
    for s in shards:
        s.set_epoch(1)
    items1 = [set(i for b in s for i in b) for s in shards]
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (items1[a] & items1[b])


def test_build_dataloaders_shard_train_not_dev(monkeypatch, tmp_path):
    """Under a faked 2-process world, ranks iterate the SAME global batch
    sequence with identical padded shapes but DISJOINT row slices (the
    row-shard contract jit SPMD needs — unlike the reference's DDP
    batch-granularity shards); the dev split stays identical and full
    (reference: src/dcasr/tasks/build.py:121-129 — the equal-count trim
    would bias dev WER)."""
    from hnet_mamba_asr_tpu.data.synthetic import build_tone_corpus
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.tasks.build import build_dataloaders

    entries = build_tone_corpus(tmp_path, n_utts=16)
    tok = Tokenizer.train([e["text"] for e in entries],
                          tmp_path / "tok" / "bpe", vocab_size=12,
                          hard_vocab_limit=False)
    cfg = {"data": {"manifests_dir": str(tmp_path / "manifests"),
                    "train_manifest": "train-960", "dev_splits": ["dev-clean"]},
           "batch_bins": 1200,
           "frontend_conf": {"n_mels": 20}}

    per_rank_train, per_rank_dev = [], []
    for rank in (0, 1):
        _fake_procs(monkeypatch, rank, 2)
        train_loader, sampler, dev_loaders = build_dataloaders(
            cfg, tmp_path, tok, n_devices=2, seed=0)
        per_rank_train.append([(b["wave"].shape, b["row_mask"].sum(),
                                tuple(b["ids"])) for b in train_loader])
        dev_ids = [tuple(batch["ids"]) for batch in dev_loaders["dev-clean"]]
        per_rank_dev.append(dev_ids)

    assert len(per_rank_train[0]) == len(per_rank_train[1]) > 0
    for (sh0, _, ids0), (sh1, _, ids1) in zip(*per_rank_train):
        assert sh0 == sh1, "padded local shapes must be identical per step"
        assert not (set(ids0) & set(ids1)), "row slices must be disjoint"
    t0, t1 = (set(i for _, _, ids in s for i in ids) for s in per_rank_train)
    assert t0 and t1 and not (t0 & t1)
    assert t0 | t1 == {e["id"] for e in entries}, \
        "union of row shards must cover the corpus"
    assert per_rank_dev[0] == per_rank_dev[1], "dev must be identical (unsharded)"
    dev_utts = set(i for b in per_rank_dev[0] for i in b)
    assert dev_utts == {f"u{i}" for i in range(8)}, "dev must cover the full split"


# ── process-0-only writers ────────────────────────────────────────────────────
def test_trainer_nonzero_rank_writes_nothing(monkeypatch, tmp_path):
    """A faked rank-1 trainer trains (params move) but writes no checkpoints;
    rank 0 writes. MetricsLogger mirrors the same guard."""
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger
    from tests.test_trainer import CFG, ToyLoader, ToyModel

    _fake_procs(monkeypatch, 1, 2)
    m1 = MetricsLogger(tmp_path / "m1", is_main=jax.process_index() == 0)
    m1.log_scalar("x", 1.0, 0)
    m1.append_summary("provenance", {"rank": 1})
    m1.close()
    assert not (tmp_path / "m1").exists(), "rank 1 must not create run dirs"

    tr1 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                  dev_loaders={"dev": ToyLoader(2, seed=9)},
                  ckpt_dir=tmp_path / "ck1", metrics=m1)
    assert tr1.is_main is False
    w0 = np.asarray(jax.device_get(tr1.params["w"])).copy()
    tr1.train()
    assert not np.allclose(w0, np.asarray(jax.device_get(tr1.params["w"]))), \
        "rank 1 must still train"
    assert not (tmp_path / "ck1").exists(), "rank 1 must not write checkpoints"

    _fake_procs(monkeypatch, 0, 2)
    m0 = MetricsLogger(tmp_path / "m0", is_main=jax.process_index() == 0)
    tr0 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                  dev_loaders={"dev": ToyLoader(2, seed=9)},
                  ckpt_dir=tmp_path / "ck0", metrics=m0)
    tr0.train()
    m0.close()
    assert (tmp_path / "ck0" / "latest.ckpt").exists()
    assert (tmp_path / "m0" / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in
             (tmp_path / "m0" / "metrics.jsonl").read_text().splitlines()]
    assert any("dev_dev/loss" in l for l in lines)


def test_ranks_train_identically(monkeypatch, tmp_path):
    """Both simulated ranks run the SAME jitted step on the same (replicated)
    params: given identical data they must produce identical parameters —
    the SPMD analog of DDP's 'replicas stay in sync' contract."""
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    from tests.test_trainer import CFG, ToyLoader, ToyModel

    results = []
    for rank in (0, 1):
        _fake_procs(monkeypatch, rank, 2)
        tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                     ckpt_dir=tmp_path / f"ck{rank}")
        tr.train()
        results.append(jax.device_get(tr.params))
    np.testing.assert_array_equal(np.asarray(results[0]["w"]),
                                  np.asarray(results[1]["w"]))


def test_maybe_init_distributed_env_gate(monkeypatch):
    """No coordinator env -> no-op False; coordinator set -> initialize()
    called exactly once and True returned (idempotent on RuntimeError)."""
    from hnet_mamba_asr_tpu.parallel import mesh as pm

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert pm.maybe_init_distributed() is False
    assert not calls

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    assert pm.maybe_init_distributed() is True
    assert len(calls) == 1

    def boom(*a, **k):
        raise RuntimeError("already initialized")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert pm.maybe_init_distributed() is True     # idempotent


def test_provenance_records_process_count(monkeypatch):
    from hnet_mamba_asr_tpu.utils.provenance import collect_provenance

    _fake_procs(monkeypatch, 0, 4)
    prov = collect_provenance({"batch_bins": 100}, repo_root=".", n_devices=8,
                              seed=0)
    assert '"process_count": 4' in json.dumps(prov)
