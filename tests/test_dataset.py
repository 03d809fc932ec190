"""Host data pipeline: length grid, collate static shapes + row masking,
bucket sampler budget/sharding/determinism, dataset with real WAV files."""
import json

import numpy as np
import pytest

from hnet_mamba_asr_tpu.data.audio import write_wav
from hnet_mamba_asr_tpu.data.dataset import (
    ASRDataset, BucketBatchSampler, DataLoader, collate_batch, length_grid,
    make_dataloader,
)
from hnet_mamba_asr_tpu.data.manifests import feat_frames, load_manifest, write_manifest
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer

TEXTS = ["the cat sat", "a dog ran fast", "hello world", "speech is fun",
         "testing one two three", "short"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        n = int(rng.integers(4000, 12000))
        path = root / f"utt{i}.wav"
        write_wav(path, rng.normal(size=n) * 0.1, 16000)
        entries.append({"id": f"utt{i}", "audio": str(path), "text": text,
                        "frames": n})
    manifest = write_manifest(entries, root / "train.jsonl")
    tok = Tokenizer.train(TEXTS * 5, root / "bpe", vocab_size=48,
                          hard_vocab_limit=False)
    return manifest, tok


def test_length_grid():
    assert length_grid(10) == 256
    assert length_grid(256) == 256
    vals = sorted({length_grid(t) for t in range(1, 4000)})
    assert all(vals[i] < vals[i + 1] for i in range(len(vals) - 1))
    assert len(vals) <= 16                            # bounded compile count
    assert all(length_grid(t) >= t for t in range(1, 4000))


def test_feat_frames():
    assert feat_frames(400) == 1
    assert feat_frames(16000) == 98
    assert feat_frames(100) == 0


def test_collate_static_shapes():
    samples = [{"wave": np.ones(5000, np.float32), "n_samples": 5000,
                "tokens": np.array([4, 5, 6], np.int32), "id": "a", "index": 0},
               {"wave": np.ones(3000, np.float32), "n_samples": 3000,
                "tokens": np.array([7], np.int32), "id": "b", "index": 1}]
    b = collate_batch(samples, pad_id=3, seed=1, epoch=2, batch_multiple=4)
    assert b["wave"].shape[0] == 4                    # padded to multiple
    t_pad = length_grid(feat_frames(5000))
    assert b["wave"].shape[1] == (t_pad - 1) * 160 + 400
    np.testing.assert_array_equal(b["row_mask"], [True, True, False, False])
    np.testing.assert_array_equal(b["wave_lens"], [5000, 3000, 400, 400])
    np.testing.assert_array_equal(b["token_lens"], [3, 1, 0, 0])
    assert (b["tokens"][1, 1:] == 3).all()
    np.testing.assert_array_equal(b["aug_ref"], [1, 2])
    assert b["tokens"].shape[1] == 8


def test_bucket_sampler_budget():
    lengths = [10, 20, 30, 40, 50, 60, 70, 80]
    s = BucketBatchSampler(lengths, max_frames=100, shuffle=False)
    for batch in s:
        mx = max(lengths[i] for i in batch)
        assert len(batch) * mx <= 100
    covered = sorted(i for b in s for i in b)
    assert covered == list(range(8))


def test_bucket_sampler_sharding():
    lengths = list(range(10, 100, 3))
    a = BucketBatchSampler(lengths, 200, num_replicas=2, rank=0, seed=1)
    b = BucketBatchSampler(lengths, 200, num_replicas=2, rank=1, seed=1)
    assert len(a) == len(b)                           # equal count per rank
    ids_a = {i for bt in a for i in bt}
    ids_b = {i for bt in b for i in bt}
    assert not (ids_a & ids_b)                        # disjoint


def test_bucket_sampler_epoch_determinism():
    lengths = list(range(10, 200, 7))
    s1 = BucketBatchSampler(lengths, 300, shuffle=True, seed=5)
    s1.set_epoch(3)
    order1 = list(s1)
    s2 = BucketBatchSampler(lengths, 300, shuffle=True, seed=5)
    s2.set_epoch(3)
    assert order1 == list(s2)
    s2.set_epoch(4)
    assert order1 != list(s2)


def test_dataset_items_and_loader(corpus):
    manifest, tok = corpus
    ds = ASRDataset(manifest, tok, augment=False)
    assert len(ds) == len(TEXTS)
    item = ds[0]
    assert item["wave"].dtype == np.float32
    assert item["tokens"].ndim == 1 and len(item["tokens"]) > 0
    loader, sampler = make_dataloader(ds, max_frames=400, batch_multiple=2)
    batches = list(loader)
    assert sum(int(b["row_mask"].sum()) for b in batches) == len(TEXTS)
    for b in batches:
        assert b["wave"].shape[0] % 2 == 0
        assert set(b) >= {"wave", "wave_lens", "tokens", "token_lens",
                          "row_mask", "aug_ref", "item_index", "ids"}


def test_prefetch_matches_sync(corpus):
    manifest, tok = corpus
    ds = ASRDataset(manifest, tok, augment=False)
    sync_loader, _ = make_dataloader(ds, max_frames=400, batch_multiple=2)
    pre_loader, _ = make_dataloader(ds, max_frames=400, batch_multiple=2,
                                    prefetch=2)
    sync_batches = list(sync_loader)
    pre_batches = list(pre_loader)
    assert len(sync_batches) == len(pre_batches)
    for a, b in zip(sync_batches, pre_batches):
        np.testing.assert_array_equal(a["wave"], b["wave"])
        assert a["ids"] == b["ids"]


def test_prefetch_propagates_errors(corpus):
    manifest, tok = corpus
    ds = ASRDataset(manifest, tok, augment=False)
    ds.entries[0] = dict(ds.entries[0], audio="/nonexistent.wav")
    loader, _ = make_dataloader(ds, max_frames=4000, prefetch=2)
    with pytest.raises(Exception):
        list(loader)


def test_speed_perturb_expands_items(corpus):
    manifest, tok = corpus
    ds = ASRDataset(manifest, tok, augment=True, speed_perturb=[0.9, 1.0, 1.1])
    assert len(ds) == 3 * len(TEXTS)
    # perturbed ids are suffixed; identity factor keeps the raw id
    ids = {ds[i]["id"] for i in range(len(ds))}
    assert "utt0" in ids and "utt0#sp0.9" in ids and "utt0#sp1.1" in ids
    # expected length accounting for the sampler
    entry_frames = load_manifest(manifest)[0]["frames"]
    assert ds.lengths[0] == feat_frames(round(entry_frames / 0.9))


def test_perturbed_samples_matches_actual_resample():
    """The metadata-only sample-count formula must EXACTLY match what
    apply_speed_perturb produces — the multi-host row-sharded loader derives
    padded batch shapes from the manifest alone and a one-sample drift would
    desynchronize processes."""
    from hnet_mamba_asr_tpu.data.audio import apply_speed_perturb
    from hnet_mamba_asr_tpu.data.dataset import perturbed_samples

    rng = np.random.default_rng(1)
    for n in [400, 401, 4001, 16000, 16001, 54321]:
        wave = rng.normal(size=n).astype(np.float32)
        for f in (0.9, 1.0, 1.1):
            out = apply_speed_perturb(wave, 16000, f)
            assert len(out) == perturbed_samples(n, 16000, f), (n, f)


def test_row_shard_slices_assemble_to_global_batch(corpus):
    """Two row-sharded loaders' local arrays, concatenated in rank order,
    must equal the unsharded loader's padded global batch bit-for-bit."""
    manifest, tok = corpus
    def mk(row_shard):
        ds = ASRDataset(manifest, tok, augment=False)
        return make_dataloader(ds, max_frames=2500, batch_multiple=2,
                               row_shard=row_shard is not None,
                               rank=row_shard[0] if row_shard else 0,
                               num_replicas=row_shard[1] if row_shard else 1)[0]

    full = list(mk(None))
    shards = [list(mk((r, 2))) for r in range(2)]
    assert len(shards[0]) == len(shards[1]) == len(full)
    for fb, b0, b1 in zip(full, *shards):
        for key in ("wave", "wave_lens", "tokens", "token_lens", "row_mask",
                    "item_index"):
            np.testing.assert_array_equal(
                np.concatenate([b0[key], b1[key]], axis=0), fb[key], err_msg=key)
        np.testing.assert_array_equal(b0["aug_ref"], fb["aug_ref"])
        assert b0["ids"] + b1["ids"] == fb["ids"]


def test_row_shard_rejects_lying_manifest(corpus):
    manifest, tok = corpus
    ds = ASRDataset(manifest, tok, augment=False)
    ds.entries[0] = dict(ds.entries[0], frames=ds.entries[0]["frames"] + 7)
    ds.samples = [s + 7 for s in ds.samples]          # simulate stale metadata
    sampler = BucketBatchSampler(ds.lengths, 100000)
    loader = DataLoader(ds, sampler, batch_multiple=2, row_shard=(0, 2))
    with pytest.raises(ValueError, match="manifest"):
        list(loader)


# ---- int16 wire format (data.wire_dtype) -----------------------------------

def _pcm16_samples():
    """Two samples whose floats are exactly i/32768 (PCM16-representable)."""
    rng = np.random.default_rng(7)
    out = []
    for i, n in enumerate((5000, 3000)):
        ints = rng.integers(-32768, 32768, size=n).astype(np.int16)
        out.append({"wave": ints.astype(np.float32) / 32768.0, "n_samples": n,
                    "tokens": np.array([4 + i], np.int32), "id": f"s{i}",
                    "index": i})
    return out


def test_collate_int16_wire_exact_for_pcm16():
    samples = _pcm16_samples()
    b32 = collate_batch(samples, pad_id=3, seed=1, epoch=2)
    b16 = collate_batch(samples, pad_id=3, seed=1, epoch=2, wire_dtype="int16")
    assert b16["wave"].dtype == np.int16
    assert b16["wave"].shape == b32["wave"].shape
    # dequantized int16 wire == the float32 wire bit-for-bit (PCM16 source)
    np.testing.assert_array_equal(b16["wave"].astype(np.float32) / 32768.0,
                                  b32["wave"])
    # every non-wave field identical
    for k in ("wave_lens", "tokens", "token_lens", "row_mask", "item_index"):
        np.testing.assert_array_equal(b16[k], b32[k])


def test_collate_int16_wire_quantization_bound():
    # arbitrary floats (speed-perturb output): requantization error is at
    # most one PCM16 step (clip at the +1.0 edge costs a full 1/32768)
    rng = np.random.default_rng(3)
    w = np.clip(rng.normal(size=4096) * 0.4, -1.0, 1.0).astype(np.float32)
    s = [{"wave": w, "n_samples": len(w), "tokens": np.array([5], np.int32),
          "id": "q", "index": 0}]
    b16 = collate_batch(s, pad_id=3, seed=0, epoch=0, wire_dtype="int16")
    deq = b16["wave"][0, :len(w)].astype(np.float32) / 32768.0
    assert np.max(np.abs(deq - w)) <= 1.0 / 32768.0


def test_melspec_int16_wire_matches_float32():
    import jax.numpy as jnp

    from hnet_mamba_asr_tpu.ops.melspec import log_mel_spectrogram

    rng = np.random.default_rng(11)
    ints = rng.integers(-32768, 32768, size=(2, 4000)).astype(np.int16)
    lens = np.array([4000, 2500], np.int32)
    f32, l32 = log_mel_spectrogram(jnp.asarray(ints.astype(np.float32) / 32768.0),
                                   jnp.asarray(lens))
    f16, l16 = log_mel_spectrogram(jnp.asarray(ints), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    # the 1/32768 rescale is a power of two: bit-identical feature path
    np.testing.assert_array_equal(np.asarray(f32), np.asarray(f16))


def test_loader_wire_dtype_plumbed_and_validated(corpus):
    manifest, tok = corpus
    ds = ASRDataset(load_manifest(manifest), tok)
    loader, _ = make_dataloader(ds, max_frames=4000, wire_dtype="int16")
    batch = next(iter(loader))
    assert batch["wave"].dtype == np.int16
    with pytest.raises(ValueError, match="wire_dtype"):
        make_dataloader(ds, max_frames=4000, wire_dtype="int8")


def test_perturb_cache_bit_identical_and_corrupt_recovery(corpus, tmp_path):
    """With perturb_cache_dir set, the first fetch writes <id>#sp<f>.npy and
    later fetches return BIT-identical waves; a corrupt/truncated cache file
    is recomputed and replaced, never trusted."""
    manifest, tok = corpus
    plain = ASRDataset(manifest, tok, augment=True, speed_perturb=[0.9, 1.0, 1.1])
    cached = ASRDataset(manifest, tok, augment=True, speed_perturb=[0.9, 1.0, 1.1],
                        perturb_cache_dir=tmp_path / "pc")
    for i in range(len(plain)):
        np.testing.assert_array_equal(cached[i]["wave"], plain[i]["wave"])
    files = sorted(p.name for p in (tmp_path / "pc").iterdir())
    # only non-unit factors are cached (identity reads are already cheap)
    assert files and all("#sp" in f and "1.0" not in f for f in files)
    assert not any(".tmp" in f for f in files)        # atomic, no debris

    # warm fetches still bit-identical (now served from the cache)
    for i in range(len(plain)):
        np.testing.assert_array_equal(cached[i]["wave"], plain[i]["wave"])

    # corrupt one cache file: wrong length must be recomputed + replaced
    victim = (tmp_path / "pc") / files[0]
    np.save(victim, np.zeros(3, np.float32))
    idx = next(i for i in range(len(cached))
               if f"{cached.entries[cached.items[i][0]]['id']}#sp" +
               str(cached.items[i][1]) + ".npy" == files[0])
    np.testing.assert_array_equal(cached[idx]["wave"], plain[idx]["wave"])
    fixed = np.load(victim)
    assert len(fixed) == plain[idx]["n_samples"]


def test_perturb_cache_dir_plumbs_from_config(corpus, tmp_path):
    from pathlib import Path
    from hnet_mamba_asr_tpu.tasks.build import build_dataloaders
    manifest, tok = corpus
    root = Path(manifest).parent
    cfg = {"data": {"manifests_dir": str(root), "train_manifest": "train",
                    "perturb_cache_dir": str(tmp_path / "pcache")},
           "batch_bins": 2000, "train": {"speed_perturb": [0.9, 1.0, 1.1]}}
    loader, sampler, dev = build_dataloaders(cfg, root, tok, seed=0)
    assert loader.dataset.perturb_cache_dir == tmp_path / "pcache"
    next(iter(loader))                       # one batch populates the cache
    assert any((tmp_path / "pcache").iterdir())
