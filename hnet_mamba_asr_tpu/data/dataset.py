"""Host-side dataset + bucketed batching feeding the fused device frontend.

TPU-first split of responsibilities (vs the reference, which computes log-mel/
CMVN/SpecAugment inside DataLoader workers — reference:
src/dcasr/data/librispeech.py:116-133): the host only reads audio, applies
speed perturbation, tokenizes, and pads; **waveforms go to the device raw**,
and the frontend (framing+rFFT+mel+CMVN+SpecAugment) runs as part of the jitted
train step. SpecAugment determinism is carried by (seed, epoch, item_index)
integers shipped with the batch, from which the step derives per-utterance
jax.random keys — resume-exact, like the reference's seeded generators.

Static shapes for XLA: padded lengths snap to a geometric grid and batch rows
pad to a multiple of ``batch_multiple`` with ``row_mask`` marking real rows, so
one training run compiles a handful of executables instead of one per batch.

Speed perturbation expands the item list x len(factors) (each utterance once
per factor, Kaldi-style deterministic 3x data).
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from hnet_mamba_asr_tpu.data.audio import apply_speed_perturb, read_audio
from hnet_mamba_asr_tpu.data.manifests import SAMPLE_RATE, feat_frames, load_manifest
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


def length_grid(value: int, *, base: int = 256, ratio: float = 1.25) -> int:
    """Snap a length up to a geometric grid (bounded compile count)."""
    if value <= base:
        return base
    steps = math.ceil(math.log(value / base) / math.log(ratio))
    return int(math.ceil(base * ratio ** steps))


class ASRDataset:
    """Yields {wave, n_samples, tokens, id, index}; lengths known up front."""

    def __init__(self, manifest, tokenizer, *, augment: bool = False, seed: int = 0,
                 speed_perturb: Sequence[float] | None = None,
                 sample_rate: int = SAMPLE_RATE):
        self.entries = (load_manifest(manifest)
                        if isinstance(manifest, (str, Path)) else list(manifest))
        self.tokenizer = tokenizer
        self.augment = augment
        self.seed = seed
        self.sample_rate = sample_rate
        self.epoch = 0
        self.factors = ([float(f) for f in speed_perturb]
                        if (augment and speed_perturb) else [1.0])
        self.items = [(i, f) for i in range(len(self.entries)) for f in self.factors]
        self.lengths = [feat_frames(round(self.entries[i]["frames"] / f))
                        for i, f in self.items]
        self.pad_id = tokenizer.pad_id

    def __len__(self) -> int:
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __getitem__(self, i: int) -> dict:
        idx, factor = self.items[i]
        e = self.entries[idx]
        wave, sr = read_audio(e["audio"])
        if sr != self.sample_rate:
            raise ValueError(f"{e['audio']}: sample rate {sr} != {self.sample_rate}")
        if factor != 1.0:
            wave = apply_speed_perturb(wave, self.sample_rate, factor)
        uid = e["id"] if factor == 1.0 else f"{e['id']}#sp{factor}"
        tokens = np.asarray(self.tokenizer.encode(e["text"]), dtype=np.int32)
        return {"wave": wave.astype(np.float32), "n_samples": len(wave),
                "tokens": tokens, "id": uid, "index": i}


def collate_batch(samples: Sequence[dict], *, pad_id: int, seed: int, epoch: int,
                  batch_multiple: int = 1, snap_lengths: bool = True,
                  token_multiple: int = 8) -> dict:
    """Pad a list of items into a static-shape batch with row masking."""
    B = len(samples)
    B_pad = -(-B // batch_multiple) * batch_multiple
    n_max = max(s["n_samples"] for s in samples)
    if snap_lengths:
        # snap the FEATURE length to the grid, then convert back to samples
        t_pad = length_grid(feat_frames(n_max))
        n_pad = (t_pad - 1) * 160 + 400
    else:
        n_pad = n_max
    u_max = max(len(s["tokens"]) for s in samples)
    u_pad = max(-(-u_max // token_multiple) * token_multiple, token_multiple)

    wave = np.zeros((B_pad, n_pad), dtype=np.float32)
    wave_lens = np.zeros(B_pad, dtype=np.int32)
    tokens = np.full((B_pad, u_pad), pad_id, dtype=np.int32)
    token_lens = np.zeros(B_pad, dtype=np.int32)
    indices = np.zeros(B_pad, dtype=np.int32)
    for i, s in enumerate(samples):
        wave[i, :s["n_samples"]] = s["wave"][:n_pad]
        wave_lens[i] = min(s["n_samples"], n_pad)
        tokens[i, :len(s["tokens"])] = s["tokens"]
        token_lens[i] = len(s["tokens"])
        indices[i] = s["index"]
    row_mask = np.zeros(B_pad, dtype=bool)
    row_mask[:B] = True
    # wave_lens for padded rows must cover one window so the frontend is valid
    wave_lens[B:] = 400
    return {"wave": wave, "wave_lens": wave_lens, "tokens": tokens,
            "token_lens": token_lens, "row_mask": row_mask,
            "aug_ref": np.array([seed, epoch], dtype=np.int32),
            "item_index": indices, "ids": [s["id"] for s in samples]}


class BucketBatchSampler:
    """Length-bucketed dynamic batches under a ``max_frames = max(B*T)`` budget,
    sharded across processes with an equal batch count per process; shuffled
    deterministically by (seed, epoch). Mirrors the reference sampler's
    semantics (reference: src/dcasr/data/librispeech.py:154-202) with JAX
    process sharding in place of DDP ranks."""

    def __init__(self, lengths, max_frames: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.lengths = list(lengths)
        self.max_frames = max_frames
        self.num_replicas = max(1, num_replicas)
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self._batches = self._compute()

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self._batches = self._compute()

    def _all_batches(self) -> list[list[int]]:
        order = sorted(range(len(self.lengths)), key=lambda i: self.lengths[i])
        batches, cur, cur_max = [], [], 0
        for i in order:
            new_max = max(cur_max, self.lengths[i])
            if cur and (len(cur) + 1) * new_max > self.max_frames:
                batches.append(cur)
                cur, cur_max = [i], self.lengths[i]
            else:
                cur.append(i)
                cur_max = new_max
        if cur:
            batches.append(cur)
        return batches

    def _compute(self) -> list[list[int]]:
        batches = self._all_batches()
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            batches = [batches[k] for k in rng.permutation(len(batches))]
        usable = (len(batches) // self.num_replicas) * self.num_replicas
        return batches[self.rank:usable:self.num_replicas]

    def __iter__(self):
        return iter(self._batches)

    def __len__(self) -> int:
        return len(self._batches)


class DataLoader:
    """Single-host loader: sampler -> fetch -> collate. Deterministic; exposes
    ``set_epoch`` for both the sampler shuffle and augmentation keying.

    ``prefetch > 0`` overlaps host IO/collate with device compute via a
    background thread and a bounded queue (order preserved; exceptions
    re-raised on the consumer side)."""

    def __init__(self, dataset: ASRDataset, sampler: BucketBatchSampler, *,
                 batch_multiple: int = 1, snap_lengths: bool = True,
                 prefetch: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_multiple = batch_multiple
        self.snap_lengths = snap_lengths
        self.prefetch = int(prefetch)

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def _make(self, batch_idx) -> dict:
        samples = [self.dataset[i] for i in batch_idx]
        return collate_batch(samples, pad_id=self.dataset.pad_id,
                             seed=self.dataset.seed, epoch=self.dataset.epoch,
                             batch_multiple=self.batch_multiple,
                             snap_lengths=self.snap_lengths)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            for batch_idx in self.sampler:
                yield self._make(batch_idx)
            return
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker(indices):
            try:
                for batch_idx in indices:
                    q.put(("ok", self._make(batch_idx)))
            except BaseException as e:  # noqa: BLE001 - re-raised on consumer
                q.put(("err", e))
            finally:
                q.put(("ok", SENTINEL))

        t = threading.Thread(target=worker, args=(list(self.sampler),),
                             daemon=True)
        t.start()
        while True:
            kind, item = q.get()
            if kind == "err":
                raise item
            if item is SENTINEL:
                break
            yield item


def make_dataloader(dataset: ASRDataset, max_frames: int, *, shuffle: bool = False,
                    seed: int = 0, num_replicas: int = 1, rank: int = 0,
                    batch_multiple: int = 1, snap_lengths: bool = True,
                    prefetch: int = 0):
    sampler = BucketBatchSampler(dataset.lengths, max_frames, num_replicas, rank,
                                 shuffle=shuffle, seed=seed)
    loader = DataLoader(dataset, sampler, batch_multiple=batch_multiple,
                        snap_lengths=snap_lengths, prefetch=prefetch)
    return loader, sampler
