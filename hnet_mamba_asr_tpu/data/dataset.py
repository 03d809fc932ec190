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
import os
from fractions import Fraction
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


def perturbed_samples(n_samples: int, sample_rate: int, factor: float) -> int:
    """EXACT output sample count of ``apply_speed_perturb`` from metadata.

    Mirrors data/audio.py:resample's arithmetic term for term (same Fraction
    reduction, same float ceil) so padded batch shapes are derivable from the
    manifest alone — the property the multi-host row-sharded loader depends
    on (every process must compute identical pad targets without reading the
    other processes' audio)."""
    if factor == 1.0:
        return int(n_samples)
    virtual_sr = int(round(sample_rate / float(factor)))
    if virtual_sr == sample_rate:
        return int(n_samples)
    frac = Fraction(virtual_sr, sample_rate).limit_denominator(1000)
    return int(np.ceil(n_samples * frac.numerator / frac.denominator))


class ASRDataset:
    """Yields {wave, n_samples, tokens, id, index}; lengths known up front."""

    def __init__(self, manifest, tokenizer, *, augment: bool = False, seed: int = 0,
                 speed_perturb: Sequence[float] | None = None,
                 sample_rate: int = SAMPLE_RATE,
                 perturb_cache_dir: str | Path | None = None):
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
        # exact per-item sample counts (metadata-only; matches the fetched
        # wave length exactly — asserted on the row-sharded path)
        self.samples = [perturbed_samples(self.entries[i]["frames"], sample_rate, f)
                        for i, f in self.items]
        self.lengths = [feat_frames(s) for s in self.samples]
        self.pad_id = tokenizer.pad_id
        self.perturb_cache_dir = (Path(perturb_cache_dir)
                                  if perturb_cache_dir else None)
        if self.perturb_cache_dir is not None:
            self.perturb_cache_dir.mkdir(parents=True, exist_ok=True)
        self._tok_len_cache: dict[int, int] = {}

    def token_len(self, item: int) -> int:
        """Token count for item ``item`` from text alone (cached per entry)."""
        idx, _ = self.items[item]
        n = self._tok_len_cache.get(idx)
        if n is None:
            n = len(self.tokenizer.encode(self.entries[idx]["text"]))
            self._tok_len_cache[idx] = n
        return n

    def __len__(self) -> int:
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _cached_perturb(self, e: dict, factor: float) -> np.ndarray:
        """Resample-once disk cache for speed-perturbed waveforms.

        The polyphase resample is ~2/3 of the host pipeline cost (profiled;
        the reference recomputes it every epoch through torchaudio —
        /root/reference/src/dcasr/data/librispeech.py speed-perturb path).
        With ``perturb_cache_dir`` set, every (utterance, factor) pair is
        resampled once and epochs >= 2 read a .npy back bit-identically
        (float32 is exactly what the compute path returns). A cache file
        with the wrong sample count (partial write from a crashed run,
        stale manifest) is recomputed and atomically replaced, never
        trusted."""
        cache = self.perturb_cache_dir / f"{e['id']}#sp{factor}.npy"
        expect = perturbed_samples(e["frames"], self.sample_rate, factor)
        if cache.exists():
            try:
                w = np.load(cache)
                if len(w) == expect and w.dtype == np.float32:
                    return w
            except Exception:  # noqa: BLE001 - corrupt cache = recompute
                pass
        wave, sr = read_audio(e["audio"])
        if sr != self.sample_rate:
            raise ValueError(f"{e['audio']}: sample rate {sr} != "
                             f"{self.sample_rate}")
        wave = apply_speed_perturb(wave, self.sample_rate, factor)
        wave = wave.astype(np.float32)
        tmp = cache.with_suffix(f".tmp{os.getpid()}.npy")
        try:
            np.save(tmp, wave)
            os.replace(tmp, cache)
        except OSError:                      # read-only/full disk: still train
            tmp.unlink(missing_ok=True)
        return wave

    def __getitem__(self, i: int) -> dict:
        idx, factor = self.items[i]
        e = self.entries[idx]
        if factor != 1.0 and self.perturb_cache_dir is not None:
            wave = self._cached_perturb(e, factor)
        else:
            wave, sr = read_audio(e["audio"])
            if sr != self.sample_rate:
                raise ValueError(f"{e['audio']}: sample rate {sr} != "
                                 f"{self.sample_rate}")
            if factor != 1.0:
                wave = apply_speed_perturb(wave, self.sample_rate, factor)
        uid = e["id"] if factor == 1.0 else f"{e['id']}#sp{factor}"
        tokens = np.asarray(self.tokenizer.encode(e["text"]), dtype=np.int32)
        return {"wave": wave.astype(np.float32), "n_samples": len(wave),
                "tokens": tokens, "id": uid, "index": i}


def pad_targets(n_samples_list: Sequence[int], token_lens_list: Sequence[int], *,
                batch_multiple: int = 1, snap_lengths: bool = True,
                token_multiple: int = 8) -> tuple[int, int, int]:
    """(B_pad, n_pad, u_pad) for a batch, from length metadata only.

    Shared by the local collate and the multi-host row-sharded loader so pad
    targets are identical whether computed from fetched waves or from the
    manifest (perturbed_samples keeps those two equal)."""
    B = len(n_samples_list)
    B_pad = -(-B // batch_multiple) * batch_multiple
    n_max = max(n_samples_list)
    if snap_lengths:
        # snap the FEATURE length to the grid, then convert back to samples
        t_pad = length_grid(feat_frames(n_max))
        n_pad = (t_pad - 1) * 160 + 400
    else:
        n_pad = n_max
    u_max = max(token_lens_list)
    u_pad = max(-(-u_max // token_multiple) * token_multiple, token_multiple)
    return B_pad, n_pad, u_pad


def _fill_rows(rows: Sequence[dict | None], n_pad: int, u_pad: int, *,
               pad_id: int, seed: int, epoch: int,
               wire_dtype: str = "float32") -> dict:
    """Materialize padded arrays for ``rows`` (None = padding row).

    ``wire_dtype="int16"`` ships PCM16-quantized waveforms (half the
    host->device bytes of float32 — the dominant per-step upload). The
    frontend rescales by 1/32768 on device (ops/melspec.py), which is EXACT
    for PCM16 sources; speed-perturbed rows re-quantize with error <=
    1/65536 of full scale (below the source medium's own quantization)."""
    R = len(rows)
    wave = np.zeros((R, n_pad),
                    dtype=np.int16 if wire_dtype == "int16" else np.float32)
    # wave_lens for padded rows must cover one window so the frontend is valid
    wave_lens = np.full(R, 400, dtype=np.int32)
    tokens = np.full((R, u_pad), pad_id, dtype=np.int32)
    token_lens = np.zeros(R, dtype=np.int32)
    indices = np.zeros(R, dtype=np.int32)
    row_mask = np.zeros(R, dtype=bool)
    ids = []
    for i, s in enumerate(rows):
        if s is None:
            continue
        w = s["wave"][:n_pad]
        if wave.dtype == np.int16:
            w = np.clip(np.round(w * 32768.0), -32768, 32767)
        wave[i, :min(s["n_samples"], n_pad)] = w
        wave_lens[i] = min(s["n_samples"], n_pad)
        tokens[i, :len(s["tokens"])] = s["tokens"]
        token_lens[i] = len(s["tokens"])
        indices[i] = s["index"]
        row_mask[i] = True
        ids.append(s["id"])
    return {"wave": wave, "wave_lens": wave_lens, "tokens": tokens,
            "token_lens": token_lens, "row_mask": row_mask,
            "aug_ref": np.array([seed, epoch], dtype=np.int32),
            "item_index": indices, "ids": ids}


def collate_batch(samples: Sequence[dict], *, pad_id: int, seed: int, epoch: int,
                  batch_multiple: int = 1, snap_lengths: bool = True,
                  token_multiple: int = 8, wire_dtype: str = "float32") -> dict:
    """Pad a list of items into a static-shape batch with row masking."""
    B_pad, n_pad, u_pad = pad_targets(
        [s["n_samples"] for s in samples], [len(s["tokens"]) for s in samples],
        batch_multiple=batch_multiple, snap_lengths=snap_lengths,
        token_multiple=token_multiple)
    rows = list(samples) + [None] * (B_pad - len(samples))
    return _fill_rows(rows, n_pad, u_pad, pad_id=pad_id, seed=seed, epoch=epoch,
                      wire_dtype=wire_dtype)


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
    re-raised on the consumer side).

    ``row_shard=(rank, count)`` is the MULTI-HOST mode: the sampler must be
    unsharded (every process iterates the identical global batch sequence)
    and each process materializes only its contiguous row slice
    ``[rank*B_pad/count, (rank+1)*B_pad/count)`` — pad targets are computed
    from metadata over ALL rows, so every process produces the same padded
    local shape and ``parallel.mesh.shard_batch`` can assemble the true
    global batch from the per-process slices. This replaces batch-granularity
    sharding (reference DDP: src/dcasr/data/librispeech.py:154-202, where
    ranks may hold different shapes per step) because jit SPMD requires one
    identical global shape on every process at every step."""

    def __init__(self, dataset: ASRDataset, sampler: BucketBatchSampler, *,
                 batch_multiple: int = 1, snap_lengths: bool = True,
                 prefetch: int = 0, row_shard: tuple[int, int] | None = None,
                 wire_dtype: str = "float32"):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_multiple = batch_multiple
        self.snap_lengths = snap_lengths
        self.prefetch = int(prefetch)
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32|int16, got {wire_dtype!r}")
        self.wire_dtype = wire_dtype
        self.row_shard = tuple(row_shard) if row_shard else None
        if self.row_shard:
            rank, count = self.row_shard
            if not (0 <= rank < count):
                raise ValueError(f"row_shard rank {rank} not in [0, {count})")
            if batch_multiple % count:
                raise ValueError(
                    f"row_shard needs batch_multiple ({batch_multiple}) "
                    f"divisible by process count ({count}) so every process "
                    f"gets an equal row slice")

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def _fetch_checked(self, item: int, expect_samples: int) -> dict:
        s = self.dataset[item]
        if s["n_samples"] != expect_samples:
            e = self.dataset.entries[self.dataset.items[item][0]]
            raise ValueError(
                f"{e['audio']}: audio has {s['n_samples']} samples but the "
                f"manifest-derived expectation is {expect_samples}. On a "
                f"row-sharded (multi-host) run pad targets come from "
                f"metadata, so a lying manifest would silently break the "
                f"equal-shape contract — fix the manifest 'frames' field.")
        return s

    def _make(self, batch_idx) -> dict:
        if self.row_shard is None:
            samples = [self.dataset[i] for i in batch_idx]
            return collate_batch(samples, pad_id=self.dataset.pad_id,
                                 seed=self.dataset.seed, epoch=self.dataset.epoch,
                                 batch_multiple=self.batch_multiple,
                                 snap_lengths=self.snap_lengths,
                                 wire_dtype=self.wire_dtype)
        rank, count = self.row_shard
        n_samps = [self.dataset.samples[i] for i in batch_idx]
        tok_lens = [self.dataset.token_len(i) for i in batch_idx]
        B = len(batch_idx)
        B_pad, n_pad, u_pad = pad_targets(
            n_samps, tok_lens, batch_multiple=self.batch_multiple,
            snap_lengths=self.snap_lengths)
        per = B_pad // count
        lo = rank * per
        rows = [self._fetch_checked(batch_idx[r], n_samps[r]) if r < B else None
                for r in range(lo, lo + per)]
        return _fill_rows(rows, n_pad, u_pad, pad_id=self.dataset.pad_id,
                          seed=self.dataset.seed, epoch=self.dataset.epoch,
                          wire_dtype=self.wire_dtype)

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
                    prefetch: int = 0, row_shard: bool = False,
                    wire_dtype: str = "float32"):
    """``row_shard=True`` turns (rank, num_replicas) into ROW sharding of a
    shared global batch sequence (the multi-host contract — see DataLoader);
    otherwise ranks take disjoint batches (single-host / host-local use)."""
    sampler = BucketBatchSampler(dataset.lengths, max_frames,
                                 1 if row_shard else num_replicas,
                                 0 if row_shard else rank,
                                 shuffle=shuffle, seed=seed)
    loader = DataLoader(dataset, sampler, batch_multiple=batch_multiple,
                        snap_lengths=snap_lengths, prefetch=prefetch,
                        row_shard=(rank, num_replicas) if row_shard else None,
                        wire_dtype=wire_dtype)
    return loader, sampler
