"""Text-only dataset for external-LM training.

Serves tokenized lines lazily from a large corpus (byte-offset line index
cached beside the file — a 40M-line corpus is never held in RAM) or from an
in-memory list (dev sets from manifest transcripts). Bucketing uses EXACT
per-line token counts cached per (corpus, tokenizer), so the sampler's token
budget is a hard per-batch memory bound (behavioral spec: reference
src/dcasr/data/lm_text.py). Cache writes are per-pid tmp + atomic rename so
concurrent builders can't race.

Collate emits a static-shape batch with row_mask (same contract as the ASR
collate minus the waveform keys), so the model-agnostic Trainer trains the LM
unchanged.
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Iterator

import numpy as np

from hnet_mamba_asr_tpu.data.dataset import BucketBatchSampler
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


def _build_line_index(corpus_path: Path) -> np.ndarray:
    offsets, pos = [], 0
    with open(corpus_path, "rb") as f:
        for raw in f:
            if raw.strip():
                offsets.append(pos)
            pos += len(raw)
    return np.asarray(offsets, dtype=np.int64)


def load_line_index(corpus_path: str | Path) -> np.ndarray:
    """Cached byte offsets of non-empty lines; rebuilt when the file changes."""
    corpus_path = Path(corpus_path)
    cache = corpus_path.with_suffix(corpus_path.suffix + ".idx.npz")
    stat = corpus_path.stat()
    if cache.exists():
        try:
            z = np.load(cache)
            if (int(z["size"]) == stat.st_size
                    and int(z["mtime_ns"]) == stat.st_mtime_ns):
                return z["offsets"]
            logger.info("corpus changed; rebuilding line index %s", cache.name)
        except Exception:
            logger.warning("unreadable line-index cache %s; rebuilding", cache.name)
    offsets = _build_line_index(corpus_path)
    tmp = cache.with_suffix(f".tmp{os.getpid()}.npz")
    np.savez(tmp, offsets=offsets, size=np.int64(stat.st_size),
             mtime_ns=np.int64(stat.st_mtime_ns))
    os.replace(tmp, cache)
    logger.info("line index: %d non-empty lines -> %s", len(offsets), cache.name)
    return offsets


def load_token_lengths(corpus_path: str | Path, tokenizer,
                       offsets: np.ndarray) -> np.ndarray:
    """EXACT per-line token counts, cached per (corpus, tokenizer model).

    Exact counts make the sampler's token budget a hard bound (+1 bos/eos wrap
    only) — deterministic device memory, no estimate-overshoot tail.
    """
    corpus_path = Path(corpus_path)
    stat = corpus_path.stat()
    tok_path = Path(tokenizer.model_path)
    tok_stat = tok_path.stat()
    cache = corpus_path.with_suffix(corpus_path.suffix + f".len.{tok_path.stem}.npz")
    if cache.exists():
        try:
            z = np.load(cache)
            if (int(z["size"]) == stat.st_size
                    and int(z["mtime_ns"]) == stat.st_mtime_ns
                    and int(z["tok_size"]) == tok_stat.st_size
                    and int(z["tok_mtime_ns"]) == tok_stat.st_mtime_ns
                    and len(z["lengths"]) == len(offsets)):
                return z["lengths"]
            logger.info("stale token-length cache %s; rebuilding", cache.name)
        except Exception:
            logger.warning("unreadable token-length cache %s; rebuilding", cache.name)
    t0 = time.time()
    counts = _count_tokens(corpus_path, tok_path, offsets)
    tmp = cache.with_suffix(f".tmp{os.getpid()}.npz")
    np.savez(tmp, lengths=counts, size=np.int64(stat.st_size),
             mtime_ns=np.int64(stat.st_mtime_ns), tok_size=np.int64(tok_stat.st_size),
             tok_mtime_ns=np.int64(tok_stat.st_mtime_ns))
    os.replace(tmp, cache)
    logger.info("token lengths: %d lines in %.0f s -> %s",
                len(counts), time.time() - t0, cache.name)
    return counts


_POOL_TOKENIZER = None


def _pool_init(model_path: str) -> None:
    global _POOL_TOKENIZER
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    _POOL_TOKENIZER = Tokenizer(model_path)


def _pool_count(lines: list[str]) -> list[int]:
    return [len(_POOL_TOKENIZER.encode(line)) for line in lines]


def _count_tokens(corpus_path: Path, tok_path: Path,
                  offsets: np.ndarray) -> np.ndarray:
    """Exact per-line token counts; a fork pool parallelizes the encode pass
    over CPU cores (one pooled pass over a 40M-line corpus, mirroring the
    reference's approach; falls back to in-process on single-core hosts)."""
    import multiprocessing as mp

    counts = np.empty(len(offsets), dtype=np.int32)
    n_procs = min(12, os.cpu_count() or 1)
    chunk = 20000

    def line_chunks():
        with open(corpus_path, "rb") as f:
            buf = []
            for off in offsets:
                f.seek(int(off))
                buf.append(f.readline().decode("utf-8").strip())
                if len(buf) == chunk:
                    yield buf
                    buf = []
            if buf:
                yield buf

    if n_procs <= 1 or len(offsets) < chunk:
        _pool_init(str(tok_path))
        pos = 0
        for lines in line_chunks():
            counts[pos:pos + len(lines)] = _pool_count(lines)
            pos += len(lines)
        return counts
    with mp.get_context("fork").Pool(n_procs, _pool_init,
                                     (str(tok_path),)) as pool:
        pos = 0
        for res in pool.imap(_pool_count, line_chunks()):
            counts[pos:pos + len(res)] = res
            pos += len(res)
    return counts


class LMTextDataset:
    """Tokenized text lines for next-token LM training (lazy or in-memory)."""

    def __init__(self, tokenizer, *, corpus_path: str | Path | None = None,
                 lines: list[str] | None = None, max_tokens: int = 512):
        if (corpus_path is None) == (lines is None):
            raise ValueError("exactly one of corpus_path / lines")
        self.tokenizer = tokenizer
        self.pad_id = tokenizer.pad_id
        self.max_tokens = int(max_tokens)
        self._fh = None
        self.corpus_path = Path(corpus_path) if corpus_path is not None else None
        if self.corpus_path is not None:
            self.offsets = load_line_index(self.corpus_path)
            counts = load_token_lengths(self.corpus_path, tokenizer, self.offsets)
            self.lengths = [max(1, min(self.max_tokens, int(c))) for c in counts]
            self.lines = None
        else:
            self.lines = [l.strip() for l in lines if l.encode("utf-8").strip()]
            self.offsets = None
            self.lengths = [max(1, min(self.max_tokens, len(tokenizer.encode(l))))
                            for l in self.lines]
        self.epoch = 0
        logger.info("LMTextDataset: %d lines (%s, max_tokens=%d)", len(self.lengths),
                    self.corpus_path.name if self.corpus_path else "in-memory",
                    self.max_tokens)

    @classmethod
    def from_manifest(cls, manifest_path: str | Path, tokenizer, **kw) -> "LMTextDataset":
        with open(manifest_path, encoding="utf-8") as f:
            lines = [json.loads(l)["text"] for l in f if l.strip()]
        return cls(tokenizer, lines=lines, **kw)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _line(self, idx: int) -> str:
        if self.lines is not None:
            return self.lines[idx]
        if self._fh is None:
            self._fh = open(self.corpus_path, "rb")
        self._fh.seek(int(self.offsets[idx]))
        return self._fh.readline().decode("utf-8").strip()

    def __len__(self) -> int:
        return len(self.lengths)

    def __getitem__(self, idx: int) -> dict:
        ids = self.tokenizer.encode(self._line(idx))[:self.max_tokens]
        if not ids:                                  # unknown-only line: keep one token
            ids = [self.tokenizer.unk_id]
        return {"tokens": np.asarray(ids, dtype=np.int32), "id": f"line{idx}"}


def _fill_lm_rows(rows: list[dict | None], u_pad: int, pad_id: int) -> dict:
    """Materialize padded LM arrays for ``rows`` (None = padding row)."""
    R = len(rows)
    tokens = np.full((R, u_pad), pad_id, dtype=np.int32)
    lens = np.zeros(R, dtype=np.int32)
    row_mask = np.zeros(R, dtype=bool)
    ids = []
    for i, it in enumerate(rows):
        if it is None:
            continue
        tokens[i, :len(it["tokens"])] = it["tokens"]
        lens[i] = len(it["tokens"])
        row_mask[i] = True
        ids.append(it["id"])
    return {"tokens": tokens, "token_lens": lens, "row_mask": row_mask,
            "ids": ids}


def collate_lm(items: list[dict], *, pad_id: int, batch_multiple: int = 1,
               token_multiple: int = 16) -> dict:
    """Static-shape LM batch with row masking (tokens-only contract)."""
    B = len(items)
    B_pad = -(-B // batch_multiple) * batch_multiple
    u_max = max(len(it["tokens"]) for it in items)
    u_pad = max(-(-u_max // token_multiple) * token_multiple, token_multiple)
    rows = list(items) + [None] * (B_pad - B)
    return _fill_lm_rows(rows, u_pad, pad_id)


class LMDataLoader:
    """``row_shard=(rank, count)`` = the multi-host mode (see
    data/dataset.py DataLoader): the sampler is unsharded, every process
    computes pad targets from the dataset's exact cached token lengths, and
    materializes only its contiguous row slice."""

    def __init__(self, dataset: LMTextDataset, sampler: BucketBatchSampler,
                 batch_multiple: int = 1,
                 row_shard: tuple[int, int] | None = None,
                 token_multiple: int = 16):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_multiple = batch_multiple
        self.token_multiple = token_multiple
        self.row_shard = tuple(row_shard) if row_shard else None
        if self.row_shard:
            rank, count = self.row_shard
            if not (0 <= rank < count):
                raise ValueError(f"row_shard rank {rank} not in [0, {count})")
            if batch_multiple % count:
                raise ValueError(
                    f"row_shard needs batch_multiple ({batch_multiple}) "
                    f"divisible by process count ({count})")

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[dict]:
        for idxs in self.sampler:
            if self.row_shard is None:
                yield collate_lm([self.dataset[i] for i in idxs],
                                 pad_id=self.dataset.pad_id,
                                 batch_multiple=self.batch_multiple,
                                 token_multiple=self.token_multiple)
                continue
            rank, count = self.row_shard
            B = len(idxs)
            B_pad = -(-B // self.batch_multiple) * self.batch_multiple
            u_max = max(self.dataset.lengths[i] for i in idxs)
            u_pad = max(-(-u_max // self.token_multiple) * self.token_multiple,
                        self.token_multiple)
            per = B_pad // count
            lo = rank * per
            rows = []
            for r in range(lo, lo + per):
                if r >= B:
                    rows.append(None)
                    continue
                it = self.dataset[idxs[r]]
                if len(it["tokens"]) != self.dataset.lengths[idxs[r]]:
                    raise ValueError(
                        f"line {idxs[r]}: cached token length "
                        f"{self.dataset.lengths[idxs[r]]} != actual "
                        f"{len(it['tokens'])} — stale token-length cache "
                        f"would break the multi-host equal-shape contract")
                rows.append(it)
            yield _fill_lm_rows(rows, u_pad, self.dataset.pad_id)


def make_lm_dataloader(dataset: LMTextDataset, batch_tokens: int, *, shuffle: bool,
                       seed: int = 0, num_replicas: int = 1, rank: int = 0,
                       batch_multiple: int = 1, row_shard: bool = False):
    """``row_shard=True`` turns (rank, num_replicas) into row sharding of a
    shared global batch sequence (multi-host); else batch-granularity."""
    sampler = BucketBatchSampler(dataset.lengths, batch_tokens,
                                 1 if row_shard else num_replicas,
                                 0 if row_shard else rank,
                                 shuffle=shuffle, seed=seed)
    loader = LMDataLoader(dataset, sampler, batch_multiple,
                          row_shard=(rank, num_replicas) if row_shard else None)
    return loader, sampler
