"""Acoustic frontend assembly: log-mel + frozen global CMVN (+ SpecAugment keys).

The device-side ops live in ``ops/melspec.py`` / ``ops/specaug.py``; this module
owns their configuration and the host-side CMVN statistics workflow:

- ``Frontend``: a frozen config bundle whose ``__call__`` runs the fused
  waveform -> log-mel (+CMVN) pipeline under jit.
- ``GlobalCMVN``: frozen mean/istd applied as ``(x - mean) * istd``; ``.npz``
  serialization.
- ``CMVNAccumulator``: streaming float64 mean/var over valid frames (fp32 sums
  drift over train-960's ~3e8 frames — reference: src/dcasr/data/features.py:8,89).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from hnet_mamba_asr_tpu.ops.melspec import (
    HOP_LENGTH, N_MELS, SAMPLE_RATE, WIN_LENGTH, frame_count, log_mel_spectrogram,
)
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


class GlobalCMVN:
    """Frozen global mean/variance normalization."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.istd = (1.0 / np.asarray(std, dtype=np.float32))

    def __call__(self, feats):
        return (feats - self.mean) * self.istd

    def save(self, path: str | Path) -> None:
        np.savez(path, mean=self.mean, std=1.0 / self.istd)

    @classmethod
    def load(cls, path: str | Path) -> "GlobalCMVN":
        stats = np.load(path)
        return cls(stats["mean"], stats["std"])


class CMVNAccumulator:
    """Streaming fp64 mean/var statistics over valid (unpadded) frames."""

    def __init__(self, n_mels: int = N_MELS):
        self.sum = np.zeros(n_mels, dtype=np.float64)
        self.sumsq = np.zeros(n_mels, dtype=np.float64)
        self.count = 0

    def update(self, feats, lengths=None) -> None:
        x = np.asarray(feats, dtype=np.float64)
        if x.ndim == 2:
            x = x[None]
        if lengths is not None:
            valid = np.arange(x.shape[1])[None, :] < np.asarray(lengths)[:, None]
            x = x[valid]                                 # [K, n_mels]
        else:
            x = x.reshape(-1, x.shape[-1])
        self.sum += x.sum(axis=0)
        self.sumsq += (x ** 2).sum(axis=0)
        self.count += x.shape[0]

    def finalize(self, var_floor: float = 1e-8) -> dict:
        if self.count == 0:
            raise RuntimeError("no frames accumulated")
        mean = self.sum / self.count
        var = np.maximum(self.sumsq / self.count - mean ** 2, var_floor)
        return {"mean": mean.astype(np.float32), "std": np.sqrt(var).astype(np.float32),
                "count": self.count}

    def save(self, path: str | Path) -> dict:
        stats = self.finalize()
        np.savez(path, **stats)
        logger.info("CMVN stats saved to %s (count=%d)", path, stats["count"])
        return stats


@dataclass
class Frontend:
    """Config bundle for the fused waveform -> normalized log-mel pipeline."""
    sample_rate: int = SAMPLE_RATE
    n_mels: int = N_MELS
    win_length: int = WIN_LENGTH
    hop_length: int = HOP_LENGTH
    cmvn: GlobalCMVN | None = field(default=None)

    def frame_count(self, num_samples):
        return frame_count(np.asarray(num_samples), self.win_length, self.hop_length)

    def __call__(self, wave, lengths=None):
        """wave [B,N] or [N] -> (feats [B,T,n_mels], feat_lengths [B])."""
        feats, flens = log_mel_spectrogram(
            jnp.asarray(wave), None if lengths is None else jnp.asarray(lengths),
            win_length=self.win_length, hop_length=self.hop_length,
            n_mels=self.n_mels, sample_rate=self.sample_rate)
        if self.cmvn is not None:
            feats = (feats - jnp.asarray(self.cmvn.mean)) * jnp.asarray(self.cmvn.istd)
        return feats, flens
