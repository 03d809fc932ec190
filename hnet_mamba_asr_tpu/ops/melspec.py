"""Log-mel spectrogram as one jittable XLA op: framing + rFFT + mel + log.

TPU-native replacement for the reference's torchaudio MelSpectrogram C++ path
(reference: src/dcasr/data/features.py:29-67). Same tensor contract:

    waveform [B, N] @ 16 kHz -> feats [B, T, n_mels],  T = 1 + (N - win) // hop

- ``center=False`` framing: every frame covers real samples only, so features
  of a zero-padded batch are bit-identical to per-utterance features on all
  valid frames (masked by the returned lengths).
- periodic Hann window; power spectrum (|.|^2); HTK mel scale, unnormalized
  triangular filters (torchaudio defaults), log with a 1e-10 floor.

The mel filterbank application is a [n_freq, n_mels] matmul — MXU work — and
XLA fuses framing/window/log around the rFFT, so the whole frontend compiles
into the input side of the train step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_MELS = 80
WIN_LENGTH = 400          # 25 ms
HOP_LENGTH = 160          # 10 ms -> 100 Hz
LOG_FLOOR = 1e-10


def frame_count(num_samples, win_length: int = WIN_LENGTH, hop_length: int = HOP_LENGTH):
    """Feature-frame count for an n-sample waveform (center=False contract)."""
    return jnp.maximum(0, (num_samples - win_length) // hop_length + 1)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """[n_freqs, n_mels] triangular filterbank, HTK mel scale, no normalization."""
    if f_max is None:
        f_max = sample_rate / 2.0
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)                                  # [n_mels + 2]
    # triangle m spans (hz[m], hz[m+1], hz[m+2])
    lower = (freqs[:, None] - hz_pts[None, :-2]) / np.maximum(
        hz_pts[1:-1] - hz_pts[:-2], 1e-10)[None, :]
    upper = (hz_pts[None, 2:] - freqs[:, None]) / np.maximum(
        hz_pts[2:] - hz_pts[1:-1], 1e-10)[None, :]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def windowed_dft_matrices(win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """[win, F] cos/sin DFT matrices with the Hann window pre-folded.

    The TPU has no FFT unit and XLA's FFT lowering is slow (measured 134 ms of
    a 175 ms train step for this frontend); an explicit rDFT as two matmuls is
    MXU work and ~2 orders faster at win=400. Computed in fp64, cast to fp32.
    """
    n_freqs = win_length // 2 + 1
    n = np.arange(win_length, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / win_length
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))    # [win, 1]
    return ((np.cos(ang) * w).astype(np.float32),
            ((-np.sin(ang)) * w).astype(np.float32))


@partial(jax.jit, static_argnames=("win_length", "hop_length", "n_mels", "sample_rate"))
def log_mel_spectrogram(wave: jax.Array, lengths: jax.Array | None = None, *,
                        win_length: int = WIN_LENGTH, hop_length: int = HOP_LENGTH,
                        n_mels: int = N_MELS, sample_rate: int = SAMPLE_RATE):
    """waveform [B, N] (or [N]) -> (log-mel feats [B, T, n_mels], feat_lengths [B]).

    T is determined by the PADDED length N; frames beyond ``feat_lengths`` are
    garbage-free (they see zero padding) but should be masked downstream.
    """
    if wave.ndim == 1:
        wave = wave[None, :]
    B, N = wave.shape
    if N < win_length:
        raise ValueError(f"waveform ({N} samples) shorter than one window ({win_length})")
    if lengths is None:
        lengths = jnp.full((B,), N, dtype=jnp.int32)
    if jnp.issubdtype(wave.dtype, jnp.integer):
        # int16 PCM wire format (data.wire_dtype: int16): the loader ships
        # quantized samples to halve host->device bytes; i/32768 restores the
        # float path exactly for PCM16 sources. The scale fuses into the DFT
        # matmul below, so the device-side cost is zero.
        wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
    else:
        wave = wave.astype(jnp.float32)

    # TPU-fast STFT: (1) framing as STATIC slices of a hop-aligned reshape —
    # rows[t] = wave[t*hop : (t+1)*hop], frame t = rows t..t+k concatenated —
    # no dynamic gather (XLA lowers big gathers poorly); (2) rDFT as two MXU
    # matmuls with the Hann window folded into the basis matrices (TPUs have
    # no FFT unit; jnp.fft.rfft + gather cost 130 ms of a 540 ms train step).
    T = 1 + (N - win_length) // hop_length
    k_full, rem = divmod(win_length, hop_length)
    n_rows = T + k_full + (1 if rem else 0)
    wave_p = jnp.pad(wave, ((0, 0), (0, n_rows * hop_length - N)))
    rows = wave_p.reshape(B, n_rows, hop_length)
    pieces = [rows[:, i:T + i] for i in range(k_full)]
    if rem:
        pieces.append(rows[:, k_full:T + k_full, :rem])
    frames = jnp.concatenate(pieces, axis=-1)                    # [B, T, win]
    dft_cos, dft_sin = (jnp.asarray(m)
                        for m in windowed_dft_matrices(win_length))
    re = jax.lax.dot_general(frames, dft_cos, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    im = jax.lax.dot_general(frames, dft_sin, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    power = re * re + im * im                                    # [B, T, W//2+1]
    fb = jnp.asarray(mel_filterbank(win_length // 2 + 1, n_mels, sample_rate))
    mel = jax.lax.dot_general(power, fb, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, LOG_FLOOR))
    return feats, frame_count(lengths.astype(jnp.int32), win_length, hop_length)
