"""Frontend: log-mel vs an independent numpy STFT oracle, padding invariance,
CMVN accumulator, SpecAugment determinism + policy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.data.features import CMVNAccumulator, Frontend, GlobalCMVN
from hnet_mamba_asr_tpu.ops.melspec import (
    frame_count, hann_window, log_mel_spectrogram, mel_filterbank,
)
from hnet_mamba_asr_tpu.ops.specaug import augment_key, spec_augment


def oracle_logmel(wave, win=400, hop=160, n_mels=80, sr=16000):
    """Independent numpy implementation (explicit loops, fp64)."""
    T = 1 + (len(wave) - win) // hop
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win) / win))
    spec = np.empty((T, win // 2 + 1))
    for t in range(T):
        fr = wave[t * hop:t * hop + win] * w
        spec[t] = np.abs(np.fft.rfft(fr)) ** 2
    fb = mel_filterbank(win // 2 + 1, n_mels, sr).astype(np.float64)
    return np.log(np.maximum(spec @ fb, 1e-10))


def test_against_oracle(rng):
    wave = rng.normal(size=4000).astype(np.float32)
    feats, flens = log_mel_spectrogram(jnp.asarray(wave))
    ref = oracle_logmel(wave.astype(np.float64))
    assert feats.shape == (1, ref.shape[0], 80)
    assert int(flens[0]) == ref.shape[0]
    # fp32 rFFT vs fp64 oracle: tiny mel energies amplify log-domain error
    np.testing.assert_allclose(np.asarray(feats[0]), ref, rtol=0, atol=2e-2)


def test_frame_count_formula():
    assert int(frame_count(400)) == 1
    assert int(frame_count(559)) == 1
    assert int(frame_count(560)) == 2
    assert int(frame_count(100)) == 0
    assert int(frame_count(16000)) == 98


def test_padding_invariance(rng):
    """Zero-padded batch features == per-utterance features on valid frames."""
    w1 = rng.normal(size=3200).astype(np.float32)
    w2 = rng.normal(size=4800).astype(np.float32)
    N = 4800
    batch = np.zeros((2, N), dtype=np.float32)
    batch[0, :3200] = w1
    batch[1] = w2
    feats_b, flens = log_mel_spectrogram(jnp.asarray(batch),
                                         jnp.asarray([3200, 4800]))
    feats_1, _ = log_mel_spectrogram(jnp.asarray(w1))
    T1 = int(flens[0])
    # frames see real samples only (center=False); tiny fp divergence is allowed
    # because XLA may batch the rFFT differently for different batch shapes
    np.testing.assert_allclose(np.asarray(feats_b[0, :T1]), np.asarray(feats_1[0]),
                               rtol=0, atol=1e-5)


def test_short_waveform_raises():
    with pytest.raises(ValueError, match="shorter than one window"):
        log_mel_spectrogram(jnp.zeros((1, 100)))


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(201, 80, 16000)
    assert fb.shape == (201, 80)
    assert fb.min() >= 0
    # every filter has positive mass and interior frequencies are covered
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[5:-5].sum(axis=1) > 0).any()


def test_hann_periodic():
    w = hann_window(400)
    assert w[0] == 0.0
    assert abs(w[200] - 1.0) < 1e-6                      # peak at N/2 for periodic


def test_cmvn_accumulator(rng):
    acc = CMVNAccumulator(n_mels=8)
    data = rng.normal(loc=3.0, scale=2.0, size=(10, 50, 8))
    lengths = rng.integers(10, 50, size=10)
    for i in range(10):
        acc.update(data[i], [lengths[i]])
    stats = acc.finalize()
    valid = np.concatenate([data[i, :lengths[i]] for i in range(10)])
    np.testing.assert_allclose(stats["mean"], valid.mean(0), rtol=1e-5)
    np.testing.assert_allclose(stats["std"], valid.std(0), rtol=1e-4)
    assert stats["count"] == int(lengths.sum())


def test_cmvn_save_load(tmp_path, rng):
    acc = CMVNAccumulator(n_mels=4)
    acc.update(rng.normal(size=(5, 20, 4)))
    stats = acc.save(tmp_path / "cmvn.npz")
    cm = GlobalCMVN.load(tmp_path / "cmvn.npz")
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    out = cm(x)
    np.testing.assert_allclose(out, (x - stats["mean"]) / stats["std"], rtol=1e-5)


def test_frontend_with_cmvn(rng):
    wave = rng.normal(size=(2, 4000)).astype(np.float32)
    fe = Frontend(cmvn=GlobalCMVN(np.full(80, 1.0), np.full(80, 2.0)))
    feats, flens = fe(wave)
    raw, _ = log_mel_spectrogram(jnp.asarray(wave))
    np.testing.assert_allclose(np.asarray(feats), (np.asarray(raw) - 1.0) / 2.0,
                               rtol=1e-5, atol=1e-5)


# ── SpecAugment ────────────────────────────────────────────────────────────────
def _batch(rng, B=3, T=60, F=20):
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32)) + 5.0
    lengths = jnp.asarray([60, 40, 25])
    keys = jnp.stack([augment_key(0, 1, i) for i in range(B)])
    return feats, lengths, keys


def test_specaug_deterministic(rng):
    feats, lengths, keys = _batch(rng)
    a = spec_augment(feats, lengths, keys)
    b = spec_augment(feats, lengths, keys)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    keys2 = jnp.stack([augment_key(0, 2, i) for i in range(3)])
    c = spec_augment(feats, lengths, keys2)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_specaug_masks_are_zero_and_bounded(rng):
    feats, lengths, keys = _batch(rng)
    out = np.asarray(spec_augment(feats, lengths, keys,
                                  freq_masks=2, freq_width=5,
                                  time_masks=2, time_width=10))
    # masked cells are exactly 0; everything else untouched
    diff = (out != np.asarray(feats))
    assert (out[diff] == 0.0).all()
    # time masks never start inside padding: rows beyond length can only be
    # masked via frequency masks (full columns) — check utterance 2 (len 25)
    pad_region = diff[2, 25:, :]
    if pad_region.any():
        cols = pad_region.any(axis=0)
        full_freq_cols = diff[2, :25, :].all(axis=0)
        assert np.all(cols <= full_freq_cols | ~cols)    # only full-column hits


def test_specaug_ratio_mode(rng):
    feats, lengths, keys = _batch(rng)
    out = np.asarray(spec_augment(feats, lengths, keys, freq_masks=0, freq_width=0,
                                  time_masks=1, time_width=0, time_width_ratio=0.5))
    # per-utt cap: at most ceil(0.5 * length) frames masked on any utterance
    for i, L in enumerate([60, 40, 25]):
        masked_rows = (out[i] != np.asarray(feats)[i]).any(axis=1).sum()
        assert masked_rows <= int(0.5 * L) + 1


def test_augment_key_distinct():
    k1, k2, k3 = augment_key(0, 0, 0), augment_key(0, 0, 1), augment_key(1, 0, 0)
    assert not np.array_equal(k1, k2)
    assert not np.array_equal(k1, k3)
