"""FLAC codec: lossless round-trips across the feature matrix (channel modes,
bit depths, wasted bits, partitions, rice2, LPC/fixed), native C++ decoder vs
the Python oracle, corruption detection, and audio-IO dispatch."""
import numpy as np
import pytest

from hnet_mamba_asr_tpu.data import flac
from hnet_mamba_asr_tpu.utils import native


def _tone(rng, n, amp=4000, noise=200):
    t = np.arange(n)
    return (amp * np.sin(0.013 * t) + rng.normal(0, noise, n)).astype(np.int64)


def _roundtrip(tmp_path, samples, **kw):
    p = tmp_path / "t.flac"
    flac.write_flac(p, samples, 16000, **kw)
    out, sr, bps = flac.decode_flac_bytes(p.read_bytes())
    want = samples if samples.ndim == 2 else samples[:, None]
    assert sr == 16000
    np.testing.assert_array_equal(out, want)
    return p.read_bytes()


def test_mono_roundtrip_exact(rng, tmp_path):
    _roundtrip(tmp_path, _tone(rng, 9001))          # odd length: partial frame


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_modes_exact(rng, tmp_path, mode):
    left = _tone(rng, 7000)
    right = (left * 0.8 + rng.normal(0, 150, 7000)).astype(np.int64)
    _roundtrip(tmp_path, np.stack([left, right], 1), channel_mode=mode)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(rng, tmp_path, bps):
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, 5000)
    _roundtrip(tmp_path, x, bps=bps)


def test_full_scale_random_uses_escape(rng, tmp_path):
    """Incompressible data forces escape partitions and stays lossless."""
    x = rng.integers(-32768, 32768, 4096)
    data = _roundtrip(tmp_path, x)
    assert len(data) >= 4096 * 2                    # paid ~raw cost


def test_wasted_bits_partitions_rice2(rng, tmp_path):
    x = (_tone(rng, 8192) >> 5) << 5                # 5 wasted bits/sample
    small = _roundtrip(tmp_path, x, partition_order=3, rice2=True)
    plain = _roundtrip(tmp_path, _tone(rng, 8192))
    assert len(small) < len(plain)                  # wasted-bit packing pays


def test_fixed_only_and_silence(rng, tmp_path):
    _roundtrip(tmp_path, _tone(rng, 6000), use_lpc=False)
    _roundtrip(tmp_path, np.zeros(6000, np.int64))  # constant subframes
    _roundtrip(tmp_path, np.full(300, -17, np.int64))


def test_tiny_inputs(rng, tmp_path):
    for n in (1, 2, 3, 17):
        _roundtrip(tmp_path, rng.integers(-100, 100, n))


def test_float_input_matches_wav_convention(rng, tmp_path):
    wave_f = np.clip(rng.normal(0, 0.2, 4000), -1, 1)
    p = tmp_path / "f.flac"
    flac.write_flac(p, wave_f, 16000)
    out, _, bps = flac.decode_flac_bytes(p.read_bytes())
    want = np.round(np.clip(wave_f, -1, 1) * 32767).astype(np.int64)
    np.testing.assert_array_equal(out[:, 0], want)


def test_streaminfo_and_flac_info(rng, tmp_path):
    x = _tone(rng, 12345)
    p = tmp_path / "i.flac"
    flac.write_flac(p, x, 16000)
    info = flac.flac_info(p)
    assert info["total_samples"] == 12345
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1 and info["bps"] == 16
    import hashlib
    assert info["md5"] == hashlib.md5(
        x.astype("<i2").tobytes()).digest()          # spec MD5 of raw PCM


def test_crc_corruption_detected(rng, tmp_path):
    p = tmp_path / "c.flac"
    flac.write_flac(p, _tone(rng, 5000), 16000)
    data = bytearray(p.read_bytes())
    data[len(data) // 2] ^= 0x40                     # flip a payload bit
    with pytest.raises(ValueError):
        flac.decode_flac_bytes(bytes(data))


def test_truncated_and_garbage_raise():
    with pytest.raises(ValueError, match="fLaC"):
        flac.decode_flac_bytes(b"RIFFxxxx")
    with pytest.raises(ValueError):
        flac.decode_flac_bytes(b"fLaC" + b"\x00" * 10)


def test_read_audio_dispatch(rng, tmp_path):
    from hnet_mamba_asr_tpu.data.audio import audio_info, read_audio, write_wav

    x = _tone(rng, 8000)
    flac.write_flac(tmp_path / "a.flac", x, 16000)
    write_wav(tmp_path / "a.wav", x / 32768.0, 16000)
    wf, sr_f = read_audio(tmp_path / "a.flac")
    ww, sr_w = read_audio(tmp_path / "a.wav")
    assert sr_f == sr_w == 16000
    np.testing.assert_allclose(wf, x / 32768.0)      # FLAC path is exact
    ai = audio_info(tmp_path / "a.flac")
    assert ai["frames"] == 8000 and ai["sample_rate"] == 16000
    with pytest.raises(ValueError, match="container"):
        read_audio(tmp_path / "a.mp3")


def test_stereo_read_audio_downmixes(rng, tmp_path):
    left = _tone(rng, 4000)
    right = rng.integers(-1000, 1000, 4000)
    flac.write_flac(tmp_path / "s.flac", np.stack([left, right], 1), 16000)
    from hnet_mamba_asr_tpu.data.audio import read_audio
    w, _ = read_audio(tmp_path / "s.flac")
    np.testing.assert_allclose(w, (left + right) / 2 / 32768.0)


def test_manifest_counts_flac_frames(rng, tmp_path):
    from hnet_mamba_asr_tpu.data.manifests import _flac_frames

    flac.write_flac(tmp_path / "m.flac", _tone(rng, 23456), 16000)
    assert _flac_frames(tmp_path / "m.flac") == 23456


# ── native C++ decoder parity ─────────────────────────────────────────────────
needs_native = pytest.mark.skipif(
    native.lib is None, reason="native library unavailable (no g++?)")


@needs_native
def test_native_parity_fuzz(rng, tmp_path):
    """Native decode must be bit-identical to the Python oracle across the
    randomized feature matrix."""
    p = tmp_path / "z.flac"
    modes = ["independent", "left_side", "right_side", "mid_side"]
    for trial in range(12):
        n = int(rng.integers(1, 9000))
        stereo = bool(rng.integers(0, 2))
        bps = int(rng.choice([8, 16, 24]))
        lim = 1 << (bps - 1)
        if rng.integers(0, 2):
            x = _tone(rng, n, amp=min(4000, lim // 2), noise=lim / 200)
        else:
            x = rng.integers(-lim, lim, n)
        x = np.clip(x, -lim, lim - 1)
        kw = dict(bps=bps, partition_order=int(rng.integers(0, 4)),
                  rice2=bool(rng.integers(0, 2)),
                  use_lpc=bool(rng.integers(0, 2)),
                  blocksize=int(rng.choice([256, 1024, 4096])))
        if stereo:
            x = np.stack([x, np.roll(x, 7)], 1)
            kw["channel_mode"] = modes[int(rng.integers(0, 4))]
        flac.write_flac(p, x, 16000, **kw)
        data = p.read_bytes()
        got = native.flac_decode(data)
        assert got is not None, (trial, kw)
        ref, sr, rbps = flac.decode_flac_bytes(data)
        assert got[1] == sr and got[2] == rbps
        np.testing.assert_array_equal(got[0], ref, err_msg=str((trial, kw)))


@needs_native
def test_native_rejects_corruption(rng, tmp_path):
    p = tmp_path / "r.flac"
    flac.write_flac(p, _tone(rng, 5000), 16000)
    data = bytearray(p.read_bytes())
    data[len(data) - 10] ^= 0x01
    assert native.flac_decode(bytes(data)) is None   # falls back to oracle


@needs_native
def test_read_flac_uses_native(rng, tmp_path, monkeypatch):
    """read_flac must go through the native fast path when available and
    produce the exact oracle output."""
    x = _tone(rng, 6000)
    p = tmp_path / "n.flac"
    flac.write_flac(p, x, 16000)
    calls = []
    orig = native.flac_decode
    monkeypatch.setattr(native, "flac_decode",
                        lambda d: (calls.append(1), orig(d))[1])
    w, sr = flac.read_flac(p)
    assert calls, "native path not taken"
    np.testing.assert_allclose(w, x / 32768.0)
