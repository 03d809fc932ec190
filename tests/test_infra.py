"""utils: metrics logger channels, provenance defensiveness, audio IO round trip."""
import json
import math

import numpy as np
import pytest

from hnet_mamba_asr_tpu.data.audio import (
    apply_speed_perturb, audio_info, read_wav, resample, write_wav,
)
from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger
from hnet_mamba_asr_tpu.utils.provenance import collect_provenance, fingerprint_file


def test_metrics_logger_jsonl_and_summary(tmp_path):
    ml = MetricsLogger(tmp_path, tensorboard=False)
    ml.log_scalars({"train/loss": 1.5, "train/lr": 1e-3}, step=10, split="train", epoch=0)
    ml.log_scalar("dev/wer", 42.0, step=10)
    ml.update_summary(best_wer=42.0)
    ml.append_summary("provenance", {"seed": 0})
    ml.append_summary("provenance", {"seed": 1})
    ml.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["train/loss"] == 1.5 and lines[0]["step"] == 10
    assert lines[1]["dev/wer"] == 42.0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["best_wer"] == 42.0
    assert [p["seed"] for p in summary["provenance"]] == [0, 1]


def test_metrics_logger_resume_appends(tmp_path):
    ml = MetricsLogger(tmp_path, tensorboard=False)
    ml.log_scalar("a", 1.0, 1)
    ml.update_summary(x=1)
    ml.close()
    ml = MetricsLogger(tmp_path, resume=True, tensorboard=False)
    ml.log_scalar("a", 2.0, 2)
    ml.close()
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    # appended (not truncated), with an explicit resume marker between the
    # segments so writer-integrity checks can allow re-logged steps
    assert [l.get("event", l.get("step")) for l in lines] == [1, "resume", 2]
    assert json.loads((tmp_path / "summary.json").read_text())["x"] == 1
    # fresh run truncates
    ml = MetricsLogger(tmp_path, resume=False, tensorboard=False)
    ml.close()
    assert (tmp_path / "metrics.jsonl").read_text() == ""


def test_metrics_logger_noop_for_non_main(tmp_path):
    ml = MetricsLogger(tmp_path / "sub", is_main=False)
    ml.log_scalar("a", 1.0, 1)
    ml.update_summary(x=1)
    ml.close()
    assert not (tmp_path / "sub").exists()


def test_histogram(tmp_path):
    ml = MetricsLogger(tmp_path, tensorboard=False)
    ml.log_histogram("h", np.arange(10.0), step=5)
    ml.close()
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["h/mean"] == pytest.approx(4.5)
    assert rec["h/n"] == 10


def test_provenance_never_raises(tmp_path):
    rec = collect_provenance({"batch_bins": 64000, "accum_grad": 2}, repo_root=tmp_path,
                             n_devices=4, seed=7,
                             artifacts={"missing": tmp_path / "nope.bin"})
    assert rec["seed"] == 7
    assert rec["batch"]["effective_global_frames"] == 64000 * 2 * 4
    json.dumps(rec, default=str)                          # JSON-serializable


def test_fingerprint(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"hello")
    fp = fingerprint_file(f)
    assert fp["bytes"] == 5
    assert len(fp["sha256"]) == 64


def test_wav_round_trip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * math.pi * 440.0 * t)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr and len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3                    # PCM16 quantization
    info = audio_info(p)
    assert info["frames"] == sr and info["duration_s"] == pytest.approx(1.0)


def test_resample_preserves_tone(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * math.pi * 440.0 * t)
    y = resample(x, sr, 8000)
    assert abs(len(y) - sr // 2) <= 2
    # dominant frequency must stay 440 Hz at the new rate
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    peak_hz = np.argmax(spec) * 8000 / (len(y) - 400)
    assert abs(peak_hz - 440.0) < 5.0


def test_speed_perturb_duration():
    sr = 16000
    x = np.random.default_rng(0).normal(size=sr).astype(np.float64)
    fast = apply_speed_perturb(x, sr, 1.1)
    slow = apply_speed_perturb(x, sr, 0.9)
    assert apply_speed_perturb(x, sr, 1.0) is x          # identity bit-exact
    assert abs(len(fast) - sr / 1.1) < 200
    assert abs(len(slow) - sr / 0.9) < 200
