"""Full-pipeline learning proof: train a tiny Type A CTC model on a synthetic
tone-word corpus through the REAL CLI scripts until train-split WER reaches
zero, then decode -> score -> gate through the real scripts too.

This is the closest this environment gets to the reference's <12.0 test-clean
WER gate (reference: src/dcasr/eval/score.py:187-209, configs/
typeA_small_N1.yaml goal block) — no LibriSpeech exists here, so the gate
proves the *pipeline learns*: if loss wiring, the optimizer, greedy decode, or
scoring silently breaks, WER stays high and this test fails."""
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from hnet_mamba_asr_tpu.data.synthetic import build_tone_corpus, overfit_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Corpus + tokenizer + CMVN + 40 epochs of training via scripts/train.py."""
    import build_tokenizer, compute_cmvn, train as train_script

    root = tmp_path_factory.mktemp("overfit")
    build_tone_corpus(root)
    (root / "cfg.yaml").write_text(overfit_config(root))
    build_tokenizer.run(["--manifests", str(root / "manifests" / "train-960.jsonl"),
                         "--out", str(root / "tok" / "bpe"),
                         "--vocab-size", "12", "--no-hard-limit"])
    compute_cmvn.run(["--manifest", str(root / "manifests" / "train-960.jsonl"),
                      "--out", str(root / "cmvn.npz"), "--n-mels", "20"])
    train_script.run(train_script.parse_args(
        ["--config", str(root / "cfg.yaml"), "--exp-dir", str(root / "exp")]))
    return root


def test_training_learns(trained):
    """Inline dev WER must collapse over training (74% -> 0% on this corpus)."""
    lines = [json.loads(l) for l in
             (trained / "exp" / "metrics.jsonl").read_text().splitlines()]
    wers = [m["dev_dev-clean/wer"] for m in lines if "dev_dev-clean/wer" in m]
    assert len(wers) >= 3, "expected validation every 10 epochs"
    assert wers[-1] < 5.0, f"dev WER did not collapse: {wers}"
    assert wers[-1] < wers[0], f"no learning signal: {wers}"


def test_decode_score_gate_pass(trained):
    """decode -> score_wer on the overfit model: the gate must PASS (exit 0)."""
    import decode as decode_script, score_wer

    root = trained
    decode_script.run(decode_script.parse_args(
        ["--config", str(root / "cfg.yaml"),
         "--checkpoint", str(root / "exp" / "checkpoints" / "latest.ckpt"),
         "--splits", "test-clean", "--out-dir", str(root / "exp" / "decode")]))
    # score_wer exits 2 on gate failure, returns normally on pass
    score_wer.run(score_wer.parse_args(
        ["--decode-dir", str(root / "exp" / "decode"),
         "--config", str(root / "cfg.yaml"), "--n-bootstrap", "50"]))
    scores = json.loads(
        (root / "exp" / "decode" / "score" / "scores.json").read_text())
    assert scores["gate"]["passed"] is True
    assert scores["gate"]["wer"] < 5.0
    cell = scores["splits"]["test-clean"]["cells"]["ctc_greedy"]
    assert cell["n_utts"] == 24
