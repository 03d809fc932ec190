"""RNN-T full-pipeline learning proof: the transducer family trains to a
collapsed WER on the tone-word corpus through the REAL CLI scripts, then
decode -> score -> gate pass through the real scripts too (the RNNT analog
of tests/test_overfit_gate.py — same corpus, same gate bar).

The transducer's greedy decode only starts emitting once the loss is well
below ~0.1 (blank dominates every frame before that), so this gate trains
longer than the CTC one (240 tiny epochs, ~2 min CPU)."""
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from hnet_mamba_asr_tpu.data.synthetic import build_tone_corpus, overfit_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import build_tokenizer, compute_cmvn, train as train_script

    root = tmp_path_factory.mktemp("overfit_rnnt")
    build_tone_corpus(root)
    (root / "cfg.yaml").write_text(overfit_config(root))
    build_tokenizer.run(["--manifests",
                         str(root / "manifests" / "train-960.jsonl"),
                         "--out", str(root / "tok" / "bpe"),
                         "--vocab-size", "12", "--no-hard-limit"])
    compute_cmvn.run(["--manifest",
                      str(root / "manifests" / "train-960.jsonl"),
                      "--out", str(root / "cmvn.npz"), "--n-mels", "20"])
    train_script.run(train_script.parse_args(
        ["--config", str(root / "cfg.yaml"), "--exp-dir", str(root / "exp"),
         "model_conf.ctc_weight=0.0", "model_conf.rnnt_weight=1.0",
         "rnnt_conf.d_pred=32", "rnnt_conf.d_joint=64",
         "optim_conf.lr=5.0e-3", "train.max_epoch=240",
         "eval.valid_interval_epoch=40"]))
    return root


def test_rnnt_training_learns(trained):
    """Inline dev WER (RNNT greedy) must collapse over training."""
    lines = [json.loads(l) for l in
             (trained / "exp" / "metrics.jsonl").read_text().splitlines()]
    wers = [m["dev_dev-clean/wer"] for m in lines if "dev_dev-clean/wer" in m]
    assert len(wers) >= 3
    assert wers[-1] < 15.0, f"dev WER did not collapse: {wers}"
    assert wers[-1] < wers[0], f"no learning signal: {wers}"


def test_rnnt_decode_score_gate(trained):
    """decode (rnnt_greedy) -> score_wer: WER at the collapsed level through
    the real scoring pipeline."""
    import decode as decode_script, score_wer

    root = trained
    decode_script.run(decode_script.parse_args(
        ["--config", str(root / "cfg.yaml"),
         "--checkpoint", str(root / "exp" / "checkpoints" / "latest.ckpt"),
         "--splits", "test-clean", "--out-dir", str(root / "exp" / "decode"),
         "model_conf.ctc_weight=0.0", "model_conf.rnnt_weight=1.0",
         "rnnt_conf.d_pred=32", "rnnt_conf.d_joint=64",
         "decode.read_outs=[rnnt]", "decode.search=[greedy]",
         "score.gate_cell=rnnt_greedy"]))
    score_wer.run(score_wer.parse_args(
        ["--decode-dir", str(root / "exp" / "decode"),
         "--config", str(root / "cfg.yaml"), "--n-bootstrap", "50",
         "score.gate_cell=rnnt_greedy"]))
    scores = json.loads(
        (root / "exp" / "decode" / "score" / "scores.json").read_text())
    cell = scores["splits"]["test-clean"]["cells"]["rnnt_greedy"]
    assert cell["n_utts"] == 24
    assert cell["wer"] < 15.0
