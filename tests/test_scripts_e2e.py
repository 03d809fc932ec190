"""End-to-end pipeline smoke: build_tokenizer -> compute_cmvn -> train (1 epoch)
-> train_lm (1 epoch) -> decode (all 7 cells) -> score_wer, all through the
real CLI entry points on synthetic audio. The TPU analog of the reference's
smoke_2gpu.sh programmatic verifier."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

TEXTS = ["aa bb cc", "bb aa", "cc cc bb", "aa", "bb cc", "cc aa aa bb"]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from hnet_mamba_asr_tpu.data.audio import write_wav
    from hnet_mamba_asr_tpu.data.flac import write_flac
    from hnet_mamba_asr_tpu.data.manifests import write_manifest

    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    (root / "manifests").mkdir()
    entries = []
    for i, text in enumerate(TEXTS):
        n = int(rng.integers(4000, 9000))
        wave = rng.normal(size=n) * 0.1
        # alternate containers: the pipeline must consume WAV and FLAC alike
        if i % 2:
            path = root / f"u{i}.flac"
            write_flac(path, wave, 16000)
        else:
            path = root / f"u{i}.wav"
            write_wav(path, wave, 16000)
        entries.append({"id": f"u{i}", "audio": str(path),
                        "text": text, "frames": n})
    write_manifest(entries[:4], root / "manifests" / "train-960.jsonl")
    write_manifest(entries[4:], root / "manifests" / "dev-clean.jsonl")
    write_manifest(entries[4:], root / "manifests" / "test-clean.jsonl")
    (root / "data" / "lm").mkdir(parents=True)
    (root / "data" / "lm" / "corpus.txt").write_text("\n".join(TEXTS * 10))
    return root


def _write_cfg(root: Path) -> Path:
    cfg = f"""
experiment: {{name: smoke, seed: 0}}
data:
  manifests_dir: {root}/manifests
  train_manifest: train-960
  dev_splits: [dev-clean]
  eval_splits: [test-clean]
  wire_dtype: int16            # production wire format through the real CLIs
  lm_corpus: {root}/data/lm/corpus.txt
bpemodel: {root}/tok/bpe.model
frontend_conf: {{sample_rate: 16000, n_mels: 20, win_length: 400, hop_length: 160,
                 cmvn: {root}/cmvn.npz}}
specaug_conf: {{num_freq_mask: 1, freq_mask_width_range: [0, 3],
                num_time_mask: 1, time_mask_width_range: [0, 5]}}
encoder: dcasr
encoder_conf: {{arch_type: A, d_outer: 16, d_main: 24, n_enc: 1, n_main: 1,
                n_dec: 1, d_state: 8, headdim: 8, ssd_chunk_size: 16,
                hnet: {{compression_N: 1}}}}
head: ctc
aed_conf: {{n_layers: 1, n_heads: 2, d_ff: 32, dropout: 0.0, max_decode_len: 8}}
model_conf: {{ctc_weight: 0.5, aed_weight: 0.5, lsm_weight: 0.1}}
lm_conf: {{d_model: 16, n_layers: 1, n_heads: 2, d_ff: 32, dropout: 0.0,
           lsm_weight: 0.0, max_line_tokens: 32}}
batch_bins: 2000
batch_tokens: 64
optim: adamw
optim_conf: {{lr: 1.0e-3}}
scheduler: warmuplr
scheduler_conf: {{warmup_steps: 5}}
train: {{max_epoch: 1, grad_clip: 5.0, precision: fp32, log_interval: 1}}
eval: {{valid_interval_epoch: 1}}
best_model_criterion: [[valid, loss, min]]
keep_nbest_models: 2
decode:
  read_outs: [ctc, aed, joint]
  search: [greedy, beam]
  beam_size: 2
  pre_beam: 4
  ctc_weight: 0.3
  lm: enabled
  lm_config: {root}/cfg.yaml
  lm_checkpoint: {root}/exp_lm/checkpoints/latest.ckpt
  lm_weight: 0.2
  rescore_weight: 0.3
  batch_bins: 2000
score: {{gate_cell: ctc_greedy}}
goal: {{sane_test_clean_wer_below: 12.0}}
"""
    path = root / "cfg.yaml"
    path.write_text(cfg)
    return path


def test_full_pipeline(workspace):
    root = workspace
    cfg_path = _write_cfg(root)

    import build_tokenizer, compute_cmvn, decode as decode_script
    import score_wer, train as train_script, train_lm as train_lm_script

    # 1. tokenizer
    build_tokenizer.run(["--manifests", str(root / "manifests" / "train-960.jsonl"),
                         "--out", str(root / "tok" / "bpe"),
                         "--vocab-size", "24", "--no-hard-limit"])
    assert (root / "tok" / "bpe.model").exists()

    # 2. CMVN
    compute_cmvn.run(["--manifest", str(root / "manifests" / "train-960.jsonl"),
                      "--out", str(root / "cmvn.npz"), "--n-mels", "20"])
    assert (root / "cmvn.npz").exists()

    # 3. ASR training (1 epoch)
    train_script.run(train_script.parse_args(
        ["--config", str(cfg_path), "--exp-dir", str(root / "exp")]))
    assert (root / "exp" / "checkpoints" / "latest.ckpt").exists()
    metrics = [json.loads(l) for l in
               (root / "exp" / "metrics.jsonl").read_text().splitlines()]
    assert any("train/loss" in m or "loss/total" in m for m in metrics)
    summary = json.loads((root / "exp" / "summary.json").read_text())
    assert "provenance" in summary and "best_valid_loss" in summary

    # 4. LM training (1 epoch)
    train_lm_script.run(train_lm_script.parse_args(
        ["--config", str(cfg_path), "--exp-dir", str(root / "exp_lm")]))
    assert (root / "exp_lm" / "checkpoints" / "latest.ckpt").exists()

    # 5. decode all 7 cells
    decode_script.run(decode_script.parse_args(
        ["--config", str(cfg_path),
         "--checkpoint", str(root / "exp" / "checkpoints" / "latest.ckpt"),
         "--splits", "test-clean", "--out-dir", str(root / "exp" / "decode")]))
    cells = sorted(p.name for p in (root / "exp" / "decode").iterdir()
                   if p.is_dir() and p.name != "logs")
    assert cells == ["aed_beam", "aed_beam_lm", "ctc_beam", "ctc_beam_lm",
                     "ctc_greedy", "joint_beam", "joint_beam_lm"]
    recs = [json.loads(l) for l in
            (root / "exp" / "decode" / "ctc_greedy" / "test-clean.jsonl")
            .read_text().splitlines()]
    assert len(recs) == 2
    assert all(set(r) >= {"id", "ref", "hyp", "decode_s", "audio_s"} for r in recs)

    # 6. score + gate (untrained model: gate will FAIL -> exit code 2 is fine)
    with pytest.raises(SystemExit) as exc:
        score_wer.run(score_wer.parse_args(
            ["--decode-dir", str(root / "exp" / "decode"),
             "--config", str(cfg_path), "--n-bootstrap", "50"]))
    assert exc.value.code == 2
    scores = json.loads(
        (root / "exp" / "decode" / "score" / "scores.json").read_text())
    assert set(scores["splits"]["test-clean"]["cells"]) == set(cells)
    assert scores["gate"]["evaluated"]
    report = (root / "exp" / "decode" / "score" / "report.txt").read_text()
    assert "GATE" in report

    # 7. serving export from the trained checkpoint, served via the
    # self-contained runtime — hyp ids must match a live greedy decode
    import export_serving
    export_serving.run(export_serving.parse_args(
        ["--config", str(cfg_path),
         "--checkpoint", str(root / "exp" / "checkpoints" / "latest.ckpt"),
         "--out", str(root / "serve"), "--buckets", "2x16000",
         "--emit", "frame_ids"]))
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer as bt
    from hnet_mamba_asr_tpu.tasks.decode_task import load_model_params
    from hnet_mamba_asr_tpu.utils.config import load_config
    sm = load_serving_artifact(root / "serve")
    cfg = load_config(cfg_path, [])
    tok = bt(cfg, root)
    assert sm.vocab_size == tok.vocab_size and sm.blank_id == tok.vocab_size
    model = build_model(cfg, tok.vocab_size, cmvn=build_cmvn(cfg, root))
    params, _ = load_model_params(root / "exp" / "checkpoints" / "latest.ckpt")
    rng = np.random.default_rng(3)
    wave = (rng.normal(size=(2, 9000)) * 0.1).astype(np.float32)
    lens = np.array([9000, 7200], np.int32)
    served_ids = sm.transcribe_ids(wave, lens)
    live = model.greedy_decode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 16000 - 9000))),
                 "wave_lens": lens})
    assert served_ids == live
    # the export CLI embeds the tokenizer -> standalone text == tok.decode
    assert sm.transcribe_text(wave, lens) == [tok.decode(r) for r in live]

    # 8. ad-hoc transcription CLI (no manifest): hyp == live greedy decode
    import transcribe
    out_jsonl = root / "adhoc.jsonl"
    wavs = [str(root / "u0.wav"), str(root / "u2.wav")]
    recs = transcribe.run(transcribe.parse_args(
        ["--config", str(cfg_path),
         "--checkpoint", str(root / "exp" / "checkpoints" / "latest.ckpt"),
         "--cell", "ctc_greedy", "--out", str(out_jsonl)] + wavs))
    assert [r["id"] for r in recs] == wavs
    from hnet_mamba_asr_tpu.data.audio import read_wav
    for r, p in zip(recs, wavs):
        w, sr = read_wav(p)
        S = ((w.shape[0] + sr - 1) // sr) * sr           # the CLI's 1 s grid
        ids = model.greedy_decode(
            params, {"wave": np.pad(w, (0, S - w.shape[0]))[None, :]
                     .astype(np.float32),
                     "wave_lens": np.array([w.shape[0]], np.int32)})[0]
        assert r["hyp"] == tok.decode(ids)


def test_train_cli_parallel_planes(workspace):
    """train.sp / train.pp / train.fsdp reach the Trainer from YAML (the
    flatten_config generic hoist): each CLI branch builds its mesh/adapter
    and completes a real 1-epoch run. Regression for the dropped-train-keys
    bug — before the hoist, these branches were unreachable from config."""
    import train as train_script
    root = workspace
    cfg_path = _write_cfg(root)
    if not (root / "tok" / "bpe.model").exists():   # standalone-run support
        import build_tokenizer, compute_cmvn
        build_tokenizer.run(
            ["--manifests", str(root / "manifests" / "train-960.jsonl"),
             "--out", str(root / "tok" / "bpe"),
             "--vocab-size", "24", "--no-hard-limit"])
        compute_cmvn.run(
            ["--manifest", str(root / "manifests" / "train-960.jsonl"),
             "--out", str(root / "cmvn.npz"), "--n-mels", "20"])
    base = ["--config", str(cfg_path)]

    # pipeline parallel: n_main must divide pp -> n_main=2
    tr = train_script.run(train_script.parse_args(
        base + ["--exp-dir", str(root / "exp_pp"), "train.pp=2",
                "encoder_conf.n_main=2"]))
    assert type(tr.model).__name__ == "PPModel"
    assert tr.global_step > 0 and "pp" in tr.mesh.axis_names

    # sequence parallel: tiny utts all snap to the 256-frame grid (div 4*sp)
    tr = train_script.run(train_script.parse_args(
        base + ["--exp-dir", str(root / "exp_sp"), "train.sp=2"]))
    assert type(tr.model).__name__ == "SPModel"
    assert tr.global_step > 0 and "sp" in tr.mesh.axis_names

    # fsdp: sharded leaves on the plain dp mesh
    from jax.sharding import PartitionSpec as P
    import jax
    tr = train_script.run(train_script.parse_args(
        base + ["--exp-dir", str(root / "exp_fsdp"), "train.fsdp=true",
                "train.fsdp_min_elems=64"]))
    assert tr.global_step > 0
    assert any(l.sharding.spec != P()
               for l in jax.tree_util.tree_leaves(tr.params))
