#!/usr/bin/env bash
# Multi-device smoke with programmatic asserts (the TPU rendition of the
# reference's smoke_2gpu.sh): run one REAL sharded training step on an
# 8-virtual-device mesh, a fresh tiny train + resume cycle through the real
# CLI, and verify metrics/checkpoint/summary invariants.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

echo "[smoke] 1/3 sharded train step on an 8-device mesh"
python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

echo "[smoke] 2/3 fresh tiny run + resume through the real CLI"
python - <<'EOF'
import json, os, sys, tempfile
import numpy as np
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "scripts")
from hnet_mamba_asr_tpu.data.audio import write_wav
from hnet_mamba_asr_tpu.data.manifests import write_manifest
import train as train_script

root = tempfile.mkdtemp(prefix="smoke_")
rng = np.random.default_rng(0)
entries = []
os.makedirs(f"{root}/manifests")
for i, text in enumerate(["aa bb", "bb cc", "cc aa", "aa cc bb"]):
    n = int(rng.integers(4000, 8000))
    write_wav(f"{root}/u{i}.wav", rng.normal(size=n) * 0.1, 16000)
    entries.append({"id": f"u{i}", "audio": f"{root}/u{i}.wav",
                    "text": text, "frames": n})
write_manifest(entries[:3], f"{root}/manifests/train-960.jsonl")
write_manifest(entries[3:], f"{root}/manifests/dev-clean.jsonl")
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
Tokenizer.train(["aa bb cc"] * 10, f"{root}/bpe", vocab_size=12,
                hard_vocab_limit=False)
cfg = f"""
experiment: {{name: smoke, seed: 0}}
data: {{manifests_dir: {root}/manifests, train_manifest: train-960,
        dev_splits: [dev-clean]}}
bpemodel: {root}/bpe.model
frontend_conf: {{n_mels: 20}}
encoder: dcasr
encoder_conf: {{arch_type: A, d_outer: 16, d_main: 24, n_enc: 1, n_main: 1,
                n_dec: 1, d_state: 8, headdim: 8, ssd_chunk_size: 16,
                hnet: {{compression_N: 1}}}}
model_conf: {{ctc_weight: 1.0, aed_weight: 0.0}}
batch_bins: 2000
optim: adamw
optim_conf: {{lr: 1.0e-3}}
train: {{max_epoch: 1, precision: fp32, log_interval: 1}}
eval: {{valid_interval_epoch: 1}}
best_model_criterion: [[valid, loss, min]]
"""
with open(f"{root}/cfg.yaml", "w") as f:
    f.write(cfg)
train_script.run(train_script.parse_args(
    ["--config", f"{root}/cfg.yaml", "--exp-dir", f"{root}/exp"]))
# asserts: checkpoint, best symlink, metrics keys, provenance device count
assert os.path.exists(f"{root}/exp/checkpoints/latest.ckpt"), "no checkpoint"
assert os.path.islink(f"{root}/exp/checkpoints/valid.loss.best.ckpt"), "no best link"
metrics = [json.loads(l) for l in open(f"{root}/exp/metrics.jsonl")]
assert any("valid/loss" in m for m in metrics), "no valid loss logged"
summary = json.load(open(f"{root}/exp/summary.json"))
prov = summary["provenance"][0]
assert prov["env"]["devices"]["count"] == 8, prov["env"]["devices"]
assert "best_valid_loss" in summary
# resume continues without fresh-starting
train_script.run(train_script.parse_args(
    ["--config", f"{root}/cfg.yaml", "--exp-dir", f"{root}/exp",
     "--resume", "auto", "train.max_epoch=2"]))
assert any("valid/loss" in json.loads(l)
           for l in open(f"{root}/exp/metrics.jsonl"))
print("[smoke] CLI run + resume OK:", root)
EOF

echo "[smoke] 3/4 unit smoke (fast subset)"
python -m pytest tests/test_trainer.py tests/test_dataset.py -q

echo "[smoke] 4/4 two REAL processes (jax.distributed on the CPU backend)"
python scripts/smoke_2proc.py

echo "[smoke] ALL OK"
