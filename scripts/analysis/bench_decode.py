"""Decode RTF benchmark: the Small model through the decode cells on the
live device with random-init weights (timing only — WER needs real data).

Measures per-cell wall time over a batch of synthetic utterances and prints
RTF (decode seconds per audio second; < 1.0 is faster than realtime). The
aed/joint cells run the lockstep batched beam (decode_batch default).

Usage: python scripts/analysis/bench_decode.py [B] [seconds_per_utt] [--lm]
"""
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_bench_cache")
    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 16
    secs = float(args[1]) if len(args) > 1 else 15.0
    frames = int(secs * 100)                       # 10 ms hop
    vocab = 500
    cfg = _small_config()
    model = build_model(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)
    batch["ids"] = [f"u{i}" for i in range(B)]
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=vocab,
                          decode=lambda ids: " ".join(map(str, ids)))
    dc = {"beam_size": 10, "pre_beam": 20, "ctc_weight": 0.3,
          "lm_weight": 0.3, "rescore_weight": 0.3}
    cells = [
        {"read_out": "ctc", "search": "greedy", "lm": False, "name": "ctc_greedy"},
        {"read_out": "ctc", "search": "beam", "lm": False, "name": "ctc_beam"},
        {"read_out": "aed", "search": "beam", "lm": False, "name": "aed_beam"},
        {"read_out": "joint", "search": "beam", "lm": False, "name": "joint_beam"},
    ]
    lm = None
    if "--lm" in sys.argv:
        # production-shape fusion LM (lm_transformer_500: 16L/512d, ~51M),
        # random weights — timing only. The _lm cells exercise the in-scan
        # fused CTC beam and the batched second-pass rescorers.
        import jax.numpy as jnp
        from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
        from hnet_mamba_asr_tpu.models.lm import TransformerLM
        lm_model = TransformerLM(vocab_size=vocab, d_model=512, n_layers=16,
                                 n_heads=8, d_ff=2048, dropout=0.0)
        lm_params = lm_model.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, 8), jnp.int32))
        lm = CausalLMScorer(lm_model, lm_params)
        cells += [
            {"read_out": "ctc", "search": "beam", "lm": True,
             "name": "ctc_beam_lm"},
            {"read_out": "aed", "search": "beam", "lm": True,
             "name": "aed_beam_lm"},
            {"read_out": "joint", "search": "beam", "lm": True,
             "name": "joint_beam_lm"},
        ]
    audio_s = B * secs
    print(f"device={jax.devices()[0].platform} B={B} {secs:.0f}s/utt "
          f"({audio_s:.0f}s audio) Small model, beam {dc['beam_size']}")
    for cell in cells:
        decode_batch(model, params, tok, dict(batch), cell, dc, lm=lm)  # warm
        t0 = time.perf_counter()
        recs = decode_batch(model, params, tok, dict(batch), cell, dc, lm=lm)
        dt = time.perf_counter() - t0
        print(f"{cell['name']:11s} {dt:7.2f}s  RTF {dt / audio_s:7.4f}  "
              f"({audio_s / dt:6.1f}x realtime)")
        assert len(recs) == B


if __name__ == "__main__":
    main()
