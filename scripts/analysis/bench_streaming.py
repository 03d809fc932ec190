#!/usr/bin/env python
"""Streaming-inference latency on the live device (serving benchmark).

Drives StreamingEncoder on the Small production model with random weights:
audio arrives in real-time-sized blocks and each emission's wall-clock cost is
measured. Reports per-emission compute latency (p50/p95/max) and the
end-to-end algorithmic latency = (seg + lookahead) * 10 ms + compute. The
reference has no streaming mode at all; this pins the serving numbers for the
one it gained here.

Usage: python scripts/analysis/bench_streaming.py [seg_frames] [lookahead]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.models.streaming import (
        StreamingCTCGreedy, StreamingEncoder,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    seg = int(sys.argv[1]) if len(sys.argv) > 1 else 96          # 0.96 s
    lookahead = int(sys.argv[2]) if len(sys.argv) > 2 else 32    # 0.32 s
    left_ctx = 512

    cfg = _small_config()
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    model = build_model(cfg, 500)
    params = model.init_params(jax.random.PRNGKey(0))

    se = StreamingEncoder(model, params, seg_frames=seg, left_ctx=left_ctx,
                          lookahead=lookahead)
    sc = StreamingCTCGreedy(model, params, se)

    rng = np.random.default_rng(0)
    audio_s = 60.0
    wave = (rng.normal(size=int(audio_s * 16000)) * 0.1).astype(np.float32)
    block = 1600                                  # 100 ms arrival blocks

    # warmup compile on a throwaway stream
    sc.accept(wave[:(left_ctx + seg + lookahead) * 160 + 400])
    sc.reset()

    lat = []
    n_toks = 0
    t_all = time.perf_counter()
    for i in range(0, len(wave), block):
        t0 = time.perf_counter()
        toks = sc.accept(wave[i:i + block])
        dt = time.perf_counter() - t0
        if toks or dt > 0.003:                    # an emission happened
            lat.append(dt)
        n_toks += len(toks)
    n_toks += len(sc.finish())
    total = time.perf_counter() - t_all

    lat = np.asarray(sorted(lat))
    emit_ms = {"p50": 1e3 * lat[len(lat) // 2],
               "p95": 1e3 * lat[int(len(lat) * 0.95)],
               "max": 1e3 * lat[-1]} if len(lat) else {}
    print(f"device={jax.devices()[0].platform} Small model, seg={seg} "
          f"({seg * 10} ms) lookahead={lookahead} ({lookahead * 10} ms) "
          f"left_ctx={left_ctx}")
    print(f"emissions={len(lat)} over {audio_s:.0f}s audio, tokens={n_toks}, "
          f"total compute {total:.2f}s (RTF {total / audio_s:.4f})")
    if emit_ms:
        print("per-emission compute latency: "
              + "  ".join(f"{k}={v:.0f}ms" for k, v in emit_ms.items()))
        print(f"end-to-end latency ~= {(seg + lookahead) * 10} ms algorithmic "
              f"+ {emit_ms['p50']:.0f} ms compute (p50)")


if __name__ == "__main__":
    main()
