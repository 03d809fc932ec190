#!/usr/bin/env python
"""On-chip throughput of pooled multi-session streaming serving.

Exports the causal Small streaming step at batch B and at batch 1, then
drives B simulated live sessions (synthetic audio, fixed chunk cadence)
through runtime.StreamingSessionPool vs one solo session, measuring:

  - per-tick wall time (one program call advancing up to B sessions)
  - aggregate realtime factor: (sessions x audio seconds) / wall seconds
    — how many concurrent realtime streams one chip sustains

Relay discipline: everything measured within ONE process; the solo arm
runs in the same process right after the pooled arm (compare trends, not
absolutes, across runs). Writes docs/results/streaming_pool_tpu.json.

Usage: python scripts/analysis/bench_streaming_pool.py [B] [seconds] [block_enc]
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    import numpy as np

    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving.export import save_streaming_artifact
    from hnet_mamba_asr_tpu.serving.runtime import (StreamingServingModel,
                                                    StreamingSessionPool)
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    block_enc = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    tiny = len(sys.argv) > 4 and sys.argv[4] == "tiny"   # CPU smoke mode
    sr = 16000

    cfg = _small_config(tiny=tiny)              # production dims (or smoke)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    model = build_model(cfg, 500)
    params = model.init_params(jax.random.PRNGKey(0))

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        art_b = Path(td) / f"stream_b{B}"
        art_1 = Path(td) / "stream_b1"
        t0 = time.perf_counter()
        save_streaming_artifact(art_b, model, params, block_enc=block_enc,
                                batch=B)
        save_streaming_artifact(art_1, model, params, block_enc=block_enc)
        export_s = time.perf_counter() - t0

        rng = np.random.default_rng(0)
        waves = [(rng.normal(size=int(secs * sr)) * 0.1).astype(np.float32)
                 for _ in range(B)]
        chunk = 4 * block_enc * 160              # one emission block of audio

        # pooled arm: B concurrent sessions, round-robin feeding
        pool = StreamingSessionPool(art_b)
        sids = [pool.open() for _ in range(B)]
        pool.feed(sids[0], waves[0][:chunk])     # warm/compile
        for s in sids:
            pool.close(s)
        sids = [pool.open() for _ in range(B)]
        t0 = time.perf_counter()
        pos = 0
        n_tok = 0
        while pos < len(waves[0]):
            for k, sid in enumerate(sids):
                n_tok += len(pool.feed(sid, waves[k][pos:pos + chunk]))
            pos += chunk
        for sid in sids:
            n_tok += len(pool.finish(sid))
        pooled_s = time.perf_counter() - t0
        pooled_rtf_aggregate = (B * secs) / pooled_s

        # solo arm: one session through the batch-1 artifact
        solo = StreamingServingModel(art_1)
        solo.feed(waves[0][:chunk])              # warm/compile
        solo.reset()
        t0 = time.perf_counter()
        pos = 0
        while pos < len(waves[0]):
            solo.feed(waves[0][pos:pos + chunk])
            pos += chunk
        solo.finish()
        solo_s = time.perf_counter() - t0
        solo_rtf = secs / solo_s

    out = {
        "device": str(jax.devices()[0]), "B": B, "seconds_per_session": secs,
        "block_enc": block_enc, "export_s": round(export_s, 1),
        "pooled_wall_s": round(pooled_s, 3),
        "pooled_aggregate_realtime_streams": round(pooled_rtf_aggregate, 2),
        "solo_wall_s": round(solo_s, 3),
        "solo_realtime_streams": round(solo_rtf, 2),
        "pool_efficiency_vs_B_solos": round(pooled_rtf_aggregate
                                            / (B * solo_rtf), 3),
        "note": "aggregate_realtime_streams = concurrent realtime sessions "
                "one chip sustains; pooled ticks amortize dispatch+compute "
                "across B sessions (dominant on high-latency transports)",
    }
    print(json.dumps(out))
    res = REPO / "docs" / "results" / "streaming_pool_tpu.json"
    res.write_text(json.dumps(out, indent=2))
    print(f"wrote {res}")


if __name__ == "__main__":
    main()
