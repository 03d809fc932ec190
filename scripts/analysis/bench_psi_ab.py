#!/usr/bin/env python
"""Within-run A/B: joint device beam with the MXU-matmul psi vs the legacy
[B,R,C,T] gather/logsumexp psi (HMASR_PSI_LOOP=1). Both variants compile
first, then trials interleave inside ONE process — the only timing
comparison this relay permits (CLAUDE.md perf-log discipline).

Usage: python scripts/analysis/bench_psi_ab.py [B] [secs] [--trials N]
"""
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_bench_cache")
    import numpy as np

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.decoders.device_beam import beam_search_device
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.utils.relay import ping

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 8
    secs = float(args[1]) if len(args) > 1 else 15.0
    n_trials = 5
    if "--trials" in sys.argv:
        n_trials = int(sys.argv[sys.argv.index("--trials") + 1])
    frames = int(secs * 100)
    vocab = 500
    cfg = _small_config()
    model = build_model(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)

    relay = ping()
    print(f"relay={relay['relay_state']} dispatch={relay['dispatch_s']}",
          flush=True)
    enc = model.encode(params, batch, train=False)
    lp = np.asarray(model.ctc.apply({"params": params["ctc"]}, enc.features,
                                    method="log_probs"))
    feats = jax.device_put(enc.features)
    lens = np.asarray(enc.lengths)

    def run(variant):
        os.environ["HMASR_PSI_LOOP"] = "1" if variant == "loop" else "0"
        t0 = time.perf_counter()
        out = beam_search_device(model.aed, params["aed"], feats, lens,
                                 beam_size=10, nbest=1, ctc_log_probs=lp,
                                 ctc_weight=0.3, blank_id=model.ctc.blank_id,
                                 pre_beam=20)
        assert out and out[0], "empty result"
        return time.perf_counter() - t0

    for v in ("matmul", "loop"):                   # compile both
        dt = run(v)
        print(f"compile+first {v}: {dt:.1f}s", flush=True)
    trials = {"matmul": [], "loop": []}
    for _ in range(n_trials):
        for v in ("matmul", "loop"):
            trials[v].append(run(v))
    doc = {"B": B, "secs_per_utt": secs, "relay": relay,
           "median_s": {v: round(statistics.median(ts), 3)
                        for v, ts in trials.items()},
           "trials_s": {v: [round(x, 3) for x in ts]
                        for v, ts in trials.items()}}
    doc["matmul_over_loop"] = round(
        doc["median_s"]["matmul"] / doc["median_s"]["loop"], 3)
    print(json.dumps(doc), flush=True)
    out = REPO / "docs" / "results" / "psi_matmul_ab.json"
    out.write_text(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
