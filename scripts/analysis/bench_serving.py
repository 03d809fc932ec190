#!/usr/bin/env python
"""Within-run serving latency on the live chip: exported fp32 vs int8.

Weight-bound serving is SMALL batch + short audio (the whole parameter set
streams from HBM per call while activations are tiny), exactly the regime
the int8 weight-only path (serving/quant.py) targets. Per-call timing is
impossible through the ~1.5 s-per-dispatch relay, so each arm scans K calls
inside ONE jitted program with a loop-carried perturbation (wave depends on
the previous frame_ids — without the carry XLA hoists the body and you
measure nothing; CLAUDE.md ablation lesson). Arms interleave (fp, q, fp, q)
to cancel relay drift; a value fetch fences.

Usage: python scripts/analysis/bench_serving.py [B] [seconds] [K] [reps]
Writes docs/results/serving_rtf_ab.json.
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
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import load_serving_artifact, \
        save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    S = int(SECONDS * 16000)
    vocab = 500

    cfg = _small_config()
    model = build_model(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))

    art_dir = Path("/tmp/serving_ab")
    arts = {}
    for tag, q in (("fp", None), ("int8", "int8")):
        d = art_dir / tag
        save_serving_artifact(d, model, params, buckets=[(B, S)],
                              emit=("frame_ids",), quantize=q,
                              platforms=("tpu",))   # axon presents a TPU
        arts[tag] = load_serving_artifact(d)
        npz = (d / "params.npz").stat().st_size / 1e6
        print(f"{tag}: params.npz {npz:.1f} MB", flush=True)

    rng = np.random.default_rng(0)
    wave = (rng.normal(size=(B, S)) * 0.1).astype(np.float32)
    lens = np.full(B, S, np.int32)
    audio_s = float(lens.sum()) / 16000.0

    def per_call_s(sm) -> float:
        fn = sm._fns[(B, S)].call             # traceable exported program
        p = sm._params

        @jax.jit
        def run(p, wave, lens):
            def body(w, _):
                out = fn(p, w, lens)
                # loop-carry: next wave depends on this call's output so XLA
                # cannot hoist the body out of the scan
                bump = (out["frame_ids"][0, 0] % 2).astype(jnp.float32) * 1e-6
                return w + bump, out["frame_ids"][0, 0]
            _, ids = jax.lax.scan(body, wave, None, length=K)
            return ids[-1]

        _ = int(run(p, wave, lens))           # compile + fence
        best = float("inf")
        for _i in range(REPS):
            t0 = time.perf_counter()
            _ = int(run(p, wave, lens))
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    print(f"device={jax.devices()[0]} B={B} {SECONDS}s K={K} reps={REPS}",
          flush=True)
    rows = {}
    for arm in ("fp", "int8", "fp2", "int82"):
        tag = "int8" if arm.startswith("int8") else "fp"
        rows[arm] = per_call_s(arts[tag])
        print(f"{arm:6s} {rows[arm]*1e3:8.2f} ms/call  "
              f"rtf {rows[arm]/audio_s:.5f}", flush=True)
    fp = min(rows["fp"], rows["fp2"])
    q = min(rows["int8"], rows["int82"])
    print(f"best-of: fp {fp*1e3:.2f} ms  int8 {q*1e3:.2f} ms  "
          f"speedup {fp/q:.3f}x", flush=True)

    out = REPO / "docs" / "results" / "serving_rtf_ab.json"
    out.write_text(json.dumps({
        "device": str(jax.devices()[0]), "B": B, "seconds": SECONDS, "K": K,
        "reps": REPS, "rows_per_call_s": rows, "best_fp_s": fp,
        "best_int8_s": q, "speedup": fp / q, "rtf_fp": fp / audio_s,
        "rtf_int8": q / audio_s,
        "note": "CTC greedy emission via the exported artifacts; K scanned "
                "calls per dispatch with a loop-carried wave perturbation; "
                "interleaved arms",
    }, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
