#!/usr/bin/env python
"""Within-run Small-vs-Large training-step throughput on the live chip.

The Large recipe (configs/typeA_large_N1.yaml) is the reference's documented
~185M-encoder scale (reference docs/experimental_plan.md:120-125) with no
shipped YAML; this measures the full hybrid train step for both scales in ONE
process (the relay drifts ±15-50% across processes — CLAUDE.md) at each
scale's own production budget:

  Small: B=32 x 1000 mel frames (32k budget), remat none,  intra bf16
  Large: B=16 x 1000 mel frames (16k budget), remat dots,  intra bf16

Interleaved reps; reports frames/s/chip per arm plus the per-parameter
throughput ratio (frames/s x params — how much of the slowdown is just
model mass). Writes docs/results/large_step_tpu.json.

Usage: python scripts/analysis/bench_large.py [n_scan_steps] [reps]
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
    import optax

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.utils.config import load_config

    N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    vocab = 500

    small = _small_config()
    small["encoder_conf"] = dict(small["encoder_conf"], remat_policy="none",
                                 ssd_intra_dtype="bf16")
    large_yaml = load_config(str(REPO / "configs" / "typeA_large_N1.yaml"), [])
    large = _small_config()
    large["encoder_conf"] = dict(large_yaml["encoder_conf"])
    large["aed_conf"] = dict(large_yaml["aed_conf"])

    arms = {"small_32k": (small, 32), "large_16k": (large, 16)}
    runners = {}
    for name, (cfg, B) in arms.items():
        model = build_model(cfg, vocab)
        params = model.init_params(jax.random.PRNGKey(0))
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        batch = _batch(B=B, frames=1000, n_mels=80, vocab=vocab)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
        opt_state = tx.init(params)

        @jax.jit
        def run_steps(params, opt_state, batch, model=model, tx=tx):
            def body(carry, i):
                params, opt_state = carry
                (loss, _), grads = jax.value_and_grad(
                    lambda p: model.loss_fn(p, batch, i, True),
                    has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(N_STEPS))
            return params, opt_state, losses[-1]

        runners[name] = {"run": run_steps, "state": (params, opt_state),
                         "batch": batch, "B": B, "n_params": n_params,
                         "times": []}

    # compile+warmup both arms first, then interleave timed reps
    for name, r in runners.items():
        t0 = time.perf_counter()
        p, o, loss = r["run"](*r["state"], r["batch"])
        _ = float(loss)
        r["state"] = (p, o)
        print(f"[warmup] {name}: {time.perf_counter() - t0:.1f}s "
              f"({r['n_params']/1e6:.1f}M params)", file=sys.stderr)
    for rep in range(REPS):
        for name, r in runners.items():
            t0 = time.perf_counter()
            p, o, loss = r["run"](*r["state"], r["batch"])
            _ = float(loss)
            r["state"] = (p, o)
            r["times"].append((time.perf_counter() - t0) / N_STEPS)

    out = {"n_steps": N_STEPS, "reps": REPS}
    for name, r in runners.items():
        best = min(r["times"])
        out[name] = {"frames_per_s": round(r["B"] * 1000 / best, 1),
                     "step_s": round(best, 4),
                     "params_m": round(r["n_params"] / 1e6, 1),
                     "times": [round(t, 4) for t in r["times"]]}
    f_small = out["small_32k"]["frames_per_s"]
    f_large = out["large_16k"]["frames_per_s"]
    out["large_over_small_frames"] = round(f_large / f_small, 3)
    out["large_over_small_param_frames"] = round(
        (f_large * out["large_16k"]["params_m"]) /
        (f_small * out["small_32k"]["params_m"]), 3)
    dest = REPO / "docs" / "results" / "large_step_tpu.json"
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
