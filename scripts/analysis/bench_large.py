#!/usr/bin/env python
"""Within-run Small-vs-Large training-step throughput on the live chip.

The Large recipe (configs/typeA_large_N1.yaml) is the reference's documented
~185M-encoder scale (reference docs/experimental_plan.md:120-125) with no
shipped YAML; this measures the CTC gate-cell train step for both scales in
ONE process (the relay drifts ±15-50% across processes — CLAUDE.md) at each
scale's own production budget:

  Small: B=32 x 1000 mel frames (32k budget), remat none,  intra bf16
  Large: B=16 x 1000 mel frames (16k budget), remat dots,  intra bf16

Residency discipline: a 16 GB v5e cannot hold BOTH arms' params+moments and
a step's activations at once (the first draft OOMed), so arms alternate in
blocks — each block re-inits its state on device (cheap jitted init),
runs, times, and frees before the other arm's block. The compiled
executables persist across blocks, so only the state upload alternates.

Reports frames/s/chip per arm plus the per-parameter throughput ratio.
Writes docs/results/large_step_tpu.json.

Usage: python scripts/analysis/bench_large.py [n_scan_steps] [blocks]
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

    N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if BLOCKS < 1:
        raise SystemExit("blocks must be >= 1 (block 0 is warmup-only)")
    vocab = 500

    small = _small_config()
    small["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}  # gate cell
    small["encoder_conf"] = dict(small["encoder_conf"], remat_policy="none",
                                 ssd_intra_dtype="bf16")
    large_yaml = load_config(str(REPO / "configs" / "typeA_large_N1.yaml"), [])
    large = dict(small)
    large["encoder_conf"] = dict(large_yaml["encoder_conf"])

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    arms = {}
    for name, (cfg, B) in {"small_32k": (small, 32),
                           "large_16k": (large, 16)}.items():
        model = build_model(cfg, vocab)
        batch = _batch(B=B, frames=1000, n_mels=80, vocab=vocab)

        @jax.jit
        def init_state(key, model=model):
            params = model.init_params(key)
            return params, tx.init(params)

        @jax.jit
        def run_steps(params, opt_state, batch, model=model):
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

        arms[name] = {"init": init_state, "run": run_steps, "batch": batch,
                      "B": B, "n_params": None, "times": [], "warm": False}

    for block in range(BLOCKS + 1):           # block 0 = compile/warmup only
        for name, a in arms.items():
            state = a["init"](jax.random.PRNGKey(0))
            if a["n_params"] is None:
                a["n_params"] = sum(int(np.prod(p.shape)) for p in
                                    jax.tree_util.tree_leaves(state[0]))
            # fence the async init dispatch OUT of the timed window (value
            # fetch is the only reliable fence through the relay)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(state[0])[0]))
            t0 = time.perf_counter()
            p, o, loss = a["run"](*state, a["batch"])
            _ = float(loss)
            dt = (time.perf_counter() - t0) / N_STEPS
            if a["warm"]:
                a["times"].append(dt)
            else:
                print(f"[warmup] {name}: {dt * N_STEPS:.1f}s total "
                      f"({a['n_params']/1e6:.1f}M params)", file=sys.stderr)
                a["warm"] = True
            del state, p, o                    # free before the other arm

    out = {"n_steps": N_STEPS, "blocks": BLOCKS, "loss_head": "ctc"}
    for name, a in arms.items():
        best = min(a["times"])
        out[name] = {"frames_per_s": round(a["B"] * 1000 / best, 1),
                     "step_s": round(best, 4),
                     "params_m": round(a["n_params"] / 1e6, 1),
                     "times": [round(t, 4) for t in a["times"]]}
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
