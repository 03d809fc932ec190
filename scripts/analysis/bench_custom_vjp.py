#!/usr/bin/env python
"""A/B the flash-style SSD intra-chunk custom VJP on the live chip.

The bytes-breakdown (docs/results/bytes_breakdown.json) showed the autodiff
backward of the intra-chunk attention materializes fp32 [B,K,H,Q,Q] tensors
and saves three QQ residuals per layer between forward and backward; the
custom VJP (ops/ssd.py:_intra_attn) recomputes them in the backward in the
intra dtype instead. This script measures the REAL production step (full
hybrid loss, remat none, intra bf16, B=32x1000f) with the VJP on vs off in
ONE process — the only comparison the relay's ±15-50% drift allows.

Also reports the mamba2 gated-RMSNorm bf16-storage variant indirectly: both
arms include it, so compare this script's 'custom_vjp=on' row against
bench.py history for the combined effect.

Usage: python scripts/analysis/bench_custom_vjp.py [n_scan_steps] [reps]
Writes docs/results/custom_vjp_ab.json.
"""
import functools
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
    import numpy as np  # noqa: F401
    import optax

    from __graft_entry__ import _batch, _small_config
    import hnet_mamba_asr_tpu.models.mamba2 as mamba2_mod
    from hnet_mamba_asr_tpu.ops import ssd as ssd_mod
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    vocab = 500
    B, frames = 32, 1000

    cfg = _small_config()
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], remat_policy="none",
                               ssd_intra_dtype="bf16")
    model = build_model(cfg, vocab)
    params0 = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)

    def bench(custom_vjp: bool):
        # route every Mamba2 layer's ssd() through the chosen backward
        mamba2_mod.ssd = functools.partial(ssd_mod.ssd, custom_vjp=custom_vjp)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
        params = jax.tree_util.tree_map(jnp.asarray, params0)
        opt_state = tx.init(params)

        @jax.jit
        def run(params, opt_state, batch):
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

        params, opt_state, loss = run(params, opt_state, batch)
        _ = float(loss)                      # fence (block_until_ready lies
        best = float("inf")                  # through the relay)
        for _ in range(REPS):
            t0 = time.perf_counter()
            params, opt_state, loss = run(params, opt_state, batch)
            lv = float(loss)
            best = min(best, (time.perf_counter() - t0) / N_STEPS)
        del params, opt_state
        return B * frames / best, lv

    print(f"device={jax.devices()[0]} scan={N_STEPS} reps={REPS}", flush=True)
    rows = {}
    # interleave the arms so slow relay drift cancels: off, on, off, on
    for arm in ("off", "on", "off2", "on2"):
        fps, loss = bench(custom_vjp=arm.startswith("on"))
        rows[arm] = fps
        print(f"custom_vjp={arm:4s} {fps/1e3:8.1f}k frames/s/chip "
              f"(loss {loss:.4f})", flush=True)
    off = max(rows["off"], rows["off2"])
    on = max(rows["on"], rows["on2"])
    print(f"best-of: off {off/1e3:.1f}k  on {on/1e3:.1f}k  "
          f"ratio {on/off:.3f}", flush=True)

    out = REPO / "docs" / "results" / "custom_vjp_ab.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "device": str(jax.devices()[0]), "B": B, "frames": frames,
        "scan_steps": N_STEPS, "reps": REPS, "rows_frames_per_s": rows,
        "best_off": off, "best_on": on, "ratio_on_over_off": on / off,
        "note": "full hybrid loss, remat none, intra bf16; both arms include "
                "the gated-RMSNorm bf16-storage change",
    }, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
