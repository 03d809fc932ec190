#!/usr/bin/env python
"""Train-step throughput ablation on the live chip (VERDICT r1 item 5).

Variants over the gate cell (Type A Small N=1, CTC-only, bf16 compute):
  - batch shape: B=64x1000f (the reference budget) vs B=32x1000f (+accum 2)
  - optimizer moments in bf16 (adamw mu_dtype) vs fp32
Measures mel-frames/s/chip with the bench.py discipline (lax.scan over many
steps in one device call; value fetch as the fence) and prints an estimated
MFU from the analytic FLOPs module.

Usage: python scripts/analysis/bench_train_ablate.py [n_scan_steps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    vocab = 500
    cfg = _small_config()
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    models = {}

    def get_model(policy):
        if policy not in models:
            c = dict(cfg, encoder_conf=dict(cfg["encoder_conf"],
                                            remat_policy=policy))
            models[policy] = build_model(c, vocab)
        return models[policy]

    params0 = get_model("full").init_params(jax.random.PRNGKey(0))

    peak_flops = 197.0e12                     # v5e bf16
    from hnet_mamba_asr_tpu.eval.efficiency import encoder_flops
    flops_per_1k = encoder_flops(cfg["encoder_conf"], n_mels=80,
                                 n_frames=1000)["total"]   # fwd FLOPs / 1k frames

    def bench(B, frames, mu_dtype, policy="full"):
        model = get_model(policy)
        batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(1e-3, mu_dtype=mu_dtype))
        params = jax.tree_util.tree_map(jnp.asarray, params0)
        opt_state = tx.init(params)

        @jax.jit
        def run(params, opt_state, batch):
            def body(carry, i):
                params, opt_state = carry
                def loss_fn(p):
                    loss, _ = model.loss_fn(p, batch, i, True)
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(N_STEPS))
            return params, opt_state, losses[-1]

        params, opt_state, loss = run(params, opt_state, batch)
        _ = float(loss)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = run(params, opt_state, batch)
            _ = float(loss)
            dt = min(dt, (time.perf_counter() - t0) / N_STEPS)
        fps = B * frames / dt
        # fwd + ~2x bwd over the encoder (heads are small at CTC-only)
        mfu = 3 * flops_per_1k * (fps / 1000) / peak_flops
        del params, opt_state
        return fps, mfu

    print(f"device={jax.devices()[0].platform} scan={N_STEPS} "
          f"enc_fwd={flops_per_1k / 1e9:.1f} GFLOP/1k frames", flush=True)
    variants = [(64, jnp.float32, "full"), (64, jnp.bfloat16, "full"),
                (32, jnp.float32, "full"), (32, jnp.bfloat16, "full")]
    if len(sys.argv) > 2:                 # "B:mu[:policy]", comma-separated
        variants = []
        for spec in sys.argv[2].split(","):
            parts = spec.split(":")
            variants.append((int(parts[0]),
                             jnp.bfloat16 if parts[1] == "bf16" else jnp.float32,
                             parts[2] if len(parts) > 2 else "full"))
    for B, mu, policy in variants:
        try:
            fps, mfu = bench(B, 1000, mu, policy)
        except Exception as e:                       # e.g. OOM at dots/none
            print(f"B={B:3d}x1000f mu={jnp.dtype(mu).name:9s} remat={policy:5s}"
                  f" FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"B={B:3d}x1000f mu={jnp.dtype(mu).name:9s} remat={policy:5s}"
              f" {fps / 1e3:8.1f}k frames/s/chip   MFU~{100 * mfu:.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
