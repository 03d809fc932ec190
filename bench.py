"""Benchmark: training throughput of the flagship model on the local chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: mel-frames/sec/chip for a full training step (fused frontend ->
Type A Small N=1 encoder (bf16) -> CTC loss -> grads -> adamw update) at the
reference's per-device budget of 64k mel frames per step (reference:
configs/typeA_small_N1.yaml batching comment — batch_bins 64000/GPU).

vs_baseline: ratio against an estimated reference throughput of 36k mel-frames
/sec per L40S GPU. The reference repo publishes no steps/sec; the anchor is
derived from its own arithmetic — 1.04e9 mel frames per epoch (960h x 3
speed-perturb x 100 fps) across 4 GPUs with an assumed ~2 h/epoch wall time,
consistent with its 64-epoch/multi-day runlog cadence. The driver's target is
vs_baseline >= 2.0.
"""
from __future__ import annotations

import json
import time

REF_FRAMES_PER_SEC_PER_CHIP = 36_000.0


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    import numpy as np
    import optax

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config()
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}   # the gate cell
    vocab = 500
    model = build_model(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))

    B, frames = 64, 1000                                   # 64k mel frames/step
    batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    # Many steps inside ONE device call (lax.scan over the step body): the
    # host<->device dispatch path here has ~seconds of per-call latency, so a
    # per-step Python loop measures the launch overhead, not the chip. The
    # scan amortizes it; fetching the final loss fences the whole chain.
    N_STEPS = 16

    @jax.jit
    def run_steps(params, opt_state, batch):
        def body(carry, i):
            params, opt_state = carry
            def loss_fn(p):
                loss, stats = model.loss_fn(p, batch, i, True)
                return loss, stats
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.numpy.arange(N_STEPS))
        return params, opt_state, losses[-1]

    # warmup (compile + first execution), then best-of-3 steady-state timing
    # (dispatch to the chip goes through a relay here with run-to-run jitter;
    # the best trial is the chip's sustained rate)
    params, opt_state, loss = run_steps(params, opt_state, batch)
    _ = float(loss)                                        # full fetch fence
    dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = run_steps(params, opt_state, batch)
        _ = float(loss)
        dt = min(dt, (time.perf_counter() - t0) / N_STEPS)

    n_chips = jax.local_device_count()
    frames_per_sec_per_chip = (B * frames) / dt / n_chips
    # estimated MFU: analytic encoder forward FLOPs x3 (fwd + ~2x bwd; the
    # CTC head is negligible) against the v5e bf16 peak. The step is
    # memory-bound (measured: B=32 beats B=64 per frame), so MFU is the
    # honest context for the frames/s headline, not a target.
    from hnet_mamba_asr_tpu.eval.efficiency import encoder_flops
    fwd_flops_per_frame = encoder_flops(cfg["encoder_conf"], n_mels=80,
                                        n_frames=1000)["total"] / 1000.0
    mfu = 3 * fwd_flops_per_frame * frames_per_sec_per_chip / 197.0e12
    print(json.dumps({
        "metric": "train_mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec_per_chip, 1),
        "unit": "mel-frames/s/chip",
        "vs_baseline": round(frames_per_sec_per_chip / REF_FRAMES_PER_SEC_PER_CHIP, 3),
        "est_mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
