#!/usr/bin/env python
"""Within-run A/B of two encoder_conf variants on the live chip.

The relay's cross-process drift is ±15-50% (CLAUDE.md), so the ONLY valid
perf comparison is interleaved arms inside one process. This generalizes
bench_custom_vjp.py: both arms run the REAL production step (full hybrid
loss, B=32x1000f, remat none, intra bf16) and differ only by the
encoder_conf overrides given on the command line as JSON.

Usage:
  python scripts/analysis/bench_config_ab.py '{"ssd_out_compute_dtype": true}' \
      [base_overrides_json] [n_scan_steps] [reps] [tag]

Writes docs/results/config_ab_<tag>.json.
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
    import optax

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    on_over = json.loads(sys.argv[1])
    base_over = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    N_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    tag = sys.argv[5] if len(sys.argv) > 5 else "_".join(sorted(on_over))
    vocab = 500
    B, frames = 32, 1000

    def _cfg_with(overrides: dict):
        # nested "aed_conf"/"model_conf"/"rnnt_conf" keys route to those
        # config sections; everything else is an encoder_conf override
        overrides = dict(overrides)
        sections = {k: overrides.pop(k, None)
                    for k in ("aed_conf", "model_conf", "rnnt_conf")}
        cfg = _small_config()
        cfg["encoder_conf"] = dict(cfg["encoder_conf"], remat_policy="none",
                                   ssd_intra_dtype="bf16", **base_over,
                                   **overrides)
        for k, v in sections.items():
            if v:
                cfg[k] = dict(cfg.get(k, {}) or {}, **v)
        return cfg

    def bench(overrides: dict):
        cfg = _cfg_with(overrides)
        model = build_model(cfg, vocab)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = _batch(B=B, frames=frames, n_mels=80, vocab=vocab)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
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

    # ---- arms-identical guard (r3 lesson) -----------------------------------
    # The ssd_out_compute_dtype A/B credited "+14-18%" to a flag that
    # compiles to an IDENTICAL jaxpr — pure relay drift between interleaved
    # arms. Trace both arms at a reduced shape (same code path) and hash the
    # jaxprs: when they match, the measured ratio is a drift calibration,
    # not a win, and the artifact says so.
    import hashlib

    def _arm_jaxpr_hash(overrides: dict) -> str:
        model = build_model(_cfg_with(overrides), vocab)
        params = model.init_params(jax.random.PRNGKey(0))
        small = _batch(B=2, frames=128, n_mels=80, vocab=vocab)
        jaxpr = jax.make_jaxpr(
            jax.grad(lambda p: model.loss_fn(p, small, 0, True)[0]))(params)
        return hashlib.sha256(str(jaxpr).encode()).hexdigest()[:16]

    print("tracing both arms for the identical-program guard ...", flush=True)
    arms_identical = _arm_jaxpr_hash({}) == _arm_jaxpr_hash(on_over)
    if arms_identical:
        print("WARNING: both arms compile to the SAME jaxpr — any measured "
              "ratio below is relay drift, not an effect of the override.",
              flush=True)

    print(f"device={jax.devices()[0]} scan={N_STEPS} reps={REPS} "
          f"on={on_over} base={base_over}", flush=True)
    # Paired, order-flipped design (r3 methodology upgrade after the
    # ssd_out_compute_dtype retraction): relay drift is time-correlated, so
    # adjacent measurements pair up and the pair ORDER alternates (off-on,
    # on-off, ...) to cancel linear drift. The headline is the MEDIAN of the
    # per-pair ratios with the pair count behind it — never a best-of.
    PAIRS = 3
    rows, pair_ratios = {}, []
    for i in range(PAIRS):
        order = ("off", "on") if i % 2 == 0 else ("on", "off")
        fps = {}
        for arm in order:
            f, loss = bench(on_over if arm == "on" else {})
            fps[arm] = f
            rows[f"{arm}{i}"] = f
            print(f"pair {i} {arm:3s} {f/1e3:8.1f}k frames/s/chip "
                  f"(loss {loss:.4f})", flush=True)
        pair_ratios.append(fps["on"] / fps["off"])
    pair_ratios_sorted = sorted(pair_ratios)
    median_ratio = pair_ratios_sorted[len(pair_ratios) // 2]
    wins = sum(r > 1.0 for r in pair_ratios)
    print(f"per-pair on/off ratios: {[round(r, 4) for r in pair_ratios]} — "
          f"median {median_ratio:.4f}, on wins {wins}/{PAIRS}", flush=True)
    off = max(v for k, v in rows.items() if k.startswith("off"))
    on = max(v for k, v in rows.items() if k.startswith("on"))

    out = REPO / "docs" / "results" / f"config_ab_{tag}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "device": str(jax.devices()[0]), "B": B, "frames": frames,
        "scan_steps": N_STEPS, "reps": REPS, "on_overrides": on_over,
        "base_overrides": base_over, "rows_frames_per_s": rows,
        "pair_ratios_on_over_off": pair_ratios,
        "median_ratio": median_ratio, "on_wins": f"{wins}/{PAIRS}",
        "best_off": off, "best_on": on, "ratio_on_over_off": on / off,
        "arms_identical_jaxpr": arms_identical,
        "note": "full hybrid loss, remat none, intra bf16; paired "
                "order-flipped arms, median-of-pair-ratios headline"
                + ("; ARMS IDENTICAL — ratio is drift calibration"
                   if arms_identical else ""),
    }, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
