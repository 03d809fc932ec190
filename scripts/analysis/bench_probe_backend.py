#!/usr/bin/env python
"""Probe-backend speedup on a realistic frame-probe shape (VERDICT r2 #4).

The reference reports its torch-LBFGS GPU backend ~135x faster than sklearn
on probe fits (reference: src/dcasr/interp/probes.py:189-236, README.md:175).
This measures OUR 'jax' backend (jitted optax.lbfgs on the local device)
against sklearn on this host for a realistic phone-id frame probe:
n training frames x d_outer features x ~39 phone classes, Gaussian
class-separable synthetic data (probe fits do not care about acoustics).

Reports wall time (fit+predict) per backend, speedup, test-prediction
agreement, and accuracy delta; writes docs/results/probe_backend_tpu.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def make_data(rng, n, d, k, base, spread=0.08):
    """Class means ``base`` are SHARED between train and test splits (the
    first run drew fresh means per split and measured chance accuracy)."""
    import numpy as np
    X, y = [], []
    counts = rng.multinomial(n, rng.dirichlet(np.ones(k) * 4.0))
    for c in range(k):
        X.append(rng.normal(size=(counts[c], d)) + base[c] * spread)
        y += [f"ph{c}"] * counts[c]
    return np.concatenate(X).astype(np.float32), y


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-train", type=int, default=30000)
    ap.add_argument("--n-test", type=int, default=6000)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--classes", type=int, default=39)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--out", default=str(REPO / "docs" / "results" /
                                         "probe_backend_tpu.json"))
    args = ap.parse_args(argv)

    import numpy as np

    import jax

    from hnet_mamba_asr_tpu.interp.probes import train_probe

    rng = np.random.default_rng(0)
    base = rng.normal(size=(args.classes, args.d))
    Xtr, ytr = make_data(rng, args.n_train, args.d, args.classes, base)
    Xte, yte = make_data(rng, args.n_test, args.d, args.classes, base)

    results = {}
    for backend in ("jax", "sklearn"):
        t0 = time.perf_counter()
        out = train_probe(list(Xtr), ytr, list(Xte), yte, backend=backend,
                          max_iter=args.max_iter)
        dt = time.perf_counter() - t0
        results[backend] = {"seconds": round(dt, 2),
                            "accuracy": round(out["accuracy"], 4),
                            "n_iter": out["n_iter"]}
        print(f"{backend}: {dt:.2f}s acc={out['accuracy']:.4f} "
              f"iters={out['n_iter']}", flush=True)
        if backend == "jax":
            # second fit isolates the steady-state (compile amortized) cost
            t0 = time.perf_counter()
            train_probe(list(Xtr), ytr, list(Xte), yte, backend="jax",
                        max_iter=args.max_iter)
            results["jax"]["seconds_warm"] = round(time.perf_counter() - t0, 2)

    payload = {
        "device": str(jax.devices()[0]),
        "shape": {"n_train": args.n_train, "d": args.d,
                  "classes": args.classes},
        "results": results,
        "speedup_cold": round(results["sklearn"]["seconds"]
                              / results["jax"]["seconds"], 1),
        "speedup_warm": round(results["sklearn"]["seconds"]
                              / results["jax"]["seconds_warm"], 1),
        "accuracy_delta": round(abs(results["jax"]["accuracy"]
                                    - results["sklearn"]["accuracy"]), 5),
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(payload, indent=2))
    print(json.dumps({k: v for k, v in payload.items() if k != "results"}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
