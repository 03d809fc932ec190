#!/usr/bin/env python
"""Per-instruction HBM-byte breakdown of the compiled production train step.

The roofline (scripts/analysis/roofline.py) showed the step sits AT the v5e
HBM bandwidth ceiling (~170 GB counted per step, hbm_bw_frac 0.89-1.09), so
further throughput comes only from moving fewer bytes. XLA's aggregate
cost_analysis() can't say WHERE the bytes go; this tool parses the optimized
HLO of a K=1 train-step program and charges every top-level instruction
(fusions, convolutions, dots, copies) its operand+output buffer bytes — the
same producer+consumer accounting XLA's "bytes accessed" uses — then ranks
instruction groups so optimization effort can be aimed at the dominant terms.

Compile-only: needs the TPU backend for an honest layout/fusion picture but
never executes, so it is safe to run while training elsewhere. Use
--platform cpu for a rough (differently-fused) offline view.

Output: docs/results/bytes_breakdown.json + a printed top-N table.
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

from hnet_mamba_asr_tpu.utils.hlo_bytes import (  # noqa: E402
    parse_hlo, shape_bytes, traffic_bounds)


def classify(name: str, opcode: str, called_ops: set[str]) -> str:
    """Human bucket for an instruction: what kind of work the bytes feed."""
    if opcode == "convolution" or "convolution" in called_ops:
        return "convolution"
    if opcode in ("dot", "custom-call") or "dot" in called_ops:
        return "matmul"
    if opcode in ("copy", "copy-start"):
        return "copy"
    if opcode.startswith(("all-reduce", "reduce-scatter", "all-gather",
                          "collective")):
        return "collective"
    if "scatter" in called_ops or opcode == "scatter":
        return "scatter"
    if "reduce" in called_ops or opcode == "reduce":
        return "reduce"
    if opcode == "fusion":
        return "elementwise-fusion"
    return opcode


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat", default="none")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--intra", default="bf16",
                    help="ssd_intra_dtype ('' = fp32)")
    ap.add_argument("--out-compute", action="store_true",
                    help="encoder_conf.ssd_out_compute_dtype (production: on)")
    ap.add_argument("--hybrid", action="store_true",
                    help="full CTC+AED hybrid loss (default: CTC-only like "
                    "roofline.py)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for offline view)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny debug model (parse-path check, not a real "
                    "measurement)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=str(REPO / "docs" / "results" /
                                         "bytes_breakdown.json"))
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_bench_cache")
    import optax

    from __graft_entry__ import _batch, _small_config
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=args.tiny)
    if not args.hybrid:
        cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], remat_policy=args.remat,
                               ssd_out_compute_dtype=args.out_compute,
                               ssd_chunk_size=args.chunk,
                               ssd_intra_dtype=args.intra or None)
    vocab = 500
    model = build_model(cfg, vocab)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=args.batch, frames=args.frames, n_mels=80, vocab=vocab)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    def one_step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch, 0, True), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    print("lower+compile (cached after first run) ...", flush=True)
    compiled = jax.jit(one_step).lower(params, opt_state, batch).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    text = compiled.as_text()
    comps = parse_hlo(text)

    # entry computation = the one whose name contains 'main' (jax convention)
    entry = next((k for k in comps if "main" in k), None)
    if entry is None:
        entry = max(comps, key=lambda k: len(comps[k]))
    shape_of = {}
    for comp in comps.values():
        for name, shape, *_ in comp:
            shape_of[name] = shape

    # charge top-level (entry + while bodies reached from entry) instructions
    def called_opcodes(called_names, depth=0):
        ops: set[str] = set()
        if depth > 2:
            return ops
        for cn in called_names:
            for _, _, opcode, _, called in comps.get(cn, []):
                ops.add(opcode)
                if opcode in ("fusion", "while", "conditional", "call"):
                    ops |= called_opcodes(called, depth + 1)
        return ops

    rows = []
    seen_comps = set()

    def walk(comp_name):
        if comp_name in seen_comps or comp_name not in comps:
            return
        seen_comps.add(comp_name)
        for name, shape, opcode, operands, called in comps[comp_name]:
            if opcode in ("parameter", "constant", "get-tuple-element",
                          "tuple", "bitcast"):
                continue
            # the matching -start already charged the transfer (its tuple
            # shape holds both source and destination buffers)
            if opcode.endswith(("-done", "-update")):
                continue
            out_b = shape_bytes(shape)
            in_b = sum(shape_bytes(shape_of.get(o, "")) for o in operands)
            rows.append({"name": name, "opcode": opcode, "comp": comp_name,
                         "bytes": out_b + in_b, "out_bytes": out_b,
                         "shape": shape.strip(),
                         "bucket": classify(name, opcode,
                                            called_opcodes(called))})
            if opcode in ("while", "conditional", "call"):
                for cn in called:
                    walk(cn)

    walk(entry)
    rows.sort(key=lambda r: -r["bytes"])
    total = sum(r["bytes"] for r in rows)
    by_bucket = defaultdict(lambda: [0, 0])
    for r in rows:
        by_bucket[r["bucket"]][0] += r["bytes"]
        by_bucket[r["bucket"]][1] += 1
    buckets = sorted(((b, v[0], v[1]) for b, v in by_bucket.items()),
                     key=lambda t: -t[1])

    # aggregate by (bucket, normalized output shape): the per-instruction view
    # drowns in 12x-per-layer repeats; the shape families are the real signal
    def norm_shape(s: str) -> str:
        s = re.sub(r"\{[^}]*\}", "", s)        # drop layout annotations
        return re.sub(r"\s+", " ", s).strip()

    by_shape = defaultdict(lambda: [0, 0])
    for r in rows:
        by_shape[(r["bucket"], norm_shape(r["shape"]))][0] += r["bytes"]
        by_shape[(r["bucket"], norm_shape(r["shape"]))][1] += 1
    shape_rows = sorted(((b, s, v[0], v[1]) for (b, s), v in by_shape.items()),
                        key=lambda t: -t[2])

    xla_bytes = float(cost.get("bytes accessed", 0.0))
    print(f"\nXLA aggregate bytes accessed: {xla_bytes/1e9:.1f} GB; "
          f"parsed top-level charge: {total/1e9:.1f} GB "
          f"(parse covers {100*total/max(xla_bytes,1):.0f}%)\n")
    print(f"{'GB':>7} {'%':>5}  bucket (n instrs)")
    for b, v, n in buckets:
        print(f"{v/1e9:7.1f} {100*v/total:5.1f}  {b} ({n})")
    print(f"\ntop {args.top} shape families:")
    print(f"{'GB':>7} {'%':>5} {'n':>5}  {'bucket':<20} shape")
    for b, s, v, n in shape_rows[:args.top]:
        print(f"{v/1e9:7.2f} {100*v/total:5.1f} {n:5d}  {b:<20} {s[:90]}")
    print(f"\ntop {args.top} instructions:")
    print(f"{'GB':>7} {'%':>5}  {'bucket':<20} shape")
    for r in rows[:args.top]:
        print(f"{r['bytes']/1e9:7.2f} {100*r['bytes']/total:5.1f}  "
              f"{r['bucket']:<20} {r['shape'][:90]}  [{r['name']}]")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "device": str(jax.devices()[0]),
        "config": {"B": args.batch, "frames": args.frames,
                   "remat": args.remat, "Q": args.chunk, "intra": args.intra,
                   "out_compute": args.out_compute,
                   "hybrid": bool(args.hybrid)},
        "xla_bytes_accessed": xla_bytes,
        "parsed_bytes": total,
        "buckets": [{"bucket": b, "bytes": v, "n": n} for b, v, n in buckets],
        "shape_families": [{"bucket": b, "shape": s, "bytes": v, "n": n}
                           for b, s, v, n in shape_rows[:100]],
        "top": rows[:max(args.top, 50)],
    }, indent=2))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
