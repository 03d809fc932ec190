#!/usr/bin/env python
"""Export a trained checkpoint as a deployable AOT serving artifact.

Usage:
    python scripts/export_serving.py --config <yaml> --checkpoint <ckpt> \
        --out <dir> [--buckets 8x160000 1x160000] \
        [--emit frame_ids log_probs aed_ids beam_ids] [key=value ...]

The artifact directory (manifest.json + params.npz + one StableHLO program
per shape bucket) is served by hnet_mamba_asr_tpu/serving/runtime.py — a
single self-contained file needing only jax + numpy, no framework install.
Buckets are (batch)x(samples); audio longer than the largest bucket must be
chunked upstream (or use models/streaming.py).

The reference has no export path (deployment = full source tree + torch
checkpoint); this is the jax-native TorchScript/ONNX equivalent.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", nargs="+", default=["8x160000"],
                    help="(batch)x(samples) shape buckets, e.g. 8x160000")
    ap.add_argument("--emit", nargs="+", default=["frame_ids"],
                    choices=["frame_ids", "log_probs", "aed_ids", "beam_ids",
                             "rnnt_ids", "rnnt_beam_ids"])
    ap.add_argument("--beam-size", type=int, default=10,
                    help="with --emit beam_ids: beam width of the exported "
                         "CTC prefix beam")
    ap.add_argument("--pre-beam", type=int, default=30,
                    help="with --emit beam_ids: per-frame candidate labels")
    ap.add_argument("--streaming", type=int, default=None, metavar="BLOCK_ENC",
                    help="export an exact-causal STREAMING artifact instead "
                         "(one step program + carried states; requires "
                         "bidirectional: false); value = encoder frames per "
                         "block (16 -> 640 ms blocks)")
    ap.add_argument("--stream-batch", type=int, default=1,
                    help="with --streaming: export the step at batch B for "
                         "multi-session pooled serving (any streamable config)")
    ap.add_argument("--stream-decode", default="greedy",
                    choices=["greedy", "beam"],
                    help="with --streaming on an RNNT model: 'beam' carries "
                         "the transducer beam in the state pytree (== the "
                         "offline beam exactly; finish() returns the final "
                         "transcript, feed() returns [])")
    ap.add_argument("--stream-token-buf", type=int, default=256,
                    help="with --stream-decode beam: token buffer length")
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lower for these platforms (e.g. cpu tpu); "
                         "default: the current backend")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="int8 weight-only quantization (~4x smaller "
                         "artifact, ~4x less weight HBM traffic)")
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args(argv)


def run(args) -> None:
    from hnet_mamba_asr_tpu.serving.export import save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.build import build_cmvn, build_tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import load_model_params
    from hnet_mamba_asr_tpu.utils.config import load_config
    from hnet_mamba_asr_tpu.utils.logging_utils import get_logger, setup_logging

    buckets = []
    for spec in args.buckets if args.streaming is None else []:
        try:
            b, n = spec.lower().split("x")
            buckets.append((int(b), int(n)))
        except ValueError:
            raise SystemExit(f"bad bucket {spec!r}: expected <batch>x<samples>")

    cfg = load_config(args.config, args.overrides)
    out = Path(args.out)
    setup_logging("export_serving", out / "logs")
    logger = get_logger("export_serving")

    tokenizer = build_tokenizer(cfg, REPO_ROOT)
    cmvn = build_cmvn(cfg, REPO_ROOT)
    model = build_model(cfg, tokenizer.vocab_size, cmvn=cmvn)
    params, meta = load_model_params(args.checkpoint)

    if args.streaming is not None:
        from hnet_mamba_asr_tpu.serving.export import save_streaming_artifact
        d = save_streaming_artifact(
            out, model, params, block_enc=args.streaming,
            batch=args.stream_batch,
            quantize=args.quantize,
            platforms=tuple(args.platforms) if args.platforms else None,
            extra_meta={"config": str(args.config),
                        "checkpoint": str(args.checkpoint), **meta},
            tokenizer=tokenizer,
            stream_decode=args.stream_decode, beam_size=args.beam_size,
            token_buf_len=args.stream_token_buf)
        logger.info("exported STREAMING %s block_enc=%d batch=%d decode=%s "
                    "quantize=%s -> %s", Path(args.checkpoint).name,
                    args.streaming, args.stream_batch, args.stream_decode,
                    args.quantize, d)
    else:
        d = save_serving_artifact(
            out, model, params, buckets=buckets, emit=tuple(args.emit),
            beam_size=args.beam_size, pre_beam=args.pre_beam,
            quantize=args.quantize,
            platforms=tuple(args.platforms) if args.platforms else None,
            extra_meta={"config": str(args.config),
                        "checkpoint": str(args.checkpoint), **meta},
            tokenizer=tokenizer)
        logger.info("exported %s buckets=%s emit=%s quantize=%s -> %s",
                    Path(args.checkpoint).name, buckets, args.emit,
                    args.quantize, d)
    print(d)


if __name__ == "__main__":
    run(parse_args())
