"""AOT serving export: trace the decode path once, serve it anywhere.

The reference deploys by shipping its source tree and torch checkpoints (no
export path exists — see /root/reference/scripts/decode.sh loading the full
repo). The TPU-idiomatic deployment unit is an ahead-of-time traced program:
``jax.export`` serializes the jitted frontend -> encoder -> head computation
to StableHLO, which any jax install (CPU/GPU/TPU serving hosts, any topology)
compiles and runs WITHOUT this framework — the self-contained loader is
hnet_mamba_asr_tpu/serving/runtime.py (one file, jax + numpy only).

Weights are NOT baked into the traced programs (that would duplicate ~300 MB
per shape bucket); they ship once as a path-keyed ``params.npz`` and are
passed as a pytree argument at call time — identical calling convention for
every bucket.

Emit modes (any subset):
  frame_ids    CTC frame argmax [B, T_enc] + enc_lengths — the serving
               contract for greedy transcription (runtime collapses repeats/
               blanks host-side; reference: src/dcasr/decoders/ctc_decode.py
               greedy path)
  log_probs    full CTC log-posteriors [B, T_enc, V+1] — feeds external
               beam/lattice decoders
  aed_ids      AED greedy ids [B, max_decode_len] (KV-cached scan)

Static shapes are a feature here, not a limitation: serving hosts bucket
requests anyway, and each (batch, samples) bucket is one pre-compiled XLA
program with zero recompilation at steady state.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from jax import export as jax_export

from hnet_mamba_asr_tpu.serving.runtime import FORMAT_VERSION
from hnet_mamba_asr_tpu.training.checkpoint import tree_to_path_dict

VALID_EMIT = ("frame_ids", "log_probs", "aed_ids", "beam_ids",
              "rnnt_ids", "rnnt_beam_ids")


def _tokenizer_meta(tokenizer) -> dict:
    """Embed the id->piece table so the standalone runtime can emit text."""
    if tokenizer is None:
        return {}
    return {"tokenizer": {
        "pieces": list(tokenizer.pieces),
        # mirror data/tokenizer.Tokenizer.decode exactly: drop bos/eos/pad
        # but KEEP unk (it renders as its piece text)
        "drop_ids": sorted({int(tokenizer.bos_id), int(tokenizer.eos_id),
                            int(tokenizer.pad_id)}),
        "word_boundary": "▁",
    }}


def _serve_fn(model, emit: tuple[str, ...], beam_size: int = 10,
              pre_beam: int = 30):
    def fn(params, wave, wave_lens):
        enc = model.encode(params, {"wave": wave, "wave_lens": wave_lens},
                           train=False)
        out = {"enc_lengths": enc.lengths}
        if "frame_ids" in emit:
            out["frame_ids"] = model.ctc.apply(
                {"params": params["ctc"]}, enc.features, method="frame_argmax")
        if "log_probs" in emit:
            out["log_probs"] = model.ctc.apply(
                {"params": params["ctc"]}, enc.features, method="log_probs")
        if "aed_ids" in emit:
            out["aed_ids"] = model.aed.apply(
                {"params": params["aed"]}, enc.features, enc.lengths,
                method="greedy_decode")
        if "rnnt_ids" in emit:
            toks, tl = model.rnnt.apply({"params": params["rnnt"]},
                                        enc.features, enc.lengths,
                                        method="greedy_decode")
            out["rnnt_ids"], out["rnnt_lens"] = toks, tl
        if "rnnt_beam_ids" in emit:
            # the one-scan transducer beam traced into the program
            toks, tl = model.rnnt.apply({"params": params["rnnt"]},
                                        enc.features, enc.lengths,
                                        int(beam_size),
                                        method="beam_decode")
            out["rnnt_beam_ids"], out["rnnt_beam_lens"] = toks, tl
        if "beam_ids" in emit:
            # the full frame-synchronous CTC prefix beam INSIDE the exported
            # program (decoders/device_ctc_beam.beam_scan): beam-quality
            # transcription with no framework on the serving host
            from hnet_mamba_asr_tpu.decoders.device_ctc_beam import beam_scan
            lp = model.ctc.apply({"params": params["ctc"]}, enc.features,
                                 method="log_probs")
            toks, blen = beam_scan(lp, enc.lengths, beam_size=beam_size,
                                   pre_beam=pre_beam,
                                   blank_id=model.ctc.blank_id)
            out["beam_ids"] = toks
            out["beam_lens"] = blen
        return out
    return fn


def save_serving_artifact(out_dir: str | Path, model, params,
                          buckets: list[tuple[int, int]],
                          emit: tuple[str, ...] = ("frame_ids",),
                          quantize: str | None = None,
                          quantize_min_size: int = 4096,
                          platforms: tuple[str, ...] | None = None,
                          extra_meta: dict | None = None,
                          tokenizer=None,
                          beam_size: int = 10, pre_beam: int = 30) -> Path:
    """Export ``model``/``params`` for the given (batch, samples) buckets.

    ``emit=("beam_ids",)`` traces the device-side frame-synchronous CTC
    prefix beam (``beam_size``/``pre_beam``) into the exported program, so
    the framework-less serving host gets beam-quality ids, not just greedy.

    ``tokenizer`` (data/tokenizer.Tokenizer, optional) embeds the id->piece
    table in the manifest so the standalone runtime/server can emit TEXT,
    not just token ids, with no framework install.

    ``quantize="int8"`` stores projection/conv/embedding weights as int8 +
    per-channel scales (serving/quant.py): ~4x smaller params.npz and ~4x
    less weight HBM traffic at serve time; the dequantize is traced into the
    exported program so XLA fuses it into the consuming matmuls.

    ``platforms`` (e.g. ("cpu", "tpu")) lowers each program for several
    target platforms in one artifact — export on a CPU build host, serve on
    TPU pods. Default: the exporting process's backend only.

    Returns the artifact directory. Fails loudly on an emit mode the model
    cannot serve (no CTC head / no AED head) or on duplicate buckets.
    """
    emit = tuple(emit)
    for e in emit:
        if e not in VALID_EMIT:
            raise ValueError(f"unknown emit mode {e!r}; choices: {VALID_EMIT}")
    if not emit:
        raise ValueError("emit must name at least one output")
    if ("frame_ids" in emit or "log_probs" in emit or "beam_ids" in emit) \
            and model.ctc is None:
        raise ValueError("frame_ids/log_probs/beam_ids require a CTC head")
    if "aed_ids" in emit and model.aed is None:
        raise ValueError("aed_ids requires an AED head")
    if ("rnnt_ids" in emit or "rnnt_beam_ids" in emit) \
            and getattr(model, "rnnt", None) is None:
        raise ValueError("rnnt_ids/rnnt_beam_ids require an RNNT head")
    if len(set(buckets)) != len(buckets):
        raise ValueError(f"duplicate buckets in {buckets}")

    if quantize not in (None, "int8"):
        raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    params = jax.tree_util.tree_map(np.asarray, params)
    base_fn = _serve_fn(model, emit, beam_size, pre_beam)
    if quantize == "int8":
        from hnet_mamba_asr_tpu.serving.quant import (dequantize_tree,
                                                      quantize_tree)
        params = quantize_tree(params, min_size=quantize_min_size)

        def base_fn(qp, wave, lens,
                    _inner=_serve_fn(model, emit, beam_size, pre_beam)):
            return _inner(dequantize_tree(qp), wave, lens)

    flat = tree_to_path_dict(params)
    np.savez(out / "params.npz", **flat)

    fn = jax.jit(base_fn)
    param_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    rows = []
    for B, S in buckets:
        if B < 1 or S < 400:
            raise ValueError(f"bucket ({B}, {S}) must be >=1 row and >=400 "
                             "samples (one STFT window)")
        exp = jax_export.export(
            fn, platforms=tuple(platforms) if platforms else None)(
            param_spec,
            jax.ShapeDtypeStruct((B, S), np.float32),
            jax.ShapeDtypeStruct((B,), np.int32))
        name = f"f_{B}x{S}.shlo"
        (out / name).write_bytes(exp.serialize())
        rows.append({"batch": int(B), "samples": int(S), "file": name})

    vocab = (model.ctc.num_classes - 1 if model.ctc is not None
             else model.aed.vocab_size if model.aed is not None
             else model.rnnt.vocab_size)
    manifest = {
        "format_version": FORMAT_VERSION,
        "vocab_size": int(vocab),
        "blank_id": int(model.ctc.blank_id) if model.ctc is not None else None,
        "emit": list(emit),
        "quantize": quantize,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "buckets": rows,
        **({"beam": {"beam_size": int(beam_size), "pre_beam": int(pre_beam)}}
           if "beam_ids" in emit else {}),
        "jax_version": jax.__version__,
        **_tokenizer_meta(tokenizer),
        **(extra_meta or {}),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out


def save_streaming_artifact(out_dir: str | Path, model, params,
                            block_enc: int = 16,
                            batch: int = 1,
                            quantize: str | None = None,
                            quantize_min_size: int = 4096,
                            platforms: tuple[str, ...] | None = None,
                            extra_meta: dict | None = None,
                            tokenizer=None,
                            stream_decode: str = "greedy",
                            beam_size: int = 8,
                            token_buf_len: int = 256) -> Path:
    """Export EXACT causal streaming as one step program + initial states.

    ``batch=B`` exports the step at batch B for MULTI-SESSION serving: the
    runtime's StreamingSessionPool advances up to B concurrent streams in
    one program call (states.npz stays a one-row template the pool tiles).
    Works for ANY streamable config, dynamic chunking included: every step
    op — the router, compaction, per-row kept counts, EMA, state no-ops —
    is per-row exact (models/streaming vectorizes n_real over the batch),
    so pooled rows are independent of their batch neighbours.

    Wraps models/streaming.py's CausalStreamingEncoder step (carried conv
    tails, SSD recurrence states, router/EMA chunking state — exact vs
    offline at any block size, requires ``bidirectional: false``) with the
    on-device log-mel frontend and the CTC frame argmax:

        f(params, wave_window [1, s_win] f32, states) -> (frame_ids, states')

    The runtime side (StreamingServingModel) only buffers samples, slices
    fixed windows, carries the state pytree, and collapses CTC — so
    streaming deployment needs the same single runtime.py file. Emits
    ``block_enc`` encoder frames (= 4*block_enc mel frames = 640 ms at
    default rates) per call; latency is one block plus compute.
    """
    import jax.numpy as jnp

    from hnet_mamba_asr_tpu.models.streaming import CausalStreamingEncoder
    from hnet_mamba_asr_tpu.ops.melspec import log_mel_spectrogram

    use_rnnt = model.ctc is None and getattr(model, "rnnt", None) is not None
    if model.ctc is None and not use_rnnt:
        raise ValueError("streaming serving requires a CTC or RNNT head")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if stream_decode not in ("greedy", "beam"):
        raise ValueError(f"stream_decode must be greedy|beam, "
                         f"got {stream_decode!r}")
    use_beam = stream_decode == "beam"
    if use_beam and not use_rnnt:
        raise ValueError("stream_decode='beam' requires an RNNT-only model "
                         "(the transducer beam is the streaming-exact one)")
    cse = CausalStreamingEncoder(model, params, block_enc=block_enc)
    W_mel = cse.W_mel
    S_win = (W_mel - 1) * cse.hop + cse.win
    cmvn = model.cmvn

    params = jax.tree_util.tree_map(np.asarray, params)
    states0 = jax.tree_util.tree_map(np.asarray, cse._fresh_states())
    if use_rnnt and use_beam:
        # the transducer beam's carry IS its streaming state (models/rnnt
        # beam_decode_nbest): token buffers + lengths + alignment-merged
        # scores ride the state pytree, one-row templates like every leaf
        K, L = int(beam_size), int(token_buf_len)
        states0 = dict(
            states0,
            rnnt_btoks=np.zeros((1, K, L), np.int32),
            rnnt_bplen=np.zeros((1, K), np.int32),
            rnnt_bscore=np.where(np.arange(K)[None, :] == 0, 0.0,
                                 -1.0e30).astype(np.float32))
    elif use_rnnt:
        # one-row template like every other state leaf (batch>1 exports tile
        # it; the pool tiles it per session)
        states0 = dict(states0, rnnt_hist=np.full(
            (1, model.rnnt.context), model.rnnt.bos_id, np.int32))

    def _encode_block(p, wave, states):
        feats, _ = log_mel_spectrogram(
            wave, jnp.full((wave.shape[0],), S_win), win_length=cse.win,
            hop_length=cse.hop, n_mels=model.n_mels)
        if cmvn is not None:
            feats = (feats - jnp.asarray(cmvn.mean)) * jnp.asarray(cmvn.istd)
        feats = feats[:, :W_mel].astype(jnp.float32)
        return cse._step(p["encoder"], feats, states)

    if use_rnnt and use_beam:
        # streaming transducer BEAM: the beam carry (token buffers, lengths,
        # merged scores) rides the state pytree, so block-wise beam ==
        # offline beam exactly. Each call returns the CURRENT BEST full
        # hypothesis (the beam may rewrite earlier output — the runtime
        # REPLACES the session transcript instead of appending).
        def step(p, wave, n_valid, states):
            states = dict(states)
            bstate = (states.pop("rnnt_btoks"), states.pop("rnnt_bplen"),
                      states.pop("rnnt_bscore"))
            x_out, new_states = _encode_block(p, wave, states)
            ftoks, fplen, fscore = model.rnnt.apply(
                {"params": p["rnnt"]}, x_out, n_valid, int(beam_size),
                state=bstate, method="beam_decode_nbest")
            best = jnp.argmax(fscore, axis=1)
            toks = jnp.take_along_axis(ftoks, best[:, None, None], 1)[:, 0]
            tl = jnp.take_along_axis(fplen, best[:, None], 1)[:, 0]
            return (toks, tl), dict(new_states, rnnt_btoks=ftoks,
                                    rnnt_bplen=fplen, rnnt_bscore=fscore)
    elif use_rnnt:
        # transducer streaming: the stateless predictor's label history rides
        # in the state pytree, so block-wise greedy == offline greedy exactly.
        # n_valid masks the final partial block's tail frames (they must not
        # emit or advance the history).
        def step(p, wave, n_valid, states):
            states = dict(states)
            hist = states.pop("rnnt_hist")
            x_out, new_states = _encode_block(p, wave, states)
            toks, tl, hist2 = model.rnnt.apply(
                {"params": p["rnnt"]}, x_out, n_valid, hist=hist,
                return_hist=True, method="greedy_decode")
            return (toks, tl), dict(new_states, rnnt_hist=hist2)
    else:
        def step(p, wave, states):
            x_out, new_states = _encode_block(p, wave, states)
            ids = model.ctc.apply({"params": p["ctc"]}, x_out,
                                  method="frame_argmax")
            return ids, new_states

    if quantize == "int8":
        from hnet_mamba_asr_tpu.serving.quant import (dequantize_tree,
                                                      quantize_tree)
        params = quantize_tree(params, min_size=quantize_min_size)
        inner = step

        if use_rnnt:
            def step(qp, wave, n_valid, states):
                return inner(dequantize_tree(qp), wave, n_valid, states)
        else:
            def step(qp, wave, states):
                return inner(dequantize_tree(qp), wave, states)
    elif quantize is not None:
        raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "params.npz", **tree_to_path_dict(params))
    np.savez(out / "states.npz", **tree_to_path_dict(states0))

    spec = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
    states_b = states0 if batch == 1 else jax.tree_util.tree_map(
        lambda a: np.concatenate([a] * batch, axis=0), states0)
    args = [spec(params), jax.ShapeDtypeStruct((batch, S_win), np.float32)]
    if use_rnnt:
        args.append(jax.ShapeDtypeStruct((batch,), np.int32))
    args.append(spec(states_b))
    exp = jax_export.export(
        jax.jit(step), platforms=tuple(platforms) if platforms else None)(
        *args)
    (out / "stream_step.shlo").write_bytes(exp.serialize())

    head = model.rnnt if use_rnnt else model.ctc
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": "streaming",
        "vocab_size": int(head.num_classes - 1),
        "blank_id": int(head.blank_id),
        "emit": ["rnnt_ids"] if use_rnnt else ["frame_ids"],
        "quantize": quantize,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "streaming": {"block_enc": int(block_enc), "w_mel": int(W_mel),
                      "s_win": int(S_win), "hop": int(cse.hop),
                      "win": int(cse.win), "batch": int(batch),
                      "decode": stream_decode if use_rnnt else "greedy",
                      **({"beam_size": int(beam_size),
                          "token_buf_len": int(token_buf_len)}
                         if use_beam else {}),
                      "file": "stream_step.shlo"},
        "jax_version": jax.__version__,
        **_tokenizer_meta(tokenizer),
        **(extra_meta or {}),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out
