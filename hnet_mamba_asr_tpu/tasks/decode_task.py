"""Decode task: trained checkpoint -> transcripts across the 7-cell matrix.

Cells are read-outs x search x +/-LM (behavioral spec: reference
src/dcasr/tasks/decode_task.py): greedy is CTC-only; AED/joint are beam-only;
+LM lives on the beam side only — first-pass shallow fusion for the CTC prefix
beam (``lm_weight``), second-pass n-best rescoring for AED/joint
(``rescore_weight`` / ``rescore_length_bonus``, distinct knobs so the settled
CTC fusion weight and the rescoring lambda tune independently). The canonical
matrix: ctc_greedy, ctc_beam, ctc_beam_lm, aed_beam, aed_beam_lm, joint_beam,
joint_beam_lm. Beyond the reference, transducer models add rnnt_greedy,
rnnt_beam and rnnt_beam_lm (second-pass LM re-rank of the surviving beam,
same discipline as the aed/joint *_lm cells).

TPU timing discipline: device work is fenced with ``jax.block_until_ready``
before reading the clock (the analog of the reference's cuda-synchronize
fencing) and per-cell search time is amortized per utterance. Decode engines,
fastest first: ALL beam cells default to fully ON-DEVICE searches (aed/joint:
decoders/device_beam.py; ctc_beam*: decoders/device_ctc_beam.py with in-scan
LM fusion — one jitted call per batch); decode.device_beam=false falls back
to the host lockstep engines (one batched device call per global step for
aed/joint, one per frame for the ctc beams; exact float64);
decode.batch_beams=false falls back further to the serial per-utterance host
loop for aed/joint. All engines produce the same transcripts
(equivalence-tested; device engines may differ on float32 score ties).
"""
from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search
from hnet_mamba_asr_tpu.decoders.joint import (
    Hypothesis, joint_beam_search, joint_beam_search_nbest,
    joint_beam_search_nbest_lockstep, lm_rescore, lm_rescore_batch,
)
from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer, _bucket
from hnet_mamba_asr_tpu.models.ctc_head import greedy_decode as ctc_host_greedy
from hnet_mamba_asr_tpu.training.checkpoint import load_checkpoint
from hnet_mamba_asr_tpu.utils.config import load_yaml
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)

SAMPLE_RATE = 16000


def as_str_list(value, default: list[str]) -> list[str]:
    if value is None:
        return list(default)
    if isinstance(value, str):
        return [value]
    return [str(v) for v in value]


def expand_cells(decode_cfg: Mapping[str, Any]) -> list[dict]:
    """decode block -> ordered matrix cells (greedy CTC-only, LM on beams)."""
    dc = dict(decode_cfg or {})
    read_outs = as_str_list(dc.get("read_outs"), ["ctc"])
    searches = as_str_list(dc.get("search"), ["greedy", "beam"])
    lm_val = dc.get("lm", "none")
    with_lm = str(lm_val).lower() not in ("none", "false", "")
    cells, seen = [], set()
    for ro in read_outs:
        if ro not in ("ctc", "aed", "joint", "rnnt"):
            raise ValueError(f"unknown read_out {ro!r}")
        for s in searches:
            if s not in ("greedy", "beam"):
                raise ValueError(f"unknown search {s!r}")
            if s == "greedy" and ro not in ("ctc", "rnnt"):
                continue                # greedy: CTC frame-argmax / RNNT scan
            lm_opts = [False, True] if (s == "beam" and with_lm) else [False]
            for use_lm in lm_opts:      # every beam (incl. rnnt) gets an LM cell
                name = f"{ro}_{s}" + ("_lm" if use_lm else "")
                if name in seen:
                    continue
                seen.add(name)
                cells.append({"read_out": ro, "search": s, "lm": use_lm, "name": name})
    if not cells:
        raise ValueError(f"decode config yields no cells (read_outs={read_outs}, "
                         f"search={searches}); greedy applies to CTC only")
    return cells


def check_heads(model, cells: list[dict]) -> None:
    for c in cells:
        if c["read_out"] in ("ctc", "joint") and model.ctc is None:
            raise ValueError(f"cell {c['name']}: model has no CTC head")
        if c["read_out"] in ("aed", "joint") and model.aed is None:
            raise ValueError(f"cell {c['name']}: model has no AED head")
        if c["read_out"] == "rnnt" and getattr(model, "rnnt", None) is None:
            raise ValueError(f"cell {c['name']}: model has no RNNT head")


def load_model_params(ckpt_path: str | Path) -> tuple[dict, dict]:
    """Weights from a full trainer checkpoint or a .ave/.best file -> (params, meta)."""
    state = load_checkpoint(ckpt_path)
    meta = {k: state[k] for k in ("epoch", "global_step", "averaged") if k in state}
    logger.info("loaded weights %s %s", Path(ckpt_path).name, meta or "")
    return state["params"], meta


def load_lm_scorer(decode_cfg: Mapping[str, Any], repo_root: str | Path,
                   tokenizer) -> CausalLMScorer:
    """Fusion LM from decode.lm_config + decode.lm_checkpoint (shared vocab)."""
    from hnet_mamba_asr_tpu.tasks.lm_task import build_lm
    dc = dict(decode_cfg or {})
    if not dc.get("lm_config") or not dc.get("lm_checkpoint"):
        raise ValueError("decode.lm requires decode.lm_config and decode.lm_checkpoint")
    lm_cfg = load_yaml(Path(repo_root) / str(dc["lm_config"]))
    mc = (lm_cfg.get("lm_conf", {}) or {}).get("moe")
    if mc:
        # decode-time MoE LMs score DROPLESS: capacity_factor E/top_k makes
        # the capacity bound unreachable (C = ceil(S*k*cf/E) >= S), so a
        # prefix's score never depends on what else shares the batch — and
        # the device in-scan stepper's per-token dense-mix math is exact
        E, k = int(mc.get("n_experts", 0)), int(mc.get("top_k", 2))
        lm_cfg = dict(lm_cfg, lm_conf=dict(
            lm_cfg["lm_conf"], moe=dict(mc, capacity_factor=E / max(k, 1))))
        logger.info("fusion LM is MoE (E=%d top_k=%d): dropless scoring "
                    "(capacity_factor -> %.1f)", E, k, E / max(k, 1))
    lm = build_lm(lm_cfg, tokenizer.vocab_size)
    params, _ = load_model_params(Path(repo_root) / str(dc["lm_checkpoint"]))
    if lm.lm.vocab_size != tokenizer.vocab_size:
        raise ValueError(f"LM vocab {lm.lm.vocab_size} != tokenizer "
                         f"{tokenizer.vocab_size}")
    return CausalLMScorer(lm.lm, {"params": params["lm"]} if "lm" in params
                          else {"params": params}, bos_id=tokenizer.bos_id,
                          eos_id=tokenizer.eos_id, pad_id=tokenizer.pad_id)


def length_bonus_for(decode_cfg: Mapping[str, Any]) -> float:
    """Acoustic-beam per-token bonus; default 0.0 (a positive value
    over-generates on the no-LM cells — the LM-side bias is handled by
    rescore_length_bonus at re-rank time only)."""
    return float((decode_cfg or {}).get("length_bonus", 0.0))


class CachedAEDStepper:
    """KV-cached incremental scorer for the label-synchronous beam.

    The beam is label-synchronous, so every live hypothesis has the same
    length — one scalar position drives all rows. Hypothesis survival is
    communicated as parent-row indices: ``advance(parents, tokens)`` gathers
    each row's cache from its parent, appends the new token's K/V, and returns
    next-token log-probs. Cost per step: ONE incremental attention over
    (pos + memory) instead of a full decoder re-run over the whole prefix
    (the reference's method — reference joint.py:136-141). One compiled
    executable per beam bucket, shared across utterances and steps.
    """

    def __init__(self, aed, params, features, lengths, *, beam_rows: int = 16):
        self.aed = aed
        self.params = {"params": params}
        self.features = features
        self.lengths = np.asarray(lengths)
        self.rows = _bucket(beam_rows, lo=4)
        self.cap = aed.max_decode_len + 1
        self._caches = None
        self._pos = 0
        self._b = None

        def start(params, mem, mlen):
            mem = jnp.broadcast_to(mem, (self.rows,) + mem.shape[1:])
            mlen = jnp.broadcast_to(mlen, (self.rows,))
            return aed.apply(params, mem, mlen, self.cap, method="decode_start")

        def step(params, caches, kpm, parents, tokens, pos):
            return aed.apply(params, caches, kpm, parents, tokens, pos,
                             method="decode_step")

        self._start = jax.jit(start)
        self._step = jax.jit(step)

    def start(self, b: int) -> np.ndarray:
        """Begin utterance b: feed bos, return log-probs [1, V] for step 0."""
        mem = self.features[b:b + 1]
        mlen = jnp.asarray([int(self.lengths[b])], jnp.int32)
        caches, self._kpm = self._start(self.params, mem, mlen)
        self._caches = caches
        self._pos = 0
        bos = np.full(self.rows, self.aed.bos_id, np.int32)
        logp, self._caches = self._step(self.params, self._caches, self._kpm,
                                        jnp.arange(self.rows, dtype=jnp.int32),
                                        jnp.asarray(bos), 0)
        self._pos = 1
        return np.asarray(logp)[:1]

    def advance(self, parents, tokens) -> np.ndarray:
        """Commit (parent_row, token) per live row; return log-probs [n, V]."""
        n = len(parents)
        par = np.zeros(self.rows, np.int32)
        tok = np.full(self.rows, self.aed.eos_id, np.int32)
        par[:n] = parents
        tok[:n] = tokens
        logp, self._caches = self._step(self.params, self._caches, self._kpm,
                                        jnp.asarray(par), jnp.asarray(tok),
                                        self._pos)
        self._pos += 1
        return np.asarray(logp)[:n]


class BatchedCachedAEDStepper:
    """KV-cached scorer advancing ALL utterances' beams in one device call.

    Row layout: utterance b owns rows [b*R, (b+1)*R) of a (B*R)-row cache;
    the memory K/V and padding mask are projected once per utterance and
    repeated across that utterance's R rows, so ``decode_step``'s parent
    gathers (which only touch the self-attn rings) can never mix memories.
    Satisfies joint_beam_search_nbest_lockstep's batch protocol:
    ``start() -> [n, 1, V]``, ``advance(parents [n, r], tokens [n, r]) ->
    [n, r, V]`` with LOCAL parent indices (converted to global rows here).
    Per global step the whole batch costs ONE jitted call — the reference
    decodes utterance-by-utterance with full-prefix re-runs (reference
    joint.py:136-141); here B x beam rows share one incremental attention.
    """

    def __init__(self, aed, params, features, lengths, *, beam_rows: int = 16,
                 n_utts: int | None = None):
        self.aed = aed
        self.params = {"params": params}
        self.R = _bucket(beam_rows, lo=4)
        self.B = int(features.shape[0])
        self.n = int(n_utts) if n_utts is not None else self.B
        self.cap = aed.max_decode_len + 1
        self.features = features
        self.lengths = np.asarray(lengths)
        rows = self.B * self.R
        R = self.R

        def start(params, mem, mlen):
            caches, kpm = aed.apply(params, mem, mlen, self.cap,
                                    method="decode_start")
            def expand(cache):                # mem K/V repeat; fresh ring rows
                out = {}
                for k, v in cache.items():
                    if k in ("self_k", "self_v"):
                        out[k] = jnp.zeros((rows,) + v.shape[1:], v.dtype)
                    else:
                        out[k] = jnp.repeat(v, R, axis=0)
                return out
            return tuple(expand(c) for c in caches), jnp.repeat(kpm, R, axis=0)

        def step(params, caches, kpm, parents, tokens, pos):
            return aed.apply(params, caches, kpm, parents, tokens, pos,
                             method="decode_step")

        self._start = jax.jit(start)
        self._step = jax.jit(step)
        self._caches = None
        self._kpm = None
        self._pos = 0

    def start(self) -> np.ndarray:
        """Feed bos on every row; log-probs [n, 1, V] for each utt's step 0."""
        rows = self.B * self.R
        self._caches, self._kpm = self._start(
            self.params, self.features,
            jnp.asarray(self.lengths, jnp.int32))
        logp, self._caches = self._step(
            self.params, self._caches, self._kpm,
            jnp.arange(rows, dtype=jnp.int32),
            jnp.full((rows,), self.aed.bos_id, jnp.int32), 0)
        self._pos = 1
        return np.asarray(logp).reshape(self.B, self.R, -1)[:self.n, :1]

    def advance(self, parents, tokens) -> np.ndarray:
        """Commit (local parent row, token) per utt row; log-probs [n, r, V]."""
        parents = np.asarray(parents, np.int32)
        tokens = np.asarray(tokens, np.int32)
        n, r = parents.shape
        par = np.zeros((self.B, self.R), np.int32)
        tok = np.full((self.B, self.R), self.aed.eos_id, np.int32)
        par[:n, :r] = parents
        tok[:n, :r] = tokens
        gpar = par + np.arange(self.B, dtype=np.int32)[:, None] * self.R
        logp, self._caches = self._step(
            self.params, self._caches, self._kpm,
            jnp.asarray(gpar.reshape(-1)), jnp.asarray(tok.reshape(-1)),
            self._pos)
        self._pos += 1
        return np.asarray(logp).reshape(self.B, self.R, -1)[:n, :r]


class _UttStepper:
    """Bind a CachedAEDStepper to one utterance row of the batch."""

    def __init__(self, stepper: "CachedAEDStepper", i: int):
        self._stepper = stepper
        self._i = i

    def start(self, _b: int) -> np.ndarray:
        return self._stepper.start(self._i)

    def advance(self, parents, tokens) -> np.ndarray:
        return self._stepper.advance(parents, tokens)


class AEDStepper:
    """Padded/bucketed jitted next-token scorer for the label-synchronous beam.

    One compiled executable per (rows, tokens) bucket, shared across utterances
    of a split (memory keeps its padded length; validity comes from lengths).
    """

    def __init__(self, aed, params, features, lengths):
        self.aed = aed
        self.params = params
        self.features = features                    # [B, L, d] (padded, device)
        self.lengths = np.asarray(lengths)
        self.bos_id, self.pad_id = aed.bos_id, aed.pad_id

        @partial(jax.jit, static_argnums=())
        def step(mem, mlen, ys_in, last_pos):
            logits = aed.apply({"params": params}, mem, mlen, ys_in)
            last = jnp.take_along_axis(
                logits, last_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)

        self._step = step

    def __call__(self, b: int, token_lists: list[list[int]]) -> np.ndarray:
        n = len(token_lists)
        lens = np.array([len(t) + 1 for t in token_lists])       # + bos
        rows, U = _bucket(n, lo=4), _bucket(int(lens.max()), lo=8)
        ys = np.full((rows, U), self.pad_id, dtype=np.int32)
        ys[:, 0] = self.bos_id
        for i, toks in enumerate(token_lists):
            if toks:
                ys[i, 1:1 + len(toks)] = toks
        last_pos = np.zeros(rows, dtype=np.int32)
        last_pos[:n] = lens - 1
        mem = self.features[b:b + 1]
        mem = jnp.broadcast_to(mem, (rows,) + mem.shape[1:])
        mlen = jnp.full((rows,), int(self.lengths[b]), jnp.int32)
        out = self._step(mem, mlen, jnp.asarray(ys), jnp.asarray(last_pos))
        return np.asarray(out)[:n]


def decode_batch(model, params, tokenizer, batch: dict, cell: Mapping[str, Any],
                 decode_cfg: Mapping[str, Any], lm=None, mesh=None,
                 enc=None, enc_s: float | None = None) -> list[dict]:
    """One collated batch through one cell -> per-utt {id, ref, hyp, decode_s}.

    ``mesh``: optional jax.sharding.Mesh — the batch is dp-sharded across it
    so the encoder forward (the FLOPs-heavy stage) runs SPMD over all chips;
    with tensor-sharded params (decode.tp > 1) the projections split too.
    GSPMD propagates shardings through the CTC/AED heads and the beam
    steppers, so search results are identical to single-device decode
    (equivalence-tested on a virtual mesh).

    ``enc``/``enc_s``: a precomputed EncoderOutput + the encoder seconds to
    charge this cell — the shared-encoder path (decode_split_shared) encodes
    each batch ONCE and fans it out to every cell."""
    dc = dict(decode_cfg or {})
    if mesh is not None and enc is None:
        from hnet_mamba_asr_tpu.parallel.mesh import shard_batch
        batch = shard_batch(batch, mesh)         # id lists pass through on host
    beam_size = int(dc.get("beam_size", 10))
    pre_beam = dc.get("pre_beam")
    lm_weight = float(dc.get("lm_weight", 0.0)) if cell["lm"] else 0.0
    rescore_weight = float(dc.get("rescore_weight", lm_weight)) if cell["lm"] else 0.0
    rescore_length_bonus = (float(dc.get("rescore_length_bonus", 0.0))
                            if cell["lm"] else 0.0)
    use_lm = lm if cell["lm"] else None
    if cell["lm"] and lm is None:
        raise ValueError(f"cell {cell['name']} needs decode.lm_checkpoint")
    length_bonus = length_bonus_for(dc)

    ids = batch.get("ids", [])
    row_mask = np.asarray(batch["row_mask"])
    n_real = int(row_mask.sum())

    if enc is None:
        t0 = time.perf_counter()
        enc = model.encode(params, batch, train=False)
        jax.block_until_ready(enc.features)              # fence: async dispatch
        enc_s = time.perf_counter() - t0
    enc_s = float(enc_s or 0.0)
    lengths = np.asarray(enc.lengths)

    hyps: list[list[int]] = []
    times: list[float] = []
    if cell["read_out"] == "ctc" and cell["search"] == "greedy":
        t0 = time.perf_counter()
        frame_ids = model.ctc.apply({"params": params["ctc"]}, enc.features,
                                    method="frame_argmax")
        jax.block_until_ready(frame_ids)
        hyps = ctc_host_greedy(frame_ids, lengths, model.ctc.blank_id)[:n_real]
        dt = time.perf_counter() - t0
        times = [dt / max(n_real, 1)] * n_real
    elif cell["read_out"] == "rnnt" and cell["search"] == "greedy":
        from hnet_mamba_asr_tpu.models.rnnt import rnnt_host_greedy
        t0 = time.perf_counter()
        toks, tl = model.rnnt.apply({"params": params["rnnt"]}, enc.features,
                                    enc.lengths, method="greedy_decode")
        jax.block_until_ready(toks)
        hyps = rnnt_host_greedy(toks, tl)[:n_real]
        dt = time.perf_counter() - t0
        times = [dt / max(n_real, 1)] * n_real
    elif cell["read_out"] == "rnnt":                     # transducer beam
        t0 = time.perf_counter()
        if cell["lm"]:
            # first-pass shallow fusion at lm_weight (when set) + second-pass
            # LM re-rank of the surviving beam at rescore_weight — the same
            # distinct-knob discipline as the aed/joint *_lm cells; the
            # transducer's acoustic score rides in .aed with ctc_weight=0
            fuse = lm_weight != 0.0
            if bool(dc.get("device_beam", True)):
                if fuse:
                    # in-scan fused search: ONE device call per batch (the
                    # LM steps ride inside the frame scan)
                    from hnet_mamba_asr_tpu.models.aed import sinusoidal_pe
                    Rms = int(model.rnnt.max_symbols)
                    T_enc = int(enc.features.shape[1])
                    L_buf = min(model.rnnt.max_decode_len,
                                max(T_enc * Rms, 1))
                    # LM KV-cache capacity: fused additions freeze beyond it
                    # (transcripts are far shorter than the frame budget —
                    # the cap bounds the dominant per-step cache traffic)
                    cap = min(L_buf + 1, int(dc.get("lm_cache_cap", 512)))
                    pe = jnp.asarray(sinusoidal_pe(
                        cap, use_lm.lm_model.d_model))
                    ftoks, fplen, fscore, flms = model.rnnt.apply(
                        {"params": params["rnnt"]}, enc.features, enc.lengths,
                        int(beam_size), method="beam_decode_nbest",
                        lm_model=use_lm.lm_model, lm_params=use_lm.lm_params,
                        lm_pe=pe, lm_weight=lm_weight, lm_cache_cap=cap)
                    flms = np.asarray(flms)
                else:
                    ftoks, fplen, fscore = model.rnnt.apply(
                        {"params": params["rnnt"]}, enc.features, enc.lengths,
                        int(beam_size), method="beam_decode_nbest")
                    flms = None
                ftoks, fplen, fscore = (np.asarray(ftoks), np.asarray(fplen),
                                        np.asarray(fscore))
                nbest_all = []
                # Convention note: flms is the EOS-INCLUSIVE LM sequence mass
                # (beam_decode_nbest closes every pool row with the eos term
                # so fused and unfused pools re-rank with one formula), so
                # .score here = acoustic + lm_weight * sequence_logprob. The
                # host fused engine (rnnt_decode.py) builds .score from the
                # label-only LM mass — the two engines' .score fields are on
                # different scales and must never be compared across engines
                # (final output is unaffected: lm_rescore_batch re-ranks
                # from .aed/.lm, and .lm carries the same eos-inclusive mass
                # both ways).
                for b in range(n_real):
                    rows = [Hypothesis(tokens=ftoks[b, k, :fplen[b, k]].tolist(),
                                       aed=float(fscore[b, k]), ctc=0.0,
                                       lm=(float(flms[b, k]) if fuse else None),
                                       score=float(fscore[b, k])
                                       + (lm_weight * float(flms[b, k])
                                          if fuse else 0.0))
                            for k in range(fscore.shape[1])
                            if fscore[b, k] > -5.0e8]
                    rows.sort(key=lambda h: h.score, reverse=True)
                    nbest_all.append(rows[:beam_size])
            else:
                from hnet_mamba_asr_tpu.decoders.rnnt_decode import (
                    rnnt_beam_search,
                )
                nbest_all = rnnt_beam_search(
                    model.rnnt, params["rnnt"], enc.features, enc.lengths,
                    beam_size=beam_size, nbest=beam_size,
                    lm=(use_lm if fuse else None),
                    lm_weight=lm_weight)[:n_real]
            hyps = lm_rescore_batch(nbest_all, use_lm, rescore_weight,
                                    ctc_weight=0.0,
                                    length_bonus=rescore_length_bonus)
        elif bool(dc.get("device_beam", True)):
            # whole search in ONE jitted scan (models/rnnt.beam_decode);
            # exact merge-by-sequence via token-buffer compare
            from hnet_mamba_asr_tpu.models.rnnt import rnnt_host_greedy
            toks, tl = model.rnnt.apply({"params": params["rnnt"]},
                                        enc.features, enc.lengths,
                                        int(beam_size),
                                        method="beam_decode")
            jax.block_until_ready(toks)
            hyps = rnnt_host_greedy(toks, tl)[:n_real]
        else:
            from hnet_mamba_asr_tpu.decoders.rnnt_decode import (
                rnnt_beam_search,
            )
            hyps = rnnt_beam_search(model.rnnt, params["rnnt"], enc.features,
                                    enc.lengths,
                                    beam_size=beam_size)[:n_real]
        dt = time.perf_counter() - t0
        times = [dt / max(n_real, 1)] * n_real
    elif cell["read_out"] == "ctc":                      # prefix beam (+/-LM)
        t0 = time.perf_counter()
        logp = model.ctc.apply({"params": params["ctc"]}, enc.features,
                               method="log_probs")
        jax.block_until_ready(logp)
        enc_s += time.perf_counter() - t0                # shared projection: amortized
        t0 = time.perf_counter()
        if bool(dc.get("device_beam", True)):
            # frame-synchronous search entirely on-device: ONE jitted call per
            # batch; LM fusion runs in-scan with per-row cached LM steps
            from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
                ctc_beam_search_device,
            )
            hyps = ctc_beam_search_device(
                logp, lengths, blank_id=model.ctc.blank_id,
                beam_size=beam_size, pre_beam=int(pre_beam or 30),
                lm=use_lm, lm_weight=lm_weight, n_utts=n_real)
        else:
            # host lockstep engine (exact float64): one Python iteration per
            # frame; with LM fusion every frame makes ONE batched
            # next_logprobs call covering all live prefixes in the batch
            hyps = ctc_prefix_beam_search(
                np.asarray(logp)[:n_real], lengths[:n_real],
                blank_id=model.ctc.blank_id, beam_size=beam_size,
                pre_beam=int(pre_beam or 30), lm=use_lm, lm_weight=lm_weight)
        dt = time.perf_counter() - t0
        times = [dt / max(n_real, 1)] * n_real           # amortized per utt
    else:                                                # aed / joint beam
        ctc_w = 0.0 if cell["read_out"] == "aed" else float(dc.get("ctc_weight", 0.3))
        ctc_logp = None
        if ctc_w > 0.0:
            ctc_logp = np.asarray(model.ctc.apply({"params": params["ctc"]},
                                                  enc.features, method="log_probs"))
        pre = int(pre_beam) if pre_beam else None
        kw = dict(vocab_size=model.aed.vocab_size,
                  beam_size=beam_size, ctc_weight=ctc_w, bos_id=tokenizer.bos_id,
                  eos_id=tokenizer.eos_id, pad_id=tokenizer.pad_id,
                  blank_id=model.ctc.blank_id if model.ctc is not None else None,
                  length_bonus=length_bonus, pre_beam=pre,
                  max_decode_len=model.aed.max_decode_len)
        if bool(dc.get("device_beam", True)):
            # the whole search runs on-device (lax.scan + top_k; the CTC
            # prefix recursion is an inner scan) — ONE jitted call per batch
            from hnet_mamba_asr_tpu.decoders.device_beam import (
                beam_search_device,
            )
            t0 = time.perf_counter()
            nbest_all = beam_search_device(
                model.aed, params["aed"], enc.features, lengths,
                beam_size=beam_size, nbest=(beam_size if cell["lm"] else 1),
                length_bonus=length_bonus, pre_beam=pre, n_utts=n_real,
                ctc_log_probs=ctc_logp, ctc_weight=ctc_w,
                blank_id=model.ctc.blank_id if model.ctc is not None else None,
                lm=(use_lm if cell["lm"] else None))
            if cell["lm"]:
                # re-rank on fused in-program LM scores (lm_rescore_batch
                # only calls the LM for hypotheses lacking one — the rare
                # empty-pool alive fallback)
                hyps.extend(lm_rescore_batch(
                    nbest_all, use_lm, rescore_weight, ctc_weight=ctc_w,
                    length_bonus=rescore_length_bonus))
            else:
                hyps.extend(nb[0].tokens if nb else [] for nb in nbest_all)
            dt = time.perf_counter() - t0
            times = [dt / max(n_real, 1)] * n_real
        elif bool(dc.get("batch_beams", True)):
            # lockstep engine: one batched stepper call per global step covers
            # every live beam row in the batch (results identical to the
            # serial path — both run the same _UttBeam engine)
            stepper = BatchedCachedAEDStepper(
                model.aed, params["aed"], enc.features, lengths,
                beam_rows=beam_size, n_utts=n_real)
            t0 = time.perf_counter()
            nbest_all = joint_beam_search_nbest_lockstep(
                lengths[:n_real], batch_stepper=stepper,
                ctc_log_probs=(ctc_logp[:n_real] if ctc_logp is not None
                               else None),
                nbest=(beam_size if cell["lm"] else 1), **kw)
            for nb in nbest_all:
                if cell["lm"]:
                    hyps.append(lm_rescore(nb, use_lm, rescore_weight,
                                           ctc_weight=ctc_w,
                                           length_bonus=rescore_length_bonus))
                else:
                    hyps.append(nb[0].tokens if nb else [])
            dt = time.perf_counter() - t0
            times = [dt / max(n_real, 1)] * n_real       # amortized per utt
        else:                                            # serial fallback
            stepper = CachedAEDStepper(model.aed, params["aed"], enc.features,
                                       lengths, beam_rows=beam_size)
            for i in range(n_real):
                t0 = time.perf_counter()
                lp_i = (ctc_logp[i:i + 1, :lengths[i]]
                        if ctc_logp is not None else None)
                utt = _UttStepper(stepper, i)
                if cell["lm"]:
                    nbest = joint_beam_search_nbest(
                        None, lengths[i:i + 1], ctc_log_probs=lp_i,
                        nbest=beam_size, aed_next_logprobs=utt, **kw)[0]
                    hyp = lm_rescore(nbest, use_lm, rescore_weight,
                                     ctc_weight=ctc_w,
                                     length_bonus=rescore_length_bonus)
                else:
                    hyp = joint_beam_search(None, lengths[i:i + 1],
                                            ctc_log_probs=lp_i,
                                            aed_next_logprobs=utt, **kw)[0]
                times.append(time.perf_counter() - t0)
                hyps.append(hyp)

    per_utt_enc = enc_s / max(n_real, 1)
    tokens = np.asarray(batch["tokens"])
    tlens = np.asarray(batch["token_lens"])
    records = []
    for i in range(n_real):
        ref_ids = tokens[i, :int(tlens[i])].tolist()
        records.append({"id": ids[i], "ref": tokenizer.decode(ref_ids),
                        "hyp": tokenizer.decode(hyps[i]),
                        "decode_s": round(per_utt_enc + times[i], 6)})
    return records


def decode_split(model, params, tokenizer, loader, cell, decode_cfg, *,
                 audio_seconds: Mapping[str, float], out_path: str | Path,
                 lm=None, mesh=None) -> dict:
    """Decode one split through one cell; write per-utt JSONL; return summary."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    warm = next(iter(loader), None)                      # untimed warmup compile
    if warm is not None:
        warm.pop("ids", None)
        if mesh is not None:
            from hnet_mamba_asr_tpu.parallel.mesh import shard_batch
            warm = shard_batch(warm, mesh)
        jax.block_until_ready(model.encode(params, warm, train=False).features)
    n, dec_s, aud_s = 0, 0.0, 0.0
    with open(out_path, "w", encoding="utf-8") as w:
        for batch in loader:
            for r in decode_batch(model, params, tokenizer, batch, cell,
                                  decode_cfg, lm=lm, mesh=mesh):
                r["audio_s"] = round(audio_seconds.get(r["id"], 0.0), 3)
                w.write(json.dumps(r) + "\n")
                n += 1
                dec_s += r["decode_s"]
                aud_s += r["audio_s"]
    summary = {"cell": cell["name"], "n_utts": n, "decode_s": round(dec_s, 3),
               "audio_s": round(aud_s, 3),
               "rtf": round(dec_s / aud_s, 5) if aud_s > 0 else None}
    logger.info("decoded %s: %s", out_path.name, summary)
    return summary


def decode_split_shared(model, params, tokenizer, loader, cells, decode_cfg, *,
                        audio_seconds: Mapping[str, float],
                        out_dir: str | Path, split: str,
                        lm=None, mesh=None) -> list[dict]:
    """Decode one split through ALL cells with ONE encoder pass per batch.

    The per-cell loop (decode_split) re-reads audio and re-runs the encoder
    once per cell — 7x the encoder FLOPs and host IO for the full matrix.
    Here each batch is encoded once and fanned out to every cell; the
    encoder seconds are charged to each cell divided by the cell count, so
    summed decode_s still reflects true wall time (enable with
    ``decode.share_encoder: true``; the default per-cell path keeps the
    reference's accounting, where every cell pays its own encoder).
    """
    out_dir = Path(out_dir)
    writers = {}
    for cell in cells:
        path = out_dir / cell["name"] / f"{split}.jsonl"
        path.parent.mkdir(parents=True, exist_ok=True)
        writers[cell["name"]] = open(path, "w", encoding="utf-8")
    totals = {c["name"]: {"n": 0, "dec_s": 0.0, "aud_s": 0.0} for c in cells}
    try:
        warm = None
        for batch in loader:
            if warm is None:                     # untimed warmup compile
                wb = {k: v for k, v in batch.items() if k != "ids"}
                if mesh is not None:
                    from hnet_mamba_asr_tpu.parallel.mesh import shard_batch
                    wb = shard_batch(wb, mesh)
                jax.block_until_ready(
                    model.encode(params, wb, train=False).features)
                warm = True
            if mesh is not None:
                from hnet_mamba_asr_tpu.parallel.mesh import shard_batch
                batch = shard_batch(batch, mesh)
            t0 = time.perf_counter()
            enc = model.encode(params, batch, train=False)
            jax.block_until_ready(enc.features)
            enc_s = time.perf_counter() - t0
            for cell in cells:
                recs = decode_batch(model, params, tokenizer, batch, cell,
                                    decode_cfg, lm=lm, mesh=mesh,
                                    enc=enc, enc_s=enc_s / len(cells))
                t = totals[cell["name"]]
                w = writers[cell["name"]]
                for r in recs:
                    r["audio_s"] = round(audio_seconds.get(r["id"], 0.0), 3)
                    w.write(json.dumps(r) + "\n")
                    t["n"] += 1
                    t["dec_s"] += r["decode_s"]
                    t["aud_s"] += r["audio_s"]
    finally:
        for w in writers.values():
            w.close()
    summaries = []
    for cell in cells:
        t = totals[cell["name"]]
        summary = {"cell": cell["name"], "n_utts": t["n"],
                   "decode_s": round(t["dec_s"], 3),
                   "audio_s": round(t["aud_s"], 3),
                   "rtf": round(t["dec_s"] / t["aud_s"], 5)
                   if t["aud_s"] > 0 else None}
        logger.info("decoded %s/%s (shared encoder): %s", cell["name"], split,
                    summary)
        summaries.append(summary)
    return summaries


def audio_seconds_from_manifest(manifest_path: str | Path) -> dict[str, float]:
    out = {}
    with open(manifest_path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                e = json.loads(line)
                out[e["id"]] = e["frames"] / SAMPLE_RATE
    return out
