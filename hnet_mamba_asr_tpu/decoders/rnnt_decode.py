"""RNN-T beam search (host engine, exact merge-by-sequence).

Beyond the reference (no transducer exists there). Graves-style
time-synchronous beam over the transducer lattice: a hypothesis is a LABEL
SEQUENCE whose score is the log-sum over every alignment of that sequence
to the frames consumed so far (alignments that emit the same labels at
different frames MERGE by logaddexp — the same discipline as the CTC prefix
beam's stay/grow merges). Per frame, hypotheses expand by up to
``max_symbols`` label emissions before the mandatory blank that consumes
the frame; the beam keeps the top ``beam_size`` sequences.

With ``beam_size`` and ``max_symbols`` large enough to cover the lattice,
the best hypothesis is the exact MAP label sequence (tested against
brute-force enumeration scored by ops/rnnt_loss — the oracle pattern every
search engine in this repo follows). Scores accumulate in float64 on host;
the joint evaluations are batched over beam rows and ride jitted,
shape-cached device calls (one per expansion round per frame).

First-pass LM shallow fusion (``lm``/``lm_weight``): each label emission
adds ``lm_weight * logP_LM(label | labels so far)`` to the hypothesis's
SELECTION score — the same fusion rule as the CTC prefix beam
(decoders/ctc_decode.py) applied to the transducer's label sequence. The
LM term depends only on the label sequence, never the alignment, so exact
alignment merges are unaffected: the acoustic log-sum and the raw LM
log-prob are carried separately and combined only for pruning/ranking.
Blank consumes a frame without an LM term (the LM never sees blanks).
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np

_JIT_CACHE: dict = {}


def _step_fn(head):
    key = ("rnnt_step", id(head))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(partial(head.apply, method="step_logprobs"))
        _JIT_CACHE[key] = fn
    return fn


def rnnt_beam_search(head, params, memory, memory_lengths, *,
                     beam_size: int = 8,
                     max_symbols: int | None = None,
                     nbest: int | None = None,
                     lm=None, lm_weight: float = 0.0):
    """memory [B, T, d_memory], memory_lengths [B] -> one id list per row.

    ``max_symbols`` caps label emissions per frame (default: the head's
    greedy cap). Scores are alignment-marginalized per label sequence.
    ``nbest``: return the top-n surviving beam per utterance as Hypothesis
    lists instead (aed = acoustic transducer log-prob, ctc = 0, score =
    the fused selection score — the shape lm_rescore_batch re-ranks for
    the rnnt_beam_lm cell).
    ``lm``: a CausalLMScorer for first-pass shallow fusion; per expansion
    round ONE batched next_logprobs call scores every frontier sequence."""
    max_symbols = int(max_symbols if max_symbols is not None
                      else head.max_symbols)
    variables = {"params": params}
    enc_f = np.asarray(head.apply(variables, memory,
                                  method="encode_features"))   # [B, T, J]
    step = _step_fn(head)
    lens = np.asarray(memory_lengths)
    C = head.context
    bos = int(head.bos_id)
    blank = int(head.blank_id)
    fuse = lm is not None and lm_weight != 0.0
    w = float(lm_weight)
    out = []

    for b in range(memory.shape[0]):
        # hyp: tuple(labels) -> (acoustic log-sum over alignments waiting at
        # frame t, raw LM log-prob of the labels). Ranking uses ac + w*lm.
        hyps = {(): (0.0, 0.0)}
        rank = (lambda kv: -(kv[1][0] + w * kv[1][1])) if fuse \
            else (lambda kv: -kv[1][0])
        for t in range(int(lens[b])):
            enc_t = enc_f[b, t]
            # expansion rounds: round 0 scores every surviving hyp once;
            # each round may extend by one label; blanks bank into `nxt`
            nxt: dict[tuple, tuple[float, float]] = {}
            cur = hyps
            for round_ in range(max_symbols + 1):
                seqs = list(cur.keys())
                R = max(beam_size, len(seqs))    # fixed rows: no jit churn
                hist = np.full((R, C), bos, np.int32)
                for i, y in enumerate(seqs):
                    for j in range(min(C, len(y))):
                        hist[i, j] = y[-1 - j]
                lp = np.asarray(step(variables,
                                     np.broadcast_to(enc_t,
                                                     (R, enc_t.shape[-1])),
                                     hist), np.float64)        # [R, V+1]
                # blank: the alignment consumes frame t -> merge into nxt
                for i, y in enumerate(seqs):
                    ac, lms = cur[y]
                    s = ac + lp[i, blank]
                    if y in nxt:
                        s = np.logaddexp(nxt[y][0], s)
                    nxt[y] = (s, lms)
                if round_ == max_symbols:
                    break
                # one batched LM call scores every frontier sequence's
                # next-token distribution (shallow fusion)
                lmlp = (np.asarray(lm.next_logprobs([list(y) for y in seqs]),
                                   np.float64) if fuse else None)
                # label expansions (merge into the NEXT round's frontier —
                # two parents cannot produce the same child in one round,
                # but a child may coincide with a hyp already in `cur`
                # only via different label counts, impossible same-round)
                frontier: dict[tuple, tuple[float, float]] = {}
                for i, y in enumerate(seqs):
                    ac, lms = cur[y]
                    for k in range(head.vocab_size):
                        cand = ac + lp[i, k]
                        child = y + (k,)
                        clm = lms + lmlp[i, k] if fuse else 0.0
                        if child in frontier:
                            cand = np.logaddexp(frontier[child][0], cand)
                        frontier[child] = (cand, clm)
                if not frontier:
                    break
                # prune the frontier to the beam (fused score when fusing)
                cur = dict(sorted(frontier.items(), key=rank)[:beam_size])
            hyps = dict(sorted(nxt.items(), key=rank)[:beam_size])
        if nbest is not None:
            from hnet_mamba_asr_tpu.decoders.joint import Hypothesis
            ranked = sorted(hyps.items(), key=rank)[:nbest]
            # .lm stays None: lm_rescore_batch fills it with the full
            # sequence_logprob (incl. eos) — the fused lms here excludes
            # the eos closure term by the shallow-fusion selection rule
            out.append([Hypothesis(tokens=list(y), aed=float(ac), ctc=0.0,
                                   score=float(ac + w * lms))
                        for y, (ac, lms) in ranked])
        else:
            best = min(hyps.items(), key=rank)[0] if hyps else ()
            out.append(list(best))
    return out
