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
                     nbest: int | None = None):
    """memory [B, T, d_memory], memory_lengths [B] -> one id list per row.

    ``max_symbols`` caps label emissions per frame (default: the head's
    greedy cap). Scores are alignment-marginalized per label sequence.
    ``nbest``: return the top-n surviving beam per utterance as Hypothesis
    lists instead (score/aed = transducer log-prob, ctc = 0 — the shape
    lm_rescore_batch re-ranks for the rnnt_beam_lm cell)."""
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
    out: list[list[int]] = []

    for b in range(memory.shape[0]):
        # hyp: tuple(labels) -> log-sum score of alignments waiting at frame t
        hyps = {(): 0.0}
        for t in range(int(lens[b])):
            enc_t = enc_f[b, t]
            # expansion rounds: round 0 scores every surviving hyp once;
            # each round may extend by one label; blanks bank into `nxt`
            nxt: dict[tuple, float] = {}
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
                    s = cur[y] + lp[i, blank]
                    nxt[y] = np.logaddexp(nxt[y], s) if y in nxt else s
                if round_ == max_symbols:
                    break
                # label expansions (merge into the NEXT round's frontier —
                # two parents cannot produce the same child in one round,
                # but a child may coincide with a hyp already in `cur`
                # only via different label counts, impossible same-round)
                frontier: dict[tuple, float] = {}
                for i, y in enumerate(seqs):
                    base = cur[y]
                    for k in range(head.vocab_size):
                        cand = base + lp[i, k]
                        child = y + (k,)
                        frontier[child] = np.logaddexp(
                            frontier[child], cand) if child in frontier \
                            else cand
                if not frontier:
                    break
                # prune the frontier to the beam
                cur = dict(sorted(frontier.items(), key=lambda kv: -kv[1])
                           [:beam_size])
            hyps = dict(sorted(nxt.items(), key=lambda kv: -kv[1])
                        [:beam_size])
        if nbest is not None:
            from hnet_mamba_asr_tpu.decoders.joint import Hypothesis
            ranked = sorted(hyps.items(), key=lambda kv: -kv[1])[:nbest]
            out.append([Hypothesis(tokens=list(y), aed=float(s), ctc=0.0,
                                   score=float(s)) for y, s in ranked])
        else:
            best = max(hyps.items(), key=lambda kv: kv[1])[0] if hyps else ()
            out.append(list(best))
    return out
