"""CTC prefix beam search (Hannun et al.) with optional first-pass LM fusion.

Host-side numpy search over device-computed CTC log-probs — the search itself
is tiny next to the encoder; what matters on TPU is that the LM calls are
batched device work (one ``next_logprobs`` per frame over all beam prefixes).
Semantics match the reference cell for cell (reference:
src/dcasr/decoders/ctc.py:23-69): per prefix we track (log p ending in blank,
log p ending in non-blank, accumulated LM score); extending by a new label adds
``lm_weight * logP_LM(token | prefix)`` (shallow fusion); sum-over-alignments
scoring finds the most probable LABEL sequence rather than the best path.
"""
from __future__ import annotations

import numpy as np


def ctc_prefix_beam_search(log_probs, lengths, *, blank_id: int, beam_size: int = 10,
                           pre_beam: int = 30, lm=None, lm_weight: float = 0.0
                           ) -> list[list[int]]:
    """log_probs [B, T, V+1] (device array or numpy), lengths [B] ->
    one bare-id list per utterance.

    ``lm`` is any object with ``next_logprobs(prefixes) -> [n, V]`` (e.g.
    decoders.lm_scorer.CausalLMScorer).
    """
    lp_all = np.asarray(log_probs, dtype=np.float64)
    lens = np.asarray(lengths)
    use_lm = lm is not None and lm_weight != 0.0
    if use_lm and blank_id != lp_all.shape[-1] - 1:
        raise ValueError("LM fusion requires blank at the last class "
                         "(LM scores cover labels 0..V-1 only)")
    results: list[list[int]] = []
    for b in range(lp_all.shape[0]):
        T = int(lens[b])
        lp = lp_all[b, :T]
        # prefix -> (log p ending blank, log p ending non-blank, lm score)
        beam: dict[tuple, tuple] = {(): (0.0, -np.inf, 0.0)}
        for t in range(T):
            frame = lp[t]
            order = np.argsort(frame)[::-1]
            cands = [int(c) for c in order if int(c) != blank_id][:pre_beam]
            if use_lm:
                prefixes = list(beam.keys())
                lm_next = np.asarray(lm.next_logprobs([list(p) for p in prefixes]))
                row_of = {p: i for i, p in enumerate(prefixes)}
            nxt: dict[tuple, tuple] = {}
            for prefix, (pb, pnb, lms) in beam.items():
                p_tot = np.logaddexp(pb, pnb)
                # stay on this prefix via blank
                e = nxt.get(prefix, (-np.inf, -np.inf, lms))
                nxt[prefix] = (np.logaddexp(e[0], p_tot + frame[blank_id]), e[1], lms)
                # stay via repeating the last label (ends non-blank)
                if prefix:
                    e = nxt[prefix]
                    nxt[prefix] = (e[0], np.logaddexp(e[1], pnb + frame[prefix[-1]]), lms)
                # grow by a candidate label
                for c in cands:
                    grown = prefix + (c,)
                    # repeated label must cross a blank: only the blank-ending mass extends
                    base = pb if (prefix and c == prefix[-1]) else p_tot
                    lm_grown = lms + (lm_weight * float(lm_next[row_of[prefix], c])
                                      if use_lm else 0.0)
                    e = nxt.get(grown, (-np.inf, -np.inf, lm_grown))
                    nxt[grown] = (e[0], np.logaddexp(e[1], base + frame[c]), lm_grown)
            ranked = sorted(nxt.items(),
                            key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]) + kv[1][2],
                            reverse=True)
            beam = dict(ranked[:beam_size])
        best = max(beam.items(),
                   key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]) + kv[1][2])[0]
        results.append(list(best))
    return results
