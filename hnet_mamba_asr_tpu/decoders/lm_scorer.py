"""CausalLMScorer: adapts any causal LM to the two decode-time interfaces.

- ``next_logprobs(prefixes) -> [n, V]``: next-token log-softmax after
  bos+prefix — FIRST-PASS shallow fusion for the CTC prefix beam (CTC is
  nearly language-blind per frame, so the LM adds real information there).
- ``sequence_logprob(sequences) -> [n]``: full-sequence log-prob of each
  COMPLETE hypothesis including its terminal eos — SECOND-PASS rescoring for
  the AED/joint beams (an autoregressive AED already carries a strong internal
  LM; first-pass fusion double-counts the prior and truncates, rescoring
  re-orders a fixed complete set and cannot).

Summing ``next_logprobs`` step-by-step over the same tokens (plus final eos)
equals ``sequence_logprob`` to machine precision — the same log-linear term,
applied per-step vs post-hoc (pinned by tests, mirroring the reference's
test_rescore invariant).

TPU mechanics: calls are jitted once per (rows, length) bucket — ragged
prefixes pad to power-of-two buckets so the host loop reuses a handful of
compiled executables instead of recompiling per step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class CausalLMScorer:
    def __init__(self, lm_model, params, bos_id: int = 1, eos_id: int = 2,
                 pad_id: int = 3):
        self.bos_id, self.eos_id, self.pad_id = bos_id, eos_id, pad_id
        self.vocab_size = lm_model.vocab_size
        # exposed for the device CTC beam's in-scan fusion (device_ctc_beam)
        self.lm_model, self.lm_params = lm_model, params

        @jax.jit
        def _next(ids, last_pos):
            logits = lm_model.apply(params, ids)              # [n, L, V]
            last = jnp.take_along_axis(
                logits, last_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)

        @jax.jit
        def _seq(ys_in, ys_out, mask):
            logp = jax.nn.log_softmax(
                lm_model.apply(params, ys_in).astype(jnp.float32), axis=-1)
            tgt = jnp.take_along_axis(logp, ys_out[..., None].astype(jnp.int32),
                                      axis=-1)[..., 0]
            return (tgt * mask).sum(axis=-1)

        self._next_fn = _next
        self._seq_fn = _seq

    # ---- first-pass fusion interface ------------------------------------------
    def next_logprobs(self, prefixes: list[list[int]]) -> np.ndarray:
        """[n, V]: log P(next | bos, prefix) for each ragged prefix."""
        n = len(prefixes)
        lens = np.array([len(p) + 1 for p in prefixes])       # +1 for bos
        rows, L = _bucket(n), _bucket(int(lens.max()))
        ids = np.full((rows, L), self.pad_id, dtype=np.int32)
        ids[:, 0] = self.bos_id
        for i, p in enumerate(prefixes):
            if p:
                ids[i, 1:1 + len(p)] = p
        last_pos = np.zeros(rows, dtype=np.int32)
        last_pos[:n] = lens - 1                               # causal: pad after is inert
        out = self._next_fn(jnp.asarray(ids), jnp.asarray(last_pos))
        return np.asarray(out)[:n]

    # ---- second-pass rescoring interface ---------------------------------------
    def sequence_logprob(self, sequences: list[list[int]]) -> np.ndarray:
        """[n]: sum_i log P(w_i | bos, w_<i) + log P(eos | bos, w) per sequence."""
        n = len(sequences)
        lens = np.array([len(s) + 1 for s in sequences])      # scored: tokens + eos
        rows, L = _bucket(n), _bucket(int(lens.max()))
        ys_in = np.full((rows, L), self.pad_id, dtype=np.int32)
        ys_out = np.full((rows, L), self.pad_id, dtype=np.int32)
        ys_in[:, 0] = self.bos_id
        for i, s in enumerate(sequences):
            k = len(s)
            if k:
                ys_in[i, 1:1 + k] = s
                ys_out[i, :k] = s
            ys_out[i, k] = self.eos_id
        lens_full = np.zeros(rows, dtype=np.int64)
        lens_full[:n] = lens
        mask = np.arange(L)[None, :] < lens_full[:, None]
        out = self._seq_fn(jnp.asarray(ys_in), jnp.asarray(ys_out),
                           jnp.asarray(mask.astype(np.float32)))
        return np.asarray(out)[:n]
