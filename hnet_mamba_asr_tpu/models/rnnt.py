"""RNN-T (transducer) head with a STATELESS prediction network.

Beyond the reference (CTC + AED + joint only): the transducer is the
streaming-native ASR objective — frame-synchronous decoding with no
attention over the whole utterance — and it composes directly with this
repo's exact-causal streaming encoder.

TPU-first design choices:
- **Stateless predictor** (Ghodsi et al. 2020, "RNN-Transducer with
  stateless prediction network"): the label history is just the last
  ``context`` emitted tokens, embedded and concatenated. Training evaluates
  it for all U+1 positions as one batched matmul (no sequential RNN), the
  greedy decode step carries only ``context`` token ids (no recurrent
  state pytree), and quality is known to be close to an LSTM predictor at
  BPE vocabularies.
- **Joint = tanh(enc_proj + pred_proj) -> Dense(V+1)** evaluated for the
  full [B, T, U+1] lattice at training time (one fused einsum chain; the
  [B, T, U+1, V+1] logits are the dominant activation — fine at this
  repo's utterance lengths; a pruned-lattice variant is the standard
  optimization if U grows).
- Blank is the LAST class (id V), the same contract as the CTC head, so
  the tokenizer/vocab plumbing is shared.
- Loss: ``ops/rnnt_loss.py`` — one lax.scan over frames, log-domain
  cumulative-logsumexp label chain per frame, fp32.

Greedy decode is frame-synchronous with a per-frame emission cap
(``max_symbols``): scan over frames; each frame unrolls ``max_symbols``
joint evaluations with masked emission (stops at blank), which keeps the
whole search one jittable program with static shapes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.ops.rnnt_loss import rnnt_loss


class RNNTHead(nn.Module):
    """Transducer head over the shared V-token vocabulary (blank = V)."""

    vocab_size: int
    d_memory: int                   # encoder output dim (d_outer)
    d_pred: int = 256
    d_joint: int = 512
    context: int = 2                # stateless predictor history length
    max_symbols: int = 4            # greedy: max emissions per frame
    max_decode_len: int = 512
    bos_id: int = 1
    pad_id: int = 3
    dtype: Any = jnp.float32

    @property
    def blank_id(self) -> int:
        return self.vocab_size

    @property
    def num_classes(self) -> int:
        return self.vocab_size + 1

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.embed = nn.Embed(self.vocab_size, self.d_pred,
                              dtype=self.dtype, param_dtype=jnp.float32)
        self.pred_proj = nn.Dense(self.d_joint, **kw)
        self.enc_proj = nn.Dense(self.d_joint, **kw)
        self.out = nn.Dense(self.num_classes, **kw)

    # ---- prediction network --------------------------------------------------
    def _predict(self, hist: jax.Array) -> jax.Array:
        """hist [..., context] token ids (most recent first, bos-filled)
        -> [..., d_joint] predictor features."""
        emb = self.embed(jnp.clip(hist, 0, self.vocab_size - 1))
        emb = emb.reshape(*hist.shape[:-1], self.context * self.d_pred)
        return self.pred_proj(emb)

    def _histories(self, targets: jax.Array,
                   target_lengths: jax.Array) -> jax.Array:
        """[B, U] labels -> [B, U+1, context] left-contexts per position
        (position u conditions on y_{u-1}, y_{u-2}, ...; bos before t=0)."""
        B, U = targets.shape
        valid = jnp.arange(U)[None, :] < target_lengths[:, None]
        clean = jnp.where(valid, targets, self.bos_id)
        padded = jnp.concatenate(
            [jnp.full((B, self.context), self.bos_id, targets.dtype), clean],
            axis=1)                                          # [B, C+U]
        # hist[u, j] = padded[u + C-1 - j]  (j = 0 is the most recent token)
        cols = (jnp.arange(U + 1)[:, None]
                + (self.context - 1 - jnp.arange(self.context))[None, :])
        return padded[:, cols]                               # [B, U+1, C]

    # ---- joint ----------------------------------------------------------------
    def joint(self, enc_f: jax.Array, pred_f: jax.Array) -> jax.Array:
        """enc_f [B, T, J], pred_f [B, U+1, J] -> logits [B, T, U+1, V+1]."""
        x = jnp.tanh(enc_f[:, :, None, :] + pred_f[:, None, :, :])
        return self.out(x)

    # ---- loss ------------------------------------------------------------------
    def loss(self, memory: jax.Array, memory_lengths: jax.Array,
             targets: jax.Array, target_lengths: jax.Array) -> jax.Array:
        """Per-row transducer negative log-likelihood [B] (callers apply
        row_mask and any per-token normalization)."""
        enc_f = self.enc_proj(memory.astype(self.dtype))
        pred_f = self._predict(self._histories(targets, target_lengths))
        logits = self.joint(enc_f, pred_f)
        return rnnt_loss(logits, memory_lengths, targets, target_lengths,
                         blank_id=self.blank_id, reduction="none")

    # ---- beam-facing step API ------------------------------------------------
    def encode_features(self, memory: jax.Array) -> jax.Array:
        """memory [B, T, d_memory] -> joint-space encoder features [B, T, J]
        (computed once per utterance by the beam engine)."""
        return self.enc_proj(memory.astype(self.dtype))

    def step_logprobs(self, enc_f_t: jax.Array, hist: jax.Array) -> jax.Array:
        """enc_f_t [R, J] (one frame, beam rows), hist [R, context] ->
        fp32 log-probs [R, V+1] — one joint evaluation per beam expansion."""
        logits = self.out(jnp.tanh(enc_f_t + self._predict(hist)))
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # ---- greedy decode ----------------------------------------------------------
    def greedy_decode(self, memory: jax.Array, memory_lengths: jax.Array,
                      hist: jax.Array | None = None,
                      return_hist: bool = False):
        """Frame-synchronous greedy search -> (tokens [B, L], lengths [B]).

        Per frame: evaluate the joint on the current history; emit while the
        argmax is non-blank (at most ``max_symbols`` per frame), then advance
        to the next frame. One jittable lax.scan, static shapes.

        ``hist`` [B, context] carries the label history INTO this call and
        ``return_hist=True`` returns the updated history — the stateless
        predictor makes block-wise STREAMING transducer decoding exact:
        feeding encoder frames block by block with the history threaded
        through equals one offline pass (tested)."""
        B, T, _ = memory.shape
        L = min(self.max_decode_len, T * self.max_symbols)
        enc_f = self.enc_proj(memory.astype(self.dtype))     # [B, T, J]
        hist0 = jnp.full((B, self.context), self.bos_id, jnp.int32) \
            if hist is None else hist.astype(jnp.int32)
        buf0 = jnp.zeros((B, L), jnp.int32)
        len0 = jnp.zeros((B,), jnp.int32)
        ar = jnp.arange(B)

        def frame(carry, inp):
            hist, buf, out_len = carry
            enc_t, t_real = inp                              # [B, J], [B]
            alive = t_real
            for _ in range(self.max_symbols):                # static unroll
                logits = self.out(jnp.tanh(enc_t + self._predict(hist)))
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = alive & (tok != self.blank_id) & (out_len < L)
                slot = jnp.minimum(out_len, L - 1)
                buf = buf.at[ar, slot].set(
                    jnp.where(emit, tok, buf[ar, slot]))
                out_len = out_len + emit.astype(jnp.int32)
                hist = jnp.where(
                    emit[:, None],
                    jnp.concatenate([tok[:, None], hist[:, :-1]], axis=1),
                    hist)
                alive = alive & emit
            return (hist, buf, out_len), ()

        t_real = (jnp.arange(T)[None, :] < memory_lengths[:, None])
        (hist_f, buf, out_len), _ = jax.lax.scan(
            frame, (hist0, buf0, len0),
            (enc_f.transpose(1, 0, 2), t_real.transpose(1, 0)))
        if return_hist:
            return buf, out_len, hist_f
        return buf, out_len


NEG_INF = -1.0e30


class _RNNTBeamMixin:
    """Device-side time-synchronous beam for RNNTHead (mixed in below).

    The ENTIRE search is one ``lax.scan`` over frames (decoders/
    device_ctc_beam.py discipline): per frame, up to ``max_symbols``
    expansion rounds run inside the body; blank-consumed mass banks into a
    fixed-capacity per-frame BANK where alignments of the same label
    sequence merge EXACTLY by token-buffer compare (two frontier rows are
    distinct by construction, so at most one candidate matches a bank row).
    Children never need child-child merging: distinct parents produce
    distinct children in a round (same structure as the host engine in
    decoders/rnnt_decode.py, whose fp64 scores remain the oracle).
    """

    def beam_decode(self, memory: jax.Array, memory_lengths: jax.Array,
                    beam_size: int = 8,
                    max_symbols: int | None = None):
        """-> (tokens [B, L], lengths [B]) of the best merged hypothesis."""
        ftoks, fplen, fscore = self.beam_decode_nbest(
            memory, memory_lengths, beam_size, max_symbols)
        best = jnp.argmax(fscore, axis=1)
        toks = jnp.take_along_axis(ftoks, best[:, None, None], 1)[:, 0]
        plen = jnp.take_along_axis(fplen, best[:, None], 1)[:, 0]
        return toks, plen

    def beam_decode_nbest(self, memory: jax.Array, memory_lengths: jax.Array,
                          beam_size: int = 8,
                          max_symbols: int | None = None):
        """-> the whole final merged beam (tokens [B, K, L], lengths [B, K],
        scores [B, K]; dead rows score NEG_INF) — the n-best pool the
        rnnt_beam_lm cell re-ranks with a second-pass LM (the same post-hoc
        discipline as the AED/joint cells' lm_rescore)."""
        K = int(beam_size)
        R = int(max_symbols if max_symbols is not None else self.max_symbols)
        B, T, _ = memory.shape
        L = min(self.max_decode_len, T * R if T * R > 0 else 1)
        V = self.vocab_size
        blank = self.blank_id
        Nb = K * (R + 2)                       # bank capacity (loose bound)
        enc_f = self.enc_proj(memory.astype(self.dtype))      # [B, T, J]
        ar_b = jnp.arange(B)[:, None]

        ftoks0 = jnp.zeros((B, K, L), jnp.int32)
        fplen0 = jnp.zeros((B, K), jnp.int32)
        fscore0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) \
            * jnp.ones((B, 1), jnp.float32)

        def _hist(toks, plen):
            """[B, K, L], [B, K] -> [B, K, context] (most recent first)."""
            cols = plen[..., None] - 1 - jnp.arange(self.context)[None, None]
            h = jnp.take_along_axis(toks, jnp.maximum(cols, 0), axis=2)
            return jnp.where(cols >= 0, h, self.bos_id)

        def frame(carry, inp):
            ftoks, fplen, fscore = carry
            enc_t, t_real = inp                               # [B, J], [B]
            btoks = jnp.zeros((B, Nb, L), jnp.int32)
            bplen = jnp.zeros((B, Nb), jnp.int32)
            bscore = jnp.full((B, Nb), NEG_INF, jnp.float32)
            bvalid = jnp.zeros((B, Nb), bool)
            count = jnp.zeros((B,), jnp.int32)

            for _ in range(R + 1):                            # static unroll
                hist = _hist(ftoks, fplen)
                logits = self.out(jnp.tanh(
                    enc_t[:, None, :] + self._predict(hist)))
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                live = fscore > NEG_INF / 2

                # ---- bank the blank-consumed mass (exact merges) ----------
                cand = fscore + lp[..., blank]                # [B, K]
                pos = jnp.arange(L)
                same_tok = jnp.where(
                    (pos[None, None, None, :] < fplen[:, :, None, None]),
                    ftoks[:, :, None, :] == btoks[:, None, :, :], True)
                eq = (same_tok.all(-1)
                      & (fplen[:, :, None] == bplen[:, None, :])
                      & bvalid[:, None, :]
                      & live[:, :, None])                     # [B, K, Nb]
                sel = jnp.where(eq, cand[:, :, None], NEG_INF).max(1)
                bscore = jnp.logaddexp(bscore, sel)
                unmatched = live & ~eq.any(-1)                # [B, K]
                slot = count[:, None] + jnp.cumsum(
                    unmatched.astype(jnp.int32), axis=1) - 1
                slot = jnp.where(unmatched, jnp.minimum(slot, Nb - 1), Nb - 1)
                # scatter appends via one-hot (at most one cand per slot)
                oh = jax.nn.one_hot(jnp.where(unmatched, slot, Nb), Nb,
                                    dtype=jnp.float32)        # [B, K, Nb]
                app_score = jnp.where(
                    oh.astype(bool).any(1),
                    jnp.where(oh.astype(bool), cand[:, :, None],
                              NEG_INF).max(1), NEG_INF)
                bscore = jnp.logaddexp(bscore, app_score)
                ohb = oh.astype(bool)
                btoks = jnp.where(
                    ohb.any(1)[:, :, None],
                    jnp.einsum("bkn,bkl->bnl", oh, ftoks.astype(jnp.float32)
                               ).astype(jnp.int32), btoks)
                bplen = jnp.where(
                    ohb.any(1),
                    jnp.einsum("bkn,bk->bn", oh, fplen.astype(jnp.float32)
                               ).astype(jnp.int32), bplen)
                bvalid = bvalid | ohb.any(1)
                count = count + unmatched.sum(-1)

                # ---- children: flatten [K*V] and keep top-K ---------------
                can_grow = live & (fplen < L)
                child = jnp.where(can_grow[:, :, None],
                                  fscore[:, :, None] + lp[..., :V], NEG_INF)
                top, idx = jax.lax.top_k(child.reshape(B, K * V), K)
                parent = idx // V
                label = idx % V
                ptoks = jnp.take_along_axis(
                    ftoks, parent[:, :, None], axis=1)
                pplen = jnp.take_along_axis(fplen, parent, axis=1)
                wr = jax.nn.one_hot(jnp.minimum(pplen, L - 1), L,
                                    dtype=bool)               # [B, K, L]
                ftoks = jnp.where(wr, label[:, :, None], ptoks)
                fplen = pplen + 1
                fscore = top

            # ---- frame end: next frontier = top-K of the bank -------------
            bs = jnp.where(bvalid, bscore, NEG_INF)
            top, idx = jax.lax.top_k(bs, K)
            ntoks = jnp.take_along_axis(btoks, idx[:, :, None], axis=1)
            nplen = jnp.take_along_axis(bplen, idx, axis=1)
            ftoks2, fplen2, fscore2 = carry
            keep = t_real[:, None]
            return (jnp.where(keep[..., None], ntoks, ftoks2),
                    jnp.where(keep, nplen, fplen2),
                    jnp.where(keep, top, fscore2)), ()

        t_real = (jnp.arange(T)[None, :] < memory_lengths[:, None])
        (ftoks, fplen, fscore), _ = jax.lax.scan(
            frame, (ftoks0, fplen0, fscore0),
            (enc_f.transpose(1, 0, 2), t_real.transpose(1, 0)))
        return ftoks, fplen, fscore


# graft the mixin methods onto RNNTHead (kept separate for readability)
RNNTHead.beam_decode = _RNNTBeamMixin.beam_decode
RNNTHead.beam_decode_nbest = _RNNTBeamMixin.beam_decode_nbest


def rnnt_host_greedy(tokens, lengths) -> list[list[int]]:
    """Device greedy output -> per-utterance host id lists."""
    import numpy as np
    toks = np.asarray(tokens)
    lens = np.asarray(lengths)
    return [toks[b, :int(lens[b])].tolist() for b in range(toks.shape[0])]
