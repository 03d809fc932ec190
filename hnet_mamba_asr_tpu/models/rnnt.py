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

    First-pass LM shallow fusion runs IN-SCAN (``lm_model``/``lm_params``):
    every label emission adds ``lm_weight * logP_LM(label | labels)`` to
    the SELECTION score while the acoustic log-sum and the raw LM log-prob
    ride as separate carries (the LM term is a function of the label
    sequence only, so exact alignment merges are untouched). Each round
    one batched cached LM step (decoders/device_ctc_beam._lm_step) scores
    the round frontier; the per-frame winners come out of the BANK, whose
    rows snapshot frontiers of different rounds — instead of banking whole
    KV caches (Nb× the memory), each bank row remembers its frame-start
    ancestor (``root``) and the winners REPLAY their <= max_symbols new
    labels from the pristine frame-start caches (masked steps), which
    reproduces the caches and next-token distribution exactly.
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
                          max_symbols: int | None = None,
                          lm_model=None, lm_params=None, lm_pe=None,
                          lm_weight: float = 0.0, lm_cache_cap: int = 512,
                          state=None, token_buf_len: int | None = None):
        """-> the whole final merged beam (tokens [B, K, L], lengths [B, K],
        scores [B, K]; dead rows score NEG_INF) — the n-best pool the
        rnnt_beam_lm cell re-ranks with a second-pass LM (the same post-hoc
        discipline as the AED/joint cells' lm_rescore).

        STREAMING: the returned triple IS the search's whole state (the
        search is frame-synchronous with no lookahead), so feeding encoder
        frames block by block with the previous call's outputs threaded
        back as ``state`` equals one offline pass EXACTLY — pass
        ``token_buf_len`` on the first call so the token buffer's size is
        block-independent (padding rows beyond ``memory_lengths`` are
        state no-ops). Not combinable with LM fusion (whose carry also
        holds KV caches).

        With ``lm_model`` (a models/lm.TransformerLM) + ``lm_params`` +
        ``lm_pe`` (sinusoidal PE table [cap, d_model]) the search fuses the
        LM first-pass at ``lm_weight`` and returns a 4-tuple
        (tokens, lengths, acoustic_scores, lm_logprobs). The returned LM
        log-probs INCLUDE the eos closure term (comparable to
        CausalLMScorer.sequence_logprob, so lm_rescore_batch re-ranks the
        fused and unfused pools with the same formula); in-search selection
        uses the running label-only LM mass, the standard shallow-fusion
        rule."""
        K = int(beam_size)
        R = int(max_symbols if max_symbols is not None else self.max_symbols)
        B, T, _ = memory.shape
        use_lm = lm_model is not None
        if state is not None and use_lm:
            raise ValueError("streaming state does not compose with LM "
                             "fusion (the fused carry also holds KV caches)")
        if state is not None:
            L = int(state[0].shape[-1])
        elif token_buf_len is not None:
            L = int(token_buf_len)
        else:
            L = min(self.max_decode_len, T * R if T * R > 0 else 1)
        V = self.vocab_size
        blank = self.blank_id
        Nb = K * (R + 2)                       # bank capacity (loose bound)
        w = float(lm_weight)
        enc_f = self.enc_proj(memory.astype(self.dtype))      # [B, T, J]
        ar_b = jnp.arange(B)[:, None]

        if state is not None:
            ftoks0, fplen0, fscore0 = (jnp.asarray(state[0], jnp.int32),
                                       jnp.asarray(state[1], jnp.int32),
                                       jnp.asarray(state[2], jnp.float32))
        else:
            ftoks0 = jnp.zeros((B, K, L), jnp.int32)
            fplen0 = jnp.zeros((B, K), jnp.int32)
            fscore0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) \
                * jnp.ones((B, 1), jnp.float32)

        if use_lm:
            from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
                _lm_init_caches, _lm_step,
            )
            rows = B * K
            cap = int(min(L + 1, lm_cache_cap))
            caches0 = _lm_init_caches(lm_model, rows, cap)
            bos = jnp.full((rows,), lm_model.bos_id, jnp.int32)
            lm_next0, caches0 = _lm_step(
                lm_model, lm_pe, lm_params, caches0, bos,
                jnp.zeros((rows,), jnp.int32), jnp.ones((rows,), bool))
            lm_next0 = lm_next0.reshape(B, K, -1)             # [B, K, Vlm]
            flms0 = jnp.zeros((B, K), jnp.float32)

        def _hist(toks, plen):
            """[B, K, L], [B, K] -> [B, K, context] (most recent first)."""
            cols = plen[..., None] - 1 - jnp.arange(self.context)[None, None]
            h = jnp.take_along_axis(toks, jnp.maximum(cols, 0), axis=2)
            return jnp.where(cols >= 0, h, self.bos_id)

        def frame(carry, inp):
            if use_lm:
                ftoks, fplen, fscore, flms, lm_next, caches = carry
                plen_start = fplen                            # replay anchor
                root = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None],
                                        (B, K))
                broot = jnp.zeros((B, Nb), jnp.int32)
                blms = jnp.zeros((B, Nb), jnp.float32)
                caches_r = caches                             # round frontier
            else:
                ftoks, fplen, fscore = carry
            enc_t, t_real = inp                               # [B, J], [B]
            btoks = jnp.zeros((B, Nb, L), jnp.int32)
            bplen = jnp.zeros((B, Nb), jnp.int32)
            bscore = jnp.full((B, Nb), NEG_INF, jnp.float32)
            bvalid = jnp.zeros((B, Nb), bool)
            count = jnp.zeros((B,), jnp.int32)

            for round_ in range(R + 1):                       # static unroll
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
                # HIGHEST precision on every one-hot scatter: the default TPU
                # matmul multiplies in bf16, which would round token ids /
                # plens above 256 and perturb banked LM masses by ~0.4%.
                hi = jax.lax.Precision.HIGHEST
                btoks = jnp.where(
                    ohb.any(1)[:, :, None],
                    jnp.einsum("bkn,bkl->bnl", oh, ftoks.astype(jnp.float32),
                               precision=hi).astype(jnp.int32), btoks)
                bplen = jnp.where(
                    ohb.any(1),
                    jnp.einsum("bkn,bk->bn", oh, fplen.astype(jnp.float32),
                               precision=hi).astype(jnp.int32), bplen)
                bvalid = bvalid | ohb.any(1)
                count = count + unmatched.sum(-1)
                if use_lm:
                    # a merged row's LM score equals the bank row's (same
                    # sequence); appended rows copy the frontier's lms/root
                    blms = jnp.where(
                        ohb.any(1),
                        jnp.einsum("bkn,bk->bn", oh, flms,
                                   precision=hi).astype(jnp.float32),
                        blms)
                    broot = jnp.where(
                        ohb.any(1),
                        jnp.einsum("bkn,bk->bn", oh, root.astype(jnp.float32),
                                   precision=hi).astype(jnp.int32), broot)
                if round_ == R:
                    break                 # last round only banks; children
                                          # would be discarded at frame end

                # ---- children: flatten [K*V] and keep top-K ---------------
                can_grow = live & (fplen < L)
                child_ac = jnp.where(can_grow[:, :, None],
                                     fscore[:, :, None] + lp[..., :V], NEG_INF)
                if use_lm:
                    # selection on the FUSED score; acoustic/LM parts are
                    # re-gathered from the winning (parent, label) pairs
                    child_lms = flms[:, :, None] + lm_next[..., :V]
                    child_sel = jnp.where(child_ac > NEG_INF / 2,
                                          child_ac + w * child_lms, NEG_INF)
                else:
                    child_sel = child_ac
                _, idx = jax.lax.top_k(child_sel.reshape(B, K * V), K)
                parent = idx // V
                label = idx % V
                top = jnp.take_along_axis(child_ac.reshape(B, K * V), idx, 1)
                ptoks = jnp.take_along_axis(
                    ftoks, parent[:, :, None], axis=1)
                pplen = jnp.take_along_axis(fplen, parent, axis=1)
                wr = jax.nn.one_hot(jnp.minimum(pplen, L - 1), L,
                                    dtype=bool)               # [B, K, L]
                ftoks = jnp.where(wr, label[:, :, None], ptoks)
                fplen = pplen + 1
                fscore = top
                if use_lm:
                    flms = jnp.take_along_axis(
                        child_lms.reshape(B, K * V), idx, 1)
                    root = jnp.take_along_axis(root, parent, axis=1)
                    # one batched cached LM step advances the new frontier
                    # (per-row positions; dead/frozen rows masked)
                    gpar = (parent + ar_b * K).reshape(rows)
                    caches_r = tuple((ck[gpar], cv[gpar])
                                     for ck, cv in caches_r)
                    alive_r = (top > NEG_INF / 2) & t_real[:, None]
                    pos_r = jnp.minimum(pplen + 1, cap - 1).reshape(rows)
                    write = (alive_r & (pplen + 1 < cap)).reshape(rows)
                    step_lp, caches_r = _lm_step(
                        lm_model, lm_pe, lm_params, caches_r,
                        jnp.where(write, label.reshape(rows),
                                  lm_model.pad_id),
                        pos_r, write)
                    par_next = jnp.take_along_axis(
                        lm_next, parent[..., None], 1)
                    lm_next = jnp.where(write.reshape(B, K)[..., None],
                                        step_lp.reshape(B, K, -1), par_next)

            # ---- frame end: next frontier = top-K of the bank -------------
            bs = jnp.where(bvalid, bscore, NEG_INF)
            if use_lm:
                _, idx = jax.lax.top_k(
                    jnp.where(bvalid, bscore + w * blms, NEG_INF), K)
                top = jnp.take_along_axis(bs, idx, 1)
            else:
                top, idx = jax.lax.top_k(bs, K)
            ntoks = jnp.take_along_axis(btoks, idx[:, :, None], axis=1)
            nplen = jnp.take_along_axis(bplen, idx, axis=1)
            keep = t_real[:, None]
            if not use_lm:
                ftoks2, fplen2, fscore2 = carry
                return (jnp.where(keep[..., None], ntoks, ftoks2),
                        jnp.where(keep, nplen, fplen2),
                        jnp.where(keep, top, fscore2)), ()

            # ---- LM replay: winners re-derive caches + next-token dist from
            # the pristine frame-start caches of their root ancestor --------
            nlms = jnp.take_along_axis(blms, idx, 1)
            nroot = jnp.take_along_axis(broot, idx, 1)        # [B, K]
            p0 = jnp.take_along_axis(plen_start, nroot, 1)    # labels at start
            groot = (nroot + ar_b * K).reshape(rows)
            ncaches = tuple((ck[groot], cv[groot]) for ck, cv in caches)
            nlm_next = jnp.take_along_axis(carry[4], nroot[..., None], 1)
            delta = nplen - p0                                # 0..R new labels
            for j in range(R):
                seq_i = jnp.minimum(p0 + j, L - 1)            # label index
                tok_j = jnp.take_along_axis(ntoks, seq_i[..., None], 2)[..., 0]
                active = (j < delta) & t_real[:, None]
                pos_j = jnp.minimum(p0 + 1 + j, cap - 1).reshape(rows)
                write = (active & (p0 + 1 + j < cap)).reshape(rows)
                step_lp, ncaches = _lm_step(
                    lm_model, lm_pe, lm_params, ncaches,
                    jnp.where(write, tok_j.reshape(rows), lm_model.pad_id),
                    pos_j, write)
                nlm_next = jnp.where(write.reshape(B, K)[..., None],
                                     step_lp.reshape(B, K, -1), nlm_next)

            ftoks2, fplen2, fscore2, flms2, lm_next2, caches2 = carry
            keep_r = jnp.broadcast_to(keep, (B, K)).reshape(rows)
            kcaches = tuple(
                (jnp.where(keep_r[:, None, None, None], nk, ok),
                 jnp.where(keep_r[:, None, None, None], nv, ov))
                for (nk, nv), (ok, ov) in zip(ncaches, caches2))
            return (jnp.where(keep[..., None], ntoks, ftoks2),
                    jnp.where(keep, nplen, fplen2),
                    jnp.where(keep, top, fscore2),
                    jnp.where(keep, nlms, flms2),
                    jnp.where(keep[..., None], nlm_next, lm_next2),
                    kcaches), ()

        t_real = (jnp.arange(T)[None, :] < memory_lengths[:, None])
        if use_lm:
            (ftoks, fplen, fscore, flms, lm_nextF, _), _ = jax.lax.scan(
                frame, (ftoks0, fplen0, fscore0, flms0, lm_next0, caches0),
                (enc_f.transpose(1, 0, 2), t_real.transpose(1, 0)))
            return (ftoks, fplen, fscore,
                    flms + lm_nextF[..., lm_model.eos_id])

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
