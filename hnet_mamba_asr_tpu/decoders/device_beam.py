"""Fully device-side AED beam search: one jitted call per batch.

The host-driven label-synchronous beam (decoders/joint.py) makes one device
round trip per global step; that is the right engine for the joint cell
(whose CTC prefix scorer is host state), but the pure-AED beam has no host
state at all — so here the ENTIRE search lives on the device as a
``lax.scan`` over KV-cached decode steps with ``lax.top_k`` selection:

  - alive beam: R rows per utterance, scores -inf-padded, so the beam can
    shrink (eos retirements) exactly like the host search's Python list;
  - ended pool: running top-``nbest`` completions per utterance, updated by
    concat + top_k whenever eos expansions win beam slots;
  - per-utterance step caps ``min(max(1, ratio*Tf), Tf-1, max_decode_len)``
    and the sound early stop (length_bonus <= 0: best alive <= nbest-th
    completion) as per-utterance active masks;
  - cap survivors are finalized with their own eos score in the same scan
    iteration their cap is hit (the host search's need_final pass).

Search semantics mirror joint_beam_search_nbest with ctc_weight = 0
(behavioral spec: reference src/dcasr/decoders/joint.py); the one numeric
difference is float32 on-device score accumulation vs the host's float64 —
hypotheses can differ only on score ties inside ~1e-6 (equivalence-fuzzed in
tests). The win is dispatch: B x beam x steps of search costs ONE device
call, vs one call per step for the host loop.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.decoders.joint import Hypothesis

NEG_INF = -1.0e9
_JIT_CACHE: dict = {}


def _pow2_bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def _beam_scan(aed, params, memory, memory_lengths, max_steps, *,
               beam_size: int, nbest: int, length_bonus: float, pre: int,
               N_ITERS: int):
    """Jittable core. memory [B, S, d]; max_steps [B] int32 (per-utt cap).
    Returns pool (scores/aed/len/tokens), alive (ditto) after the scan.
    N_ITERS (static, bucketed) bounds the scan; iterations past every
    utterance's cap are inert (all active flags false)."""
    B = memory.shape[0]
    R = beam_size
    P = nbest
    V = aed.vocab_size
    cap = aed.max_decode_len + 1
    rows = B * R

    def apply(method, *a):
        return aed.apply(params, *a, method=method)

    caches, kpm = apply("decode_start", memory, memory_lengths, cap)
    rep = lambda x: jnp.repeat(x, R, axis=0)
    caches = tuple(
        {k: (jnp.zeros((rows,) + v.shape[1:], v.dtype)
             if k in ("self_k", "self_v") else rep(v))
         for k, v in c.items()} for c in caches)
    kpm = rep(kpm)

    # commit bos on every row (pos 0); expansion happens from row 0 only
    # because all other rows start at -inf score
    logp, caches = apply("decode_step", caches, kpm,
                         jnp.arange(rows, dtype=jnp.int32),
                         jnp.full((rows,), aed.bos_id, jnp.int32), 0)

    state = dict(
        caches=caches,
        logp=logp.reshape(B, R, V),
        alive_score=jnp.where(jnp.arange(R)[None, :] == 0, 0.0, NEG_INF
                              ) * jnp.ones((B, 1)),
        alive_aed=jnp.zeros((B, R), jnp.float32),
        alive_tok=jnp.zeros((B, R, cap), jnp.int32),
        pool_score=jnp.full((B, P), NEG_INF, jnp.float32),
        pool_aed=jnp.zeros((B, P), jnp.float32),
        pool_len=jnp.zeros((B, P), jnp.int32),
        pool_tok=jnp.zeros((B, P, cap), jnp.int32),
        pool_n=jnp.zeros((B,), jnp.int32),
        active=jnp.ones((B,), bool),
    )

    eos = aed.eos_id

    def body(state, t):
        lp = state["logp"]                                   # [B, R, V]
        # pre-beam pruning per row (eos always kept), as in the host search
        if pre < V:
            thresh = jax.lax.top_k(lp, pre)[0][..., -1:]
            keep = (lp >= thresh) | (jnp.arange(V) == eos)[None, None, :]
            lp = jnp.where(keep, lp, NEG_INF)
        dead = state["alive_score"] <= NEG_INF / 2           # [B, R]
        new_aed = state["alive_aed"][..., None] + lp          # [B, R, V]
        is_eos_col = (jnp.arange(V) == eos)[None, None, :]
        new_len = t + jnp.where(is_eos_col, 0, 1)            # eos keeps length
        total = new_aed + length_bonus * new_len
        total = jnp.where(dead[..., None], NEG_INF, total)
        flat = total.reshape(B, R * V)
        top_val, top_idx = jax.lax.top_k(flat, R)            # [B, R]
        parent = (top_idx // V).astype(jnp.int32)
        tok = (top_idx % V).astype(jnp.int32)
        sel_aed = jnp.take_along_axis(new_aed.reshape(B, R * V), top_idx, 1)
        is_end = (tok == eos) | (top_val <= NEG_INF / 2)

        # retire eos winners into the pool (concat + re-top_k keeps top-P)
        end_score = jnp.where(tok == eos, top_val, NEG_INF)
        gat = jnp.take_along_axis(state["alive_tok"], parent[..., None], 1)
        cand_tok = gat                                        # eos not stored
        ps = jnp.concatenate([state["pool_score"], end_score], 1)
        pa = jnp.concatenate([state["pool_aed"], sel_aed], 1)
        pl = jnp.concatenate([state["pool_len"],
                              jnp.broadcast_to(t, (B, R)).astype(jnp.int32)], 1)
        pt = jnp.concatenate([state["pool_tok"], cand_tok], 1)
        pool_val, pool_idx = jax.lax.top_k(ps, P)
        pool_aed = jnp.take_along_axis(pa, pool_idx, 1)
        pool_len = jnp.take_along_axis(pl, pool_idx, 1)
        pool_tok = jnp.take_along_axis(pt, pool_idx[..., None], 1)
        pool_n = state["pool_n"] + (end_score > NEG_INF / 2).sum(1)

        # surviving beam rows: non-eos winners; others become dead slots
        alive_score = jnp.where(is_end, NEG_INF, top_val)
        alive_aed = jnp.where(is_end, 0.0, sel_aed)
        alive_tok = gat.at[:, :, t].set(jnp.where(is_end, 0, tok))

        # termination per utt (host semantics, in order):
        beam_empty = jnp.all(alive_score <= NEG_INF / 2, axis=1)
        kth = pool_val[:, nbest - 1]                  # P == nbest by contract
        early = ((length_bonus <= 0.0) & (pool_n >= nbest)
                 & (alive_score.max(1) <= kth) & ~beam_empty)
        hit_cap = (t + 1 >= max_steps) & ~beam_empty & ~early

        # need one more decode_step's logp for both expansion AND the cap
        # finalization — commit the selected rows and read it now
        gpar = parent + jnp.arange(B, dtype=jnp.int32)[:, None] * R
        commit_tok = jnp.where(is_end, eos, tok)
        logp2, caches = apply("decode_step", state["caches"], kpm,
                              gpar.reshape(-1), commit_tok.reshape(-1), t + 1)
        logp2 = logp2.reshape(B, R, V)

        # cap finalization: survivors score their own eos from logp2
        fin_score = jnp.where(
            (alive_score > NEG_INF / 2) & hit_cap[:, None],
            alive_aed + logp2[:, :, eos] + length_bonus * (t + 1), NEG_INF)
        ps = jnp.concatenate([pool_val, fin_score], 1)
        pa = jnp.concatenate([pool_aed, alive_aed + logp2[:, :, eos]], 1)
        pl = jnp.concatenate([pool_len,
                              jnp.full((B, R), t + 1, jnp.int32)], 1)
        pt = jnp.concatenate([pool_tok, alive_tok], 1)
        pool_val2, pool_idx2 = jax.lax.top_k(ps, P)
        pool_aed2 = jnp.take_along_axis(pa, pool_idx2, 1)
        pool_len2 = jnp.take_along_axis(pl, pool_idx2, 1)
        pool_tok2 = jnp.take_along_axis(pt, pool_idx2[..., None], 1)
        pool_n2 = pool_n + jnp.where(
            hit_cap, (fin_score > NEG_INF / 2).sum(1), 0)

        use_fin = hit_cap[:, None]
        act = state["active"]
        upd = lambda new, old: jnp.where(
            act.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        # caches of inactive utterances keep being written but are never read
        # again (their alive/pool state is frozen) — no freeze copy needed
        new_state = dict(
            caches=caches,
            logp=upd(logp2, state["logp"]),
            alive_score=upd(alive_score, state["alive_score"]),
            alive_aed=upd(alive_aed, state["alive_aed"]),
            alive_tok=upd(alive_tok, state["alive_tok"]),
            pool_score=upd(jnp.where(use_fin, pool_val2, pool_val),
                           state["pool_score"]),
            pool_aed=upd(jnp.where(use_fin, pool_aed2, pool_aed),
                         state["pool_aed"]),
            pool_len=upd(jnp.where(use_fin, pool_len2, pool_len),
                         state["pool_len"]),
            pool_tok=upd(jnp.where(use_fin[..., None], pool_tok2, pool_tok),
                         state["pool_tok"]),
            pool_n=upd(jnp.where(hit_cap, pool_n2, pool_n), state["pool_n"]),
            active=act & ~(beam_empty | early | hit_cap),
        )
        return new_state, ()

    state, _ = jax.lax.scan(body, state, jnp.arange(N_ITERS))
    return {k: state[k] for k in ("alive_score", "alive_aed", "alive_tok",
                                  "pool_score", "pool_aed", "pool_len",
                                  "pool_tok", "pool_n")}


def aed_beam_search_device(aed, params, features, lengths, *,
                           beam_size: int = 10, nbest: int = 1,
                           length_bonus: float = 0.0,
                           max_len_ratio: float = 1.0,
                           pre_beam: int | None = None,
                           n_utts: int | None = None
                           ) -> list[list[Hypothesis]]:
    """Pure-AED n-best beam, entirely on-device (ONE jitted call per batch).

    Returns per-utterance Hypothesis lists compatible with lm_rescore (the
    aed_beam / aed_beam_lm cells of the decode matrix)."""
    lens = np.asarray(lengths)
    B = features.shape[0]
    n = int(n_utts) if n_utts is not None else B
    max_steps = np.minimum(
        np.minimum(np.maximum(1, (max_len_ratio * lens).astype(np.int64)),
                   np.maximum(lens - 1, 1)),
        aed.max_decode_len).astype(np.int32)
    pre = min(aed.vocab_size,
              pre_beam if pre_beam else max(2 * beam_size, 15))
    # bucket the static trip count so executables are reused across batches
    worst = int(max_steps[:n].max()) if n else 1
    n_iters = min(_pow2_bucket(worst), int(aed.max_decode_len))

    key = (aed, beam_size, nbest, float(length_bonus), pre, n_iters)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        import functools
        fn = jax.jit(functools.partial(
            _beam_scan, aed, beam_size=beam_size, nbest=nbest,
            length_bonus=length_bonus, pre=pre, N_ITERS=n_iters))
        _JIT_CACHE[key] = fn
    out = fn({"params": params}, features, jnp.asarray(lens, jnp.int32),
             jnp.asarray(max_steps))
    out = {k: np.asarray(v) for k, v in out.items()}

    results: list[list[Hypothesis]] = []
    for b in range(n):
        hyps: list[Hypothesis] = []
        for p in range(out["pool_score"].shape[1]):
            if out["pool_score"][b, p] > NEG_INF / 2:
                L = int(out["pool_len"][b, p])
                hyps.append(Hypothesis(
                    tokens=out["pool_tok"][b, p, :L].tolist(),
                    aed=float(out["pool_aed"][b, p]), ctc=0.0,
                    score=float(out["pool_score"][b, p])))
        if not hyps:                                  # pool empty: alive best
            order = np.argsort(-out["alive_score"][b])
            for r in order[:nbest]:
                if out["alive_score"][b, r] > NEG_INF / 2:
                    L = int(max_steps[b])
                    hyps.append(Hypothesis(
                        tokens=out["alive_tok"][b, r, :L].tolist(),
                        aed=float(out["alive_aed"][b, r]), ctc=0.0,
                        score=float(out["alive_score"][b, r])))
        hyps.sort(key=lambda h: h.score, reverse=True)
        results.append(hyps[:nbest])
    return results
