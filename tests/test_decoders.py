"""Decode stack: CTC greedy collapse; prefix beam vs brute-force MAP label
sequence; CTCPrefixScorer vs brute-force alignment enumeration; joint beam on a
fake encoder; LM scorer interface identities; lm_rescore semantics."""
import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search
from hnet_mamba_asr_tpu.decoders.joint import (
    CTCPrefixScorer, Hypothesis, joint_beam_search, joint_beam_search_nbest, lm_rescore,
)
from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
from hnet_mamba_asr_tpu.models.ctc_head import ctc_greedy_collapse, greedy_decode
from hnet_mamba_asr_tpu.models.lm import TransformerLM


def _collapse(path, blank):
    out, prev = [], None
    for s in path:
        if s != prev:
            if s != blank:
                out.append(s)
            prev = s
    return out


def _softmax_rows(rng, T, C):
    x = rng.normal(size=(T, C))
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


# ── greedy ────────────────────────────────────────────────────────────────────
def test_greedy_collapse():
    assert ctc_greedy_collapse([0, 0, 2, 1, 1, 2, 2], blank_id=2) == [0, 1]
    assert ctc_greedy_collapse([1, 2, 1], blank_id=2) == [1, 1]    # blank splits repeats
    assert ctc_greedy_collapse([2, 2, 2], blank_id=2) == []


def test_greedy_decode_lengths():
    ids = np.array([[0, 0, 2, 1], [1, 2, 2, 2]])
    out = greedy_decode(ids, np.array([4, 2]), blank_id=2)
    assert out == [[0, 1], [1]]


# ── prefix beam vs brute force ────────────────────────────────────────────────
def _brute_best_label_seq(p, blank):
    T, C = p.shape
    totals: dict[tuple, float] = {}
    for path in itertools.product(range(C), repeat=T):
        prob = np.prod([p[t, path[t]] for t in range(T)])
        seq = tuple(_collapse(path, blank))
        totals[seq] = totals.get(seq, 0.0) + prob
    return list(max(totals.items(), key=lambda kv: kv[1])[0])


def test_prefix_beam_matches_bruteforce(rng):
    blank = 2
    for T in (2, 3, 4, 5):
        p = _softmax_rows(rng, T, 3)
        out = ctc_prefix_beam_search(np.log(p)[None], [T], blank_id=blank,
                                     beam_size=100, pre_beam=10)
        assert out[0] == _brute_best_label_seq(p, blank), T


def test_prefix_beam_batch_and_lengths(rng):
    lp = np.log(np.stack([_softmax_rows(rng, 6, 4) for _ in range(3)]))
    out = ctc_prefix_beam_search(lp, [6, 4, 2], blank_id=3, beam_size=8)
    assert len(out) == 3
    assert all(0 <= i < 3 for seq in out for i in seq)


def test_prefix_beam_lm_fusion_changes_ranking(rng):
    """A synthetic LM that loves token 0 must be able to flip a near-tie."""
    class BiasLM:
        def next_logprobs(self, prefixes):
            out = np.full((len(prefixes), 2), np.log(0.01))
            out[:, 0] = np.log(0.99)
            return out

    p = np.array([[[0.46, 0.49, 0.05]]] * 1, dtype=np.float64)    # T=1, blank=2
    lp = np.log(p)
    no_lm = ctc_prefix_beam_search(lp, [1], blank_id=2, beam_size=4)
    with_lm = ctc_prefix_beam_search(lp, [1], blank_id=2, beam_size=4,
                                     lm=BiasLM(), lm_weight=1.0)
    assert no_lm[0] == [1]
    assert with_lm[0] == [0]


# ── CTC prefix scorer vs brute force ─────────────────────────────────────────
def _brute_prefix_logprob(p, prefix, blank):
    T, K = p.shape
    total = 0.0
    for path in itertools.product(range(K), repeat=T):
        prob = np.prod([p[t, path[t]] for t in range(T)])
        if _collapse(path, blank)[:len(prefix)] == list(prefix):
            total += prob
    return math.log(total) if total > 0 else -1e10


def _chain_score(scorer, prefix):
    state = scorer.initial_state()
    sc = None
    for k in range(len(prefix)):
        scores, states = scorer.score(list(prefix[:k]), [prefix[k]], state)
        sc, state = float(scores[0]), states[0]
    return sc


def test_ctc_prefix_scorer_matches_bruteforce(rng):
    blank = 3
    for T in (3, 4, 5):
        p = _softmax_rows(rng, T, 4)
        scorer = CTCPrefixScorer(np.log(p), blank, eos_id=99)
        for g in ([0], [1], [2], [0, 1], [1, 2], [0, 0], [2, 1, 0]):
            if len(g) >= T:
                continue
            got = _chain_score(scorer, g)
            ref = _brute_prefix_logprob(p, g, blank)
            assert abs(got - ref) < 1e-4, (T, g, got, ref)


def test_initial_state_cumulative_blank(rng):
    lp = np.log(_softmax_rows(rng, 4, 4))
    s = CTCPrefixScorer(lp, blank_id=3, eos_id=99).initial_state()
    assert (s[:, 0] < -1e9).all()
    assert abs(s[0, 1] - lp[0, 3]) < 1e-9
    assert abs(s[2, 1] - lp[:3, 3].sum()) < 1e-9


def test_eos_scores_exact_prefix(rng):
    """Extending by eos must return P(output == prefix exactly)."""
    blank = 2
    p = _softmax_rows(rng, 4, 3)
    scorer = CTCPrefixScorer(np.log(p), blank, eos_id=7)
    scores, _ = scorer.score([0], [7], _first_state(scorer, 0))
    # brute force: paths collapsing to exactly [0]
    total = 0.0
    for path in itertools.product(range(3), repeat=4):
        if _collapse(path, blank) == [0]:
            total += np.prod([p[t, path[t]] for t in range(4)])
    assert abs(float(scores[0]) - math.log(total)) < 1e-6


def _first_state(scorer, label):
    scores, states = scorer.score([], [label], scorer.initial_state())
    return states[0]


# ── joint beam on a synthetic setup ───────────────────────────────────────────
def _fake_aed_next(target_seq, V, eos_id=2):
    """Deterministic 'AED': wants target_seq then eos, nearly one-hot."""
    def fn(b, token_lists):
        out = np.full((len(token_lists), V), np.log(1e-6))
        for i, toks in enumerate(token_lists):
            k = len(toks)
            want = target_seq[k] if k < len(target_seq) else eos_id
            out[i, want] = np.log(0.999)
        return out
    return fn


def test_joint_beam_recovers_target(rng):
    V = 8
    target = [5, 6, 4]
    mem_lens = [12]
    hyps = joint_beam_search(None, mem_lens,
                             aed_next_logprobs=_fake_aed_next(target, V),
                             ctc_log_probs=None, vocab_size=V, beam_size=4,
                             ctc_weight=0.0)
    assert hyps[0] == target


def test_joint_beam_with_ctc_anchoring(rng):
    """CTC log-probs concentrated on [1,0] must keep the joint output anchored
    even when the fake AED prefers something longer."""
    V, blank = 8, 8
    T = 6
    # CTC strongly emits 5 then 4 (with blanks around)
    p = np.full((T, V + 1), 0.01)
    for t, c in enumerate([5, 5, blank, 4, 4, blank]):
        p[t, c] = 0.93
    p /= p.sum(-1, keepdims=True)
    nbest = joint_beam_search_nbest(
        None, [T], aed_next_logprobs=_fake_aed_next([5, 4], V),
        ctc_log_probs=np.log(p)[None], vocab_size=V, beam_size=4,
        ctc_weight=0.5, nbest=2)
    assert nbest[0][0].tokens == [5, 4]
    assert len(nbest[0]) <= 2
    assert nbest[0][0].score >= nbest[0][-1].score


def test_cached_stepper_matches_full_recompute(rng):
    """joint_beam_search with the KV-cached stateful stepper must emit the
    SAME hypotheses as the full-recompute functional scorer."""
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import CachedAEDStepper, _UttStepper

    V, DM, S = 12, 16, 9
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=2, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=8)
    mem = jnp.asarray(rng.normal(size=(2, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 3])
    params = head.init(jax.random.PRNGKey(0), mem, jnp.asarray(mlens),
                       jnp.zeros((2, 3), jnp.int32))["params"]

    def functional(b, token_lists):
        n = len(token_lists)
        U = max(len(t) for t in token_lists) + 1
        ys = np.full((n, U), 3, np.int32)
        ys[:, 0] = 1
        for i, toks in enumerate(token_lists):
            ys[i, 1:1 + len(toks)] = toks
        logits = head.apply({"params": params}, mem[b:b + 1].repeat(n, axis=0),
                            jnp.full((n,), mlens[b]), jnp.asarray(ys))
        lens = np.array([len(t) for t in token_lists])
        last = np.asarray(logits)[np.arange(n), lens].astype(np.float64)
        last = last - np.log(np.exp(last - last.max(-1, keepdims=True)).sum(-1,
                             keepdims=True)) - last.max(-1, keepdims=True)
        return last

    kw = dict(vocab_size=V, beam_size=3, ctc_weight=0.0, max_decode_len=8)
    for b in range(2):
        ref = joint_beam_search(None, mlens[b:b + 1],
                                aed_next_logprobs=lambda _b, tl, b=b: functional(b, tl),
                                ctc_log_probs=None, **kw)[0]
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=3)
        got = joint_beam_search(None, mlens[b:b + 1],
                                aed_next_logprobs=_UttStepper(stepper, b),
                                ctc_log_probs=None, **kw)[0]
        assert got == ref, (b, got, ref)


def test_lockstep_batched_matches_serial(rng):
    """joint_beam_search_nbest_lockstep + BatchedCachedAEDStepper must emit
    per-utterance n-bests IDENTICAL to the serial search with the per-utt
    cached stepper — with and without the CTC joint term."""
    from hnet_mamba_asr_tpu.decoders.joint import joint_beam_search_nbest_lockstep
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import (
        BatchedCachedAEDStepper, CachedAEDStepper, _UttStepper,
    )

    V, DM, S, B = 12, 16, 9, 3
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=2, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=8)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 3, S - 1])
    params = head.init(jax.random.PRNGKey(1), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 3), jnp.int32))["params"]
    # CTC log-probs over V+1 classes (blank = V), normalized rows
    raw = rng.normal(size=(B, S, V + 1))
    ctc_lp = raw - np.log(np.exp(raw).sum(-1, keepdims=True))

    for ctc_w in (0.0, 0.3):
        kw = dict(vocab_size=V, beam_size=3, ctc_weight=ctc_w, blank_id=V,
                  nbest=3, max_decode_len=8)
        serial = []
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=3)
        for b in range(B):
            lp_b = ctc_lp[b:b + 1, :mlens[b]] if ctc_w > 0 else None
            serial.append(joint_beam_search_nbest(
                None, mlens[b:b + 1], ctc_log_probs=lp_b,
                aed_next_logprobs=_UttStepper(stepper, b), **kw)[0])
        batched = joint_beam_search_nbest_lockstep(
            mlens, batch_stepper=BatchedCachedAEDStepper(
                head, params, mem, mlens, beam_rows=3),
            ctc_log_probs=ctc_lp if ctc_w > 0 else None, **kw)
        for b in range(B):
            assert [h.tokens for h in batched[b]] == \
                   [h.tokens for h in serial[b]], (ctc_w, b)
            np.testing.assert_allclose([h.score for h in batched[b]],
                                       [h.score for h in serial[b]],
                                       rtol=0, atol=1e-6)


def test_device_beam_matches_host(rng):
    """The fully on-device AED beam (lax.scan + top_k) must produce the same
    n-best hypotheses as the host-driven search — incl. a positive length
    bonus (which exercises the cap-survivor finalization path)."""
    from hnet_mamba_asr_tpu.decoders.device_beam import aed_beam_search_device
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import CachedAEDStepper, _UttStepper

    V, DM, S, B = 12, 16, 9, 4
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=2, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=8)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 3, S - 1, S - 4])
    params = head.init(jax.random.PRNGKey(1), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 3), jnp.int32))["params"]
    for bonus in (0.0, 0.4):
        dev = aed_beam_search_device(head, params, mem, mlens, beam_size=3,
                                     nbest=3, length_bonus=bonus)
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=3)
        for b in range(B):
            host = joint_beam_search_nbest(
                None, mlens[b:b + 1], ctc_log_probs=None, vocab_size=V,
                beam_size=3, ctc_weight=0.0, nbest=3, max_decode_len=8,
                length_bonus=bonus,
                aed_next_logprobs=_UttStepper(stepper, b))[0]
            assert [h.tokens for h in dev[b]] == [h.tokens for h in host], \
                (bonus, b)
            np.testing.assert_allclose([h.score for h in dev[b]],
                                       [h.score for h in host], atol=1e-4)


def test_device_joint_beam_matches_host(rng):
    """The on-device JOINT beam (CTC prefix recursion as an inner scan) must
    match the host joint search — across ctc weights and a positive bonus."""
    from hnet_mamba_asr_tpu.decoders.device_beam import beam_search_device
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import CachedAEDStepper, _UttStepper

    V, DM, S, B = 12, 16, 9, 4
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=2, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=8)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 3, S - 1, S - 4])
    params = head.init(jax.random.PRNGKey(1), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 3), jnp.int32))["params"]
    raw = rng.normal(size=(B, S, V + 1))
    ctc_lp = raw - np.log(np.exp(raw).sum(-1, keepdims=True))

    for w, bonus in ((0.3, 0.0), (0.5, 0.0), (0.3, 0.4)):
        dev = beam_search_device(head, params, mem, mlens, beam_size=3,
                                 nbest=3, length_bonus=bonus,
                                 ctc_log_probs=ctc_lp, ctc_weight=w,
                                 blank_id=V)
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=3)
        for b in range(B):
            host = joint_beam_search_nbest(
                None, mlens[b:b + 1], ctc_log_probs=ctc_lp[b:b + 1, :mlens[b]],
                vocab_size=V, beam_size=3, ctc_weight=w, blank_id=V, nbest=3,
                max_decode_len=8, length_bonus=bonus,
                aed_next_logprobs=_UttStepper(stepper, b))[0]
            assert [h.tokens for h in dev[b]] == \
                   [h.tokens for h in host], (w, bonus, b)
            np.testing.assert_allclose([h.score for h in dev[b]],
                                       [h.score for h in host], atol=2e-4)


def test_device_beam_short_utterances(rng):
    """Tf=2 gives max_steps=1 — the cap-finalization fires on the very first
    scan iteration; device and host must still agree (both ctc weights)."""
    from hnet_mamba_asr_tpu.decoders.device_beam import beam_search_device
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import CachedAEDStepper, _UttStepper

    V, DM, S, B = 10, 16, 6, 3
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=1, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=6)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.asarray([2, 3, 6])
    params = head.init(jax.random.PRNGKey(0), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 2), jnp.int32))["params"]
    raw = rng.normal(size=(B, S, V + 1))
    ctc_lp = raw - np.log(np.exp(raw).sum(-1, keepdims=True))
    for w in (0.0, 0.3):
        dev = beam_search_device(head, params, mem, mlens, beam_size=2,
                                 nbest=2,
                                 ctc_log_probs=ctc_lp if w else None,
                                 ctc_weight=w, blank_id=V)
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=2)
        for b in range(B):
            host = joint_beam_search_nbest(
                None, mlens[b:b + 1],
                ctc_log_probs=ctc_lp[b:b + 1, :mlens[b]] if w else None,
                vocab_size=V, beam_size=2, ctc_weight=w, blank_id=V, nbest=2,
                max_decode_len=6,
                aed_next_logprobs=_UttStepper(stepper, b))[0]
            assert [h.tokens for h in dev[b]] == \
                   [h.tokens for h in host], (w, b)


def test_device_beam_fused_lm_rescore(rng):
    """beam_search_device(lm=...) scores the n-best pool INSIDE the search
    program; the attached .lm values must equal the host scorer's
    sequence_logprob (same fp32 math, different padding shapes), and the
    rescorers must re-rank identically WITHOUT a second LM call."""
    from hnet_mamba_asr_tpu.decoders.device_beam import beam_search_device
    from hnet_mamba_asr_tpu.decoders.joint import lm_rescore_batch
    from hnet_mamba_asr_tpu.models.aed import AEDHead

    V, DM, S, B = 12, 16, 9, 3
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=1, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=8)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 3, S - 1])
    params = head.init(jax.random.PRNGKey(1), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 3), jnp.int32))["params"]
    raw = rng.normal(size=(B, S, V + 1))
    ctc_lp = raw - np.log(np.exp(raw).sum(-1, keepdims=True))
    lm = TransformerLM(vocab_size=V, d_model=16, n_layers=1, n_heads=2,
                       d_ff=32, dropout=0.0)
    scorer = CausalLMScorer(
        lm, lm.init(jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32)))

    # joint config covers the use_ctc code path; the LM block is shared
    dev = beam_search_device(head, params, mem, mlens, beam_size=3, nbest=3,
                             ctc_log_probs=ctc_lp, ctc_weight=0.3,
                             blank_id=V, lm=scorer)
    flat = [h for nb in dev for h in nb]
    assert flat and all(h.lm is not None for h in flat)
    host_lm = scorer.sequence_logprob([h.tokens for h in flat])
    np.testing.assert_allclose([h.lm for h in flat], host_lm, atol=1e-4)

    calls = []
    orig = scorer.sequence_logprob
    scorer.sequence_logprob = lambda seqs: (calls.append(len(seqs)),
                                            orig(seqs))[1]
    fused = lm_rescore_batch(dev, scorer, 0.6, ctc_weight=0.3,
                             length_bonus=0.1)
    assert calls == []                        # fused scores: zero LM calls
    for nb in dev:                            # strip -> host-scored path
        for h in nb:
            h.lm = None
    unfused = lm_rescore_batch(dev, scorer, 0.6, ctc_weight=0.3,
                               length_bonus=0.1)
    assert calls == [len(flat)]
    assert fused == unfused


def test_lockstep_partial_batch_rows(rng):
    """n_utts < padded B: the stepper slices its returns to the real utts and
    the padded rows never leak into results."""
    from hnet_mamba_asr_tpu.decoders.joint import joint_beam_search_nbest_lockstep
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    from hnet_mamba_asr_tpu.tasks.decode_task import BatchedCachedAEDStepper

    V, DM, S = 10, 16, 7
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=1, n_heads=2, d_ff=32,
                   dropout=0.0, max_decode_len=6)
    mem = jnp.asarray(rng.normal(size=(4, S, DM)).astype(np.float32))
    mlens = np.asarray([S, S - 2, S, S])                 # rows 2-3 are padding
    params = head.init(jax.random.PRNGKey(2), mem, jnp.asarray(mlens),
                       jnp.zeros((4, 2), jnp.int32))["params"]
    out = joint_beam_search_nbest_lockstep(
        mlens[:2], batch_stepper=BatchedCachedAEDStepper(
            head, params, mem, mlens, beam_rows=3, n_utts=2),
        ctc_log_probs=None, vocab_size=V, beam_size=3, ctc_weight=0.0,
        nbest=2, max_decode_len=6)
    assert len(out) == 2
    assert all(len(nb) >= 1 for nb in out)


def test_lm_rescore_batch_matches_per_utt():
    """Batched rescoring (one LM call for the whole batch) must re-rank
    identically to per-utterance lm_rescore."""
    from hnet_mamba_asr_tpu.decoders.joint import lm_rescore_batch

    class CountingLM:
        def __init__(self):
            self.calls = 0

        def sequence_logprob(self, seqs):
            self.calls += 1
            return np.asarray([-0.5 * len(s) - 0.01 * sum(s) for s in seqs])

    nbests = [
        [Hypothesis(tokens=[1, 2], aed=-1.0, ctc=-2.0),
         Hypothesis(tokens=[3], aed=-1.5, ctc=-1.0)],
        [],
        [Hypothesis(tokens=[4, 5, 6], aed=-2.0, ctc=-1.5)],
    ]
    lm = CountingLM()
    got = lm_rescore_batch(nbests, lm, 0.7, ctc_weight=0.3, length_bonus=0.1)
    assert lm.calls == 1                              # one call for the batch
    want = [lm_rescore(nb, CountingLM(), 0.7, ctc_weight=0.3,
                       length_bonus=0.1) if nb else [] for nb in nbests]
    assert got == want
    assert lm_rescore_batch([[], []], CountingLM(), 1.0,
                            ctc_weight=0.3) == [[], []]


def test_lm_rescore_semantics():
    h1 = Hypothesis(tokens=[1, 2], aed=-1.0, ctc=-2.0, score=0.0)
    h2 = Hypothesis(tokens=[3], aed=-1.5, ctc=-1.0, score=0.0)

    class FixedLM:
        def __init__(self, scores):
            self.scores = scores

        def sequence_logprob(self, seqs):
            return np.asarray([self.scores[tuple(s)] for s in seqs])

    lm = FixedLM({(1, 2): -0.1, (3,): -10.0})
    # lm_weight=0 -> acoustic best (recompute: 0.7*aed + 0.3*ctc)
    best = lm_rescore([h1, h2], lm, 0.0, ctc_weight=0.3)
    a1 = 0.7 * -1.0 + 0.3 * -2.0
    a2 = 0.7 * -1.5 + 0.3 * -1.0
    assert best == ([1, 2] if a1 >= a2 else [3])
    # strong LM flips to the LM-favored hypothesis
    assert lm_rescore([h1, h2], lm, 10.0, ctc_weight=0.3) == [1, 2]
    assert lm_rescore([], lm, 1.0, ctc_weight=0.3) == []


# ── CausalLMScorer ────────────────────────────────────────────────────────────
@pytest.fixture(scope="module")
def lm_setup():
    lm = TransformerLM(vocab_size=10, d_model=16, n_layers=1, n_heads=2, d_ff=32,
                       dropout=0.0)
    params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return CausalLMScorer(lm, params)


def test_scorer_interfaces_consistent(lm_setup):
    """sequence_logprob == chained next_logprobs incl. terminal eos."""
    scorer = lm_setup
    seq = [4, 7, 5]
    total = 0.0
    for k in range(len(seq)):
        total += float(scorer.next_logprobs([seq[:k]])[0, seq[k]])
    total += float(scorer.next_logprobs([seq])[0, scorer.eos_id])
    batched = float(scorer.sequence_logprob([seq])[0])
    assert batched == pytest.approx(total, abs=1e-3)


def test_scorer_ragged_batch(lm_setup):
    scorer = lm_setup
    out = scorer.next_logprobs([[4, 5], [], [6, 7, 8, 9]])
    assert out.shape == (3, 10)
    # each row is a log-softmax
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-4)
    single = scorer.next_logprobs([[4, 5]])
    np.testing.assert_allclose(out[0], single[0], atol=1e-4)   # padding-invariant


def test_scorer_sequence_batch(lm_setup):
    scorer = lm_setup
    outs = scorer.sequence_logprob([[4, 5, 6], [7]])
    singles = [float(scorer.sequence_logprob([[4, 5, 6]])[0]),
               float(scorer.sequence_logprob([[7]])[0])]
    np.testing.assert_allclose(outs, singles, atol=1e-3)
