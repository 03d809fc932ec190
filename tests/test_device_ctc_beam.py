"""Device-side frame-synchronous CTC prefix beam vs the host engine, and the
pure-function cached LM stepper vs the full TransformerLM forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search
from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
    _lm_init_caches, _lm_step, ctc_beam_search_device,
)
from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
from hnet_mamba_asr_tpu.models.aed import sinusoidal_pe
from hnet_mamba_asr_tpu.models.lm import TransformerLM


def _log_softmax(x):
    return x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - x.max(-1, keepdims=True)


def _random_logp(rng, B, T, V1, scale=1.5):
    return _log_softmax(scale * rng.normal(size=(B, T, V1))).astype(np.float32)


@pytest.fixture(scope="module")
def lm_setup():
    lm = TransformerLM(vocab_size=10, d_model=16, n_layers=2, n_heads=2,
                       d_ff=32, dropout=0.0)
    params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return lm, params, CausalLMScorer(lm, params)


def test_lm_step_matches_full_forward(lm_setup):
    """Chained per-row cached steps (masked writes, per-row positions) must
    reproduce the scorer's full-forward next_logprobs at every prefix length."""
    lm, params, scorer = lm_setup
    rng = np.random.default_rng(3)
    rows, cap = 3, 8
    pe = jnp.asarray(sinusoidal_pe(cap, lm.d_model))
    caches = _lm_init_caches(lm, rows, cap)
    # feed bos on every row
    logp, caches = _lm_step(lm, pe, params, caches,
                            jnp.full((rows,), lm.bos_id, jnp.int32),
                            jnp.zeros((rows,), jnp.int32),
                            jnp.ones((rows,), bool))
    np.testing.assert_allclose(np.asarray(logp),
                               scorer.next_logprobs([[], [], []]), atol=2e-5)
    # rows advance at DIFFERENT rates: row 0 every step, row 1 every 2nd,
    # row 2 never — masked writes must keep the frozen rows' caches intact
    prefixes = [[], [], []]
    lens = np.zeros(3, np.int32)
    for step in range(5):
        grow = np.array([True, step % 2 == 0, False])
        toks = rng.integers(4, 10, size=3).astype(np.int32)
        pos = jnp.asarray(lens + 1)
        step_lp, caches = _lm_step(lm, pe, params, caches, jnp.asarray(toks),
                                   pos, jnp.asarray(grow))
        for r in range(3):
            if grow[r]:
                prefixes[r].append(int(toks[r]))
                lens[r] += 1
                np.testing.assert_allclose(
                    np.asarray(step_lp)[r],
                    scorer.next_logprobs([prefixes[r]])[0], atol=2e-5,
                    err_msg=f"step {step} row {r}")


def test_device_ctc_beam_matches_host(rng):
    """No-LM transcripts must match the host engine on fuzzed batches."""
    for seed in range(6):
        r = np.random.default_rng(seed)
        B, T, V1 = 5, 14, 7
        lp = _random_logp(r, B, T, V1)
        lens = np.array([T, T - 4, T - 1, 3, T - 7])
        for K, P in ((4, 5), (8, 6)):
            host = ctc_prefix_beam_search(lp, lens, blank_id=V1 - 1,
                                          beam_size=K, pre_beam=P)
            dev = ctc_beam_search_device(lp, lens, blank_id=V1 - 1,
                                         beam_size=K, pre_beam=P)
            assert dev == host, (seed, K, P)


def test_device_ctc_beam_peaked_matches_greedy_domain(rng):
    """Peaked distributions (near-deterministic frames): both engines must
    produce identical transcripts, incl. repeated-label / blank crossings."""
    r = np.random.default_rng(11)
    B, T, V1 = 4, 12, 6
    path = r.integers(0, V1, size=(B, T))
    lp = np.full((B, T, V1), -8.0, np.float32)
    for b in range(B):
        lp[b, np.arange(T), path[b]] = -0.01
    lp = _log_softmax(lp).astype(np.float32)
    lens = np.array([T, T - 2, T - 5, 4])
    host = ctc_prefix_beam_search(lp, lens, blank_id=V1 - 1, beam_size=4,
                                  pre_beam=4)
    dev = ctc_beam_search_device(lp, lens, blank_id=V1 - 1, beam_size=4,
                                 pre_beam=4)
    assert dev == host


def test_device_ctc_beam_lm_matches_host(lm_setup):
    """In-scan LM fusion must reproduce the host's batched-fusion transcripts
    (same lm_weight, same blank-at-V contract)."""
    lm, params, scorer = lm_setup
    for seed in (0, 1, 2):
        r = np.random.default_rng(100 + seed)
        B, T = 3, 10
        V1 = lm.vocab_size + 1                      # blank at V
        lp = _random_logp(r, B, T, V1)
        lens = np.array([T, T - 3, 5])
        for w in (0.3, 0.8):
            host = ctc_prefix_beam_search(lp, lens, blank_id=V1 - 1,
                                          beam_size=4, pre_beam=5,
                                          lm=scorer, lm_weight=w)
            dev = ctc_beam_search_device(lp, lens, blank_id=V1 - 1,
                                         beam_size=4, pre_beam=5,
                                         lm=scorer, lm_weight=w)
            assert dev == host, (seed, w)


def test_device_ctc_beam_lm_requires_blank_last(lm_setup):
    _, _, scorer = lm_setup
    lp = np.zeros((1, 4, 11), np.float32)
    with pytest.raises(ValueError, match="blank at the last class"):
        ctc_beam_search_device(lp, np.array([4]), blank_id=0, beam_size=2,
                               pre_beam=3, lm=scorer, lm_weight=0.5)


def test_device_ctc_beam_padded_rows():
    """n_utts < B: padded rows (length 0) are skipped, real rows unaffected."""
    r = np.random.default_rng(5)
    lp = _random_logp(r, 4, 9, 6)
    lens = np.array([9, 7, 0, 0])
    dev = ctc_beam_search_device(lp, lens, blank_id=5, beam_size=3,
                                 pre_beam=4, n_utts=2)
    host = ctc_prefix_beam_search(lp[:2], lens[:2], blank_id=5, beam_size=3,
                                  pre_beam=4)
    assert dev == host
