"""eval/metrics: Levenshtein S/D/I invariants, fuzz vs an independent oracle,
normalization policy, WER/CER/TER semantics."""
import numpy as np
import pytest

from hnet_mamba_asr_tpu.eval.metrics import (
    ErrorStats, char_error_rate, char_errors, edit_distance, levenshtein_counts,
    normalize_text, real_time_factor, token_error_rate, word_error_rate, word_errors,
)


def oracle_edit_distance(a, b):
    """Independent plain-python reference DP."""
    R, H = len(a), len(b)
    dp = [[0] * (H + 1) for _ in range(R + 1)]
    for i in range(R + 1):
        dp[i][0] = i
    for j in range(H + 1):
        dp[0][j] = j
    for i in range(1, R + 1):
        for j in range(1, H + 1):
            dp[i][j] = min(dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                           dp[i - 1][j] + 1, dp[i][j - 1] + 1)
    return dp[R][H]


def test_identical():
    assert levenshtein_counts("abc", "abc") == (0, 0, 0, 3)
    assert edit_distance("abc", "abc") == 0


def test_simple_ops():
    assert levenshtein_counts("abc", "axc") == (1, 0, 0, 2)       # one sub
    assert levenshtein_counts("abc", "ac") == (0, 1, 0, 2)        # one del
    assert levenshtein_counts("ac", "abc") == (0, 0, 1, 2)        # one ins
    assert levenshtein_counts("", "ab") == (0, 0, 2, 0)
    assert levenshtein_counts("ab", "") == (0, 2, 0, 0)


def test_fuzz_invariants(rng):
    for _ in range(300):
        R, H = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        ref = [int(x) for x in rng.integers(0, 5, R)]
        hyp = [int(x) for x in rng.integers(0, 5, H)]
        s, d, i, c = levenshtein_counts(ref, hyp)
        dist = oracle_edit_distance(ref, hyp)
        assert s + d + i == dist
        assert c + s + d == len(ref)
        assert c + s + i == len(hyp)
        assert edit_distance(ref, hyp) == dist


def test_normalize_text():
    assert normalize_text("Hello,   World!") == "hello world"
    assert normalize_text("don't stop") == "don't stop"
    assert normalize_text("A.B.C") == "a b c"
    assert normalize_text("MiXeD CaSe", lowercase=False) == "MiXeD CaSe"


def test_wer_cer():
    st = word_error_rate(["the cat sat"], ["the cat sat"])
    assert st.er == 0.0 and st.sentence_acc == 1.0
    st = word_error_rate(["the cat sat"], ["the bat sat"])
    assert st.sub == 1 and st.er == pytest.approx(1 / 3)
    st = char_error_rate(["ab cd"], ["abcd"])
    assert st.er == 0.0                                  # spaces stripped
    st = token_error_rate([[1, 2, 3]], [[1, 3]])
    assert st.dele == 1


def test_error_stats_dict():
    st = ErrorStats(n_ref=10, sub=1, dele=1, ins=1, cor=8, n_utt=2, n_correct=1)
    d = st.as_dict("wer")
    assert d["wer"] == pytest.approx(30.0)
    assert d["sent_acc"] == pytest.approx(50.0)


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        word_error_rate(["a"], ["a", "b"])


def test_inline_helpers():
    edits, n = word_errors("the cat", "the cat sat")
    assert (edits, n) == (1, 3)
    edits, n = char_errors("abc", "a bc")
    assert (edits, n) == (0, 3)


def test_rtf():
    assert real_time_factor(1.0, 2.0) == 0.5
    assert real_time_factor(1.0, 0.0) > 0              # guarded denominator


def test_wer_can_exceed_one():
    st = word_error_rate(["a"], ["b c d"])
    assert st.er > 1.0
