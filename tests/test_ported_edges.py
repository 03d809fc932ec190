"""Long-tail adversarial cases ported from the reference suite (test-gap
audit, PARITY.md appendix): scoring loader/gate/RTF/bootstrap edges, metrics
logger coercion/atomicity/histograms, HybridLoss fail-loud rules, AED
lsm-zero==CE + max_decode_len truncation + QK-norm boundedness, joint-beam
numeric guards, SpecAugment containment, fixed-pool gradient facts, CMVN
floors, provenance arithmetic, LM-text cache keys/budgets, tokenizer edges."""
import json
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.eval.score import (
    bootstrap_split, gate_check, load_decode_records, score_decode_dir,
    score_records,
)


# ═══ eval/score long tail (reference tests/test_score_wer.py) ═════════════════
def _write_records(path, recs):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in recs) + "\n")


def test_loader_malformed_json_and_types(tmp_path):
    p = tmp_path / "cell" / "dev.jsonl"
    p.parent.mkdir(parents=True)
    p.write_text('{"id": "a", "ref": "x", "hyp": "y"}\nnot json\n')
    with pytest.raises(ValueError, match="malformed JSON"):
        load_decode_records(p)
    p.write_text('[1, 2]\n')
    with pytest.raises(ValueError, match="must be an object"):
        load_decode_records(p)
    p.write_text('{"id": "a", "ref": 3, "hyp": "y"}\n')
    with pytest.raises(ValueError, match="must be a string"):
        load_decode_records(p)
    p.write_text('{"id": "a", "ref": "x"}\n')
    with pytest.raises(ValueError, match="missing 'hyp'"):
        load_decode_records(p)
    p.write_text("\n\n")
    with pytest.raises(ValueError, match="no decode records"):
        load_decode_records(p)


def test_empty_hyp_all_deletions():
    scored = score_records([{"id": "a", "ref": "x y z", "hyp": ""}])
    w = scored["wer"]
    assert (w.sub, w.dele, w.ins) == (0, 3, 0)
    assert w.er == 1.0


def test_rtf_suppressed_on_missing_audio():
    recs = [{"id": "a", "ref": "x", "hyp": "x", "decode_s": 0.1, "audio_s": 2.0},
            {"id": "b", "ref": "y", "hyp": "y", "decode_s": 0.1}]
    assert score_records(recs)["rtf"] is None            # one missing -> suppressed
    recs[1]["audio_s"] = 1.0
    assert score_records(recs)["rtf"] == pytest.approx(0.2 / 3.0, abs=1e-4)


def test_gate_uses_unrounded_wer():
    """11.996 rounds to 12.0 for display but must PASS the strict < 12.0 gate;
    12.004 must FAIL even though it also displays as 12.0."""
    for exact, expected in ((11.996, True), (12.004, False)):
        cells = {"test-clean": {"ctc_greedy": {"wer": 12.0, "wer_exact": exact}}}
        g = gate_check(cells, {"sane_test_clean_wer_below": 12.0},
                       gate_cell="ctc_greedy")
        assert g["evaluated"] and g["passed"] is expected, exact


def test_gate_missing_cell_and_split():
    cells = {"test-clean": {"aed_beam": {"wer": 5.0, "wer_exact": 5.0}}}
    g = gate_check(cells, {"sane_test_clean_wer_below": 12.0}, gate_cell="ctc_greedy")
    assert not g["evaluated"] and "not decoded" in g["reason"]
    g = gate_check({}, {"sane_test_clean_wer_below": 12.0})
    assert not g["evaluated"]


def test_bootstrap_id_mismatch_raises():
    a = [{"id": "u1", "n_ref": 2, "sub": 0, "del": 0, "ins": 0},
         {"id": "u2", "n_ref": 2, "sub": 1, "del": 0, "ins": 0}]
    b = [{"id": "u1", "n_ref": 2, "sub": 0, "del": 0, "ins": 0},
         {"id": "u3", "n_ref": 2, "sub": 1, "del": 0, "ins": 0}]
    with pytest.raises(ValueError, match="different utterance sets"):
        bootstrap_split({"a": a, "b": b}, n_resamples=10)


def test_bootstrap_ref_len_disagreement_and_zero_ref():
    a = [{"id": "u1", "n_ref": 2, "sub": 0, "del": 0, "ins": 0}]
    b = [{"id": "u1", "n_ref": 3, "sub": 0, "del": 0, "ins": 0}]
    with pytest.raises(ValueError, match="reference length"):
        bootstrap_split({"a": a, "b": b}, n_resamples=10)
    z = [{"id": "u1", "n_ref": 0, "sub": 0, "del": 0, "ins": 0}]
    with pytest.raises(ValueError, match="zero-reference-word"):
        bootstrap_split({"a": z, "b": z}, n_resamples=10)


def test_bootstrap_shuffled_order_invariant():
    """Cells listing the same utterances in different file order must give
    identical statistics (records are id-sorted before pairing)."""
    rng = np.random.default_rng(0)
    utts = [{"id": f"u{i}", "n_ref": 3, "sub": int(rng.integers(0, 2)),
             "del": 0, "ins": 0} for i in range(20)]
    fwd = bootstrap_split({"a": utts, "b": utts[::-1]}, n_resamples=200, seed=1)
    assert fwd["pairs"][0]["delta"] == 0.0
    assert fwd["cells"]["a"]["wer"] == fwd["cells"]["b"]["wer"]


def test_p_value_formula_pinned_independently():
    """Recompute the +1-corrected two-sided p from a fresh generator with the
    same seed/stream — pins the draw order and the exact formula."""
    rng = np.random.default_rng(7)
    utts_a = [{"id": f"u{i}", "n_ref": 4, "sub": int(rng.integers(0, 3)),
               "del": 0, "ins": 0} for i in range(15)]
    utts_b = [dict(u, sub=max(0, u["sub"] - 1)) for u in utts_a]
    n_res = 300
    out = bootstrap_split({"a": utts_a, "b": utts_b}, n_resamples=n_res, seed=5)

    ordered_a = sorted(utts_a, key=lambda u: u["id"])
    ordered_b = sorted(utts_b, key=lambda u: u["id"])
    errs = np.array([[u["sub"] for u in ordered_a],
                     [u["sub"] for u in ordered_b]], dtype=np.int64)
    ref = np.array([u["n_ref"] for u in ordered_a], dtype=np.int64)
    g = np.random.default_rng(5)
    idx = g.integers(0, len(ref), size=(n_res, len(ref)))
    wer = 100.0 * np.stack([errs[0][idx].sum(1), errs[1][idx].sum(1)]) \
        / np.maximum(ref[idx].sum(1), 1)
    deltas = wer[0] - wer[1]
    p_le = (np.count_nonzero(deltas <= 0) + 1) / (n_res + 1)
    p_ge = (np.count_nonzero(deltas >= 0) + 1) / (n_res + 1)
    expected = round(min(1.0, 2 * min(p_le, p_ge)), 5)
    assert out["pairs"][0]["p_value"] == expected


def test_rerun_prunes_stale_score_cells(tmp_path):
    """A re-score after a cell is removed must not leave its stale per-utt
    counts under score/."""
    recs = [{"id": "u1", "ref": "a b", "hyp": "a b", "decode_s": 0.1, "audio_s": 1.0}]
    _write_records(tmp_path / "cellA" / "dev.jsonl", recs)
    _write_records(tmp_path / "cellB" / "dev.jsonl", recs)
    score_decode_dir(tmp_path, n_bootstrap=0)
    assert (tmp_path / "score" / "cellB" / "dev.jsonl").exists()
    import shutil
    shutil.rmtree(tmp_path / "cellB")
    out = score_decode_dir(tmp_path, n_bootstrap=0)
    assert not (tmp_path / "score" / "cellB").exists()
    assert set(out["splits"]["dev"]["cells"]) == {"cellA"}


# ═══ metrics logger (reference tests/test_metrics_logger.py) ══════════════════
def test_metrics_values_coerced_and_nonfinite_roundtrip(tmp_path):
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(tmp_path, tensorboard=False)
    m.log_scalars({"a": np.float32(1.5), "b": jnp.asarray(2.0),
                   "c": float("inf"), "d": float("nan")}, step=3)
    m.close()
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["a"] == 1.5 and rec["b"] == 2.0
    assert rec["c"] == math.inf and math.isnan(rec["d"])
    assert all(isinstance(rec[k], float) for k in "ab")


def test_histogram_stats_and_empty_noop(tmp_path):
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(tmp_path, tensorboard=False)
    m.log_histogram("h", np.array([1.0, 2.0, 3.0]), step=1)
    m.log_histogram("empty", np.array([]), step=1)          # no-op, no crash
    m.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 1
    rec = lines[0]
    assert rec["h/mean"] == 2.0 and rec["h/n"] == 3 and rec["h/max"] == 3.0


def test_fresh_run_clears_stale_tb_and_jsonl(tmp_path):
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger

    (tmp_path / "events.out.tfevents.123").write_text("stale")
    (tmp_path / "metrics.jsonl").write_text('{"step": 0, "old": 1}\n')
    m = MetricsLogger(tmp_path, resume=False, tensorboard=False)
    m.log_scalar("x", 1.0, 0)
    m.close()
    assert not (tmp_path / "events.out.tfevents.123").exists()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 1 and "old" not in lines[0]


def test_update_summary_atomic_and_valid(tmp_path):
    from hnet_mamba_asr_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(tmp_path, tensorboard=False)
    m.update_summary(best=1.25, name="run")
    m.append_summary("provenance", {"attempt": 1})
    m.append_summary("provenance", {"attempt": 2})
    m.close()
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["best"] == 1.25
    assert [p["attempt"] for p in summary["provenance"]] == [1, 2]
    assert not (tmp_path / "summary.json.tmp").exists()


# ═══ HybridLoss fail-loud rules (reference tests/test_loss.py) ════════════════
def test_loss_weighted_sum_and_drop_zero():
    from hnet_mamba_asr_tpu.training.loss import HybridLossWeights, combine_losses

    w = HybridLossWeights(ctc_weight=0.3, aed_weight=0.7, ratio_weight=0.0)
    out = combine_losses(w, ctc_loss=jnp.asarray(2.0), aed_loss=jnp.asarray(4.0))
    assert float(out["loss/total"]) == pytest.approx(0.3 * 2 + 0.7 * 4)
    # ctc-only equals the raw ctc value
    w1 = HybridLossWeights(ctc_weight=1.0, aed_weight=0.0, ratio_weight=0.0)
    out = combine_losses(w1, ctc_loss=jnp.asarray(2.5))
    assert float(out["loss/total"]) == pytest.approx(2.5)


def test_loss_missing_component_with_positive_weight_raises():
    from hnet_mamba_asr_tpu.training.loss import HybridLossWeights, combine_losses

    w = HybridLossWeights(ctc_weight=0.5, aed_weight=0.5, ratio_weight=0.0)
    with pytest.raises(ValueError, match="aed_weight"):
        combine_losses(w, ctc_loss=jnp.asarray(1.0))
    with pytest.raises(ValueError, match="no loss components"):
        combine_losses(w)


# ═══ AED edges (reference tests/test_aed.py) ══════════════════════════════════
def _aed(V=10, DM=16):
    from hnet_mamba_asr_tpu.models.aed import AEDHead
    return AEDHead(vocab_size=V, d_model=DM, n_layers=1, n_heads=2, d_ff=32,
                   dropout=0.0, lsm_weight=0.0, max_decode_len=6)


def test_aed_lsm_zero_equals_cross_entropy(rng):
    """lsm_weight=0 must be plain token-mean cross entropy (hand-computed)."""
    head = _aed()
    mem = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    mlens = jnp.asarray([5, 4])
    ys = jnp.asarray([[4, 5, 6], [7, 8, 0]], jnp.int32)
    ylens = jnp.asarray([3, 2])
    params = head.init(jax.random.PRNGKey(0), mem, mlens, ys)
    loss = head.apply(params, mem, mlens, ys, ylens, method="loss")

    ys_in, ys_out, out_lens = head.apply(params, ys, ylens, method="add_sos_eos")
    logits = head.apply(params, mem, mlens, ys_in)
    logp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)
    total = n = 0.0
    for b in range(2):
        for t in range(int(out_lens[b])):
            total -= logp[b, t, int(ys_out[b, t])]
            n += 1
    assert float(loss) == pytest.approx(total / n, rel=1e-5)


def test_aed_greedy_truncates_at_max_decode_len(rng):
    """A head that never emits eos must stop at max_decode_len (truncation) —
    every emitted row is exactly cap long with no eos."""
    from hnet_mamba_asr_tpu.models.aed import strip_hypothesis
    head = _aed()
    mem = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    mlens = jnp.asarray([5, 5])
    params = head.init(jax.random.PRNGKey(0), mem, mlens,
                       jnp.zeros((2, 3), jnp.int32))

    # make eos unreachable: huge negative bias on its output column
    p = jax.tree_util.tree_map(lambda x: x, params)
    bias = np.asarray(p["params"]["out"]["bias"]).copy()
    bias[head.eos_id] = -1e9
    p["params"]["out"]["bias"] = jnp.asarray(bias)
    ids = np.asarray(head.apply(p, mem, mlens, method="greedy_decode"))
    assert ids.shape[1] == head.max_decode_len
    for row in ids:
        hyp = strip_hypothesis(row, head.eos_id)
        assert len(hyp) == head.max_decode_len          # truncated, no eos
        assert head.bos_id not in hyp and head.pad_id not in hyp


def test_qknorm_bounds_attention_logits(rng):
    """RMS-normalized q, k bound the pre-softmax logits regardless of input
    scale — the reference's divergence fix."""
    from hnet_mamba_asr_tpu.models.aed import MHAQKNorm
    mha = MHAQKNorm(d_model=16, n_heads=2)
    x1 = jnp.asarray(rng.normal(size=(1, 6, 16)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x1, x1, x1)
    for scale in (1.0, 1e3, 1e6):
        x = x1 * scale
        q = mha.apply(params, x, method="project_q")
        k, _ = mha.apply(params, x, x, method="project_kv")
        logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k))
        dh = 16 // 2
        # |q_i| <= |g| per RMS normalization => |logit| <= dh * max|g|^2
        assert np.abs(logits / math.sqrt(dh)).max() < dh, scale


# ═══ joint beam numeric guards (reference tests/test_joint.py) ════════════════
def _uniform_stepper(V):
    def fn(b, token_lists):
        return np.full((len(token_lists), V), -np.log(V), np.float64)
    return fn


def test_joint_ctc_weight_one_full_prebeam_finite(rng):
    """ctc_weight=1.0 with pre_beam=V historically produced 0*(-inf)=NaN
    scores; outputs must be finite, non-special, and non-crashing."""
    from hnet_mamba_asr_tpu.decoders.joint import joint_beam_search
    V, T = 8, 6
    raw = rng.normal(size=(1, T, V + 1))
    ctc_lp = raw - np.log(np.exp(raw).sum(-1, keepdims=True))
    hyp = joint_beam_search(
        None, np.array([T]), ctc_log_probs=ctc_lp, vocab_size=V,
        beam_size=3, ctc_weight=1.0, pre_beam=V, blank_id=V,
        max_decode_len=5, aed_next_logprobs=_uniform_stepper(V))[0]
    assert all(tok not in (1, 2, 3) for tok in hyp)     # no special leak


def test_joint_positive_length_bonus_no_premature_stop(rng):
    """With a dominant per-token bonus the best hypothesis must reach the
    step cap — the sound early stop only applies at length_bonus <= 0."""
    from hnet_mamba_asr_tpu.decoders.joint import joint_beam_search_nbest
    V, T = 6, 8
    nbest = joint_beam_search_nbest(
        None, np.array([T]), ctc_log_probs=None, vocab_size=V,
        beam_size=3, ctc_weight=0.0, nbest=1, max_decode_len=5,
        length_bonus=10.0, aed_next_logprobs=_uniform_stepper(V))[0]
    assert len(nbest[0].tokens) == 5                    # searched to the cap


# ═══ SpecAugment containment (reference tests/test_features.py) ═══════════════
def test_specaug_time_masks_stay_inside_lengths(rng):
    from hnet_mamba_asr_tpu.ops.specaug import augment_key, spec_augment
    B, T, F = 3, 40, 8
    feats = jnp.ones((B, T, F))
    lengths = jnp.asarray([40, 25, 10])
    keys = jnp.stack([augment_key(0, 0, i) for i in range(B)])
    out = np.asarray(spec_augment(feats, lengths, keys, freq_masks=0,
                                  freq_width=0, time_masks=2, time_width=8))
    for b, L in enumerate([40, 25, 10]):
        assert (out[b, L:] == 1.0).all(), f"row {b}: mask leaked past length"
        assert (out[b, :L] == 0.0).any() or (out[b, :L] == 1.0).all()


def test_specaug_grads_flow(rng):
    from hnet_mamba_asr_tpu.ops.specaug import augment_key, spec_augment
    feats = jnp.asarray(rng.normal(size=(1, 20, 4)).astype(np.float32))
    keys = jnp.stack([augment_key(0, 0, 0)])

    def f(x):
        return spec_augment(x, jnp.asarray([20]), keys, freq_masks=1,
                            freq_width=2, time_masks=1, time_width=4).sum()

    g = np.asarray(jax.grad(f)(feats))
    assert np.isfinite(g).all()
    assert set(np.unique(g)) <= {0.0, 1.0}              # identity off-mask


# ═══ fixed pool gradient facts (reference tests/test_fixed_pool.py) ═══════════
def test_meanpool_grad_distributes_uniformly(rng):
    """d(sum z)/dx = 1/count for every frame of a full window; a single-frame
    tail window gets gradient 1."""
    from hnet_mamba_asr_tpu.models.fixed_pool import FixedPoolChunker
    ch = FixedPoolChunker(d_model=2, N=3)
    x = jnp.asarray(rng.normal(size=(1, 7, 2)).astype(np.float32))
    mask = jnp.ones((1, 7), bool)
    params = ch.init(jax.random.PRNGKey(0), x, mask)

    def f(xx):
        co = ch.apply(params, xx, mask, method="chunk")
        return jnp.where(co.z_mask[..., None], co.z, 0.0).sum()

    g = np.asarray(jax.grad(f)(x))[0]
    np.testing.assert_allclose(g[:6], 1.0 / 3.0, atol=1e-6)   # two full windows
    np.testing.assert_allclose(g[6], 1.0, atol=1e-6)          # 1-frame tail


def test_fixed_pool_kept_fraction_near_inverse_stride(rng):
    from hnet_mamba_asr_tpu.models.fixed_pool import FixedPoolChunker
    ch = FixedPoolChunker(d_model=2, N=4)
    x = jnp.asarray(rng.normal(size=(1, 32, 2)).astype(np.float32))
    mask = jnp.ones((1, 32), bool)
    params = ch.init(jax.random.PRNGKey(0), x, mask)
    co = ch.apply(params, x, mask, method="chunk")
    assert float(co.kept_fraction) == pytest.approx(0.25, abs=0.05)


# ═══ CMVN floors (reference tests/test_features.py) ═══════════════════════════
def test_cmvn_constant_features_no_nan():
    from hnet_mamba_asr_tpu.data.features import CMVNAccumulator, GlobalCMVN
    acc = CMVNAccumulator(n_mels=4)
    acc.update(np.full((1, 10, 4), 3.0))
    stats = acc.finalize()
    assert (stats["std"] > 0).all()
    cm = GlobalCMVN(stats["mean"], stats["std"])
    out = cm(np.full((10, 4), 3.0, np.float32))
    assert np.isfinite(out).all()


def test_cmvn_empty_accumulator_raises():
    from hnet_mamba_asr_tpu.data.features import CMVNAccumulator
    with pytest.raises(RuntimeError):
        CMVNAccumulator(4).finalize()


# ═══ provenance arithmetic (reference tests/test_provenance.py) ═══════════════
def test_batch_info_effective_global_batch():
    from hnet_mamba_asr_tpu.utils.provenance import batch_info
    info = batch_info({"batch_bins": 32000, "accum_grad": 2}, n_devices=4)
    assert info["effective_global_frames"] == 32000 * 2 * 4


def test_fingerprint_file_matches_hashlib(tmp_path):
    import hashlib
    from hnet_mamba_asr_tpu.utils.provenance import fingerprint_file
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello" * 1000)
    fp = fingerprint_file(p)
    assert fp["sha256"] == hashlib.sha256(b"hello" * 1000).hexdigest()
    assert fp["bytes"] == 5000
    missing = fingerprint_file(tmp_path / "nope")
    assert "error" in missing or missing == {} or missing.get("sha256") is None


# ═══ LM-text cache keys + budgets (reference tests/test_lm_task.py) ═══════════
def test_token_length_cache_keyed_by_tokenizer(tmp_path):
    """Two different tokenizers over the same corpus must not share cached
    token counts."""
    from hnet_mamba_asr_tpu.data.lm_text import load_token_lengths
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    corpus = tmp_path / "c.txt"
    corpus.write_text("aa bb\ncc dd ee\n")
    t1 = Tokenizer.train(["aa bb", "cc dd ee"], tmp_path / "t1",
                         vocab_size=16, hard_vocab_limit=False)
    t2 = Tokenizer.train(["aa bb cc dd ee ff gg hh"], tmp_path / "t2",
                         vocab_size=24, hard_vocab_limit=False)
    from hnet_mamba_asr_tpu.data.lm_text import load_line_index
    offsets = load_line_index(corpus)
    l1 = load_token_lengths(corpus, t1, offsets)
    l2 = load_token_lengths(corpus, t2, offsets)
    exp1 = [len(t1.encode("aa bb")), len(t1.encode("cc dd ee"))]
    exp2 = [len(t2.encode("aa bb")), len(t2.encode("cc dd ee"))]
    assert list(l1) == exp1 and list(l2) == exp2


def test_corrupt_index_cache_recovers(tmp_path):
    from hnet_mamba_asr_tpu.data.lm_text import load_line_index
    corpus = tmp_path / "c.txt"
    corpus.write_text("one\ntwo\nthree\n")
    idx = load_line_index(corpus)
    caches = list(tmp_path.glob("*.idx*")) + list(tmp_path.glob("*.npy")) \
        + list(tmp_path.glob("*.cache*"))
    for c in caches:
        c.write_bytes(b"garbage")
    idx2 = load_line_index(corpus)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


# ═══ tokenizer edges (reference tests/test_tokenizer.py) ══════════════════════
def test_tokenizer_empty_string(tmp_path):
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    tok = Tokenizer.train(["aa bb cc"], tmp_path / "t", vocab_size=16,
                          hard_vocab_limit=False)
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_tokenizer_real_pieces_above_specials(tmp_path):
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    tok = Tokenizer.train(["aa bb cc"], tmp_path / "t", vocab_size=16,
                          hard_vocab_limit=False)
    for tid in tok.encode("aa bb"):
        assert tid >= 4                                  # specials are 0..3
