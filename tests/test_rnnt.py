"""RNN-T: loss vs brute-force lattice DP (values + grads), padding
invariance, hand-computed degenerate cases, stateless-predictor head,
greedy decode, and full-model integration (beyond the reference, which
ships CTC/AED/joint only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnet_mamba_asr_tpu.ops.rnnt_loss import rnnt_loss


def _np_oracle(logits, T_b, y, U_b, blank):
    """Graves lattice DP in fp64 numpy: -log P(y[:U_b] | x[:T_b])."""
    lp = np.asarray(logits, np.float64)
    lp = lp - lp.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    alpha = np.full((T_b, U_b + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(1, T_b):
        alpha[t, 0] = alpha[t - 1, 0] + lp[t - 1, 0, blank]
    for u in range(1, U_b + 1):
        alpha[0, u] = alpha[0, u - 1] + lp[0, u - 1, y[u - 1]]
    for t in range(1, T_b):
        for u in range(1, U_b + 1):
            alpha[t, u] = np.logaddexp(
                alpha[t - 1, u] + lp[t - 1, u, blank],
                alpha[t, u - 1] + lp[t, u - 1, y[u - 1]])
    return -(alpha[T_b - 1, U_b] + lp[T_b - 1, U_b, blank])


def _naive_jax(logits, feat_lengths, targets, target_lengths, blank):
    """Direct differentiable recursion (python loop over u, scan over t) —
    the independent reference for gradients."""
    B, T, U1, V = logits.shape
    U = U1 - 1
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    blankp = lp[..., blank]
    lab = jnp.take_along_axis(lp[:, :, :U, :],
                              jnp.clip(targets, 0, V - 1)[:, None, :, None],
                              axis=-1)[..., 0]
    NEG = -1.0e30

    def step(alpha, inp):
        b_t, l_t, t_real = inp
        new = [alpha[:, 0]]
        for u in range(1, U1):
            new.append(jnp.logaddexp(alpha[:, u], new[u - 1] + l_t[:, u - 1]))
        beta = jnp.stack(new, axis=1)
        nxt = jnp.where(t_real[:, None], beta + b_t, alpha)
        return nxt, beta

    alpha0 = jnp.full((B, U1), NEG).at[:, 0].set(0.0)
    # mask invalid label transitions softly (same contract as the real op)
    u_ids = jnp.arange(U)
    lab = jnp.where((u_ids[None, :] < target_lengths[:, None])[:, None, :],
                    lab, -3.0e4)
    t_real = jnp.arange(T)[None, :] < feat_lengths[:, None]
    _, betas = jax.lax.scan(step, alpha0,
                            (blankp.transpose(1, 0, 2),
                             lab.transpose(1, 0, 2), t_real.transpose(1, 0)))
    last = jnp.maximum(feat_lengths - 1, 0)
    bl = jnp.take_along_axis(betas.transpose(1, 0, 2),
                             last[:, None, None], 1)[:, 0]
    bb = jnp.take_along_axis(blankp, last[:, None, None], 1)[:, 0]
    tot = jnp.take_along_axis(bl + bb, jnp.clip(target_lengths, 0, U)[:, None],
                              1)[:, 0]
    return -tot


@pytest.fixture
def case(rng):
    B, T, U, V = 3, 7, 4, 6
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    feat_lens = np.array([T, 5, 3], np.int32)
    targets = rng.integers(0, V - 1, size=(B, U)).astype(np.int32)
    tgt_lens = np.array([U, 2, 3], np.int32)
    return logits, feat_lens, targets, tgt_lens, V - 1


def test_rnnt_loss_matches_numpy_oracle(case):
    logits, fl, y, ul, blank = case
    got = rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="none")
    for b in range(logits.shape[0]):
        want = _np_oracle(logits[b], int(fl[b]), y[b], int(ul[b]), blank)
        assert float(got[b]) == pytest.approx(want, rel=1e-5), b


def test_rnnt_loss_grads_match_naive_recursion(case):
    logits, fl, y, ul, blank = case

    g_fast = jax.grad(lambda l: rnnt_loss(l, fl, y, ul, blank_id=blank,
                                          reduction="sum"))(logits)
    g_ref = jax.grad(lambda l: _naive_jax(l, fl, y, ul, blank).sum())(logits)
    assert np.isfinite(np.asarray(g_fast)).all()
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_rnnt_loss_padding_invariance(case):
    """Extra padded frames, label slots, or batch rows never change a real
    row's loss."""
    logits, fl, y, ul, blank = case
    base = rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="none")
    B, T, U1, V = logits.shape
    rng = np.random.default_rng(9)
    big = rng.normal(size=(B, T + 3, U1 + 2, V)).astype(np.float32)
    big[:, :T, :U1] = logits
    ybig = np.concatenate([y, rng.integers(0, V - 1, size=(B, 2))],
                          axis=1).astype(np.int32)
    got = rnnt_loss(big, fl, ybig, ul, blank_id=blank, reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_rnnt_loss_hand_cases(rng):
    V, blank = 4, 3
    # T=1, U=1: logP = label(0,0,y0) + blank(0,1)
    logits = rng.normal(size=(1, 1, 2, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    y = np.array([[2]], np.int32)
    want = -(lp[0, 0, 0, 2] + lp[0, 0, 1, blank])
    got = rnnt_loss(logits, np.array([1]), y, np.array([1]),
                    blank_id=blank, reduction="none")
    assert float(got[0]) == pytest.approx(float(want), rel=1e-6)
    # U=0: logP = sum over frames of blank at u=0
    T = 5
    logits = rng.normal(size=(1, T, 1, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    got = rnnt_loss(logits, np.array([T]), np.zeros((1, 0), np.int32),
                    np.array([0]), blank_id=blank, reduction="none")
    assert float(got[0]) == pytest.approx(-float(lp[0, :, 0, blank].sum()),
                                          rel=1e-6)


def test_rnnt_loss_reductions(case):
    logits, fl, y, ul, blank = case
    rows = rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="none")
    s = rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="sum")
    m = rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="mean")
    assert float(s) == pytest.approx(float(rows.sum()), rel=1e-6)
    assert float(m) == pytest.approx(float(rows.mean()), rel=1e-6)
    with pytest.raises(ValueError):
        rnnt_loss(logits, fl, y, ul, blank_id=blank, reduction="nope")


# ── head ─────────────────────────────────────────────────────────────────────

def _head(V=8, D=12):
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead
    return RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=32)


def test_rnnt_head_loss_and_greedy(rng):
    head = _head()
    B, T, D = 2, 9, 12
    mem = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.asarray([T, 6], jnp.int32)
    y = jnp.asarray(rng.integers(0, 8, size=(B, 5)), jnp.int32)
    ul = jnp.asarray([5, 3], jnp.int32)
    params = head.init(jax.random.PRNGKey(0), mem, lens, y, ul,
                       method="loss")["params"]
    rows = head.apply({"params": params}, mem, lens, y, ul, method="loss")
    assert rows.shape == (B,) and np.isfinite(np.asarray(rows)).all()
    toks, tl = head.apply({"params": params}, mem, lens,
                          method="greedy_decode")
    assert toks.shape[0] == B
    assert (np.asarray(tl) <= T * head.max_symbols).all()
    # emitted ids are real labels, never blank
    for b in range(B):
        ids = np.asarray(toks)[b, :int(tl[b])]
        assert (ids < head.vocab_size).all() and (ids >= 0).all()
    # deterministic
    toks2, tl2 = head.apply({"params": params}, mem, lens,
                            method="greedy_decode")
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_rnnt_head_history_contract(rng):
    """Position u's predictor context is (y_{u-1}, y_{u-2}) with bos fill."""
    head = _head()
    y = jnp.asarray([[4, 5, 6]], jnp.int32)
    mem = jnp.zeros((1, 4, 12), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), mem, jnp.asarray([4]), y,
                       jnp.asarray([3]), method="loss")["params"]

    got = head.apply({"params": params}, y, jnp.asarray([3]),
                     method="_histories")
    want = np.array([[[1, 1], [4, 1], [5, 4], [6, 5]]])   # bos=1
    np.testing.assert_array_equal(np.asarray(got), want)


# ── model integration ────────────────────────────────────────────────────────

def _rnnt_cfg():
    return {"encoder": "dcasr", "head": "ctc",
            "frontend_conf": {"n_mels": 20, "win_length": 400,
                              "hop_length": 160},
            "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                             "n_main": 1, "n_dec": 1, "arch_type": "A",
                             "d_state": 8, "headdim": 8,
                             "ssd_chunk_size": 16,
                             "hnet": {"compression_N": 1}},
            "rnnt_conf": {"d_pred": 8, "d_joint": 16, "context": 2,
                          "max_symbols": 3},
            "model_conf": {"ctc_weight": 0.0, "aed_weight": 0.0,
                           "rnnt_weight": 1.0}}


def test_rnnt_model_loss_decode_and_train_step(rng, tmp_path):
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.training.trainer import Trainer

    model = build_model(_rnnt_cfg(), 16)
    assert model.rnnt is not None and model.ctc is None and model.aed is None
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "row_mask": np.ones(B, bool),
             "aug_ref": np.array([0, 0], np.int32),
             "item_index": np.arange(B, dtype=np.int32)}
    loss, stats = model.loss_fn(params, batch, 0, True)
    assert np.isfinite(float(loss)) and float(stats["loss/rnnt"]) > 0
    hyps = model.greedy_decode(params, batch)
    assert len(hyps) == B

    class _Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([dict(batch)])

        def __len__(self):
            return 1

    cfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
           "log_interval": 1, "valid_interval_epoch": 1,
           "keep_nbest_models": 0, "optim": "adamw",
           "optim_conf": {"lr": 1e-3}, "scheduler": "warmuplr",
           "scheduler_conf": {"warmup_steps": 10}}
    tr = Trainer(model, _Loader(), cfg, ckpt_dir=str(tmp_path))
    tr._train_epoch()
    assert tr.global_step == 1


def test_rnnt_overfits_one_batch(rng):
    """The loss drives learning: a tiny transducer memorizes one utterance
    (greedy decode reproduces the target exactly)."""
    import optax

    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    model = build_model(_rnnt_cfg(), 16)
    params = model.init_params(jax.random.PRNGKey(0))
    frames = 64
    n = (frames - 1) * 160 + 400
    target = [5, 9, 12, 7]
    batch = {"wave": np.asarray(rng.normal(size=(1, n)), np.float32) * 0.1,
             "wave_lens": np.array([n], np.int32),
             "tokens": np.asarray([target], np.int32),
             "token_lens": np.array([len(target)], np.int32),
             "row_mask": np.ones(1, bool),
             "aug_ref": np.array([0, 0], np.int32),
             "item_index": np.arange(1, dtype=np.int32)}
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (l, _), g = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch, 0, False), has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l

    hyp = None
    for chunk in range(8):                       # up to 1200 steps
        for _ in range(150):
            params, opt, l = step(params, opt)
        assert np.isfinite(float(l))
        hyp = model.greedy_decode(params, batch)[0]
        if hyp == target:
            break
    # measured: greedy locks in around step ~600 (loss ~0.01)
    assert hyp == target, (hyp, float(l))


def test_rnnt_decode_cell(rng):
    """decode_task: read_outs [rnnt] expands to the rnnt_greedy cell and
    decodes; check_heads rejects models without the head."""
    from types import SimpleNamespace

    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import (
        check_heads, decode_batch, expand_cells,
    )

    cells = expand_cells({"read_outs": ["rnnt"], "search": ["greedy", "beam"]})
    assert [c["name"] for c in cells] == ["rnnt_greedy", "rnnt_beam"]
    cells = cells[:1]
    model = build_model(_rnnt_cfg(), 16)
    check_heads(model, cells)
    ctc_only = build_model(dict(_rnnt_cfg(),
                                model_conf={"ctc_weight": 1.0}), 16)
    with pytest.raises(ValueError, match="no RNNT head"):
        check_heads(ctc_only, cells)

    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "ids": ["u0", "u1"], "row_mask": np.ones(B, bool)}
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=16,
                          decode=lambda ids: " ".join(map(str, ids)))
    recs = decode_batch(model, params, tok, batch, cells[0], {})
    assert len(recs) == B and all(isinstance(r["hyp"], str) for r in recs)


# ── serving ──────────────────────────────────────────────────────────────────

def test_rnnt_offline_serving_export(rng, tmp_path):
    """emit=("rnnt_ids",): AOT artifact transducer greedy == live greedy."""
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_art"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("rnnt_ids",))
    sm = load_serving_artifact(art)
    wave = (rng.normal(size=(2, 4000)) * 0.1).astype(np.float32)
    lens = np.array([4000, 3100], np.int32)
    ids = sm.transcribe_ids(wave, lens)
    live = model.greedy_decode(params, {"wave": wave, "wave_lens": lens})
    assert ids == live
    with pytest.raises(ValueError, match="require an RNNT head"):
        ctc_only = build_model(dict(_rnnt_cfg(),
                                    model_conf={"ctc_weight": 1.0}), 16)
        save_serving_artifact(tmp_path / "x", ctc_only,
                              ctc_only.init_params(jax.random.PRNGKey(0)),
                              [(1, 4000)], emit=("rnnt_ids",))


def test_rnnt_streaming_export_matches_offline(rng, tmp_path):
    """Streaming transducer artifact: blockwise feed/finish over the exact
    causal encoder + carried label history == the offline rnnt greedy."""
    from hnet_mamba_asr_tpu.serving import (
        load_streaming_artifact, save_streaming_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_stream"
    save_streaming_artifact(art, model, params, block_enc=8)
    sm = load_streaming_artifact(art)
    assert sm._rnnt
    wave = (rng.normal(size=10000) * 0.1).astype(np.float32)
    toks = []
    for lo in range(0, len(wave), 1300):         # ragged pushes
        toks += sm.feed(wave[lo:lo + 1300])
    toks += sm.finish()
    live = model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})[0]
    assert toks == live


# ── beam search ──────────────────────────────────────────────────────────────

def test_rnnt_beam_finds_map_sequence(rng):
    """With generous width/emission caps the beam's best hypothesis is the
    exact MAP label sequence — brute-force: score EVERY sequence up to
    length 3 with the transducer NLL (the same oracle pattern as the CTC
    prefix beam)."""
    from itertools import product

    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D, T = 3, 8, 4
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=16)
    for seed in range(3):
        r = np.random.default_rng(40 + seed)
        mem = jnp.asarray(r.normal(size=(1, T, D)) * 2.0, jnp.float32)
        lens = jnp.asarray([T], jnp.int32)
        params = head.init(jax.random.PRNGKey(seed), mem, lens,
                           jnp.zeros((1, 3), jnp.int32), jnp.asarray([3]),
                           method="loss")["params"]
        best_seq, best_nll = None, np.inf
        for L in range(0, 4):
            for y in product(range(V), repeat=L):
                tgt = np.zeros((1, 3), np.int32)
                tgt[0, :L] = y
                nll = float(head.apply({"params": params}, mem, lens,
                                       jnp.asarray(tgt), jnp.asarray([L]),
                                       method="loss")[0])
                if nll < best_nll:
                    best_nll, best_seq = nll, list(y)
        got = rnnt_beam_search(head, params, mem, lens, beam_size=27,
                               max_symbols=3)[0]
        assert got == best_seq, (seed, got, best_seq, best_nll)


def test_rnnt_beam_cell_and_vs_greedy(rng):
    """rnnt_beam decode cell runs; the beam's sequence never scores worse
    than greedy's under the model."""
    from types import SimpleNamespace

    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch, expand_cells

    cells = expand_cells({"read_outs": ["rnnt"], "search": ["beam"]})
    assert [c["name"] for c in cells] == ["rnnt_beam"]
    model = build_model(_rnnt_cfg(), 16)
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "ids": ["u0", "u1"], "row_mask": np.ones(B, bool)}
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=16,
                          decode=lambda ids: " ".join(map(str, ids)))
    recs = decode_batch(model, params, tok, batch, cells[0], {"beam_size": 4})
    assert len(recs) == B

    enc = model.encode(params, batch)
    beam = rnnt_beam_search(model.rnnt, params["rnnt"], enc.features,
                            enc.lengths, beam_size=4)
    greedy = model.greedy_decode(params, batch)

    def nll(y):
        U = max(max((len(s) for s in y), default=0), 1)
        tgt = np.zeros((B, U), np.int32)
        ul = np.zeros((B,), np.int32)
        for b, seq in enumerate(y):
            tgt[b, :len(seq)] = seq
            ul[b] = len(seq)
        return np.asarray(model.rnnt.apply(
            {"params": params["rnnt"]}, enc.features, enc.lengths,
            jnp.asarray(tgt), jnp.asarray(ul), method="loss"))

    nb, ng = nll(beam), nll(greedy)
    assert (nb <= ng + 1e-4).all(), (nb, ng)


def test_rnnt_efficiency_report(rng):
    """efficiency_report counts the RNNT head (exact, instantiated module)
    and emits per-frame/per-token secondary numbers."""
    from hnet_mamba_asr_tpu.eval.efficiency import (
        count_params, efficiency_report,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _rnnt_cfg()
    rep = efficiency_report(cfg, vocab_size=16)
    assert rep["params"]["rnnt_head"] > 0
    assert rep["params"]["ctc_head"] == 0
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    assert rep["params"]["rnnt_head"] == count_params(params["rnnt"])
    assert rep["params"]["total"] == count_params(params)
    sec = rep["flops"]["rnnt_secondary"]
    assert sec["per_frame"] > 0 and sec["per_token"] > 0


def test_rnnt_pooled_streaming_sessions_match_offline(rng, tmp_path):
    """Pooled multi-session TRANSDUCER streaming: the batch-B step carries
    per-row label histories in the state pytree and per-row n_valid masks,
    so ragged interleaved sessions each equal their solo offline greedy."""
    from hnet_mamba_asr_tpu.serving import save_streaming_artifact
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_pool"
    save_streaming_artifact(art, model, params, block_enc=8, batch=2)
    pool = StreamingSessionPool(art)
    assert pool._rnnt and pool.B == 2
    waves = [(rng.normal(size=9000) * 0.1).astype(np.float32),
             (rng.normal(size=12000) * 0.1).astype(np.float32)]
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    pos = [0, 0]
    sizes = [1000, 2100]
    while any(pos[k] < len(waves[k]) for k in range(2)):
        for k, sid in enumerate(sids):
            if pos[k] < len(waves[k]):
                got[sid] += pool.feed(sid, waves[k][pos[k]:pos[k] + sizes[k]])
                pos[k] += sizes[k]
    for k, sid in enumerate(sids):
        got[sid] += pool.finish(sid)
        live = model.greedy_decode(
            params, {"wave": waves[k][None],
                     "wave_lens": np.array([len(waves[k])], np.int32)})[0]
        assert got[sid] == live, k


def test_rnnt_device_beam_matches_host(rng):
    """The one-scan device beam reproduces the host engine's transcripts
    (fp32 vs fp64 can differ only on score ties — fuzz over seeds/lengths,
    same discipline as the device CTC/AED beams)."""
    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D = 6, 10
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=24)
    for seed in range(4):
        r = np.random.default_rng(70 + seed)
        B, T = 3, 8
        mem = jnp.asarray(r.normal(size=(B, T, D)) * 1.5, jnp.float32)
        lens = jnp.asarray([T, 6, 3], jnp.int32)
        params = head.init(jax.random.PRNGKey(seed), mem, lens,
                           jnp.zeros((B, 3), jnp.int32),
                           jnp.full((B,), 3), method="loss")["params"]
        host = rnnt_beam_search(head, params, mem, lens, beam_size=4)
        toks, tl = head.apply({"params": params}, mem, lens, 4,
                              method="beam_decode")
        dev = [np.asarray(toks)[b, :int(tl[b])].tolist() for b in range(B)]
        assert dev == host, (seed, dev, host)


def test_rnnt_device_beam_finds_map_sequence(rng):
    """Device beam with generous width also finds the brute-force MAP
    sequence on the tiny enumeration problem."""
    from itertools import product

    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D, T = 3, 8, 4
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=16)
    r = np.random.default_rng(44)
    mem = jnp.asarray(r.normal(size=(1, T, D)) * 2.0, jnp.float32)
    lens = jnp.asarray([T], jnp.int32)
    params = head.init(jax.random.PRNGKey(2), mem, lens,
                       jnp.zeros((1, 3), jnp.int32), jnp.asarray([3]),
                       method="loss")["params"]
    best_seq, best_nll = None, np.inf
    for Ln in range(0, 4):
        for y in product(range(V), repeat=Ln):
            tgt = np.zeros((1, 3), np.int32)
            tgt[0, :Ln] = y
            nll = float(head.apply({"params": params}, mem, lens,
                                   jnp.asarray(tgt), jnp.asarray([Ln]),
                                   method="loss")[0])
            if nll < best_nll:
                best_nll, best_seq = nll, list(y)
    toks, tl = head.apply({"params": params}, mem, lens, 27,
                          method="beam_decode")
    got = np.asarray(toks)[0, :int(tl[0])].tolist()
    assert got == best_seq, (got, best_seq)


def test_rnnt_beam_serving_export(rng, tmp_path):
    """emit=("rnnt_beam_ids",): the one-scan transducer beam traced into the
    AOT program == the live beam_decode; transcribe_ids prefers it over
    greedy."""
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_beam_art"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("rnnt_ids", "rnnt_beam_ids"), beam_size=4)
    sm = load_serving_artifact(art)
    wave = (rng.normal(size=(2, 4000)) * 0.1).astype(np.float32)
    lens = np.array([4000, 3100], np.int32)
    ids = sm.transcribe_ids(wave, lens)          # prefers the beam
    toks, tl = model.rnnt.apply(
        {"params": params["rnnt"]},
        model.encode(params, {"wave": wave, "wave_lens": lens}).features,
        model.encode(params, {"wave": wave, "wave_lens": lens}).lengths,
        4, method="beam_decode")
    live = [np.asarray(toks)[b, :int(tl[b])].tolist() for b in range(2)]
    assert ids == live


def test_rnnt_beam_nbest_pools_match(rng):
    """Device beam_decode_nbest's pool reproduces the host engine's nbest
    (same sequences, fp32-vs-fp64 score tolerance) — the n-best both
    rnnt_beam_lm paths re-rank."""
    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D = 6, 10
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=24)
    for seed in range(3):
        r = np.random.default_rng(170 + seed)
        B, T = 2, 7
        mem = jnp.asarray(r.normal(size=(B, T, D)) * 1.5, jnp.float32)
        lens = jnp.asarray([T, 5], jnp.int32)
        params = head.init(jax.random.PRNGKey(seed), mem, lens,
                           jnp.zeros((B, 3), jnp.int32),
                           jnp.full((B,), 3), method="loss")["params"]
        host = rnnt_beam_search(head, params, mem, lens, beam_size=4,
                                nbest=4)
        ftoks, fplen, fscore = head.apply({"params": params}, mem, lens, 4,
                                          method="beam_decode_nbest")
        ftoks, fplen, fscore = (np.asarray(ftoks), np.asarray(fplen),
                                np.asarray(fscore))
        for b in range(B):
            dev = sorted(
                ((ftoks[b, k, :fplen[b, k]].tolist(), float(fscore[b, k]))
                 for k in range(4) if fscore[b, k] > -5.0e8),
                key=lambda kv: -kv[1])
            assert [t for t, _ in dev] == [h.tokens for h in host[b]], \
                (seed, b)
            np.testing.assert_allclose([s for _, s in dev],
                                       [h.score for h in host[b]], atol=1e-3)


def test_rnnt_beam_lm_cell(rng):
    """rnnt_beam_lm: expand_cells emits it with lm enabled; a strong LM
    favoring a runner-up flips the transcript; lm_weight=0 reproduces the
    acoustic rnnt_beam result — on BOTH the device and host nbest paths."""
    from types import SimpleNamespace

    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch, expand_cells

    cells = expand_cells({"read_outs": ["rnnt"], "search": ["beam"],
                          "lm": "enabled"})
    assert [c["name"] for c in cells] == ["rnnt_beam", "rnnt_beam_lm"]
    lm_cell = cells[1]

    model = build_model(_rnnt_cfg(), 16)
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "ids": ["u0", "u1"], "row_mask": np.ones(B, bool)}
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=16,
                          decode=lambda ids: " ".join(map(str, ids)))

    base = decode_batch(model, params, tok, dict(batch), cells[0],
                        {"beam_size": 4})
    acoustic_best = [r["hyp"] for r in base]

    class FavoringLM:
        """Huge log-prob for one target sequence, tiny for everything else."""
        def __init__(self, target):
            self.target = target

        def sequence_logprob(self, seqs):
            return np.asarray([0.0 if s == self.target else -1e4
                               for s in seqs], np.float64)

    # find a runner-up to favor (device nbest pool of utt 0)
    enc = model.encode(params, batch)
    ftoks, fplen, fscore = model.rnnt.apply(
        {"params": params["rnnt"]}, enc.features, enc.lengths, 4,
        method="beam_decode_nbest")
    pool0 = [np.asarray(ftoks)[0, k, :int(np.asarray(fplen)[0, k])].tolist()
             for k in range(4) if float(np.asarray(fscore)[0, k]) > -5.0e8]
    runner_up = next((s for s in pool0
                      if " ".join(map(str, s)) != acoustic_best[0]), None)
    assert runner_up is not None, "beam produced a single hypothesis"

    for dev_flag in (True, False):
        dc0 = {"beam_size": 4, "rescore_weight": 0.0, "device_beam": dev_flag}
        neutral = decode_batch(model, params, tok, dict(batch), lm_cell, dc0,
                               lm=FavoringLM(runner_up))
        assert [r["hyp"] for r in neutral] == acoustic_best, dev_flag
        dc1 = {"beam_size": 4, "rescore_weight": 1e6, "device_beam": dev_flag}
        flipped = decode_batch(model, params, tok, dict(batch), lm_cell, dc1,
                               lm=FavoringLM(runner_up))
        assert flipped[0]["hyp"] == " ".join(map(str, runner_up)), dev_flag


def _fusion_lm(vocab=6, seed=11):
    from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
    from hnet_mamba_asr_tpu.models.lm import TransformerLM
    lm = TransformerLM(vocab_size=vocab, d_model=16, n_layers=2, n_heads=2,
                       d_ff=32, dropout=0.0)
    params = lm.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32))
    return lm, params, CausalLMScorer(lm, params)


def test_rnnt_host_fusion_accounting(rng):
    """Host fused beam: every hypothesis's fused score decomposes into its
    acoustic part plus lm_weight * the label-only LM mass (== next_logprobs
    chained by hand). (The acoustic part itself is beam-trajectory-dependent
    — fusion changes pruning, which changes which alignments merge — so it
    is NOT compared against the unfused engine; the brute-force MAP test
    below pins absolute correctness.)"""
    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D = 6, 10
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=2, max_decode_len=16)
    lm, _, scorer = _fusion_lm(vocab=V)
    r = np.random.default_rng(77)
    B, T = 2, 5
    mem = jnp.asarray(r.normal(size=(B, T, D)) * 1.5, jnp.float32)
    lens = jnp.asarray([T, 4], jnp.int32)
    params = head.init(jax.random.PRNGKey(1), mem, lens,
                       jnp.zeros((B, 3), jnp.int32),
                       jnp.full((B,), 3), method="loss")["params"]
    w = 0.7
    fused = rnnt_beam_search(head, params, mem, lens, beam_size=8,
                             nbest=8, lm=scorer, lm_weight=w)
    for b in range(B):
        for h in fused[b]:
            # label-only LM mass, chained by hand from next_logprobs
            lms = 0.0
            for i in range(len(h.tokens)):
                lms += float(scorer.next_logprobs([h.tokens[:i]])
                             [0][h.tokens[i]])
            np.testing.assert_allclose(h.score, h.aed + w * lms,
                                       rtol=0, atol=1e-6)


def test_rnnt_fused_beam_finds_fused_map(rng):
    """With generous width/emission caps the FUSED beam's best hypothesis is
    the argmax of [full transducer alignment marginal + lm_weight * label-
    only LM mass] over every sequence up to length 3 — the brute-force
    oracle with the shallow-fusion objective."""
    from itertools import product

    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D, T = 3, 8, 4
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=16)
    lm, _, scorer = _fusion_lm(vocab=V, seed=2)
    w = 1.3
    for seed in range(2):
        r = np.random.default_rng(60 + seed)
        mem = jnp.asarray(r.normal(size=(1, T, D)) * 2.0, jnp.float32)
        lens = jnp.asarray([T], jnp.int32)
        params = head.init(jax.random.PRNGKey(seed), mem, lens,
                           jnp.zeros((1, 3), jnp.int32), jnp.asarray([3]),
                           method="loss")["params"]
        best_seq, best_s = None, -np.inf
        for L in range(0, 4):
            for y in product(range(V), repeat=L):
                tgt = np.zeros((1, 3), np.int32)
                tgt[0, :L] = y
                ac = -float(head.apply({"params": params}, mem, lens,
                                       jnp.asarray(tgt), jnp.asarray([L]),
                                       method="loss")[0])
                lms = sum(float(scorer.next_logprobs([list(y[:i])])
                                [0][y[i]]) for i in range(L))
                if ac + w * lms > best_s:
                    best_s, best_seq = ac + w * lms, list(y)
        got = rnnt_beam_search(head, params, mem, lens, beam_size=27,
                               max_symbols=3, lm=scorer, lm_weight=w)[0]
        assert got == best_seq, (seed, got, best_seq, best_s)


def test_rnnt_fused_device_matches_host(rng):
    """Device in-scan fused beam == host fused engine: same sequences in the
    same fused order, acoustic scores to fp32 tolerance, and the returned
    LM log-prob equals sequence_logprob (incl. eos)."""
    from hnet_mamba_asr_tpu.decoders.rnnt_decode import rnnt_beam_search
    from hnet_mamba_asr_tpu.models.aed import sinusoidal_pe
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D = 6, 10
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=24)
    lm, lm_params, scorer = _fusion_lm(vocab=V)
    for seed in range(3):
        r = np.random.default_rng(500 + seed)
        B, T = 2, 6
        mem = jnp.asarray(r.normal(size=(B, T, D)) * 1.5, jnp.float32)
        lens = jnp.asarray([T, 4], jnp.int32)
        params = head.init(jax.random.PRNGKey(seed), mem, lens,
                           jnp.zeros((B, 3), jnp.int32),
                           jnp.full((B,), 3), method="loss")["params"]
        w = 0.6
        host = rnnt_beam_search(head, params, mem, lens, beam_size=4,
                                nbest=4, lm=scorer, lm_weight=w)
        L = min(head.max_decode_len, T * head.max_symbols)
        cap = L + 1
        pe = jnp.asarray(sinusoidal_pe(cap, lm.d_model))
        ftoks, fplen, fscore, flms = head.apply(
            {"params": params}, mem, lens, 4, method="beam_decode_nbest",
            lm_model=lm, lm_params=lm_params, lm_pe=pe, lm_weight=w,
            lm_cache_cap=cap)
        ftoks, fplen, fscore, flms = (np.asarray(ftoks), np.asarray(fplen),
                                      np.asarray(fscore), np.asarray(flms))
        for b in range(B):
            # device rows come out already in fused order (top_k)
            dev = [(ftoks[b, k, :fplen[b, k]].tolist(), float(fscore[b, k]),
                    float(flms[b, k]))
                   for k in range(4) if fscore[b, k] > -5.0e8]
            assert [t for t, _, _ in dev] == [h.tokens for h in host[b]], \
                (seed, b)
            np.testing.assert_allclose([s for _, s, _ in dev],
                                       [h.aed for h in host[b]], atol=1e-3)
            # returned LM mass == full sequence_logprob (incl. eos)
            want = scorer.sequence_logprob([t for t, _, _ in dev])
            np.testing.assert_allclose([l for _, _, l in dev], want,
                                       atol=1e-3)


def test_rnnt_beam_lm_fused_cell(rng):
    """rnnt_beam_lm with lm_weight != 0 runs first-pass fusion on BOTH paths:
    a strong LM favoring a runner-up flips the transcript through the search
    itself (rescore_weight=0), and lm_weight=0 reproduces the acoustic-only
    pool."""
    from types import SimpleNamespace

    from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch, expand_cells

    cells = expand_cells({"read_outs": ["rnnt"], "search": ["beam"],
                          "lm": "enabled"})
    lm_cell = cells[1]
    assert lm_cell["name"] == "rnnt_beam_lm"

    model = build_model(_rnnt_cfg(), 16)
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "ids": ["u0", "u1"], "row_mask": np.ones(B, bool)}
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=16,
                          decode=lambda ids: " ".join(map(str, ids)))

    lm, lm_params, scorer = _fusion_lm(vocab=16, seed=4)

    base = decode_batch(model, params, tok, dict(batch), cells[0],
                        {"beam_size": 4})
    acoustic_best = [r["hyp"] for r in base]

    for dev_flag in (True, False):
        # lm_weight=0 (+rescore 0) reproduces the acoustic-only result
        dc0 = {"beam_size": 4, "lm_weight": 0.0, "rescore_weight": 0.0,
               "device_beam": dev_flag}
        neutral = decode_batch(model, params, tok, dict(batch), lm_cell, dc0,
                               lm=scorer)
        assert [r["hyp"] for r in neutral] == acoustic_best, dev_flag
        # a real (random) LM fused at a strong weight still yields valid
        # transcripts on both paths, and both paths AGREE with each other
        dc1 = {"beam_size": 4, "lm_weight": 2.0, "rescore_weight": 0.0,
               "device_beam": dev_flag}
        fused = decode_batch(model, params, tok, dict(batch), lm_cell, dc1,
                             lm=scorer)
        if dev_flag:
            fused_dev = [r["hyp"] for r in fused]
        else:
            assert [r["hyp"] for r in fused] == fused_dev


def test_rnnt_beam_streaming_state(rng):
    """Block-wise beam with the carry threaded back as ``state`` equals one
    offline pass EXACTLY (tokens, lengths, scores) at any block split —
    including a ragged final block masked by memory_lengths."""
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead

    V, D, T = 6, 10, 12
    head = RNNTHead(vocab_size=V, d_memory=D, d_pred=8, d_joint=16,
                    context=2, max_symbols=3, max_decode_len=24)
    r = np.random.default_rng(90)
    B = 2
    mem = jnp.asarray(r.normal(size=(B, T, D)) * 1.5, jnp.float32)
    lens = np.asarray([T, 9])
    params = head.init(jax.random.PRNGKey(0), mem, jnp.asarray(lens),
                       jnp.zeros((B, 3), jnp.int32),
                       jnp.full((B,), 3), method="loss")["params"]
    L = 24
    ref = head.apply({"params": params}, mem, jnp.asarray(lens), 4,
                     method="beam_decode_nbest", token_buf_len=L)
    ref = tuple(np.asarray(x) for x in ref)

    for block in (1, 4, 5):
        state = None
        done = np.zeros(B, np.int64)
        for t0 in range(0, T, block):
            n = min(block, T - t0)
            nv = np.clip(lens - done, 0, n).astype(np.int32)
            out = head.apply({"params": params}, mem[:, t0:t0 + n],
                             jnp.asarray(nv), 4,
                             method="beam_decode_nbest",
                             state=state, token_buf_len=L)
            state = out
            done += n
        got = tuple(np.asarray(x) for x in state)
        np.testing.assert_array_equal(got[0], ref[0], err_msg=str(block))
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_allclose(got[2], ref[2], atol=1e-5)


def test_rnnt_streaming_beam_export_matches_offline(rng, tmp_path):
    """Streaming transducer BEAM artifact: the beam carry rides the state
    pytree; feed() returns [] (the beam may rewrite earlier output),
    .partial tracks the running best, finish() returns the offline
    beam_decode transcript exactly."""
    from hnet_mamba_asr_tpu.serving import (
        load_streaming_artifact, save_streaming_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_stream_beam"
    save_streaming_artifact(art, model, params, block_enc=8,
                            stream_decode="beam", beam_size=4,
                            token_buf_len=48)
    sm = load_streaming_artifact(art)
    assert sm._rnnt and sm._beam
    wave = (rng.normal(size=10000) * 0.1).astype(np.float32)
    fed = []
    for lo in range(0, len(wave), 1300):         # ragged pushes
        fed += sm.feed(wave[lo:lo + 1300])
    assert fed == []                             # beam: nothing final early
    toks = sm.finish()

    batch = {"wave": wave[None], "wave_lens": np.array([len(wave)], np.int32)}
    enc = model.encode(params, batch, train=False)
    # same token_buf_len as the artifact (the fplen < L growth cap must
    # match for exact equality)
    ftoks, fplen, fscore = model.rnnt.apply(
        {"params": params["rnnt"]}, enc.features, enc.lengths, 4,
        method="beam_decode_nbest", token_buf_len=48)
    b = int(np.argmax(np.asarray(fscore)[0]))
    live = np.asarray(ftoks)[0, b, :int(np.asarray(fplen)[0, b])].tolist()
    assert toks == live


def test_rnnt_pooled_streaming_beam_sessions_match_solo(rng, tmp_path):
    """batch=2 beam artifact: two interleaved live sessions each equal their
    own solo offline beam decode; partial() is readable mid-stream."""
    from hnet_mamba_asr_tpu.serving import save_streaming_artifact
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = dict(_rnnt_cfg(), train={"precision": "fp32"})
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "rnnt_stream_beam_pool"
    save_streaming_artifact(art, model, params, block_enc=8, batch=2,
                            stream_decode="beam", beam_size=4,
                            token_buf_len=48)
    pool = StreamingSessionPool(art)
    waves = [(rng.normal(size=n) * 0.1).astype(np.float32)
             for n in (9000, 11000)]
    sids = [pool.open(), pool.open()]
    off = [0, 0]
    while any(off[i] < len(waves[i]) for i in range(2)):
        for i in range(2):
            if off[i] < len(waves[i]):
                assert pool.feed(sids[i], waves[i][off[i]:off[i] + 1500]) == []
                off[i] += 1500
    mid = pool.partial(sids[0])
    assert isinstance(mid, list)
    finals = [pool.finish(sids[i]) for i in range(2)]
    for i in range(2):
        batch = {"wave": waves[i][None],
                 "wave_lens": np.array([len(waves[i])], np.int32)}
        enc = model.encode(params, batch, train=False)
        ftoks, fplen, fscore = model.rnnt.apply(
            {"params": params["rnnt"]}, enc.features, enc.lengths, 4,
            method="beam_decode_nbest", token_buf_len=48)
        b = int(np.argmax(np.asarray(fscore)[0]))
        live = np.asarray(ftoks)[0, b, :int(np.asarray(fplen)[0, b])].tolist()
        assert finals[i] == live, i
