"""AED head: target wrapping, loss masking/label smoothing, causality,
greedy decode termination; TransformerLM loss + accuracy contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.aed import (
    AEDHead, label_smoothing_loss, strip_hypothesis,
)
from hnet_mamba_asr_tpu.models.lm import TransformerLM

V, DM = 12, 16
HEAD_KW = dict(vocab_size=V, d_model=DM, n_layers=2, n_heads=2, d_ff=32,
               dropout=0.0, lsm_weight=0.1, max_decode_len=8)


def _head(rng, B=2, S=9):
    head = AEDHead(**HEAD_KW)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = jnp.asarray([S, S - 3])
    ys = jnp.asarray(rng.integers(4, V, size=(B, 5)).astype(np.int32))
    ylens = jnp.asarray([5, 3])
    params = head.init(jax.random.PRNGKey(0), mem, mlens, ys)
    return head, params, mem, mlens, ys, ylens


def test_add_sos_eos(rng):
    head, params, mem, mlens, ys, ylens = _head(rng)
    ys_in, ys_out, lens = head.apply(params, ys, ylens, method="add_sos_eos")
    ys_in, ys_out = np.asarray(ys_in), np.asarray(ys_out)
    assert (ys_in[:, 0] == 1).all()                        # bos
    ysv = np.asarray(ys)
    for i, n in enumerate([5, 3]):                         # valid spans copied,
        np.testing.assert_array_equal(ys_in[i, 1:1 + n], ysv[i, :n])
        assert (ys_in[i, 1 + n:] == 3).all()               # tails forced to pad
    assert ys_out[0, 5] == 2 and ys_out[1, 3] == 2         # eos at true length
    assert ys_out[1, 4] == 3 and ys_out[1, 5] == 3         # pad after
    np.testing.assert_array_equal(np.asarray(lens), [6, 4])


def test_forward_shapes_and_loss(rng):
    head, params, mem, mlens, ys, ylens = _head(rng)
    logits = head.apply(params, mem, mlens, ys)
    assert logits.shape == (2, 5, V)
    loss = head.apply(params, mem, mlens, ys, ylens, method="loss")
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_loss_ignores_padding_tail(rng):
    """Changing target pad content must not change the loss."""
    head, params, mem, mlens, ys, ylens = _head(rng)
    base = float(head.apply(params, mem, mlens, ys, ylens, method="loss"))
    ys2 = ys.at[1, 4:].set(7)                              # beyond row-1 length 3
    pert = float(head.apply(params, mem, mlens, ys2, ylens, method="loss"))
    assert base == pytest.approx(pert, rel=1e-6)


def test_decoder_self_attn_causal(rng):
    """Changing a later target token must not affect earlier logits."""
    head, params, mem, mlens, ys, ylens = _head(rng)
    base = np.asarray(head.apply(params, mem, mlens, ys))
    ys2 = ys.at[0, 3].set(4)
    pert = np.asarray(head.apply(params, mem, mlens, ys2))
    np.testing.assert_allclose(pert[0, :3], base[0, :3], atol=1e-5)
    assert np.abs(pert[0, 3:] - base[0, 3:]).max() > 0


def test_memory_padding_masked(rng):
    """Memory frames beyond memory_lengths must not affect logits."""
    head, params, mem, mlens, ys, ylens = _head(rng)
    base = np.asarray(head.apply(params, mem, mlens, ys))
    mem2 = mem.at[1, 6:].set(9.0)                          # row 1 valid length 6
    pert = np.asarray(head.apply(params, mem2, mlens, ys))
    np.testing.assert_allclose(pert[1], base[1], atol=1e-5)


def test_greedy_decode_terminates_and_strips(rng):
    head, params, mem, mlens, *_ = _head(rng)
    ids = np.asarray(head.apply(params, mem, mlens, method="greedy_decode"))
    assert ids.shape == (2, 8)
    hyp = strip_hypothesis(ids[0], eos_id=2)
    assert all(0 <= t < V and t not in (1, 3) for t in hyp)   # bos/pad non-emittable
    # finished rows keep emitting eos
    row = list(ids[0])
    if 2 in row:
        k = row.index(2)
        assert all(t == 2 for t in row[k:])


def test_cached_greedy_equals_full_recompute(rng):
    """The KV-cached greedy decode must emit exactly what a no-cache greedy
    (full decoder re-run per step, the reference's method) emits."""
    head, params, mem, mlens, *_ = _head(rng)
    cached = np.asarray(head.apply(params, mem, mlens, method="greedy_decode"))

    # reference-style greedy: grow ys, full forward each step
    import jax.numpy as jnp
    B, cap = mem.shape[0], head.max_decode_len
    ys = np.full((B, 1), 1, np.int32)                     # bos
    finished = np.zeros(B, bool)
    for _ in range(cap):
        logits = np.asarray(head.apply(params, mem, mlens, jnp.asarray(ys)))
        step = logits[:, -1].astype(np.float64)
        step[:, 1] = -1e9                                  # bos
        step[:, 3] = -1e9                                  # pad
        nxt = step.argmax(-1)
        nxt[finished] = 2                                  # eos
        ys = np.concatenate([ys, nxt[:, None].astype(np.int32)], axis=1)
        finished |= nxt == 2
        if finished.all():
            break
    want = ys[:, 1:]
    for b in range(B):
        got_seq = [int(t) for t in cached[b]]
        want_seq = [int(t) for t in want[b]]
        # compare up to / including the first eos
        def cut(seq):
            return seq[:seq.index(2) + 1] if 2 in seq else seq
        assert cut(got_seq) == cut(want_seq), b


def test_layer_step_matches_teacher_forcing(rng):
    """Incremental layer.step over positions == one full __call__."""
    import jax
    import jax.numpy as jnp
    from hnet_mamba_asr_tpu.models.aed import DecoderLayerQKNorm, causal_mask, pad_mask

    layer = DecoderLayerQKNorm(d_model=16, n_heads=2, d_ff=32, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(2, 7, 16)).astype(np.float32))
    mlens = jnp.asarray([7, 4])
    kpm = pad_mask(mlens, 7)
    params = layer.init(jax.random.PRNGKey(0), x, mem, causal_mask(5), kpm)
    full = np.asarray(layer.apply(params, x, mem, causal_mask(5), kpm))

    cache = layer.apply(params, mem, 5, method="init_cache")
    outs = []
    for t in range(5):
        y, cache = layer.apply(params, x[:, t:t + 1], cache, t, kpm,
                               method="step")
        outs.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(outs, axis=1), full, rtol=2e-4,
                               atol=2e-4)


def test_label_smoothing_matches_manual(rng):
    B, T, Vv = 1, 3, 5
    logits = jnp.asarray(rng.normal(size=(B, T, Vv)).astype(np.float32))
    target = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    lens = jnp.asarray([2])
    lsm = 0.1
    out = float(label_smoothing_loss(logits, target, lens, lsm))
    logp = np.log(np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(-1, keepdims=True))
    true = np.full((B, T, Vv), lsm / (Vv - 1))
    for t, y in enumerate([1, 2, 3]):
        true[0, t, y] = 1 - lsm
    nll = -(true * logp).sum(-1)
    expect = nll[0, :2].mean()
    assert out == pytest.approx(expect, rel=1e-5)


# ── TransformerLM ─────────────────────────────────────────────────────────────
def test_lm_forward_and_loss(rng):
    lm = TransformerLM(vocab_size=V, d_model=16, n_layers=2, n_heads=2, d_ff=32,
                       dropout=0.0)
    tokens = jnp.asarray(rng.integers(4, V, size=(2, 6)).astype(np.int32))
    tlens = jnp.asarray([6, 4])
    params = lm.init(jax.random.PRNGKey(0), tokens)
    logits = lm.apply(params, tokens)
    assert logits.shape == (2, 6, V)
    loss, acc = lm.apply(params, tokens, tlens, True, method="loss")
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_lm_causal(rng):
    lm = TransformerLM(vocab_size=V, d_model=16, n_layers=1, n_heads=2, d_ff=32,
                       dropout=0.0)
    tokens = jnp.asarray(rng.integers(4, V, size=(1, 6)).astype(np.int32))
    params = lm.init(jax.random.PRNGKey(0), tokens)
    base = np.asarray(lm.apply(params, tokens))
    pert = np.asarray(lm.apply(params, tokens.at[0, 4].set(5)))
    np.testing.assert_allclose(pert[0, :4], base[0, :4], atol=1e-5)
