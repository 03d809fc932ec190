"""SSD scan: chunked == sequential oracle (values + grads), causality,
chunk-size invariance; Mamba2 layer + blocks: shapes, padding causality,
bidirectional identity properties."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.mamba2 import Mamba2
from hnet_mamba_asr_tpu.models.mamba_block import MambaBlock, MambaStack, reverse_sequences
from hnet_mamba_asr_tpu.ops.ssd import ssd_chunked, ssd_reference


def _inputs(rng, B=2, L=37, H=3, P=8, N=16, G=1):
    x = jnp.asarray(rng.normal(size=(B, L, H, P)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.001, 0.2, size=(B, L, H)).astype(np.float32))
    A = jnp.asarray(-rng.uniform(0.5, 8.0, size=(H,)).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, G, N)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(B, L, G, N)).astype(np.float32))
    return x, dt, A, Bm, Cm


def test_chunked_matches_reference(rng):
    args = _inputs(rng)
    ref = ssd_reference(*args)
    out = ssd_chunked(*args, chunk_size=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_chunk_size_invariance(rng):
    args = _inputs(rng, L=50)
    outs = [np.asarray(ssd_chunked(*args, chunk_size=q)) for q in (8, 16, 64, 128)]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=2e-4, atol=2e-4)


def test_multi_group_heads(rng):
    args = _inputs(rng, H=4, G=2)
    ref = ssd_reference(*args)
    out = ssd_chunked(*args, chunk_size=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_causality(rng):
    """Perturbing frame t must not change outputs before t."""
    x, dt, A, Bm, Cm = _inputs(rng, B=1, L=33)
    base = np.asarray(ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8))
    t = 20
    x2 = x.at[0, t].add(10.0)
    Bm2 = Bm.at[0, t].add(5.0)
    out = np.asarray(ssd_chunked(x2, dt, A, Bm2, Cm, chunk_size=8))
    np.testing.assert_array_equal(out[0, :t], base[0, :t])
    assert np.abs(out[0, t:] - base[0, t:]).max() > 0


def test_gradients_match_reference(rng):
    args = _inputs(rng, B=1, L=21, H=2, P=4, N=8)

    def loss_ref(x, dt, A, Bm, Cm):
        return jnp.sum(jnp.tanh(ssd_reference(x, dt, A, Bm, Cm)))

    def loss_chk(x, dt, A, Bm, Cm):
        return jnp.sum(jnp.tanh(ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_chk = jax.grad(loss_chk, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_decay_stability_long_dt(rng):
    """Large dt*|A| must not overflow/NaN (decays are exp of negatives)."""
    x, dt, A, Bm, Cm = _inputs(rng, L=40)
    dt = dt * 50.0
    out = np.asarray(ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8))
    assert np.isfinite(out).all()


def test_gradients_finite_at_production_scale(rng):
    """Regression: with chunk_size >> 1 and strong decay (|A| up to 16, the
    production init range), the intra-chunk future-position exp used to
    overflow and leak NaN into gradients through the where branch."""
    x = jnp.asarray(rng.normal(size=(1, 256, 2, 8)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.3, size=(1, 256, 2)).astype(np.float32))
    A = jnp.asarray(np.array([-8.0, -16.0], np.float32))
    Bm = jnp.asarray(rng.normal(size=(1, 256, 1, 8)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(1, 256, 1, 8)).astype(np.float32))

    def loss(x, dt, A, Bm, Cm):
        return jnp.sum(ssd_chunked(x, dt, A, Bm, Cm, chunk_size=128) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, dt, A, Bm, Cm)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


# ── layer / blocks ────────────────────────────────────────────────────────────
def test_mamba2_layer_shapes(rng):
    m = Mamba2(d_model=32, d_state=16, headdim=8, chunk_size=16)
    x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 24, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_mamba2_headdim_divisibility():
    m = Mamba2(d_model=30, headdim=8)
    with pytest.raises(ValueError, match="divisible"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 30)))


def test_mamba2_causal(rng):
    m = Mamba2(d_model=16, d_state=8, headdim=8, chunk_size=8)
    x = jnp.asarray(rng.normal(size=(1, 30, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    base = np.asarray(m.apply(params, x))
    out = np.asarray(m.apply(params, x.at[0, 17].set(99.0)))
    np.testing.assert_allclose(out[0, :14], base[0, :14], atol=1e-6)  # conv reach = 4


def test_reverse_sequences_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    lengths = jnp.asarray([7, 10])
    r = reverse_sequences(x, lengths)
    rr = reverse_sequences(r, lengths)
    np.testing.assert_array_equal(np.asarray(rr), np.asarray(x))
    # padding untouched
    np.testing.assert_array_equal(np.asarray(r[0, 7:]), np.asarray(x[0, 7:]))
    # valid span actually reversed
    np.testing.assert_array_equal(np.asarray(r[0, 0]), np.asarray(x[0, 6]))


def test_block_padding_isolation(rng):
    """With length-aware bidirection, outputs on valid frames must not depend
    on what sits in the padding region."""
    blk = MambaBlock(d_model=16, bidirectional=True, d_state=8, headdim=8, chunk_size=8)
    x = jnp.asarray(rng.normal(size=(1, 20, 16)).astype(np.float32))
    lengths = jnp.asarray([12])
    params = blk.init(jax.random.PRNGKey(1), x, lengths)
    base = np.asarray(blk.apply(params, x, lengths))
    x2 = x.at[0, 12:].set(7.7)                        # garbage in padding
    out = np.asarray(blk.apply(params, x2, lengths))
    np.testing.assert_allclose(out[0, :12], base[0, :12], rtol=2e-5, atol=2e-5)


def test_stack_shapes_and_param_structure(rng):
    stack = MambaStack(n_layers=2, d_model=16, d_state=8, headdim=8, chunk_size=8)
    x = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    lengths = jnp.asarray([16, 9])
    params = stack.init(jax.random.PRNGKey(0), x, lengths)
    y = stack.apply(params, x, lengths)
    assert y.shape == x.shape
    names = set(params["params"].keys())
    assert names == {"block_0", "block_1", "norm"}
    blk = params["params"]["block_0"]
    assert "fwd" in blk and "bwd" in blk             # bidirectional by default
    assert blk["fwd"]["a_log"].shape == (4,)         # heads = expand*d/headdim


def test_bf16_forward(rng):
    m = MambaStack(n_layers=1, d_model=16, d_state=8, headdim=8, chunk_size=8,
                   dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 16, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, dtype=np.float32)).all()


def test_ssd_intra_bf16_close_to_fp32(rng):
    """intra_dtype='bf16' (halved intra-chunk HBM traffic — see the roofline
    in docs/results/roofline_tpu.json) stays within bf16 rounding of the
    fp32-intermediate path; default path is untouched."""
    from hnet_mamba_asr_tpu.ops.ssd import ssd_chunked, ssd_reference

    B, L, H, P, N = 2, 96, 4, 16, 8
    x = jnp.asarray(rng.normal(size=(B, L, H, P)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.1, size=(B, L, H)).astype(np.float32))
    A = jnp.asarray(-rng.uniform(1, 8, size=H).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, 1, N)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(B, L, 1, N)).astype(np.float32))
    ref = ssd_reference(x, dt, A, Bm, Cm)
    out = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=32, intra_dtype="bf16")
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = float(np.sqrt((np.asarray(ref) ** 2).mean()))
    assert float(np.sqrt((err ** 2).mean())) < 0.01 * scale
    # gradients flow and are finite through the bf16 intermediates
    g = jax.grad(lambda xx: (ssd_chunked(xx, dt, A, Bm, Cm, chunk_size=32,
                                         intra_dtype="bf16") ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_ssd_intra_dtype_plumbs_from_config(rng):
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = {"encoder": "dcasr", "head": "ctc",
           "frontend_conf": {"n_mels": 20},
           "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                            "n_main": 1, "n_dec": 1, "arch_type": "A",
                            "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                            "ssd_intra_dtype": "bf16",
                            "hnet": {"compression_N": 1}},
           "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0}}
    model = build_model(cfg, 12)
    assert model.encoder.ssd_intra_dtype == "bf16"
    params = model.init_params(jax.random.PRNGKey(0))
    wave = rng.normal(size=(1, 4000)).astype(np.float32)
    batch = {"wave": wave, "wave_lens": np.array([4000], np.int32),
             "tokens": np.array([[4, 5]], np.int32),
             "token_lens": np.array([2], np.int32),
             "row_mask": np.array([True])}
    loss, stats = model.loss_fn(params, batch, 0, False)
    assert np.isfinite(float(loss))


# ── flash-style custom VJP for the intra-chunk attention ────────────────────

def _intra_args(rng, B=2, K=2, H=3, Q=16, N=8, P=4, dtype=jnp.float32):
    ac = jnp.cumsum(jnp.asarray(
        -rng.uniform(0.01, 0.3, size=(B, K, H, Q)).astype(np.float32)), axis=-1)
    dtc = jnp.asarray(rng.uniform(0.001, 0.2, size=(B, K, H, Q)).astype(np.float32))
    Cc = jnp.asarray(rng.normal(size=(B, K, H, Q, N)).astype(np.float32)).astype(dtype)
    Bc = jnp.asarray(rng.normal(size=(B, K, H, Q, N)).astype(np.float32)).astype(dtype)
    xc = jnp.asarray(rng.normal(size=(B, K, H, Q, P)).astype(np.float32)).astype(dtype)
    return ac, dtc, Cc, Bc, xc


def test_intra_custom_vjp_matches_autodiff(rng):
    """The hand-written flash-style backward == jax autodiff of the same
    forward (fp32: identical math, different materialization order)."""
    from hnet_mamba_asr_tpu.ops.ssd import _intra_attn, _intra_impl

    args = _intra_args(rng)
    cot = jnp.asarray(rng.normal(size=(2, 2, 3, 16, 4)).astype(np.float32))

    y_ref, vjp_ref = jax.vjp(lambda *a: _intra_impl(*a, None)[0], *args)
    y_new, vjp_new = jax.vjp(lambda *a: _intra_attn(*a, None), *args)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), rtol=1e-6)
    g_ref = vjp_ref(cot)
    g_new = vjp_new(cot)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_intra_custom_vjp_bf16_grads_close_and_finite(rng):
    """bf16 intra path: hand-written grads finite and within bf16 rounding of
    the fp32 autodiff grads."""
    from hnet_mamba_asr_tpu.ops.ssd import _intra_attn, _intra_impl

    args = _intra_args(rng)
    cot = jnp.asarray(rng.normal(size=(2, 2, 3, 16, 4)).astype(np.float32))
    _, vjp_ref = jax.vjp(lambda *a: _intra_impl(*a, None)[0], *args)
    _, vjp_bf = jax.vjp(lambda *a: _intra_attn(*a, "bf16"), *args)
    for a, b in zip(vjp_bf(cot), vjp_ref(cot)):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        assert np.isfinite(a).all()
        scale = np.maximum(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.05 * scale)


def test_intra_dtype_unknown_value_raises(rng):
    """'bfloat16' etc must not silently fall through to the fp32 path (that
    doubles the intra-chunk HBM traffic); aliases normalize, junk raises."""
    x, dt, A, Bm, Cm = _inputs(rng, L=8)
    ok_alias = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8, intra_dtype="bfloat16")
    ok_short = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8, intra_dtype="bf16")
    np.testing.assert_allclose(np.asarray(ok_alias), np.asarray(ok_short),
                               rtol=1e-6)
    with pytest.raises(ValueError, match="intra_dtype"):
        ssd_chunked(x, dt, A, Bm, Cm, chunk_size=8, intra_dtype="half")


def test_ssd_out_compute_dtype_plumbs_and_is_noop_at_fp32(rng):
    """encoder_conf.ssd_out_compute_dtype reaches the Mamba2 layers, and at
    fp32 compute dtype rounding y to compute dtype is the identity (the knob
    only changes bytes at bf16 — see docs/results/config_ab_ssd_out_dtype)."""
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    base = {"encoder": "dcasr", "head": "ctc",
            "frontend_conf": {"n_mels": 20},
            "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                             "n_main": 1, "n_dec": 1, "arch_type": "A",
                             "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                             "hnet": {"compression_N": 1}},
            "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0}}
    on = {**base, "encoder_conf": {**base["encoder_conf"],
                                   "ssd_out_compute_dtype": True}}
    m_off = build_model(base, 12)
    m_on = build_model(on, 12)
    assert m_off.encoder.ssd_out_compute_dtype is False
    assert m_on.encoder.ssd_out_compute_dtype is True
    params = m_off.init_params(jax.random.PRNGKey(0))
    wave = rng.normal(size=(1, 4000)).astype(np.float32)
    batch = {"wave": wave, "wave_lens": np.array([4000], np.int32),
             "tokens": np.array([[4, 5]], np.int32),
             "token_lens": np.array([2], np.int32),
             "row_mask": np.array([True])}
    l_off, _ = m_off.loss_fn(params, batch, 0, False)
    l_on, _ = m_on.loss_fn(params, batch, 0, False)
    assert float(l_off) == float(l_on)


def test_intra_custom_vjp_matches_autodiff_through_full_ssd(rng):
    """custom_vjp grads == autodiff grads through ssd_chunked INCLUDING the
    L-padding path (L not a multiple of Q) and the inter-chunk correction."""
    x, dt, A, Bm, Cm = _inputs(rng, L=27)             # pads 27 -> 32 (Q=16)
    cot_shape = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16).shape
    cot = jnp.asarray(rng.normal(size=cot_shape).astype(np.float32))

    def loss(custom):
        def f(x_, dt_, B_, C_):
            y = ssd_chunked(x_, dt_, A, B_, C_, chunk_size=16,
                            custom_vjp=custom)
            return jnp.vdot(y, cot)
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)

    for a, b in zip(loss(True), loss(False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
