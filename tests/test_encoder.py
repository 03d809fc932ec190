"""Encoder sandwich: shapes, length formula, N=1 passthrough equivalence,
Type A/B wiring, fixed-pool control, chunker registry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.encoder import (
    ConvSubsampling4, DCASREncoder, build_chunker, subsampled_length,
)
from hnet_mamba_asr_tpu.models.fixed_pool import FixedPoolChunker
from hnet_mamba_asr_tpu.models.hnet_chunk import DynamicChunker

KW = dict(n_mels=20, d_outer=16, d_main=24, n_enc=1, n_main=1, n_dec=1, n_mid=1,
          d_state=8, headdim=8, chunk_size=16)


def _feats(rng, B=2, T=80, F=20):
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.asarray([T, T - 25])
    return feats, lengths


def test_subsampled_length():
    lens = jnp.asarray([80, 55, 9, 3])
    np.testing.assert_array_equal(np.asarray(subsampled_length(lens)), [19, 13, 1, 0])


def test_conv_subsampling_shapes(rng):
    sub = ConvSubsampling4(n_mels=20, d_model=16)
    feats, lengths = _feats(rng)
    params = sub.init(jax.random.PRNGKey(0), feats, lengths)
    x, out_lens = sub.apply(params, feats, lengths)
    assert x.shape == (2, 19, 16)                    # (80-1)//2=39 -> (39-1)//2=19
    np.testing.assert_array_equal(np.asarray(out_lens), [19, 13])


@pytest.mark.parametrize("arch", ["A", "B"])
def test_encoder_forward(rng, arch):
    enc = DCASREncoder(arch_type=arch, N=4 if arch == "B" else 2, **KW)
    feats, lengths = _feats(rng)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)
    out = enc.apply(params, feats, lengths)
    assert out.features.shape == (2, 19, 16)
    np.testing.assert_array_equal(np.asarray(out.lengths), [19, 13])
    n_stages = 1 if arch == "A" else 2
    assert len(out.boundaries) == n_stages
    assert len(out.chunk_embeddings) == n_stages
    assert len(out.kept_fractions) == n_stages
    assert np.isfinite(np.asarray(out.features)).all()
    assert np.isfinite(float(out.ratio_loss))


def test_n1_no_router_params(rng):
    enc = DCASREncoder(arch_type="A", N=1, **KW)
    feats, lengths = _feats(rng)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert not any("router" in jax.tree_util.keystr(path) for path, _ in flat)
    out = enc.apply(params, feats, lengths)
    assert float(out.ratio_loss) == 0.0
    assert float(out.kept_fractions[0]) == 1.0


def test_n2_has_router_and_ratio(rng):
    enc = DCASREncoder(arch_type="A", N=2, **KW)
    feats, lengths = _feats(rng)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("router" in jax.tree_util.keystr(path) for path, _ in flat)


def test_fixed_chunker_from_registry(rng):
    enc = DCASREncoder(arch_type="A", N=2, chunker="fixed", **KW)
    feats, lengths = _feats(rng)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)
    out = enc.apply(params, feats, lengths)
    assert float(out.ratio_loss) == 0.0              # fixed pooling has none
    kf = float(out.kept_fractions[0])
    assert 0.4 < kf < 0.7                            # ~1/2 by construction


def test_unknown_chunker_raises():
    with pytest.raises(ValueError, match="unknown chunker"):
        build_chunker("nope", 16, 2)


def test_bad_arch_raises(rng):
    enc = DCASREncoder(arch_type="C", **KW)
    feats, lengths = _feats(rng)
    with pytest.raises(ValueError, match="arch_type"):
        enc.init(jax.random.PRNGKey(0), feats, lengths)


def test_fixed_pool_fractional_stride_raises(rng):
    ch = FixedPoolChunker(d_model=8, N=1.5)
    with pytest.raises(ValueError, match="integer stride"):
        ch.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))


def test_fixed_pool_matches_mean_oracle(rng):
    ch = FixedPoolChunker(d_model=4, N=3)
    x = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 8 + [0] * 2], bool))
    params = ch.init(jax.random.PRNGKey(0), x, mask)
    co = ch.apply(params, x, mask, method="chunk")
    xv = np.asarray(x)[0]
    np.testing.assert_allclose(np.asarray(co.z[0, 0]), xv[0:3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(co.z[0, 1]), xv[3:6].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(co.z[0, 2]), xv[6:8].mean(0), rtol=1e-5)
    assert np.asarray(co.z_mask)[0].sum() == 3
    # dechunk broadcasts windows back
    y = ch.apply(params, co.z, co, method="dechunk")
    np.testing.assert_allclose(np.asarray(y[0, 4]), np.asarray(co.z[0, 1]), rtol=1e-5)


def test_fixed_vs_dynamic_n1_identical(rng):
    """The N=1 no-chunk control is the same passthrough under both chunkers."""
    x = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    mask = jnp.ones((2, 12), bool)
    dyn = DynamicChunker(d_model=8, N=1)
    fix = FixedPoolChunker(d_model=8, N=1)
    pd = dyn.init(jax.random.PRNGKey(0), x, mask)
    pf = fix.init(jax.random.PRNGKey(0), x, mask)
    a = dyn.apply(pd, x, mask, method="chunk")
    b = fix.apply(pf, x, mask, method="chunk")
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_typeb_with_bf16_storage_knobs_finite(rng):
    """Type B (nested sqrt-N chunkers) trains finitely with the production
    bf16 storage knobs (ssd_intra_dtype + ssd_out_compute_dtype)."""
    import jax
    import numpy as np
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = {"encoder": "dcasr", "head": "ctc",
           "frontend_conf": {"n_mels": 20},
           "train": {"precision": "bf16"},
           "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                            "n_main": 1, "n_dec": 1, "n_mid": 1,
                            "arch_type": "B", "d_state": 8, "headdim": 8,
                            "ssd_chunk_size": 16, "ssd_intra_dtype": "bf16",
                            "ssd_out_compute_dtype": True,
                            "hnet": {"compression_N": 4}},
           "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0}}
    model = build_model(cfg, 12)
    params = model.init_params(jax.random.PRNGKey(0))
    wave = rng.normal(size=(2, 8000)).astype(np.float32) * 0.1
    batch = {"wave": wave, "wave_lens": np.array([8000, 6100], np.int32),
             "tokens": np.array([[4, 5], [6, 0]], np.int32),
             "token_lens": np.array([2, 1], np.int32),
             "row_mask": np.array([True, True])}
    loss, _ = model.loss_fn(params, batch, 0, True)
    g = jax.grad(lambda p: model.loss_fn(p, batch, 0, True)[0])(params)
    gsum = float(jax.tree_util.tree_reduce(
        lambda a, b: a + np.abs(np.asarray(b, np.float32)).sum(), g, 0.0))
    assert np.isfinite(float(loss)) and np.isfinite(gsum)
