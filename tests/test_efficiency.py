"""Analytic efficiency accounting pinned against instantiated flax modules:
closed-form param counts must equal real init() counts across the architecture
matrix; FLOP policy sanity; report shape."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.eval.efficiency import (
    ASSUMPTIONS, chunker_params, conv_subsample_params, count_params,
    efficiency_report, encoder_flops, encoder_params, format_efficiency,
    head_params, mamba2_flops_per_token, mamba2_params, mamba_stack_params,
    subsampled_frames,
)
from hnet_mamba_asr_tpu.models.encoder import ConvSubsampling4, DCASREncoder
from hnet_mamba_asr_tpu.models.mamba2 import Mamba2
from hnet_mamba_asr_tpu.models.mamba_block import MambaStack


def test_mamba2_params_exact():
    for d_model, d_state, headdim in [(16, 8, 8), (32, 16, 8), (64, 128, 64)]:
        m = Mamba2(d_model=d_model, d_state=d_state, headdim=headdim)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, d_model)))
        assert count_params(params) == mamba2_params(
            d_model, d_state=d_state, headdim=headdim)


@pytest.mark.parametrize("bidir", [True, False])
def test_stack_params_exact(bidir):
    stack = MambaStack(n_layers=2, d_model=16, bidirectional=bidir,
                       d_state=8, headdim=8)
    params = stack.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))
    assert count_params(params) == mamba_stack_params(
        2, 16, bidir, d_state=8, headdim=8)


def test_conv_subsample_params_exact():
    sub = ConvSubsampling4(n_mels=20, d_model=16)
    params = sub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20)),
                      jnp.asarray([16]))
    assert count_params(params) == conv_subsample_params(20, 16)


@pytest.mark.parametrize("arch,N,chunker", [("A", 1, "dynamic"), ("A", 2, "dynamic"),
                                            ("A", 2, "fixed"), ("B", 4, "dynamic")])
def test_encoder_params_exact(arch, N, chunker):
    enc_conf = {"arch_type": arch, "d_outer": 16, "d_main": 24, "n_enc": 1,
                "n_main": 2, "n_dec": 1, "n_mid": 1, "bidirectional": True,
                "d_state": 8, "headdim": 8,
                "hnet": {"compression_N": N, "chunker": chunker}}
    enc = DCASREncoder(n_mels=20, d_outer=16, d_main=24, n_enc=1, n_main=2,
                       n_dec=1, n_mid=1, arch_type=arch, N=N, chunker=chunker,
                       d_state=8, headdim=8, chunk_size=16)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 20)),
                      jnp.asarray([40]))
    analytic = encoder_params(enc_conf, n_mels=20)
    # the closed forms assume the production Mamba2 defaults; recompute with
    # the test dims by passing them through the stack formulas
    from hnet_mamba_asr_tpu.eval import efficiency as eff
    kw = dict(d_state=8, headdim=8)
    br = {"subsample": eff.conv_subsample_params(20, 16),
          "enc_stack": eff.mamba_stack_params(1, 16, True, **kw),
          "dec_stack": eff.mamba_stack_params(1, 16, True, **kw)}
    if arch == "A":
        br["chunker"] = eff.chunker_params(chunker, 16, N)
        br["projections"] = (16 * 24 + 24) + (24 * 16 + 16)
        br["main_stack"] = eff.mamba_stack_params(2, 24, True, **kw)
    else:
        nb = N ** 0.5
        br["chunker"] = (eff.chunker_params(chunker, 16, nb)
                         + eff.chunker_params(chunker, 24, nb))
        br["projections"] = (16 * 24 + 24) + (24 * 16 + 16)
        br["mid_stack"] = eff.mamba_stack_params(1, 24, True, **kw)
        br["main_stack"] = eff.mamba_stack_params(2, 24, True, **kw)
        br["mid_dec_stack"] = eff.mamba_stack_params(1, 24, True, **kw)
    assert count_params(params) == sum(br.values())
    assert set(analytic["breakdown"]) == set(br)        # same stage taxonomy


def test_small_config_params_match_reference_scale():
    """The production Small config must land at the documented 78.9M total
    (61.7M encoder + 16.9M AED + 0.2M CTC at V=500; BASELINE.md)."""
    enc_conf = {"arch_type": "A", "d_outer": 384, "d_main": 512, "n_enc": 4,
                "n_main": 12, "n_dec": 4, "bidirectional": True,
                "hnet": {"compression_N": 1}}
    cfg = {"encoder_conf": enc_conf,
           "model_conf": {"ctc_weight": 0.3, "aed_weight": 0.7},
           "aed_conf": {"n_layers": 6, "n_heads": 4, "d_ff": 2048}}
    p_enc = encoder_params(enc_conf)["total"]
    heads = head_params(cfg, 500)
    assert p_enc == pytest.approx(61.7e6, rel=0.02)
    assert heads["aed_head"] == pytest.approx(16.9e6, rel=0.03)
    assert heads["ctc_head"] == pytest.approx(0.2e6, rel=0.05)
    assert p_enc + heads["aed_head"] + heads["ctc_head"] == pytest.approx(
        78.9e6, rel=0.02)


def test_flops_structure():
    enc_conf = {"arch_type": "A", "d_outer": 384, "d_main": 512, "n_enc": 4,
                "n_main": 12, "n_dec": 4, "bidirectional": True,
                "hnet": {"compression_N": 2}}
    f = encoder_flops(enc_conf, n_frames=1000)
    assert f["frames_25hz"] == subsampled_frames(1000)
    assert f["kept_fractions"] == [0.5]
    assert f["breakdown"]["router"] > 0                # dynamic N=2: router active
    assert f["breakdown"]["ema"] > 0
    # N=1 deactivates router/EMA
    enc_conf["hnet"]["compression_N"] = 1
    f1 = encoder_flops(enc_conf, n_frames=1000)
    assert f1["breakdown"]["router"] == 0.0
    assert f1["breakdown"]["ema"] == 0.0
    assert f1["breakdown"]["main_stack"] > f["breakdown"]["main_stack"]  # no compression
    with pytest.raises(ValueError, match="kept fraction"):
        encoder_flops(enc_conf, 1000, kept_fractions=[1.5])


def test_flops_per_token_formula():
    # d=384 defaults: d_inner=768, H=12, d_in_proj=1804? recompute by hand
    d_inner = 768
    nheads = 12
    d_in_proj = 2 * d_inner + 2 * 128 + nheads
    conv_dim = d_inner + 2 * 128
    macs = 384 * d_in_proj + conv_dim * 4 + 2 * d_inner * 128 + d_inner * 384
    assert mamba2_flops_per_token(384) == 2.0 * macs


def test_report_and_format():
    cfg = {"encoder_conf": {"arch_type": "A", "d_outer": 16, "d_main": 24,
                            "n_enc": 1, "n_main": 1, "n_dec": 1,
                            "d_state": 8, "headdim": 8,
                            "hnet": {"compression_N": 1}},
           "frontend_conf": {"n_mels": 20},
           "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0}}
    rep = efficiency_report(cfg, vocab_size=16, audio_seconds=2.0)
    assert rep["params"]["total"] > 0
    assert rep["flops"]["gflops_total"] > 0
    assert rep["assumptions"] == ASSUMPTIONS
    text = format_efficiency(rep)
    assert "params" in text and "GFLOPs" in text
    with pytest.raises(ValueError, match="positive"):
        efficiency_report(cfg, 16, audio_seconds=0)


def test_chunker_params_rules():
    assert chunker_params("dynamic", 16, 2) == 2 * 16 * 16
    assert chunker_params("dynamic", 16, 1) == 0
    assert chunker_params("fixed", 16, 4) == 0


def test_large_config_params_match_reference_scale():
    """configs/typeA_large_N1.yaml must land at the reference's documented
    Large scale: ~185M encoder at d_outer 512 / d_main 768, layers 6/18/6
    (reference docs/experimental_plan.md:120-125, README.md:41). The shipped
    YAML is loaded, not a copy of its dims, so the recipe stays pinned."""
    from pathlib import Path
    from hnet_mamba_asr_tpu.utils.config import load_config
    repo = Path(__file__).resolve().parent.parent
    cfg = load_config(str(repo / "configs" / "typeA_large_N1.yaml"), [])
    p_enc = encoder_params(cfg["encoder_conf"])["total"]
    assert p_enc == pytest.approx(185e6, rel=0.01)
    heads = head_params({"encoder_conf": cfg["encoder_conf"],
                         "model_conf": cfg["model_conf"],
                         "aed_conf": cfg["aed_conf"]}, 500)
    assert heads["aed_head"] > 0 and heads["ctc_head"] > 0
