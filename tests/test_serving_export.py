"""Serving export: AOT StableHLO artifacts round-trip exactly and load
WITHOUT the framework (runtime.py is self-contained — proven by running it
in a subprocess with the repo stripped from sys.path).

Beyond-reference capability: the reference deploys by shipping its source
tree + torch checkpoints (no export path exists)."""
import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

import jax  # noqa: E402  (conftest pins the cpu platform)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 0.5, "aed_weight": 0.5,
                         "lsm_weight": 0.1}
    # fp32: the exported program and the live jit compile with different
    # fusion orders, so parity is only bit-tight at fp32 (at bf16 the same
    # comparison shows ~1e-2 rounding noise, which would mask real bugs)
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path_factory.mktemp("art") / "artifact"
    save_serving_artifact(art, model, params,
                          buckets=[(2, 4000), (4, 8000)],
                          emit=("frame_ids", "log_probs", "aed_ids"))
    return model, params, art


def _wave(B=2, S=3500, seed=0):
    rng = np.random.default_rng(seed)
    wave = (rng.normal(size=(B, S)) * 0.1).astype(np.float32)
    lens = np.array([S, S - 900][:B], np.int32)
    return wave, lens


def test_ctc_ids_match_live_greedy(served):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    model, params, art = served
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    ids = sm.transcribe_ids(wave, lens)
    # live model runs on the same padded shape the bucket imposes
    live = model.greedy_decode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1]))),
                 "wave_lens": lens})
    assert ids == live


def test_log_probs_match_live(served):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    model, params, art = served
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    out = sm(wave, lens)
    enc = model.encode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1]))),
                 "wave_lens": lens})
    live = model.ctc.apply({"params": params["ctc"]}, enc.features,
                           method="log_probs")
    np.testing.assert_allclose(out["log_probs"], np.asarray(live),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(out["enc_lengths"], np.asarray(enc.lengths))


def test_bucket_padding_slices_back(served):
    """B=1 request pads to the (2, 4000) bucket and slices outputs to B=1,
    equal to row 0 of the full-bucket call."""
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    _, _, art = served
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    full = sm(wave, lens)
    one = sm(wave[:1], lens[:1])
    assert one["frame_ids"].shape[0] == 1
    np.testing.assert_array_equal(one["frame_ids"], full["frame_ids"][:1])
    np.testing.assert_array_equal(one["enc_lengths"], full["enc_lengths"][:1])


def test_bucket_selection_and_overflow(served):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    _, _, art = served
    sm = load_serving_artifact(art)
    assert sm.buckets == [(2, 4000), (4, 8000)]
    # 3 rows need the (4, 8000) bucket
    wave = np.zeros((3, 5000), np.float32)
    out = sm(wave, np.full(3, 5000, np.int32))
    assert out["frame_ids"].shape[0] == 3
    with pytest.raises(ValueError, match="no bucket fits"):
        sm(np.zeros((5, 4000), np.float32), np.full(5, 4000, np.int32))
    with pytest.raises(ValueError, match="no bucket fits"):
        sm(np.zeros((1, 9000), np.float32), np.full(1, 9000, np.int32))


def test_emit_validation():
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}  # no AED head
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="aed_ids requires"):
        save_serving_artifact("/tmp/_nope", model, params, [(1, 4000)],
                              emit=("aed_ids",))
    with pytest.raises(ValueError, match="unknown emit"):
        save_serving_artifact("/tmp/_nope", model, params, [(1, 4000)],
                              emit=("beams",))
    with pytest.raises(ValueError, match="duplicate buckets"):
        save_serving_artifact("/tmp/_nope", model, params,
                              [(1, 4000), (1, 4000)], emit=("frame_ids",))


def test_format_version_mismatch_raises(served, tmp_path):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    _, _, art = served
    bad = tmp_path / "bad"
    shutil.copytree(art, bad)
    m = json.loads((bad / "manifest.json").read_text())
    m["format_version"] = 999
    (bad / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="artifact format"):
        load_serving_artifact(bad)


def test_runtime_is_standalone(served, tmp_path):
    """Copy ONLY runtime.py + the artifact to a scratch dir and transcribe
    from a subprocess whose sys.path excludes the repo: the deployment story
    is one file + jax + numpy."""
    model, params, art = served
    shutil.copy(REPO / "hnet_mamba_asr_tpu" / "serving" / "runtime.py",
                tmp_path / "runtime.py")
    wave, lens = _wave()
    np.save(tmp_path / "wave.npy", wave)
    np.save(tmp_path / "lens.npy", lens)
    driver = tmp_path / "drive.py"
    driver.write_text(
        "import json, sys\n"
        "bad = [p for p in sys.path if 'repo' in p]\n"
        "assert not bad, f'repo leaked into sys.path: {bad}'\n"
        "import numpy as np, runtime\n"
        f"m = runtime.load_serving_artifact({str(art)!r})\n"
        "wave = np.load('wave.npy'); lens = np.load('lens.npy')\n"
        "print(json.dumps(m.transcribe_ids(wave, lens)))\n")
    env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "HOME": "/root", "PYTHONPATH": ""}
    r = subprocess.run([sys.executable, "drive.py"], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    ids = json.loads(r.stdout.strip().splitlines()[-1])
    live = model.greedy_decode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1]))),
                 "wave_lens": lens})
    assert ids == live


def test_params_to_tree_roundtrip():
    from hnet_mamba_asr_tpu.serving.runtime import params_to_tree
    from hnet_mamba_asr_tpu.training.checkpoint import tree_to_path_dict
    tree = {"a": {"b": np.arange(3), "c": {"d": np.ones((2, 2))}},
            "e": np.zeros(1)}
    flat = tree_to_path_dict(tree)
    back = params_to_tree(flat)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(tree)
    for x, y in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(x, y)
    with pytest.raises(ValueError, match="unparseable"):
        params_to_tree({"noformat": np.zeros(1)})


# ── int8 weight-only quantization ───────────────────────────────────────────

def test_quantize_tree_error_bound_and_selectivity():
    from hnet_mamba_asr_tpu.serving.quant import (
        dequantize_tree, quantization_error, quantize_tree)
    rng = np.random.default_rng(0)
    params = {"proj": {"kernel": rng.normal(size=(128, 64)).astype(np.float32),
                       "bias": rng.normal(size=(64,)).astype(np.float32)},
              "tiny": rng.normal(size=(4, 4)).astype(np.float32),
              "step": np.array(3, np.int32)}
    q = quantize_tree(params, min_size=1024)
    assert set(q["proj"]["kernel"]) == {"~q8", "~scale"}
    assert q["proj"]["kernel"]["~q8"].dtype == np.int8
    # small/1-D/int leaves untouched
    np.testing.assert_array_equal(q["proj"]["bias"], params["proj"]["bias"])
    np.testing.assert_array_equal(q["tiny"], params["tiny"])
    assert q["step"] == 3
    # symmetric absmax: per-channel relative error <= 1/254 (half an lsb)
    assert quantization_error(params, q) <= 1.0 / 254 + 1e-6
    dq = dequantize_tree(q)
    err = np.abs(np.asarray(dq["proj"]["kernel"]) - params["proj"]["kernel"])
    amax = np.abs(params["proj"]["kernel"]).max(axis=0)
    assert (err <= amax / 254 + 1e-6).all()


def test_int8_artifact_smaller_and_outputs_close(served, tmp_path):
    """int8 export: params.npz shrinks ~4x for the quantized mass and
    log-posteriors stay within the quantization noise of the fp artifact
    (same traced program modulo the fused dequant)."""
    from hnet_mamba_asr_tpu.serving import (load_serving_artifact,
                                            save_serving_artifact)
    model, params, art = served
    q_art = tmp_path / "q"
    save_serving_artifact(q_art, model, params, buckets=[(2, 4000)],
                          emit=("frame_ids", "log_probs"), quantize="int8",
                          quantize_min_size=256)   # tiny model, tiny weights
    man = json.loads((q_art / "manifest.json").read_text())
    assert man["quantize"] == "int8"
    fp_bytes = (art / "params.npz").stat().st_size
    q_bytes = (q_art / "params.npz").stat().st_size
    assert q_bytes < 0.65 * fp_bytes          # tiny model: much fp32 remains
    # ... and the quantized mass itself shrank ~4x: verify per-leaf
    with np.load(q_art / "params.npz") as z:
        assert any(z[k].dtype == np.int8 for k in z.files)

    sm_fp = load_serving_artifact(art)
    sm_q = load_serving_artifact(q_art)
    wave, lens = _wave()
    out_fp = sm_fp(wave, lens)
    out_q = sm_q(wave, lens)
    np.testing.assert_array_equal(out_q["enc_lengths"], out_fp["enc_lengths"])
    # log-softmax output: absolute tolerance, int8 weight noise compounds
    # through ~4 matmul layers of this tiny net
    np.testing.assert_allclose(out_q["log_probs"], out_fp["log_probs"],
                               atol=0.35)
    # quantized serving is itself deterministic
    out_q2 = sm_q(wave, lens)
    np.testing.assert_array_equal(out_q["log_probs"], out_q2["log_probs"])


def test_quantize_unknown_mode_raises(served):
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    model, params, _ = served
    with pytest.raises(ValueError, match="quantize"):
        save_serving_artifact("/tmp/_nope", model, params, [(1, 4000)],
                              quantize="int4")


def test_multi_platform_export(served, tmp_path):
    """platforms=('cpu','tpu') lowers both targets into one artifact (export
    on a CPU build host, serve on TPU pods); it still runs here on cpu."""
    from hnet_mamba_asr_tpu.serving import (load_serving_artifact,
                                            save_serving_artifact)
    model, params, art = served
    mp = tmp_path / "mp"
    save_serving_artifact(mp, model, params, buckets=[(2, 4000)],
                          emit=("frame_ids",), platforms=("cpu", "tpu"))
    man = json.loads((mp / "manifest.json").read_text())
    assert man["platforms"] == ["cpu", "tpu"]
    sm = load_serving_artifact(mp)
    ref = load_serving_artifact(art)
    wave, lens = _wave()
    assert sm.transcribe_ids(wave, lens) == ref.transcribe_ids(wave, lens)


def test_collapse_ctc_edge_cases():
    """Runtime's CTC collapse: repeats merge, blanks drop, blank separates
    repeats, and only the valid span counts."""
    from hnet_mamba_asr_tpu.serving.runtime import collapse_ctc
    blank = 9
    ids = np.array([
        [1, 1, 9, 1, 2, 2, 9, 9, 3],     # 1,(blank),1,2,3 -> [1,1,2,3]
        [9, 9, 9, 9, 9, 9, 9, 9, 9],     # all blank -> []
        [4, 4, 4, 4, 5, 9, 5, 5, 7],     # past-length tail ignored
    ])
    lens = np.array([9, 9, 5])
    out = collapse_ctc(ids, lens, blank)
    assert out == [[1, 1, 2, 3], [], [4, 5]]
    assert collapse_ctc(ids[:1], np.array([0]), blank) == [[]]


def test_serving_model_rejects_empty_and_reports_buckets(served, tmp_path):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    _, _, art = served
    bad = tmp_path / "empty"
    shutil.copytree(art, bad)
    m = json.loads((bad / "manifest.json").read_text())
    m["buckets"] = []
    (bad / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="no shape buckets"):
        load_serving_artifact(bad)
    sm = load_serving_artifact(art)
    with pytest.raises(ValueError, match="frame_ids"):
        # an artifact emitting frame_ids: transcribe works; fake a manifest
        # without it to hit the guard
        object.__setattr__(sm, "emit", ("log_probs",))
        sm.transcribe_ids(np.zeros((1, 4000), np.float32),
                          np.array([4000], np.int32))


def test_aed_ids_match_live_greedy(served):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    model, params, art = served
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    out = sm(wave, lens)
    enc = model.encode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1]))),
                 "wave_lens": lens})
    live = model.aed.apply({"params": params["aed"]}, enc.features,
                           enc.lengths, method="greedy_decode")
    np.testing.assert_array_equal(out["aed_ids"], np.asarray(live))


def test_export_n2_dynamic_chunking_model(tmp_path):
    """The dynamic H-Net chunking path (router + one-hot scatter + EMA)
    exports and serves: ids == live greedy on an N=2 model."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import (load_serving_artifact,
                                            save_serving_artifact)
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"],
                               hnet={"compression_N": 2})
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(2))
    art = save_serving_artifact(tmp_path / "n2", model, params,
                                buckets=[(2, 4000)], emit=("frame_ids",))
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    ids = sm.transcribe_ids(wave, lens)
    live = model.greedy_decode(
        params, {"wave": np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1]))),
                 "wave_lens": lens})
    assert ids == live


def test_quantize_zero_channel_roundtrips():
    """A dead output channel (all-zero weights) must not divide by zero and
    must reconstruct exactly."""
    from hnet_mamba_asr_tpu.serving.quant import dequantize_tree, quantize_tree
    w = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    w[:, 7] = 0.0
    q = quantize_tree({"k": w}, min_size=16)
    assert q["k"]["~scale"][7] == 1.0
    dq = np.asarray(dequantize_tree(q)["k"])
    np.testing.assert_array_equal(dq[:, 7], 0.0)
    assert np.isfinite(dq).all()


def test_export_cli_bad_bucket_string_exits(tmp_path):
    import sys as _sys
    _sys.path.insert(0, str(REPO / "scripts"))
    import export_serving
    args = export_serving.parse_args(
        ["--config", "x.yaml", "--checkpoint", "y.ckpt",
         "--out", str(tmp_path), "--buckets", "8by160000"])
    with pytest.raises(SystemExit):
        export_serving.run(args)


def test_bucket_too_small_raises(served):
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    model, params, _ = served
    with pytest.raises(ValueError, match="400"):
        save_serving_artifact("/tmp/_nope", model, params, [(1, 100)],
                              emit=("frame_ids",))


# ── streaming serving artifacts ─────────────────────────────────────────────

@pytest.fixture(scope="module")
def stream_served(tmp_path_factory):
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import save_streaming_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path_factory.mktemp("sart") / "stream"
    save_streaming_artifact(art, model, params, block_enc=8)
    return model, params, art


def test_streaming_serve_matches_offline_greedy(stream_served):
    """Tokens streamed through the exported step (ragged block sizes) ==
    offline greedy decode — the CausalStreamingEncoder exactness carried
    through export."""
    from hnet_mamba_asr_tpu.serving import load_streaming_artifact
    model, params, art = stream_served
    sm = load_streaming_artifact(art)
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=12000) * 0.1).astype(np.float32)
    toks, i = [], 0
    for sz in [700, 1300, 2500, 333, 4000, 2000, 1167]:
        toks += sm.feed(wave[i:i + sz]); i += sz
    toks += sm.feed(wave[i:]) + sm.finish()
    live = model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})
    assert toks == live[0]

    # reset() makes the session reusable and deterministic
    sm.reset()
    toks2 = sm.feed(wave) + sm.finish()
    assert toks2 == live[0]


def test_streaming_artifact_kind_checks(stream_served, served):
    from hnet_mamba_asr_tpu.serving import (load_serving_artifact,
                                            load_streaming_artifact)
    _, _, sart = stream_served
    _, _, oart = served
    with pytest.raises(ValueError, match="not a streaming artifact"):
        load_streaming_artifact(oart)
    with pytest.raises(KeyError):
        load_serving_artifact(sart)          # no offline buckets inside


def test_streaming_runtime_is_standalone(stream_served, tmp_path):
    """The SAME single runtime.py serves the streaming artifact from a
    repo-stripped subprocess."""
    model, params, art = stream_served
    shutil.copy(REPO / "hnet_mamba_asr_tpu" / "serving" / "runtime.py",
                tmp_path / "runtime.py")
    rng = np.random.default_rng(1)
    wave = (rng.normal(size=9000) * 0.1).astype(np.float32)
    np.save(tmp_path / "wave.npy", wave)
    (tmp_path / "drive.py").write_text(
        "import json, sys\n"
        "bad = [p for p in sys.path if 'repo' in p]\n"
        "assert not bad, bad\n"
        "import numpy as np, runtime\n"
        f"m = runtime.load_streaming_artifact({str(art)!r})\n"
        "w = np.load('wave.npy')\n"
        "toks = m.feed(w[:4000]) + m.feed(w[4000:]) + m.finish()\n"
        "print(json.dumps(toks))\n")
    env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "HOME": "/root", "PYTHONPATH": ""}
    r = subprocess.run([sys.executable, "drive.py"], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    toks = json.loads(r.stdout.strip().splitlines()[-1])
    live = model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})
    assert toks == live[0]


def test_params_to_tree_list_indices():
    """'[0]' path segments rebuild LISTS (state pytrees carry per-layer
    lists); non-contiguous indices fail loudly."""
    from hnet_mamba_asr_tpu.serving.runtime import params_to_tree
    from hnet_mamba_asr_tpu.training.checkpoint import tree_to_path_dict
    tree = {"enc": [{"conv": np.ones((2, 3)), "ssd": np.zeros(4)},
                    {"conv": np.full((2, 3), 2.0), "ssd": np.ones(4)}],
            "flag": np.array([True])}
    back = params_to_tree(tree_to_path_dict(tree))
    assert isinstance(back["enc"], list) and len(back["enc"]) == 2
    np.testing.assert_array_equal(back["enc"][1]["conv"], tree["enc"][1]["conv"])
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(tree)
    with pytest.raises(ValueError, match="non-contiguous"):
        params_to_tree({"['a'][0]": np.zeros(1), "['a'][2]": np.zeros(1)})


def test_streaming_export_cli(tmp_path):
    """--streaming through the real CLI: config + ckpt -> artifact -> served
    tokens == offline greedy."""
    import sys as _sys
    _sys.path.insert(0, str(REPO / "scripts"))
    import export_serving
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.serving import load_streaming_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.training.checkpoint import save_checkpoint

    tok = Tokenizer.train(["aa bb cc", "bb cc aa"], tmp_path / "bpe",
                          vocab_size=16, hard_vocab_limit=False)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(f"""
bpemodel: {tmp_path}/bpe.model
frontend_conf: {{n_mels: 20}}
encoder: dcasr
encoder_conf: {{arch_type: A, d_outer: 16, d_main: 24, n_enc: 1, n_main: 1,
                n_dec: 1, d_state: 8, headdim: 8, ssd_chunk_size: 16,
                bidirectional: false, hnet: {{compression_N: 1}}}}
head: ctc
model_conf: {{ctc_weight: 1.0, aed_weight: 0.0}}
train: {{precision: fp32}}
""")
    from hnet_mamba_asr_tpu.utils.config import load_config
    cfg = load_config(cfg_path, [])
    model = build_model(cfg, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, {"params": params, "epoch": 0, "global_step": 0})

    export_serving.run(export_serving.parse_args(
        ["--config", str(cfg_path), "--checkpoint", str(ckpt),
         "--out", str(tmp_path / "art"), "--streaming", "8"]))
    sm = load_streaming_artifact(tmp_path / "art")
    rng = np.random.default_rng(5)
    wave = (rng.normal(size=10000) * 0.1).astype(np.float32)
    toks = sm.feed(wave) + sm.finish()
    live = model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})
    assert toks == live[0]


def test_moe_model_exports_and_matches_live(tmp_path):
    """An MoE AED decoder (models/moe.py) lowers through jax.export AOT and
    the served aed_ids match the live greedy decode — the deployment story
    covers the expert plane (routing is deterministic, so AOT == live)."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 0.5, "aed_weight": 0.5,
                         "lsm_weight": 0.1}
    cfg["train"] = {"precision": "fp32"}
    cfg["aed_conf"]["moe"] = {"n_experts": 4, "top_k": 2,
                              "capacity_factor": 2.0, "aux_weight": 0.01}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "artifact"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("frame_ids", "aed_ids"))
    sm = load_serving_artifact(art)
    rng = np.random.default_rng(3)
    wave = (rng.normal(size=(2, 4000)) * 0.1).astype(np.float32)
    lens = np.array([4000, 3100], np.int32)
    out = sm(wave, lens)
    live = model.greedy_decode(params, {"wave": wave, "wave_lens": lens})
    ids = sm.transcribe_ids(wave, lens)
    assert ids == live
    enc = model.encode(params, {"wave": wave, "wave_lens": lens})
    live_aed = model.aed.apply({"params": params["aed"]}, enc.features,
                               enc.lengths, method="greedy_decode")
    np.testing.assert_array_equal(out["aed_ids"], np.asarray(live_aed))


def test_streaming_export_n2_dynamic_chunking(tmp_path):
    """Exact-causal streaming export at N=2 (dynamic chunking): the AOT
    streaming step carries router/EMA/compacted-stack state and the served
    token stream equals the offline greedy decode."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import (
        load_streaming_artifact, save_streaming_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False,
                               hnet={"compression_N": 2})
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "stream_n2"
    save_streaming_artifact(art, model, params, block_enc=8)
    sm = load_streaming_artifact(art)
    rng = np.random.default_rng(11)
    wave = (rng.normal(size=9000) * 0.1).astype(np.float32)
    toks = []
    for lo in range(0, len(wave), 1600):        # ragged 100 ms pushes
        toks += sm.feed(wave[lo:lo + 1600])
    toks += sm.finish()
    live = model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})
    assert toks == live[0]


def test_beam_ids_export_matches_live_device_beam(tmp_path):
    """emit=("beam_ids",): the AOT program embeds the frame-synchronous CTC
    prefix beam; served ids == the live device beam engine on the same
    padded shapes (reference beam semantics: src/dcasr/decoders/ctc.py)."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
        ctc_beam_search_device,
    )
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "beam_art"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("frame_ids", "beam_ids"),
                          beam_size=4, pre_beam=8)
    sm = load_serving_artifact(art)
    assert sm.manifest["beam"] == {"beam_size": 4, "pre_beam": 8}
    wave, lens = _wave()
    ids = sm.transcribe_ids(wave, lens)          # prefers beam_ids

    padded = np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1])))
    enc = model.encode(params, {"wave": padded, "wave_lens": lens})
    lp = model.ctc.apply({"params": params["ctc"]}, enc.features,
                         method="log_probs")
    live = ctc_beam_search_device(np.asarray(lp), np.asarray(enc.lengths),
                                  blank_id=model.ctc.blank_id,
                                  beam_size=4, pre_beam=8)
    assert ids == live


def test_beam_ids_requires_ctc_head():
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 0.0, "aed_weight": 1.0}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="beam_ids require"):
        save_serving_artifact("/tmp/_nope_beam", model, params, [(1, 4000)],
                              emit=("beam_ids",))


def test_beam_ids_compose_with_int8_quantization(tmp_path):
    """int8 weight-only quantization + the in-program prefix beam: the
    quantized artifact decodes through the beam and matches the live device
    beam run on the SAME quantized weights (dequantize traced in-program)."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
        ctc_beam_search_device,
    )
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.serving.quant import (
        dequantize_tree, quantize_tree,
    )
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "beam_q8"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("beam_ids",), beam_size=4, pre_beam=8,
                          quantize="int8", quantize_min_size=64)
    sm = load_serving_artifact(art)
    wave, lens = _wave()
    ids = sm.transcribe_ids(wave, lens)

    qparams = dequantize_tree(quantize_tree(
        jax.tree_util.tree_map(np.asarray, params), min_size=64))
    padded = np.pad(wave, ((0, 0), (0, 4000 - wave.shape[1])))
    enc = model.encode(qparams, {"wave": padded, "wave_lens": lens})
    lp = model.ctc.apply({"params": qparams["ctc"]}, enc.features,
                         method="log_probs")
    live = ctc_beam_search_device(np.asarray(lp), np.asarray(enc.lengths),
                                  blank_id=model.ctc.blank_id,
                                  beam_size=4, pre_beam=8)
    assert ids == live
