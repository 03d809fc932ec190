"""Pipeline parallelism (parallel/pipeline.py): the pipelined main stack is
exact vs the plain encoder — forward, grads, one optimizer step — including
CHUNKED configs (N > 1), since only the MambaStack call is re-plumbed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnet_mamba_asr_tpu.parallel.mesh import make_mesh
from hnet_mamba_asr_tpu.parallel.pipeline import (PPModel, pp_encode,
                                                  pp_loss_fn, pp_stack_apply,
                                                  stack_block_params)
from hnet_mamba_asr_tpu.tasks.asr_task import build_model

VOCAB = 40


def _config(bidirectional=True, N=1, n_main=4):
    return {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 24, "win_length": 400, "hop_length": 160},
        "encoder_conf": {"d_outer": 24, "d_main": 36, "n_enc": 1,
                         "n_main": n_main, "n_dec": 1, "arch_type": "A",
                         "d_state": 16, "headdim": 12, "ssd_chunk_size": 16,
                         "bidirectional": bidirectional,
                         "hnet": {"compression_N": N}},
        "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 48, "dropout": 0.0},
        "model_conf": {"ctc_weight": 0.3, "aed_weight": 0.7, "lsm_weight": 0.1},
        "train": {"precision": "fp32"},
    }


def _batch(B, T_mel, lens_mel, seed=0):
    rng = np.random.default_rng(seed)
    n_samples = (T_mel - 1) * 160 + 400
    wave = (rng.normal(size=(B, n_samples)) * 0.1).astype(np.float32)
    wave_lens = np.asarray([(l - 1) * 160 + 400 for l in lens_mel], np.int32)
    for b, wl in enumerate(wave_lens):
        wave[b, wl:] = 0.0
    return {
        "wave": wave, "wave_lens": wave_lens,
        "tokens": rng.integers(4, VOCAB, size=(B, 6)).astype(np.int32),
        "token_lens": np.full(B, 6, np.int32),
        "row_mask": np.ones(B, bool),
        "aug_ref": np.array([0, 0], np.int32),
        "item_index": np.arange(B, dtype=np.int32),
    }


def _setup(cfg, B=4, T_mel=64, lens_mel=(64, 50, 40, 57), seed=0):
    model = build_model(cfg, VOCAB)
    params = model.init_params(jax.random.PRNGKey(1))
    batch = _batch(B, T_mel, list(lens_mel), seed)
    feats, flens = model.features(batch, train=False)
    return model, params, batch, feats, flens


def _err(a, b, lengths=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if lengths is not None:
        mask = (np.arange(a.shape[1])[None, :]
                < np.asarray(lengths)[:, None])[..., None]
        a, b = a * mask, b * mask
    denom = max(np.abs(b).max(), 1e-6)
    return np.abs(a - b).max() / denom


@pytest.mark.parametrize("bidirectional", [False, True])
def test_pp_stack_exact(bidirectional):
    """pp_stack_apply == MambaStack.apply on the raw stack."""
    from hnet_mamba_asr_tpu.models.mamba_block import MambaStack
    mesh = make_mesh(4, tp=4, tp_axis="pp")          # (dp=1, pp=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 24, 36)).astype(np.float32))
    lengths = jnp.asarray([24, 17, 9, 22], jnp.int32)
    stack = MambaStack(4, 36, bidirectional=bidirectional, d_state=16,
                       headdim=12, chunk_size=16, remat=False)
    p = stack.init(jax.random.PRNGKey(0), x, lengths)["params"]
    ref = stack.apply({"params": p}, x, lengths)
    got = pp_stack_apply(p, x, lengths, mesh, n_layers=4,
                         bidirectional=bidirectional, chunk_size=16,
                         dtype=jnp.float32, intra_dtype=None,
                         out_compute=False)
    assert _err(got, ref) < 2e-5


@pytest.mark.parametrize("N", [1, 4])
def test_pp_encode_exact(N):
    """Full encoder with pipelined main stack == offline — incl. dynamic
    chunking (N=4), which SP cannot do."""
    model, params, batch, feats, flens = _setup(_config(True, N=N))
    mesh = make_mesh(4, tp=4, tp_axis="pp")
    off = model.encoder.apply({"params": params["encoder"]}, feats, flens)
    out = pp_encode(model, params, feats, flens, mesh)
    assert _err(out.features, off.features, off.lengths) < 2e-4
    assert float(out.ratio_loss) == pytest.approx(float(off.ratio_loss),
                                                  abs=1e-6)


def test_pp_loss_and_grads_match():
    model, params, batch, feats, flens = _setup(_config(True, N=4))
    mesh = make_mesh(4, tp=4, tp_axis="pp")

    l0, g0 = jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, 0, False)[0])(params)
    l1, g1 = jax.value_and_grad(
        lambda p: pp_loss_fn(model, p, batch, 0, False, mesh)[0])(params)
    assert abs(float(l0) - float(l1)) < 2e-4 * max(1.0, abs(float(l0)))
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
        denom = max(float(jnp.abs(leaf).max()), 1e-3)
        err = float(jnp.abs(leaf - flat1[path]).max()) / denom
        assert err < 5e-3, f"{jax.tree_util.keystr(path)}: {err}"


def test_pp_trainer_step_matches_plain(tmp_path):
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    model, params, batch, feats, flens = _setup(_config(False))
    tcfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
            "log_interval": 1, "valid_interval_epoch": 1,
            "keep_nbest_models": 0, "optim": "adamw",
            "optim_conf": {"lr": 1e-3, "weight_decay": 0.01},
            "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 10}}

    class _OneBatchLoader:
        def __init__(self, b):
            self.b = b

        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([dict(self.b)])

        def __len__(self):
            return 1

    pp_mesh = make_mesh(4, tp=2, tp_axis="pp")       # (dp=2, pp=2)
    tr_pp = Trainer(PPModel(model, pp_mesh), _OneBatchLoader(batch), tcfg,
                    ckpt_dir=tmp_path / "pp", mesh=pp_mesh)
    tr_pp._train_epoch()
    assert tr_pp.global_step == 1

    tr = Trainer(model, _OneBatchLoader(batch), tcfg,
                 ckpt_dir=tmp_path / "plain", mesh=make_mesh(2))
    tr._train_epoch()
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(tr_pp.params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(tr.params):
        err = np.abs(np.asarray(leaf, np.float64)
                     - np.asarray(flat_pp[path], np.float64)).max()
        assert err < 1e-4, f"{jax.tree_util.keystr(path)}: {err}"


def test_pp_guards():
    model, *_ = _setup(_config(True, n_main=4))
    with pytest.raises(ValueError, match="no 'pp' axis"):
        PPModel(model, make_mesh(2))
    mesh = make_mesh(4, tp=4, tp_axis="pp")
    model3, *_ = _setup(_config(True, n_main=3))
    with pytest.raises(ValueError, match="not divisible"):
        PPModel(model3, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        stack_block_params({"block_0": {}}, 3, 2)
