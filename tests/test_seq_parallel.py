"""Sequence parallelism (parallel/seq_parallel.py): exactness vs the offline
encoder on a virtual device mesh.

The SP path must be EXACT (not approximate): same conv receptive fields via
halos, same SSD recurrence via the cross-shard state relay, same reversed
direction via block-reversal + padding no-ops. fp32 configs compare tight;
one bf16 case compares loose (SP only moves reduction boundaries).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnet_mamba_asr_tpu.parallel.mesh import make_mesh
from hnet_mamba_asr_tpu.parallel.seq_parallel import (sp_encode, sp_loss_fn,
                                                      sp_supported)
from hnet_mamba_asr_tpu.tasks.asr_task import build_model

VOCAB = 40


def _config(bidirectional=True, precision="fp32", N=1, arch="A", ema=True,
            chunker="dynamic"):
    return {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 24, "win_length": 400, "hop_length": 160},
        "encoder_conf": {"d_outer": 24, "d_main": 36, "n_enc": 2, "n_main": 2,
                         "n_dec": 1, "n_mid": 1, "arch_type": arch,
                         "d_state": 16,
                         "headdim": 12, "ssd_chunk_size": 16,
                         "bidirectional": bidirectional,
                         "hnet": {"compression_N": N, "ema_smoothing": ema,
                                  "chunker": chunker}},
        "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 48, "dropout": 0.0},
        "model_conf": {"ctc_weight": 0.3, "aed_weight": 0.7, "lsm_weight": 0.1},
        "train": {"precision": precision},
    }


def _batch(B, T_mel, lens_mel, seed=0):
    """Batch whose mel frame count is exactly T_mel (frame_count inverse)."""
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


def _setup(cfg, B=2, T_mel=64, lens_mel=(64, 50), seed=0):
    model = build_model(cfg, VOCAB)
    params = model.init_params(jax.random.PRNGKey(1))
    batch = _batch(B, T_mel, list(lens_mel), seed)
    feats, flens = model.features(batch, train=False)
    return model, params, batch, feats, flens


def _offline(model, params, feats, flens):
    return model.encoder.apply({"params": params["encoder"]}, feats, flens)


def _masked_err(sp_feat, off_feat, lengths):
    L0 = off_feat.shape[1]
    a = np.asarray(sp_feat, np.float64)[:, :L0]
    b = np.asarray(off_feat, np.float64)
    mask = (np.arange(L0)[None, :] < np.asarray(lengths)[:, None])[..., None]
    denom = max(np.abs(b[np.broadcast_to(mask, b.shape)]).max(), 1e-6)
    return np.abs((a - b) * mask).max() / denom


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("sp", [2, 4])
def test_sp_encode_exact_fp32(bidirectional, sp):
    model, params, batch, feats, flens = _setup(_config(bidirectional))
    mesh = make_mesh(sp, tp=sp, tp_axis="sp")          # (dp=1, sp)
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert out.features.shape[1] == feats.shape[1] // 4
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(off.lengths))


def test_sp_encode_dp_times_sp():
    """2x4 (dp, sp) mesh: batch AND time sharded together."""
    model, params, batch, feats, flens = _setup(
        _config(True), B=4, T_mel=64, lens_mel=(64, 50, 36, 60))
    mesh = make_mesh(8, tp=4, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("sp", [2, 4])
def test_sp_encode_exact_fp32_n4(bidirectional, sp):
    """Dynamic chunking (N=4) under SP: per-shard compaction + the router
    halo / compressed conv tail / EMA state relays reproduce the offline
    encoder exactly, including the ratio-loss and kept-fraction scalars."""
    model, params, batch, feats, flens = _setup(_config(bidirectional, N=4))
    mesh = make_mesh(sp, tp=sp, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4
    assert abs(float(out.ratio_loss) - float(off.ratio_loss)) < 1e-6
    assert abs(float(out.kept_fractions[0])
               - float(off.kept_fractions[0])) < 1e-6


def test_sp_encode_exact_n4_no_ema():
    """ema_smoothing=false N>1: the gather-upsample fallback for frames
    preceding their shard's first boundary takes the last globally-valid
    compressed row (relayed), not the EMA state."""
    model, params, batch, feats, flens = _setup(_config(True, N=4, ema=False))
    mesh = make_mesh(4, tp=4, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4


def test_sp_loss_and_grads_match_n4():
    """N=4 full loss + parameter gradients (router, EMA relay, STE path
    included) through shard_map == offline."""
    model, params, batch, feats, flens = _setup(_config(False, N=4))
    mesh = make_mesh(2, tp=2, tp_axis="sp")
    l0, g0 = jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, 0, False)[0])(params)
    l1, g1 = jax.value_and_grad(
        lambda p: sp_loss_fn(model, p, batch, 0, False, mesh)[0])(params)
    assert abs(float(l0) - float(l1)) < 2e-4 * max(1.0, abs(float(l0)))
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
        denom = max(float(jnp.abs(leaf).max()), 1e-3)
        err = float(jnp.abs(leaf - flat1[path]).max()) / denom
        assert err < 5e-3, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_sp_trainer_step_matches_plain_n4(tmp_path):
    """train.sp wiring at N=4: the real Trainer drives SPModel and lands on
    the same parameters as the plain data-parallel Trainer."""
    from hnet_mamba_asr_tpu.parallel.seq_parallel import SPModel
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    model, params, batch, feats, flens = _setup(_config(True, N=4))
    tcfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
            "log_interval": 1, "valid_interval_epoch": 1,
            "keep_nbest_models": 0, "optim": "adamw",
            "optim_conf": {"lr": 1e-3, "weight_decay": 0.01},
            "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 10}}
    sp_mesh = make_mesh(8, tp=4, tp_axis="sp")               # (dp=2, sp=4)
    tr_sp = Trainer(SPModel(model, sp_mesh), _OneBatchLoader(batch), tcfg,
                    ckpt_dir=tmp_path / "sp", mesh=sp_mesh)
    tr_sp._train_epoch()
    tr = Trainer(model, _OneBatchLoader(batch), tcfg,
                 ckpt_dir=tmp_path / "plain", mesh=make_mesh(2))
    tr._train_epoch()
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(tr_sp.params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(tr.params):
        err = np.abs(np.asarray(leaf, np.float64)
                     - np.asarray(flat_sp[path], np.float64)).max()
        assert err < 1e-4, f"{jax.tree_util.keystr(path)}: {err}"


@pytest.mark.parametrize("bidirectional", [False, True])
def test_sp_encode_exact_typeb_n4(bidirectional):
    """Type B (two nested sqrt(4)=2 stages) under SP: the stage-2 router /
    compaction / dechunk run on the per-shard valid-compacted stage-1
    stream and reproduce the offline encoder exactly, including the summed
    two-stage ratio loss and both kept fractions."""
    model, params, batch, feats, flens = _setup(
        _config(bidirectional, N=4, arch="B"))
    mesh = make_mesh(4, tp=4, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4
    assert abs(float(out.ratio_loss) - float(off.ratio_loss)) < 1e-6
    assert len(out.kept_fractions) == len(off.kept_fractions) == 2
    for s in range(2):
        assert abs(float(out.kept_fractions[s])
                   - float(off.kept_fractions[s])) < 1e-6
    # stage-1 boundaries live on the fine grid in BOTH layouts
    p_off, b_off = off.boundaries[0]
    p_sp, b_sp = out.boundaries[0]
    L0 = p_off.shape[1]
    np.testing.assert_allclose(np.asarray(p_sp)[:, :L0], np.asarray(p_off),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b_sp)[:, :L0],
                                  np.asarray(b_off))


def test_sp_encode_typeb_identity_n1():
    """Type B at N=1: both chunkers are identity passthroughs; SP runs the
    mid/main/mid_dec stacks at the fine rate."""
    model, params, batch, feats, flens = _setup(_config(True, N=1, arch="B"))
    mesh = make_mesh(2, tp=2, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 2e-4
    assert float(out.ratio_loss) == 0.0


def test_sp_loss_and_grads_match_typeb_n4():
    """Type B N=4 full loss + parameter gradients (both routers, both EMA
    relays, nested STE paths) through shard_map == offline."""
    model, params, batch, feats, flens = _setup(_config(False, N=4, arch="B"))
    mesh = make_mesh(2, tp=2, tp_axis="sp")
    l0, g0 = jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, 0, False)[0])(params)
    l1, g1 = jax.value_and_grad(
        lambda p: sp_loss_fn(model, p, batch, 0, False, mesh)[0])(params)
    assert abs(float(l0) - float(l1)) < 2e-4 * max(1.0, abs(float(l0)))
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
        denom = max(float(jnp.abs(leaf).max()), 1e-3)
        err = float(jnp.abs(leaf - flat1[path]).max()) / denom
        assert err < 5e-3, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_sp_encode_bf16_close():
    model, params, batch, feats, flens = _setup(_config(True, "bf16"))
    mesh = make_mesh(4, tp=4, tp_axis="sp")
    off = _offline(model, params, feats, flens)
    out = sp_encode(model, params, feats, flens, mesh)
    assert _masked_err(out.features, off.features, off.lengths) < 0.08


def test_sp_loss_and_grads_match(tmp_path):
    """Full loss + parameter gradients through shard_map == offline."""
    model, params, batch, feats, flens = _setup(_config(True))
    mesh = make_mesh(4, tp=4, tp_axis="sp")

    def off_loss(p):
        return model.loss_fn(p, batch, 0, False)[0]

    def sp_loss(p):
        return sp_loss_fn(model, p, batch, 0, False, mesh)[0]

    l0, g0 = jax.value_and_grad(off_loss)(params)
    l1, g1 = jax.value_and_grad(sp_loss)(params)
    assert abs(float(l0) - float(l1)) < 2e-4 * max(1.0, abs(float(l0)))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat0:
        other = flat1[path]
        denom = max(float(jnp.abs(leaf).max()), 1e-3)
        err = float(jnp.abs(leaf - other).max()) / denom
        assert err < 5e-3, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_sp_one_optimizer_step_matches(tmp_path):
    """One adamw step driven by SP grads lands on the same params."""
    import optax
    model, params, batch, feats, flens = _setup(_config(False))
    mesh = make_mesh(2, tp=2, tp_axis="sp")
    opt = optax.adamw(1e-3)

    def step(p, loss_fn):
        g = jax.grad(lambda q: loss_fn(q)[0])(p)
        upd, _ = opt.update(g, opt.init(p), p)
        return optax.apply_updates(p, upd)

    p_off = step(params, lambda q: model.loss_fn(q, batch, 0, False))
    p_sp = step(params, lambda q: sp_loss_fn(model, q, batch, 0, False, mesh))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_off):
        other = dict(jax.tree_util.tree_leaves_with_path(p_sp))[path]
        assert float(jnp.abs(leaf - other).max()) < 1e-5, \
            jax.tree_util.keystr(path)


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter([dict(self.batch)])

    def __len__(self):
        return 1


def test_sp_trainer_step_matches_plain(tmp_path):
    """The real Trainer drives SPModel (train.sp wiring) and lands on the
    same parameters as the plain data-parallel Trainer."""
    from hnet_mamba_asr_tpu.parallel.seq_parallel import SPModel
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    model, params, batch, feats, flens = _setup(_config(True))
    tcfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
            "log_interval": 1, "valid_interval_epoch": 1,
            "keep_nbest_models": 0, "optim": "adamw",
            "optim_conf": {"lr": 1e-3, "weight_decay": 0.01},
            "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 10}}

    sp_mesh = make_mesh(8, tp=4, tp_axis="sp")               # (dp=2, sp=4)
    tr_sp = Trainer(SPModel(model, sp_mesh), _OneBatchLoader(batch), tcfg,
                    ckpt_dir=tmp_path / "sp", mesh=sp_mesh)
    tr_sp._train_epoch()
    assert tr_sp.global_step == 1

    tr = Trainer(model, _OneBatchLoader(batch), tcfg,
                 ckpt_dir=tmp_path / "plain", mesh=make_mesh(2))
    tr._train_epoch()

    flat_sp = dict(jax.tree_util.tree_leaves_with_path(tr_sp.params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(tr.params):
        err = np.abs(np.asarray(leaf, np.float64)
                     - np.asarray(flat_sp[path], np.float64)).max()
        assert err < 1e-4, f"{jax.tree_util.keystr(path)}: {err}"


def test_sp_model_rejects_bad_mesh():
    from hnet_mamba_asr_tpu.parallel.seq_parallel import SPModel
    model, *_ = _setup(_config(True))
    with pytest.raises(ValueError, match="no 'sp' axis"):
        SPModel(model, make_mesh(2))


def test_sp_rejects_unsupported():
    # N > 1 requires the dynamic chunker (fixed_pool has its own geometry)
    model2, *_ = _setup(_config(True, N=4, chunker="fixed"))
    ok2, why2 = sp_supported(model2.encoder)
    assert not ok2 and "dynamic" in why2
    mesh = make_mesh(2, tp=2, tp_axis="sp")
    with pytest.raises(ValueError, match="dynamic"):
        sp_encode(model2, model2.init_params(jax.random.PRNGKey(0)),
                  jnp.zeros((2, 64, 24)), jnp.array([64, 50]), mesh)


def test_sp_rejects_misaligned_frames():
    model, params, batch, feats, flens = _setup(_config(True), T_mel=64)
    mesh = make_mesh(4, tp=4, tp_axis="sp")
    with pytest.raises(ValueError, match="divisible by 4\\*sp"):
        sp_encode(model, params, feats[:, :60], flens, mesh)
