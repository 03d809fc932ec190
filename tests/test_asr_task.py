"""End-to-end ASR task smoke on the virtual mesh: build_model from config,
fused frontend+encoder+heads loss, Trainer epoch over synthetic audio,
greedy decode, hybrid weights wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.data.audio import write_wav
from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
from hnet_mamba_asr_tpu.data.manifests import write_manifest
from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, shard_batch
from hnet_mamba_asr_tpu.tasks.asr_task import DCASRModel, build_model
from hnet_mamba_asr_tpu.training.trainer import Trainer

CFG = {
    "encoder": "dcasr",
    "head": "ctc",
    "frontend_conf": {"n_mels": 20, "win_length": 400, "hop_length": 160},
    "specaug_conf": {"num_freq_mask": 1, "freq_mask_width_range": [0, 3],
                     "num_time_mask": 1, "time_mask_width_range": [0, 5]},
    "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1, "n_main": 1,
                     "n_dec": 1, "arch_type": "A", "d_state": 8, "headdim": 8,
                     "ssd_chunk_size": 16, "hnet": {"compression_N": 1}},
    "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 32, "dropout": 0.0,
                 "max_decode_len": 8},
    "model_conf": {"ctc_weight": 0.7, "aed_weight": 0.3, "lsm_weight": 0.1},
}

TEXTS = ["aa bb", "bb cc aa", "cc", "aa aa bb cc"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("asr")
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        n = int(rng.integers(4000, 8000))
        write_wav(root / f"u{i}.wav", rng.normal(size=n) * 0.1, 16000)
        entries.append({"id": f"u{i}", "audio": str(root / f"u{i}.wav"),
                        "text": text, "frames": n})
    manifest = write_manifest(entries, root / "m.jsonl")
    tok = Tokenizer.train(TEXTS * 5, root / "bpe", vocab_size=16,
                          hard_vocab_limit=False)
    model = build_model(CFG, tok.vocab_size)
    return manifest, tok, model


def test_loss_fn_runs_and_masks_rows(setup):
    manifest, tok, model = setup
    ds = ASRDataset(manifest, tok, augment=True, seed=0)
    loader, _ = make_dataloader(ds, max_frames=2000, batch_multiple=8)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(iter(loader))
    batch.pop("ids")
    loss, stats = model.loss_fn(params, batch, 0, True)
    assert np.isfinite(float(loss))
    assert float(stats["batch_weight"]) == float(np.asarray(batch["row_mask"]).sum())
    assert {"loss/total", "loss/ctc", "loss/aed", "loss/ratio",
            "kept_fraction", "ctc_infeasible"} <= set(stats)
    assert float(stats["loss/ratio"]) == 0.0            # N=1
    # row-mask invariance: garbage in a padded row must not change the loss
    rm = np.asarray(batch["row_mask"])
    if not rm.all():
        pad_row = int(np.argmin(rm))
        batch2 = dict(batch)
        batch2["wave"] = batch["wave"].copy()
        batch2["wave"][pad_row] = 0.5
        loss2, _ = model.loss_fn(params, batch2, 0, True)
        assert float(loss2) == pytest.approx(float(loss), rel=1e-4)


def test_greedy_decode_contract(setup):
    manifest, tok, model = setup
    ds = ASRDataset(manifest, tok, augment=False)
    loader, _ = make_dataloader(ds, max_frames=2000, batch_multiple=8)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(iter(loader))
    batch.pop("ids")
    hyps = model.greedy_decode(params, batch)
    assert isinstance(hyps, list)
    assert all(isinstance(h, list) for h in hyps)
    assert all(0 <= t < tok.vocab_size for h in hyps for t in h)


def test_full_trainer_epoch(setup, tmp_path):
    manifest, tok, model = setup
    mesh = make_mesh()
    ds = ASRDataset(manifest, tok, augment=True, seed=0)
    loader, _ = make_dataloader(ds, max_frames=2000, shuffle=True,
                                batch_multiple=8)
    dev_ds = ASRDataset(manifest, tok, augment=False)
    dev_loader, _ = make_dataloader(dev_ds, max_frames=2000, batch_multiple=8)
    cfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1, "log_interval": 1,
           "valid_interval_epoch": 1, "keep_nbest_models": 1,
           "optim": "adamw", "optim_conf": {"lr": 1e-3, "weight_decay": 0.01,
                                            "router_lr_mult": 0.5},
           "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 10},
           "best_model_criterion": [["valid", "loss", "min"]]}
    tr = Trainer(model, loader, cfg, dev_loaders={"dev": dev_loader},
                 tokenizer=tok, ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    assert tr.global_step >= 1
    assert ("valid", "loss") in tr.metric_history
    assert ("valid", "wer") in tr.metric_history        # inline greedy WER ran
    assert (tmp_path / "ck" / "latest.ckpt").exists()


def test_build_model_head_gating():
    cfg = dict(CFG, model_conf={"ctc_weight": 1.0, "aed_weight": 0.0})
    m = build_model(cfg, 16)
    assert m.ctc is not None and m.aed is None
    cfg = dict(CFG, model_conf={"ctc_weight": 0.0, "aed_weight": 1.0})
    m = build_model(cfg, 16)
    assert m.ctc is None and m.aed is not None
    with pytest.raises(ValueError):
        build_model(dict(CFG, model_conf={"ctc_weight": 0, "aed_weight": 0}), 16)


def test_n2_dynamic_chunking_trains(setup):
    """Active dynamic chunking end to end: router params exist, ratio loss is
    live, gradients are finite, kept_fraction is realized < 1."""
    manifest, tok, _ = setup
    import jax as _jax
    cfg = dict(CFG)
    cfg["encoder_conf"] = dict(CFG["encoder_conf"],
                               hnet={"compression_N": 2, "chunker": "dynamic"})
    cfg["model_conf"] = dict(CFG["model_conf"], hnet_ratio_beta=0.03)
    model = build_model(cfg, tok.vocab_size)
    params = model.init_params(_jax.random.PRNGKey(0))
    flat = _jax.tree_util.tree_leaves_with_path(params)
    assert any("router" in _jax.tree_util.keystr(p) for p, _ in flat)
    ds = ASRDataset(manifest, tok, augment=False)
    loader, _ = make_dataloader(ds, max_frames=2000, batch_multiple=8)
    batch = next(iter(loader))
    batch.pop("ids")

    def loss_of(p):
        return model.loss_fn(p, batch, 0, True)[0]

    (loss, stats), grads = _jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, 0, True), has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(stats["loss/ratio"]) > 0.0
    assert 0.0 < float(stats["kept_fraction"]) <= 1.0
    for g in _jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_specaug_resume_exact(setup):
    """Same (seed, epoch, index) -> bit-identical augmented features."""
    manifest, tok, model = setup
    ds = ASRDataset(manifest, tok, augment=True, seed=3)
    loader, _ = make_dataloader(ds, max_frames=2000, batch_multiple=8)
    loader.set_epoch(2)
    b1 = next(iter(loader))
    loader.set_epoch(2)
    b2 = next(iter(loader))
    f1, _ = model.features({k: jnp.asarray(v) for k, v in b1.items() if k != "ids"},
                           train=True)
    f2, _ = model.features({k: jnp.asarray(v) for k, v in b2.items() if k != "ids"},
                           train=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    loader.set_epoch(3)
    b3 = next(iter(loader))
    f3, _ = model.features({k: jnp.asarray(v) for k, v in b3.items() if k != "ids"},
                           train=True)
    assert not np.array_equal(np.asarray(f1), np.asarray(f3))


def test_int16_wire_batch_same_loss(setup):
    """data.wire_dtype int16: the model consumes the quantized batch directly
    (device-side dequant in the frontend) with identical loss for PCM16
    sources — the WAV corpus here IS PCM16, so equality is exact."""
    manifest, tok, model = setup
    params = model.init_params(jax.random.PRNGKey(0))
    ds = ASRDataset(manifest, tok, augment=False)
    b32 = next(iter(make_dataloader(ds, max_frames=2000, batch_multiple=8)[0]))
    b16 = next(iter(make_dataloader(ds, max_frames=2000, batch_multiple=8,
                                    wire_dtype="int16")[0]))
    b32.pop("ids"); b16.pop("ids")
    assert b16["wave"].dtype == np.int16
    loss32, _ = model.loss_fn(params, b32, 0, False)
    loss16, _ = model.loss_fn(params, b16, 0, False)
    assert float(loss16) == float(loss32)
