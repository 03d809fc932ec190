"""Trainer: toy-model convergence on the 8-device mesh, resume exactness,
checkpoint selection/pruning/averaging, early-stop min_delta semantics
(replayed on the reference's real N1 WER series), schedules, param labels."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.training.checkpoint import (
    average_checkpoints, load_checkpoint, resolve_resume, save_checkpoint,
)
from hnet_mamba_asr_tpu.training.optim import build_schedule, param_labels, warmup_lr
from hnet_mamba_asr_tpu.training.trainer import Trainer
from hnet_mamba_asr_tpu.parallel.mesh import make_mesh


class ToyModel:
    """Linear regression implementing the Trainer model contract."""

    def init_params(self, key):
        return {"w": jnp.zeros((4, 1)), "b": jnp.zeros((1,))}

    def loss_fn(self, params, batch, step, train):
        pred = batch["x"] @ params["w"] + params["b"]
        err = ((pred - batch["y"]) ** 2).mean(axis=1)
        mask = batch["row_mask"]
        loss = (err * mask).sum() / jnp.maximum(mask.sum(), 1)
        return loss, {"loss/total": loss, "batch_weight": mask.sum()}


class ToyLoader:
    """Deterministic synthetic regression batches (B divisible by 8)."""

    def __init__(self, n_batches=6, B=16, seed=0):
        rng = np.random.default_rng(seed)
        self.w = np.array([[1.0], [-2.0], [0.5], [3.0]])
        self.batches = []
        for _ in range(n_batches):
            x = rng.normal(size=(B, 4)).astype(np.float32)
            y = (x @ self.w + 0.1).astype(np.float32)
            self.batches.append({"x": x, "y": y,
                                 "row_mask": np.ones(B, bool), "ids": []})
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        return iter([dict(b) for b in self.batches])

    def __len__(self):
        return len(self.batches)


CFG = {"max_epoch": 3, "grad_clip": 5.0, "accum_grad": 1, "log_interval": 2,
       "valid_interval_epoch": 1, "keep_nbest_models": 2, "optim": "adamw",
       "optim_conf": {"lr": 0.1}, "scheduler": None, "scheduler_conf": {},
       "best_model_criterion": [["valid", "loss", "min"]],
       "early_stopping": {}}


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_toy_training_converges(tmp_path, mesh):
    tr = Trainer(ToyModel(), ToyLoader(), CFG,
                 dev_loaders={"dev": ToyLoader(2, seed=9)},
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    hist = tr.metric_history[("train", "loss")]
    assert hist[2] < hist[0] * 0.7
    assert ("valid", "loss") in tr.metric_history
    assert (tmp_path / "ck" / "latest.ckpt").exists()
    assert (tmp_path / "ck" / "valid.loss.best.ckpt").exists()


def test_resume_continues(tmp_path, mesh):
    ck = tmp_path / "ck"
    tr1 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2),
                  dev_loaders={"dev": ToyLoader(2, seed=9)}, ckpt_dir=ck, mesh=mesh)
    tr1.train()
    step1, params1 = tr1.global_step, jax.device_get(tr1.params)

    tr2 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=4),
                  dev_loaders={"dev": ToyLoader(2, seed=9)}, ckpt_dir=ck, mesh=mesh)
    tr2.train(resume="auto")
    assert tr2.epoch >= 2                              # continued, not restarted
    assert tr2.global_step > step1
    # resume really loaded the old params before continuing
    tr3 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2), ckpt_dir=ck,
                  mesh=mesh)
    tr3.load_checkpoint(ck / "latest.ckpt")
    assert tr3.global_step == tr2.global_step


def test_resume_equals_straight_run(tmp_path, mesh):
    """The reference's 'resumed run == straight run' guarantee — stronger on
    TPU because XLA is deterministic: 2 epochs straight must equal
    1 epoch + resume + 1 epoch, parameter for parameter."""
    straight = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2),
                       dev_loaders={"dev": ToyLoader(2, seed=9)},
                       ckpt_dir=tmp_path / "s", mesh=mesh)
    straight.train()

    part1 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                    dev_loaders={"dev": ToyLoader(2, seed=9)},
                    ckpt_dir=tmp_path / "r", mesh=mesh)
    part1.train()
    part2 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2),
                    dev_loaders={"dev": ToyLoader(2, seed=9)},
                    ckpt_dir=tmp_path / "r", mesh=mesh)
    part2.train(resume="auto")

    a = jax.device_get(straight.params)
    b = jax.device_get(part2.params)
    for ka in a:
        np.testing.assert_allclose(np.asarray(a[ka]), np.asarray(b[ka]),
                                   rtol=1e-6, atol=1e-7)
    assert straight.global_step == part2.global_step


def test_resume_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_resume(tmp_path, str(tmp_path / "nope.ckpt"))
    assert resolve_resume(tmp_path, "auto") is None    # fresh start OK
    assert resolve_resume(tmp_path, None) is None


def test_max_steps_no_overshoot(tmp_path, mesh):
    cfg = dict(CFG, max_steps=4, max_epoch=10)
    tr = Trainer(ToyModel(), ToyLoader(), cfg, ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    assert tr.global_step == 4
    tr2 = Trainer(ToyModel(), ToyLoader(), cfg, ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr2.train(resume="auto")
    assert tr2.global_step == 4                        # already at budget


def test_scan_steps_matches_sequential(tmp_path, mesh):
    """scan_steps groups same-shape batches into one device call; the result
    must match step-by-step training (same data, same order)."""
    cfg_seq = dict(CFG, max_epoch=1)
    tr_a = Trainer(ToyModel(), ToyLoader(n_batches=6), cfg_seq,
                   ckpt_dir=tmp_path / "a", mesh=mesh)
    tr_a.train()
    cfg_scan = dict(CFG, max_epoch=1, scan_steps=3)
    tr_b = Trainer(ToyModel(), ToyLoader(n_batches=6), cfg_scan,
                   ckpt_dir=tmp_path / "b", mesh=mesh)
    tr_b.train()
    assert tr_b.global_step == tr_a.global_step == 6
    wa = np.asarray(jax.device_get(tr_a.params["w"]))
    wb = np.asarray(jax.device_get(tr_b.params["w"]))
    np.testing.assert_allclose(wa, wb, rtol=1e-5, atol=1e-6)
    la = tr_a.metric_history[("train", "loss")][0]
    lb = tr_b.metric_history[("train", "loss")][0]
    assert la == pytest.approx(lb, rel=1e-5)


def test_scan_steps_partial_group_flushes(tmp_path, mesh):
    """5 batches with scan_steps=2 -> 2 scanned groups + 1 single step."""
    cfg = dict(CFG, max_epoch=1, scan_steps=2)
    tr = Trainer(ToyModel(), ToyLoader(n_batches=5), cfg,
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    assert tr.global_step == 5


def test_scan_steps_excludes_accum(tmp_path, mesh):
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(ToyModel(), ToyLoader(1), dict(CFG, scan_steps=2, accum_grad=2),
                ckpt_dir=tmp_path / "ck", mesh=mesh)


def test_accum_grad_equivalent_steps(tmp_path, mesh):
    cfg = dict(CFG, accum_grad=2, max_epoch=1)
    tr = Trainer(ToyModel(), ToyLoader(n_batches=6), cfg,
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    assert tr.global_step == 3                         # 6 micros / 2


def test_checkpoint_roundtrip_and_average(tmp_path):
    s1 = {"params": {"w": np.ones((2, 2), np.float32)}, "epoch": 0,
          "global_step": 1, "metric_history": {}, "config": {}, "seed": 0}
    s2 = {"params": {"w": 3 * np.ones((2, 2), np.float32)}, "epoch": 1,
          "global_step": 2, "metric_history": {}, "config": {}, "seed": 0}
    save_checkpoint(tmp_path / "a.ckpt", s1)
    save_checkpoint(tmp_path / "b.ckpt", s2)
    loaded = load_checkpoint(tmp_path / "a.ckpt")
    np.testing.assert_array_equal(loaded["params"]["w"], 1.0)
    avg = average_checkpoints([tmp_path / "a.ckpt", tmp_path / "b.ckpt"])
    np.testing.assert_array_equal(avg["params"]["w"], 2.0)


def test_opt_state_restore_rejects_changed_chain(tmp_path, mesh):
    """A checkpoint saved under one optax chain must FAIL LOUDLY when loaded
    into a trainer built with a different chain (different state tree), never
    silently map moments onto the wrong slots."""
    tr1 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                  ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr1.train()
    tr2 = Trainer(ToyModel(), ToyLoader(),
                  dict(CFG, optim="sgd", optim_conf={"lr": 0.1, "momentum": 0.9}),
                  ckpt_dir=tmp_path / "ck", mesh=mesh)
    with pytest.raises(ValueError, match="does not match"):
        tr2.load_checkpoint(tmp_path / "ck" / "latest.ckpt")


def test_opt_state_path_dict_roundtrip(tmp_path, mesh):
    """New checkpoints store the optimizer state as a path-keyed leaf dict;
    load must restore it bit-exactly into the rebuilt optax structure."""
    from hnet_mamba_asr_tpu.training.checkpoint import (
        path_dict_to_tree, tree_to_path_dict,
    )
    tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    state = load_checkpoint(tmp_path / "ck" / "latest.ckpt")
    assert state.get("opt_state_format") == "path_dict"
    assert isinstance(state["opt_state"], dict)
    restored = path_dict_to_tree(tr.opt_state, state["opt_state"])
    live = tree_to_path_dict(tr.opt_state)
    for k, v in tree_to_path_dict(restored).items():
        np.testing.assert_array_equal(v, live[k], err_msg=k)


def test_opt_state_legacy_leaf_order_still_loads(tmp_path, mesh):
    """Old raw-pytree checkpoints load when the structure matches, and raise
    on a leaf-count mismatch instead of loading garbage."""
    tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()
    legacy = {"params": jax.device_get(tr.params),
              "opt_state": jax.device_get(tr.opt_state),   # raw pytree, no format tag
              "epoch": 0, "global_step": tr.global_step,
              "metric_history": {}, "config": dict(CFG), "seed": 0}
    save_checkpoint(tmp_path / "legacy.ckpt", legacy)
    tr2 = Trainer(ToyModel(), ToyLoader(), dict(CFG), ckpt_dir=tmp_path / "ck2",
                  mesh=mesh)
    tr2.load_checkpoint(tmp_path / "legacy.ckpt")          # structure matches: OK
    tr3 = Trainer(ToyModel(), ToyLoader(),
                  dict(CFG, optim="sgd", optim_conf={"lr": 0.1, "momentum": 0.9}),
                  ckpt_dir=tmp_path / "ck3", mesh=mesh)
    with pytest.raises(ValueError):
        tr3.load_checkpoint(tmp_path / "legacy.ckpt")


def test_early_stop_min_delta_on_real_wer_series(tmp_path, mesh):
    """The reference's documented case: valid WER 6.118 -> 6.098 over 35 epochs
    (0.02 improvement, a quarter of the noise sd) must NOT keep the run alive
    when min_delta=0.05."""
    tr = Trainer(ToyModel(), ToyLoader(1), dict(CFG), ckpt_dir=tmp_path / "ck",
                 mesh=mesh)
    series = {29: 6.598, 34: 6.280, 39: 6.252, 44: 6.118, 49: 6.137,
              54: 6.118, 59: 6.103, 64: 6.118, 69: 6.098, 74: 6.109, 79: 6.104}
    tr.metric_history[("valid", "wer")] = series
    tr.early_stopping = {"enable": True, "criteria": [
        {"phase": "valid", "metric": "wer", "mode": "min", "patience": 15,
         "min_delta": 0.05}]}
    tr.epoch = 79
    assert tr._last_significant_best("valid", "wer", "min", 0.05) == 44
    assert tr._should_early_stop()
    # without min_delta the 6.098@69 would reset patience
    tr.early_stopping["criteria"][0]["min_delta"] = 0.0
    assert tr._last_significant_best("valid", "wer", "min", 0.0) == 69
    assert not tr._should_early_stop()


def test_prune_keeps_best_union_and_latest(tmp_path, mesh):
    tr = Trainer(ToyModel(), ToyLoader(1), dict(CFG, keep_nbest_models=2),
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    for e, v in [(0, 5.0), (1, 3.0), (2, 4.0), (3, 2.0), (4, 6.0)]:
        tr.epoch = e
        tr.metric_history.setdefault(("valid", "loss"), {})[e] = v
        tr.save_checkpoint()
    tr._prune_checkpoints()
    tr.flush_checkpoints()                # saves/prune ride the async writer
    kept = sorted(p.name for p in (tmp_path / "ck").glob("epoch*.ckpt"))
    assert kept == ["epoch0001.ckpt", "epoch0003.ckpt", "epoch0004.ckpt"]


def test_warmup_schedule_formula():
    sched = warmup_lr(0.002, warmup_steps=100)
    # peak at step == warmup
    assert float(sched(99)) == pytest.approx(0.002, rel=1e-6)
    # linear ramp below
    assert float(sched(49)) == pytest.approx(0.002 * 50 / 100, rel=1e-6)
    # inverse sqrt above
    assert float(sched(399)) == pytest.approx(0.002 * (100 / 400) ** 0.5, rel=1e-6)


def test_build_schedule_variants():
    s = build_schedule("steplr", 1.0, {"step_size": 10, "gamma": 0.5})
    assert float(s(0)) == 1.0 and float(s(10)) == 0.5 and float(s(25)) == 0.25
    s = build_schedule("exponentiallr", 1.0, {"gamma": 0.9})
    assert float(s(2)) == pytest.approx(0.81)
    s = build_schedule(None, 0.3, {})
    assert float(s(1000)) == pytest.approx(0.3)
    with pytest.raises(ValueError):
        build_schedule("nope", 1.0, {})


def test_tensor_parallel_matches_dp(tmp_path):
    """A (dp=4, tp=2) mesh with tensor-sharded projections must train to the
    same parameters as the plain dp mesh (GSPMD inserts the collectives)."""
    from hnet_mamba_asr_tpu.parallel.mesh import tp_specs
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from jax.sharding import PartitionSpec as P

    cfg_model = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 32, "n_enc": 1, "n_main": 1,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "hnet": {"compression_N": 1}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    model = build_model(cfg_model, 12)
    params = model.init_params(jax.random.PRNGKey(0))
    specs = tp_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = {jax.tree_util.keystr(p): s for p, s in flat if s != P()}
    assert sharded, "no tensor-sharded parameters found"
    assert any("in_proj" in k for k in sharded)
    assert any("out_proj" in k for k in sharded)

    rng_np = np.random.default_rng(0)
    batch = {
        "wave": rng_np.normal(size=(8, 4000)).astype(np.float32) * 0.1,
        "wave_lens": np.full(8, 4000, np.int32),
        "tokens": rng_np.integers(4, 12, size=(8, 8)).astype(np.int32),
        "token_lens": np.full(8, 8, np.int32),
        "row_mask": np.ones(8, bool),
        "aug_ref": np.array([0, 0], np.int32),
        "item_index": np.arange(8, dtype=np.int32),
    }

    class OneBatch:
        def __init__(self, b):
            self.b = b

        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([dict(self.b)])

        def __len__(self):
            return 1

    cfg = dict(CFG, max_epoch=1, optim_conf={"lr": 1e-2})
    tr_dp = Trainer(model, OneBatch(batch), cfg, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    tr_tp = Trainer(model, OneBatch(batch), cfg, ckpt_dir=tmp_path / "tp",
                    mesh=make_mesh(tp=2))
    tr_tp.train()
    a = jax.device_get(tr_dp.params)
    b = jax.device_get(tr_tp.params)
    for (pa, la), (pb, lb) in zip(jax.tree_util.tree_leaves_with_path(a),
                                  jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_param_labels_router_and_ndim():
    params = {"encoder": {"chunk": {"router": {"W_q": {"kernel": np.zeros((4, 4))},
                                               "W_k": {"kernel": np.zeros((4, 4))}}},
                          "block": {"a_log": np.zeros(4),
                                    "kernel": np.zeros((4, 4))}}}
    labels = param_labels(params)
    assert labels["encoder"]["chunk"]["router"]["W_q"]["kernel"] == "router"
    assert labels["encoder"]["block"]["a_log"] == "no_decay"
    assert labels["encoder"]["block"]["kernel"] == "default"
