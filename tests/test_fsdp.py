"""FSDP/ZeRO plane: weight + optimizer-state sharding over the dp axis.

The reference has no FSDP/ZeRO strategy (SURVEY.md §2.10 — plain DDP only);
this is a beyond-parity plane. Semantics under test:
- fsdp_specs rules: big divisible leaves shard their largest dim, small or
  indivisible leaves stay replicated;
- fsdp training == replicated-dp training (GSPMD inserts all-gather /
  reduce-scatter — the step function is untouched);
- optimizer moments inherit the param shards (ZeRO-1/2 for free) and the
  per-device shard is actually 1/|dp| of the leaf;
- checkpoints are saved gathered (file format identical to the replicated
  path) and round-trip both fsdp->fsdp and fsdp->replicated.
"""
import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from hnet_mamba_asr_tpu.parallel.mesh import (
    fsdp_specs, make_mesh, place_params,
)
from hnet_mamba_asr_tpu.training.trainer import Trainer
from hnet_mamba_asr_tpu.tasks.asr_task import build_model


def test_fsdp_specs_rules():
    params = {
        "big2d": np.zeros((16, 64)),        # 1024 elems, both dims % 8 == 0
        "tall": np.zeros((64, 10)),         # largest divisible dim is 0
        "small": np.zeros((4, 4)),          # under the floor
        "indivisible": np.zeros((30, 42)),  # no dim % 8 == 0
        "bias": np.zeros((64,)),            # 1-D but divisible and big enough
        "scalar": np.zeros(()),
    }
    specs = fsdp_specs(params, 8, min_elems=64)
    assert specs["big2d"] == P(None, "dp")       # 64 > 16: shard dim 1
    assert specs["tall"] == P("dp", None)
    assert specs["small"] == P()
    assert specs["indivisible"] == P()
    assert specs["bias"] == P("dp")
    assert specs["scalar"] == P()


def _tiny_asr_model():
    cfg_model = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 32, "n_enc": 1, "n_main": 1,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "hnet": {"compression_N": 1}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    return build_model(cfg_model, 12)


def _one_batch():
    rng_np = np.random.default_rng(0)
    return {
        "wave": rng_np.normal(size=(8, 4000)).astype(np.float32) * 0.1,
        "wave_lens": np.full(8, 4000, np.int32),
        "tokens": rng_np.integers(4, 12, size=(8, 8)).astype(np.int32),
        "token_lens": np.full(8, 8, np.int32),
        "row_mask": np.ones(8, bool),
        "aug_ref": np.array([0, 0], np.int32),
        "item_index": np.arange(8, dtype=np.int32),
    }


class OneBatch:
    def __init__(self, b, n=2):
        self.b, self.n = b, n

    def set_epoch(self, e):
        pass

    def __iter__(self):
        return iter([dict(self.b) for _ in range(self.n)])

    def __len__(self):
        return self.n


CFG = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1, "log_interval": 10,
       "valid_interval_epoch": 1, "keep_nbest_models": 2, "optim": "adamw",
       "optim_conf": {"lr": 1e-2}, "scheduler": None, "scheduler_conf": {},
       "best_model_criterion": [["valid", "loss", "min"]],
       "early_stopping": {}, "fsdp_min_elems": 64}


def _assert_tree_close(a, b, rtol=2e-4, atol=2e-5):
    for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(a),
                                 jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fsdp_matches_dp(tmp_path):
    """fsdp=True must train to the same parameters as plain replicated dp."""
    model = _tiny_asr_model()
    batch = _one_batch()
    tr_dp = Trainer(model, OneBatch(batch), CFG, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    tr_fs = Trainer(model, OneBatch(batch), dict(CFG, fsdp=True),
                    ckpt_dir=tmp_path / "fs", mesh=make_mesh())
    # sanity: some leaves really are sharded before training
    sharded = [l for l in jax.tree_util.tree_leaves(tr_fs.params)
               if l.sharding.spec != P()]
    assert sharded, "no fsdp-sharded parameters at this min_elems"
    tr_fs.train()
    _assert_tree_close(jax.device_get(tr_dp.params),
                       jax.device_get(tr_fs.params))


def test_fsdp_moments_inherit_shards_and_memory_drops(tmp_path):
    model = _tiny_asr_model()
    tr = Trainer(model, OneBatch(_one_batch()), dict(CFG, fsdp=True),
                 ckpt_dir=tmp_path / "fs", mesh=make_mesh())
    n_dev = len(jax.devices())
    checked = 0
    flat_params = {jax.tree_util.keystr(p): l for p, l in
                   jax.tree_util.tree_leaves_with_path(tr.params)}
    for key, leaf in flat_params.items():
        spec = leaf.sharding.spec
        if spec == P():
            continue
        # the per-device shard holds 1/n_dev of the leaf
        shard = leaf.addressable_shards[0].data
        assert shard.size * n_dev == leaf.size, key
        checked += 1
    assert checked >= 3
    # adamw moments created from placed params carry the same specs (ZeRO-1/2)
    moment_specs = set()
    for p, l in jax.tree_util.tree_leaves_with_path(tr.opt_state):
        if hasattr(l, "sharding") and getattr(l, "ndim", 0) >= 2:
            moment_specs.add(str(l.sharding.spec))
    assert any("dp" in s for s in moment_specs), moment_specs


def test_fsdp_checkpoint_gathered_and_roundtrips(tmp_path):
    model = _tiny_asr_model()
    ck = tmp_path / "fs"
    tr = Trainer(model, OneBatch(_one_batch()), dict(CFG, fsdp=True),
                 ckpt_dir=ck, mesh=make_mesh())
    tr.train()
    tr.flush_checkpoints()
    params_end = jax.device_get(tr.params)

    from hnet_mamba_asr_tpu.training.checkpoint import load_checkpoint
    state = load_checkpoint(ck / "latest.ckpt")
    # saved arrays are full-shape host numpy — format-identical to replicated
    for p, l in jax.tree_util.tree_leaves_with_path(state["params"]):
        assert isinstance(l, np.ndarray), jax.tree_util.keystr(p)
    _assert_tree_close(state["params"], params_end, rtol=1e-6, atol=1e-7)

    # fsdp checkpoint -> replicated trainer: loads cleanly (before the resume
    # run below prunes the epoch file)
    tr3 = Trainer(model, OneBatch(_one_batch()), dict(CFG),
                  ckpt_dir=tmp_path / "rep", mesh=make_mesh())
    tr3.load_checkpoint(ck / "latest.ckpt")
    _assert_tree_close(jax.device_get(tr3.params), params_end,
                       rtol=1e-6, atol=1e-7)

    # fsdp -> fsdp resume: placements restored sharded, step continues
    tr2 = Trainer(model, OneBatch(_one_batch()), dict(CFG, fsdp=True,
                                                      max_epoch=2),
                  ckpt_dir=ck, mesh=make_mesh())
    tr2.train(resume="auto")
    assert tr2.global_step > tr.global_step
    assert any(l.sharding.spec != P()
               for l in jax.tree_util.tree_leaves(tr2.params))


def test_fsdp_tp_spec_merge():
    """On a (dp, tp) mesh the tp rules win on the projections and fsdp
    shards the remaining large leaves — never both on one leaf."""
    model = _tiny_asr_model()
    params = model.init_params(jax.random.PRNGKey(0))
    # (dp, tp): tp rules win on the projections, fsdp shards the rest
    placed = place_params(params, make_mesh(tp=2), fsdp=True,
                          fsdp_min_elems=64)
    flat = {jax.tree_util.keystr(p): l for p, l in
            jax.tree_util.tree_leaves_with_path(placed)}
    tp_leaves = [k for k, l in flat.items()
                 if "tp" in str(l.sharding.spec)]
    dp_leaves = [k for k, l in flat.items()
                 if "dp" in str(l.sharding.spec)]
    assert any("in_proj" in k for k in tp_leaves), tp_leaves
    assert dp_leaves, "fsdp sharded nothing on the (dp, tp) mesh"
    assert not set(tp_leaves) & set(dp_leaves)


def test_fsdp_composes_with_tp_training(tmp_path):
    """fsdp + tensor parallelism on a (dp=4, tp=2) mesh trains to the same
    parameters as plain replicated dp."""
    model = _tiny_asr_model()
    batch = _one_batch()
    tr_dp = Trainer(model, OneBatch(batch), CFG, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    tr = Trainer(model, OneBatch(batch), dict(CFG, fsdp=True),
                 ckpt_dir=tmp_path / "tp_fs", mesh=make_mesh(tp=2))
    specs = {str(l.sharding.spec)
             for l in jax.tree_util.tree_leaves(tr.params)}
    assert any("tp" in s for s in specs) and any("dp" in s for s in specs)
    tr.train()
    _assert_tree_close(jax.device_get(tr_dp.params),
                       jax.device_get(tr.params))


def test_fsdp_composes_with_sp_training(tmp_path):
    """fsdp + sequence parallelism: on the (dp=4, sp=2) mesh the params are
    dp-sharded at rest and all-gathered at the shard_map boundary (the
    ZeRO-3 gather-on-use); training matches plain replicated dp."""
    from hnet_mamba_asr_tpu.parallel.seq_parallel import SPModel
    model = _tiny_asr_model()
    # mel frames must divide 4*sp = 8 AND give >= 4 frames per shard after
    # the x4 subsample -> T_mel = 32 (5360 samples)
    rng_np = np.random.default_rng(0)
    batch = dict(_one_batch(),
                 wave=rng_np.normal(size=(8, 5360)).astype(np.float32) * 0.1,
                 wave_lens=np.full(8, 5360, np.int32))
    tr_dp = Trainer(model, OneBatch(batch), CFG, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    sp_mesh = make_mesh(tp=2, tp_axis="sp")
    tr = Trainer(SPModel(model, sp_mesh), OneBatch(batch),
                 dict(CFG, fsdp=True), ckpt_dir=tmp_path / "sp_fs",
                 mesh=sp_mesh)
    assert any("dp" in str(l.sharding.spec)
               for l in jax.tree_util.tree_leaves(tr.params))
    tr.train()
    _assert_tree_close(jax.device_get(tr_dp.params),
                       jax.device_get(tr.params))


def test_fsdp_composes_with_pp_training(tmp_path):
    """fsdp + pipeline parallelism on a (dp=2, pp=2) mesh: params rest
    dp-sharded (ZeRO); pp_loss_fn stacks the block leaves inside the jit and
    the shard_map in_spec P('pp') reshards them — GSPMD's gather at the stack
    IS the ZeRO-3 gather-on-use. Trains to the same parameters as plain dp."""
    from hnet_mamba_asr_tpu.parallel.pipeline import PPModel
    cfg_model = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 32, "n_enc": 1, "n_main": 2,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "hnet": {"compression_N": 1}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    model = build_model(cfg_model, 12)         # n_main=2: one block per stage
    batch = _one_batch()
    tr_dp = Trainer(model, OneBatch(batch), CFG, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    pp_mesh = make_mesh(tp=2, tp_axis="pp")
    tr = Trainer(PPModel(model, pp_mesh), OneBatch(batch),
                 dict(CFG, fsdp=True), ckpt_dir=tmp_path / "pp_fs",
                 mesh=pp_mesh)
    assert any("dp" in str(l.sharding.spec)
               for l in jax.tree_util.tree_leaves(tr.params))
    tr.train()
    _assert_tree_close(jax.device_get(tr_dp.params),
                       jax.device_get(tr.params))


@pytest.mark.parametrize("extra", [{"scan_steps": 2}, {"accum_grad": 2}],
                         ids=["scan2", "accum2"])
def test_fsdp_composes_with_step_variants(tmp_path, extra):
    """fsdp params/moments survive the scanned multi-step and the
    accumulate/apply step paths (both donate the sharded buffers) and still
    match replicated-dp training."""
    model = _tiny_asr_model()
    batch = _one_batch()
    cfg = dict(CFG, **extra)
    tr_dp = Trainer(model, OneBatch(batch, n=2), cfg,
                    ckpt_dir=tmp_path / "dp", mesh=make_mesh())
    tr_dp.train()
    tr_fs = Trainer(model, OneBatch(batch, n=2), dict(cfg, fsdp=True),
                    ckpt_dir=tmp_path / "fs", mesh=make_mesh())
    tr_fs.train()
    assert tr_fs.global_step == tr_dp.global_step
    assert any(l.sharding.spec != P()
               for l in jax.tree_util.tree_leaves(tr_fs.params))
    _assert_tree_close(jax.device_get(tr_dp.params),
                       jax.device_get(tr_fs.params))
