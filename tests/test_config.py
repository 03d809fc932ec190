"""utils/config: YAML + dotlist overrides + flatten_config."""
import pytest

from hnet_mamba_asr_tpu.utils.config import (
    apply_overrides, deep_merge, flatten_config, load_config, parse_value,
)


def test_parse_value():
    assert parse_value("1") == 1
    assert parse_value("1.5") == 1.5
    assert parse_value("true") is True
    assert parse_value("null") is None
    assert parse_value("[0.9, 0.98]") == [0.9, 0.98]
    assert parse_value("hello") == "hello"


def test_apply_overrides():
    cfg = {"train": {"max_epoch": 10}, "optim": "adamw"}
    out = apply_overrides(cfg, ["train.max_epoch=20", "optim_conf.lr=1e-3", "optim=sgd"])
    assert out["train"]["max_epoch"] == 20
    assert out["optim_conf"]["lr"] == pytest.approx(1e-3)
    assert out["optim"] == "sgd"
    assert cfg["train"]["max_epoch"] == 10              # original untouched


def test_bad_override():
    with pytest.raises(ValueError):
        apply_overrides({}, ["no_equals_sign"])


def test_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": 1}
    b = {"x": {"y": 9}, "new": True}
    m = deep_merge(a, b)
    assert m == {"x": {"y": 9, "z": 2}, "k": 1, "new": True}


def test_load_config(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("train:\n  max_epoch: 5\noptim: adamw\n")
    cfg = load_config(f, ["train.max_epoch=7"])
    assert cfg["train"]["max_epoch"] == 7


def test_flatten_defaults():
    flat = flatten_config({})
    assert flat["max_epoch"] == 120
    assert flat["grad_clip"] == 5.0
    assert flat["precision"] == "bf16"
    assert flat["best_model_criterion"] == [["valid", "loss", "min"]]


def test_flatten_hoists():
    flat = flatten_config({"train": {"max_epoch": 3, "precision": "fp32"},
                           "eval": {"valid_interval_epoch": 2},
                           "accum_grad": 4, "optim": "sgd",
                           "optim_conf": {"lr": 0.1}})
    assert flat["max_epoch"] == 3
    assert flat["precision"] == "fp32"
    assert flat["valid_interval_epoch"] == 2
    assert flat["accum_grad"] == 4
    assert flat["optim_conf"] == {"lr": 0.1}


def test_flatten_hoists_every_train_knob():
    """train.* keys outside the fixed map must flow through (a dropped key
    looks exactly like 'the flag does nothing' from the CLI — the fsdp
    end-to-end verify caught train.fsdp/sp/pp/ep/async_ckpt all vanishing)."""
    flat = flatten_config({"train": {"fsdp": True, "fsdp_min_elems": 64,
                                     "sp": 2, "pp": 2, "ep": 4,
                                     "async_ckpt": False, "max_epoch": 3}})
    assert flat["fsdp"] is True and flat["fsdp_min_elems"] == 64
    assert flat["sp"] == 2 and flat["pp"] == 2 and flat["ep"] == 4
    assert flat["async_ckpt"] is False
    assert flat["max_epoch"] == 3          # fixed-map keys unaffected
    assert flat["scan_steps"] == 1         # defaults still present

def test_flatten_honors_cross_level_pinned_keys():
    """A block key colliding with a pinned key sourced from another level is
    honored, not setdefault-dropped (advisor r3: train.keep_all_checkpoints=
    true vanished and checkpoint pruning stayed on)."""
    flat = flatten_config({"train": {"keep_all_checkpoints": True,
                                     "accum_grad": 4}})
    assert flat["keep_all_checkpoints"] is True
    assert flat["accum_grad"] == 4
    # and the eval-sourced pin through train:
    flat = flatten_config({"train": {"valid_interval_epoch": 2}})
    assert flat["valid_interval_epoch"] == 2


def test_flatten_raises_on_contradictory_levels():
    import pytest
    with pytest.raises(ValueError, match="contradicts"):
        flatten_config({"keep_all_checkpoints": False,
                        "train": {"keep_all_checkpoints": True}})
    # same value in both places is fine (no ambiguity)
    flat = flatten_config({"accum_grad": 4, "train": {"accum_grad": 4}})
    assert flat["accum_grad"] == 4
