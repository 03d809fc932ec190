"""Orbax checkpoint backend: round-trip, resume-equivalence, cross-backend
loads (SURVEY.md §5.4 names orbax as the TPU-idiomatic form; the path-keyed
pickle stays the default)."""
import numpy as np
import pytest

import jax

from hnet_mamba_asr_tpu.training import checkpoint as ckpt
from hnet_mamba_asr_tpu.training.trainer import Trainer
from tests.test_trainer import CFG, ToyLoader, ToyModel


def _params(tr):
    return np.asarray(jax.device_get(tr.params["w"]))


def test_orbax_save_load_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "opt_state": {"['mu']['w']": np.ones((2, 3), np.float32)},
             "opt_state_format": "path_dict",
             "epoch": 3, "global_step": 42,
             "metric_history": {("valid", "loss"): {0: 1.0, 3: 0.5}},
             "config": {"optim": "adamw"}, "seed": 7}
    path = tmp_path / "latest.ckpt"
    ckpt.save_checkpoint(path, state, backend="orbax")
    assert path.is_dir() and (path / "meta.pkl").exists()
    back = ckpt.load_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])
    np.testing.assert_array_equal(back["opt_state"]["['mu']['w']"],
                                  state["opt_state"]["['mu']['w']"])
    assert back["epoch"] == 3 and back["global_step"] == 42
    assert back["metric_history"] == state["metric_history"]

    # replace-in-place (latest.ckpt is overwritten every save)
    state["global_step"] = 43
    ckpt.save_checkpoint(path, state, backend="orbax")
    assert ckpt.load_checkpoint(path)["global_step"] == 43

    ckpt.remove_checkpoint(path)
    assert not path.exists()


def test_orbax_unknown_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="ckpt_backend"):
        ckpt.save_checkpoint(tmp_path / "x.ckpt", {"epoch": 0}, backend="flax")


def test_trainer_orbax_resume_equals_straight_run(tmp_path):
    """2 epochs straight vs 1 epoch + orbax resume + 1 epoch: identical
    params (the pickle backend's resume-exactness bar, reference:
    src/dcasr/training/trainer.py:529-555)."""
    cfg = dict(CFG, max_epoch=2, ckpt_backend="orbax")
    straight = Trainer(ToyModel(), ToyLoader(), cfg,
                       ckpt_dir=tmp_path / "a")
    straight.train()

    first = Trainer(ToyModel(), ToyLoader(), dict(cfg, max_epoch=1),
                    ckpt_dir=tmp_path / "b")
    first.train()
    assert (tmp_path / "b" / "latest.ckpt").is_dir(), "orbax writes a dir"
    resumed = Trainer(ToyModel(), ToyLoader(), cfg, ckpt_dir=tmp_path / "b")
    resumed.train(resume="auto")
    np.testing.assert_array_equal(_params(straight), _params(resumed))


def test_cross_backend_loads(tmp_path):
    """A pickle-written run resumes under an orbax config and vice versa —
    load dispatches on what is on disk, so switching train.ckpt_backend
    mid-experiment is safe."""
    pickle_run = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1),
                         ckpt_dir=tmp_path / "p")
    pickle_run.train()
    resumed = Trainer(ToyModel(), ToyLoader(),
                      dict(CFG, max_epoch=2, ckpt_backend="orbax"),
                      ckpt_dir=tmp_path / "p")
    resumed.train(resume="auto")                 # loads pickle, saves orbax
    assert (tmp_path / "p" / "latest.ckpt").is_dir()

    orbax_run = Trainer(ToyModel(), ToyLoader(),
                        dict(CFG, max_epoch=1, ckpt_backend="orbax"),
                        ckpt_dir=tmp_path / "o")
    orbax_run.train()
    back = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2),
                   ckpt_dir=tmp_path / "o")
    back.train(resume="auto")                    # loads orbax, saves pickle
    assert (tmp_path / "o" / "latest.ckpt").is_file()
