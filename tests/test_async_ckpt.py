"""Async checkpoint writer: saved bytes identical to the synchronous path,
FIFO ordering with symlinks/prune, loud failure propagation, donation safety
(the snapshot must survive the next donating train step)."""
import pickle

import numpy as np
import pytest

import jax

from hnet_mamba_asr_tpu.training.async_ckpt import AsyncWriter
from hnet_mamba_asr_tpu.training.checkpoint import load_checkpoint
from hnet_mamba_asr_tpu.training.trainer import Trainer
from hnet_mamba_asr_tpu.parallel.mesh import make_mesh

from test_trainer import CFG, ToyLoader, ToyModel


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_async_equals_sync_checkpoint(tmp_path, mesh):
    """Same run with async_ckpt on/off writes bit-identical params/opt_state
    (the on-device snapshot + deferred fetch must not change values)."""
    outs = {}
    for mode in (True, False):
        ck = tmp_path / ("a" if mode else "s")
        tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, async_ckpt=mode),
                     dev_loaders={"dev": ToyLoader(2, seed=9)},
                     ckpt_dir=ck, mesh=mesh)
        tr.train()
        outs[mode] = load_checkpoint(ck / "latest.ckpt")
    a, s = outs[True], outs[False]
    assert a["epoch"] == s["epoch"] and a["global_step"] == s["global_step"]
    for k in a["params"]:
        np.testing.assert_array_equal(a["params"][k], s["params"][k])
    assert set(a["opt_state"]) == set(s["opt_state"])
    for k in a["opt_state"]:
        np.testing.assert_array_equal(a["opt_state"][k], s["opt_state"][k])


def test_async_save_survives_donating_step(tmp_path, mesh):
    """save_checkpoint mid-training enqueues a snapshot; the NEXT epoch's
    donating step invalidates the live buffers — the flushed checkpoint must
    still hold the values from save time, not fail on deleted arrays."""
    tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2),
                 ckpt_dir=tmp_path / "ck", mesh=mesh)
    tr.train()                            # epoch-end saves interleave epochs
    tr.flush_checkpoints()
    state = load_checkpoint(tmp_path / "ck" / "latest.ckpt")
    assert state["epoch"] == 1
    live = jax.device_get(tr.params)
    for k in live:
        np.testing.assert_array_equal(state["params"][k], np.asarray(live[k]))


def test_writer_failure_propagates():
    w = AsyncWriter()
    w.submit(lambda: (_ for _ in ()).throw(OSError("disk gone")))
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.flush()
    # writer remains usable after the failure is surfaced
    hits = []
    w.submit(lambda: hits.append(1))
    w.flush()
    assert hits == [1]
    w.close()
    with pytest.raises(RuntimeError, match="closed"):
        w.submit(lambda: None)


def test_writer_fifo_ordering():
    w = AsyncWriter()
    seen = []
    for i in range(20):
        w.submit(lambda i=i: seen.append(i))
    w.flush()
    assert seen == list(range(20))
    w.close()
    w.close()                             # idempotent


def test_async_checkpoint_loads_for_resume(tmp_path, mesh):
    ck = tmp_path / "ck"
    tr1 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1), ckpt_dir=ck,
                  mesh=mesh)
    tr1.train()
    tr2 = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=2), ckpt_dir=ck,
                  mesh=mesh)
    tr2.train(resume="auto")
    assert tr2.epoch >= 1 and tr2.global_step > tr1.global_step


def test_corrupt_dir_save_fails_loudly(tmp_path, mesh):
    """A failing async write must surface as an exception at the flush point,
    never a silently missing checkpoint."""
    ck = tmp_path / "ck"
    tr = Trainer(ToyModel(), ToyLoader(), dict(CFG, max_epoch=1), ckpt_dir=ck,
                 mesh=mesh)
    # sabotage: checkpoint dir becomes a file after Trainer created it
    for p in ck.iterdir():
        p.unlink()
    ck.rmdir()
    ck.write_bytes(b"not a directory")
    with pytest.raises((RuntimeError, OSError, pickle.PicklingError)):
        tr.train()
