"""Mesh-sharded decode == single-device decode, transcript-for-transcript.

decode_batch(mesh=...) dp-shards each batch over the virtual 8-CPU mesh (and
tensor-shards params on a (dp, tp) mesh); GSPMD must not change any search
result — greedy, CTC prefix beam, or the lockstep joint beam."""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from __graft_entry__ import _batch, _small_config  # noqa: E402

from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, place_params  # noqa: E402
from hnet_mamba_asr_tpu.tasks.asr_task import build_model  # noqa: E402
from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch  # noqa: E402

VOCAB = 24


@pytest.fixture(scope="module")
def setup():
    cfg = _small_config(tiny=True)
    cfg["train"]["precision"] = "fp32"          # exact across sharding layouts
    model = build_model(cfg, VOCAB)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=8, frames=40, n_mels=20, vocab=VOCAB, seed=3)
    batch["ids"] = [f"u{i}" for i in range(8)]
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=VOCAB,
                          decode=lambda ids: " ".join(map(str, ids)))
    return model, params, batch, tok


CELLS = [
    {"read_out": "ctc", "search": "greedy", "lm": False, "name": "ctc_greedy"},
    {"read_out": "ctc", "search": "beam", "lm": False, "name": "ctc_beam"},
    {"read_out": "joint", "search": "beam", "lm": False, "name": "joint_beam"},
]
DC = {"beam_size": 3, "pre_beam": 4, "ctc_weight": 0.3}


@pytest.mark.parametrize("cell", CELLS, ids=lambda c: c["name"])
def test_mesh_decode_matches_single_device(setup, cell):
    model, params, batch, tok = setup
    ref = decode_batch(model, params, tok, dict(batch), cell, DC)
    for tp in (1, 2):                            # dp-only and (dp=4, tp=2)
        mesh = make_mesh(8, tp=tp)
        placed = place_params(params, mesh)
        got = decode_batch(model, placed, tok, dict(batch), cell, DC,
                           mesh=mesh)
        assert [r["hyp"] for r in got] == [r["hyp"] for r in ref], (cell, tp)
        assert [r["id"] for r in got] == [r["id"] for r in ref]


def test_mesh_decode_partial_batch(setup):
    """row_mask padding rows + mesh sharding coexist."""
    model, params, batch, tok = setup
    b2 = dict(batch)
    b2["row_mask"] = np.array([True] * 6 + [False] * 2)
    b2["ids"] = b2["ids"][:6]
    cell = CELLS[0]
    ref = decode_batch(model, params, tok, dict(b2), cell, DC)
    mesh = make_mesh(8)
    got = decode_batch(model, place_params(params, mesh), tok, dict(b2), cell,
                       DC, mesh=mesh)
    assert len(got) == len(ref) == 6
    assert [r["hyp"] for r in got] == [r["hyp"] for r in ref]


@pytest.fixture(scope="module")
def rnnt_setup():
    cfg = _small_config(tiny=True)
    cfg["train"]["precision"] = "fp32"
    cfg["rnnt_conf"] = {"d_pred": 8, "d_joint": 16, "context": 2,
                        "max_symbols": 2}
    cfg["model_conf"] = dict(cfg["model_conf"], ctc_weight=0.3,
                             aed_weight=0.0, rnnt_weight=0.7)
    model = build_model(cfg, VOCAB)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(B=8, frames=40, n_mels=20, vocab=VOCAB, seed=5)
    batch["ids"] = [f"u{i}" for i in range(8)]
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=VOCAB,
                          decode=lambda ids: " ".join(map(str, ids)))
    return model, params, batch, tok


@pytest.mark.parametrize("cell", [
    {"read_out": "rnnt", "search": "greedy", "lm": False,
     "name": "rnnt_greedy"},
    {"read_out": "rnnt", "search": "beam", "lm": False, "name": "rnnt_beam"},
], ids=lambda c: c["name"])
def test_mesh_decode_rnnt_matches_single_device(rnnt_setup, cell):
    """The transducer family shards like every other cell: GSPMD dp/tp
    sharding must not change the jitted greedy scan or the device beam."""
    model, params, batch, tok = rnnt_setup
    ref = decode_batch(model, params, tok, dict(batch), cell, DC)
    for tp in (1, 2):
        mesh = make_mesh(8, tp=tp)
        placed = place_params(params, mesh)
        got = decode_batch(model, placed, tok, dict(batch), cell, DC,
                           mesh=mesh)
        assert [r["hyp"] for r in got] == [r["hyp"] for r in ref], (cell, tp)
