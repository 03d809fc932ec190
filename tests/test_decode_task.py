"""decode_task: the 7-cell matrix expansion contract, head checks, knobs."""
import pytest

from hnet_mamba_asr_tpu.tasks.decode_task import (
    as_str_list, check_heads, expand_cells, length_bonus_for,
)


def test_canonical_seven_cells():
    cells = expand_cells({"read_outs": ["ctc", "aed", "joint"],
                          "search": ["greedy", "beam"], "lm": "enabled"})
    assert [c["name"] for c in cells] == [
        "ctc_greedy", "ctc_beam", "ctc_beam_lm",
        "aed_beam", "aed_beam_lm", "joint_beam", "joint_beam_lm"]


def test_greedy_is_ctc_only():
    cells = expand_cells({"read_outs": ["aed"], "search": ["beam"]})
    assert [c["name"] for c in cells] == ["aed_beam"]
    with pytest.raises(ValueError, match="no cells"):
        expand_cells({"read_outs": ["aed"], "search": ["greedy"]})


def test_lm_off_variants():
    for lm in (None, False, "none", "false", ""):
        cells = expand_cells({"read_outs": ["ctc"], "search": ["beam"], "lm": lm})
        assert [c["name"] for c in cells] == ["ctc_beam"]


def test_lm_beam_only():
    cells = expand_cells({"read_outs": ["ctc"], "search": ["greedy", "beam"],
                          "lm": "enabled"})
    names = [c["name"] for c in cells]
    assert "ctc_greedy_lm" not in names                # greedy never gets LM
    assert "ctc_beam_lm" in names


def test_duplicates_decode_once():
    cells = expand_cells({"read_outs": ["ctc", "ctc"], "search": ["beam", "beam"]})
    assert [c["name"] for c in cells] == ["ctc_beam"]


def test_unknown_values_raise():
    with pytest.raises(ValueError, match="read_out"):
        expand_cells({"read_outs": ["transducerx"]})
    with pytest.raises(ValueError, match="search"):
        expand_cells({"read_outs": ["ctc"], "search": ["astar"]})


def test_defaults():
    cells = expand_cells({})
    assert [c["name"] for c in cells] == ["ctc_greedy", "ctc_beam"]


def test_as_str_list():
    assert as_str_list(None, ["a"]) == ["a"]
    assert as_str_list("x", ["a"]) == ["x"]
    assert as_str_list(["x", "y"], []) == ["x", "y"]


def test_check_heads():
    class M:
        ctc = object()
        aed = None

    cells = expand_cells({"read_outs": ["ctc"], "search": ["greedy"]})
    check_heads(M(), cells)                            # fine
    with pytest.raises(ValueError, match="no AED head"):
        check_heads(M(), expand_cells({"read_outs": ["joint"], "search": ["beam"]}))
    M2 = type("M2", (), {"ctc": None, "aed": object()})
    with pytest.raises(ValueError, match="no CTC head"):
        check_heads(M2(), expand_cells({"read_outs": ["ctc"], "search": ["beam"]}))


def test_length_bonus_default_zero():
    assert length_bonus_for({}) == 0.0
    assert length_bonus_for({"length_bonus": 2.0}) == 2.0


def test_shared_encoder_matches_per_cell(tmp_path):
    """decode_split_shared (one encoder pass fanned out to all cells) must
    produce identical transcripts to the per-cell decode_split path."""
    import json

    import jax
    import numpy as np

    from hnet_mamba_asr_tpu.data.dataset import ASRDataset, make_dataloader
    from hnet_mamba_asr_tpu.data.synthetic import build_tone_corpus
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import (
        decode_split, decode_split_shared,
    )

    entries = build_tone_corpus(tmp_path, n_utts=6)
    tok = Tokenizer.train([e["text"] for e in entries], tmp_path / "bpe",
                          vocab_size=12, hard_vocab_limit=False)
    cfg = {"encoder": "dcasr", "head": "ctc",
           "frontend_conf": {"n_mels": 20},
           "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                            "n_main": 1, "n_dec": 1, "arch_type": "A",
                            "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                            "hnet": {"compression_N": 1}},
           "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 32,
                        "dropout": 0.0, "max_decode_len": 8},
           "model_conf": {"ctc_weight": 0.5, "aed_weight": 0.5}}
    model = build_model(cfg, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    audio_s = {e["id"]: e["frames"] / 16000 for e in entries}
    cells = expand_cells({"read_outs": ["ctc", "aed", "joint"],
                          "search": ["greedy", "beam"], "lm": "none"})
    dc = {"beam_size": 2, "pre_beam": 4, "ctc_weight": 0.3}

    def loader():
        ds = ASRDataset(tmp_path / "manifests" / "test-clean.jsonl", tok,
                        augment=False)
        return make_dataloader(ds, 4000, batch_multiple=1)[0]

    for cell in cells:
        decode_split(model, params, tok, loader(), cell, dc,
                     audio_seconds=audio_s,
                     out_path=tmp_path / "per" / cell["name"] / "t.jsonl")
    summaries = decode_split_shared(model, params, tok, loader(), cells, dc,
                                    audio_seconds=audio_s,
                                    out_dir=tmp_path / "shared", split="t")
    assert {s["cell"] for s in summaries} == {c["name"] for c in cells}
    for cell in cells:
        per = {r["id"]: r["hyp"] for r in map(json.loads, (
            tmp_path / "per" / cell["name"] / "t.jsonl").read_text().splitlines())}
        shared = {r["id"]: r["hyp"] for r in map(json.loads, (
            tmp_path / "shared" / cell["name"] / "t.jsonl").read_text().splitlines())}
        assert per == shared, cell["name"]
    # encoder charged once across cells: summed enc time must be ~1/len(cells)
    # per cell relative to per-cell accounting; just sanity the fields exist
    for s in summaries:
        assert s["n_utts"] == 6 and s["rtf"] is not None
