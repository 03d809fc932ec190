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
        expand_cells({"read_outs": ["rnnt"]})
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
