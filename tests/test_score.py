"""eval/score: record validation, bootstrap pairing, gate semantics, end-to-end dir."""
import json

import pytest

from hnet_mamba_asr_tpu.eval.score import (
    bootstrap_split, cell_summary, check_same_utterances, discover_cells,
    format_report, gate_check, load_decode_records, score_decode_dir, score_records,
)


def _write_jsonl(path, records):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _records(hyp_map):
    return [{"id": uid, "ref": ref, "hyp": hyp, "decode_s": 0.1, "audio_s": 2.0}
            for uid, (ref, hyp) in hyp_map.items()]


REFS = {
    "utt1": ("the cat sat on the mat", "the cat sat on the mat"),
    "utt2": ("a quick brown fox", "a quick brown box"),
    "utt3": ("hello world again", "hello word again"),
    "utt4": ("speech recognition works", "speech recognition works"),
}


def test_load_validates(tmp_path):
    p = tmp_path / "x.jsonl"
    _write_jsonl(p, _records(REFS))
    recs = load_decode_records(p)
    assert len(recs) == 4
    # duplicate id
    _write_jsonl(p, _records(REFS) + [{"id": "utt1", "ref": "a", "hyp": "a"}])
    with pytest.raises(ValueError, match="duplicate"):
        load_decode_records(p)
    # missing key
    _write_jsonl(p, [{"id": "u", "ref": "a"}])
    with pytest.raises(ValueError, match="hyp"):
        load_decode_records(p)
    # empty
    p.write_text("")
    with pytest.raises(ValueError, match="no decode records"):
        load_decode_records(p)


def test_score_records_counts():
    scored = score_records(_records(REFS))
    s = cell_summary(scored)
    assert s["n_utts"] == 4
    assert s["n_ref_words"] == 16
    assert s["wer_exact"] == pytest.approx(100 * 2 / 16)
    assert s["rtf"] == pytest.approx(0.4 / 8.0)
    assert s["sent_acc"] == pytest.approx(50.0)


def test_check_same_utterances():
    a = [{"id": "u1", "n_ref": 3}, {"id": "u2", "n_ref": 2}]
    b = [{"id": "u1", "n_ref": 3}, {"id": "u2", "n_ref": 2}]
    check_same_utterances({"a": a, "b": b})
    with pytest.raises(ValueError, match="different utterance sets"):
        check_same_utterances({"a": a, "b": a[:1]})
    with pytest.raises(ValueError, match="reference length"):
        check_same_utterances({"a": a, "b": [{"id": "u1", "n_ref": 4},
                                             {"id": "u2", "n_ref": 2}]})
    with pytest.raises(ValueError, match="zero-reference"):
        check_same_utterances({"a": [{"id": "u1", "n_ref": 0}]})


def test_bootstrap_identical_cells_p_one():
    utts = [{"id": f"u{i}", "n_ref": 5, "sub": i % 2, "del": 0, "ins": 0}
            for i in range(20)]
    out = bootstrap_split({"a": utts, "b": list(utts)}, n_resamples=200, seed=1)
    pair = out["pairs"][0]
    assert pair["delta"] == 0.0
    assert pair["p_value"] == pytest.approx(1.0)
    assert out["cells"]["a"]["wer_ci95"][0] <= out["cells"]["a"]["wer"] \
        <= out["cells"]["a"]["wer_ci95"][1]


def test_bootstrap_clear_difference():
    good = [{"id": f"u{i}", "n_ref": 5, "sub": 0, "del": 0, "ins": 0} for i in range(30)]
    bad = [{"id": f"u{i}", "n_ref": 5, "sub": 3, "del": 1, "ins": 0} for i in range(30)]
    out = bootstrap_split({"good": good, "bad": bad}, n_resamples=300, seed=1)
    pair = out["pairs"][0]
    assert pair["delta"] < 0
    assert pair["p_value"] < 0.05


def test_gate():
    cells = {"test-clean": {"ctc_greedy": {"wer": 11.99, "wer_exact": 11.994},
                            "aed_beam": {"wer": 9.0, "wer_exact": 9.0}}}
    g = gate_check(cells, {"sane_test_clean_wer_below": 12.0}, gate_cell="ctc_greedy")
    assert g["evaluated"] and g["passed"] and g["cell"] == "ctc_greedy"
    g = gate_check(cells, {"sane_test_clean_wer_below": 12.0})
    assert g["cell"] == "aed_beam"                      # best cell when unpinned
    g = gate_check(cells, {"sane_test_clean_wer_below": 11.994}, gate_cell="ctc_greedy")
    assert not g["passed"]                              # strict <, unrounded
    g = gate_check(cells, None)
    assert not g["evaluated"]
    g = gate_check({}, {"sane_test_clean_wer_below": 12.0})
    assert not g["evaluated"]


def test_score_decode_dir_end_to_end(tmp_path):
    d = tmp_path / "decode"
    for cell in ("ctc_greedy", "aed_beam"):
        _write_jsonl(d / cell / "test-clean.jsonl", _records(REFS))
    out = score_decode_dir(d, n_bootstrap=50, goal_cfg={"sane_test_clean_wer_below": 50.0},
                           gate_cell="ctc_greedy")
    assert out["gate"]["passed"]
    cells = out["splits"]["test-clean"]["cells"]
    assert set(cells) == {"ctc_greedy", "aed_beam"}
    assert "wer_ci95" in cells["ctc_greedy"]
    assert (d / "score" / "ctc_greedy" / "test-clean.jsonl").exists()
    report = format_report(out["splits"], out["gate"])
    assert "GATE PASS" in report
    tree = discover_cells(d)
    assert set(tree["test-clean"]) == {"ctc_greedy", "aed_beam"}


def test_discover_empty_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        discover_cells(tmp_path / "empty")
