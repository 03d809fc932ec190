"""End-to-end interpretability gate (CPU): analytic tone alignments -> real
train.py (N=2 dynamic chunking) -> all four run_interp.py modes -> gated
verdict, all through scripts/analysis/interp_e2e.py.

The reference runs its interp program (boundaries / probes / robustness /
emergence) over MFA forced alignments on LibriSpeech (reference:
scripts/run_interp.py, src/dcasr/interp/driver.py); this environment has no
LibriSpeech or MFA, but the tone corpus's word intervals are known
analytically, so the full pipeline — alignment integrity checks, boundary
collection + scoring with random floors, disjoint-split probes, perturbed
re-collection, per-epoch emergence — executes for real end to end."""
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts" / "analysis"))


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    import interp_e2e

    root = tmp_path_factory.mktemp("interp_e2e")
    # 12 epochs (~140 steps at N=2) is enough for a learning signal; the
    # probe gate tolerates a half-trained encoder (tones stay separable).
    return interp_e2e.run(interp_e2e.parse_args(
        ["--cpu", "--root", str(root), "--epochs", "12",
         "--word-probe-bar", "0.8"]))


def test_gate_passes(result):
    assert result["gate"], f"interp e2e gate failed: {result['checks']}"


def test_probes_beat_baselines(result):
    frames = result["probe_frames"]
    assert frames["word_id_accuracy"] >= 0.8
    assert frames["word_id_accuracy"] > frames["word_id_majority"]
    assert frames["phone_class_accuracy"] > frames["phone_class_majority"]


def test_boundaries_scored_with_floor(result):
    words = result["boundary_words"]
    assert 0.0 <= words["f1"] <= 1.0
    assert "boundary_random_f1" in result


def test_emergence_covers_epochs(result):
    # valid_interval=1 when emergence is requested -> one retained epoch
    # checkpoint (and one emergence row) per trained epoch
    assert len(result["emergence_epochs"]) >= 12
    assert result["emergence_epochs"] == sorted(result["emergence_epochs"])


def test_robustness_blocks(result):
    names = result["robustness_perturbations"]
    assert any("noise" in n for n in names)
    assert any("speed" in n for n in names)
    assert any("silence" in n for n in names)
