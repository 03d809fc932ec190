"""Analysis scripts drive end to end on a synthetic corpus (vocab study)."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts" / "analysis"))


def test_vocab_analysis_runs(tmp_path, capsys):
    import vocab_analysis

    rng = np.random.default_rng(0)
    entries = [{"id": f"u{i}", "audio": "x.wav",
                "text": t, "frames": int(rng.integers(16000, 48000))}
               for i, t in enumerate(["the cat sat", "a dog ran fast",
                                      "hello world", "testing one two"] * 6)]
    m = tmp_path / "m.jsonl"
    with open(m, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    vocab_analysis.run(["--manifest", str(m), "--candidates", "24", "32",
                        "--min-count", "2", "--sample", "100"])
    out = capsys.readouterr().out
    assert "tok/utt" in out
    assert "24" in out or "32" in out
