"""Serving runtime: load and run exported ASR artifacts with jax + numpy ONLY.

This module is deliberately SELF-CONTAINED — no imports from the rest of the
package — so a deployment host can copy this one file next to an artifact
directory and serve the model without installing the framework (the test
suite proves it: tests/test_serving_export.py runs this file from a temp dir
with the repo stripped from sys.path). The reference has no deployment-export
story at all (torch checkpoints require the full source tree to load); this
is the TPU-idiomatic equivalent of a TorchScript/ONNX export: ahead-of-time
traced StableHLO programs (jax.export) that XLA compiles for whatever
devices the serving host has.

Artifact layout (produced by hnet_mamba_asr_tpu.serving.export):

    manifest.json     format/version, vocab contract, emit set, shape buckets
    params.npz        path-keyed flat weights (keys are jax keystr paths)
    f_<B>x<S>.shlo    one serialized jax.export function per (batch, samples)
                      bucket; called as fn(params_pytree, wave, wave_lens)

Calls pick the smallest bucket that fits, zero-pad rows/samples up to it, and
slice the outputs back. Padded rows carry wave_len 0 and come back with
enc_length 0 (the encoder's length formula maps 0 samples to 0 frames), so
they are inert without masking logic here.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1
_KEY_RE = re.compile(r"\['([^']*)'\]")


def params_to_tree(flat: dict) -> dict:
    """Path-keyed flat dict (jax keystr paths like "['a']['b']") -> nested dict."""
    tree: dict = {}
    for path, leaf in flat.items():
        keys = _KEY_RE.findall(path)
        if not keys:
            raise ValueError(f"unparseable params key {path!r}")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return tree


def collapse_ctc(frame_ids: np.ndarray, lengths: np.ndarray,
                 blank_id: int) -> list[list[int]]:
    """Standard CTC collapse: drop repeats, then blanks, per valid row span."""
    out = []
    for row, n in zip(np.asarray(frame_ids), np.asarray(lengths)):
        prev, toks = -1, []
        for t in row[: int(n)]:
            t = int(t)
            if t != prev and t != blank_id:
                toks.append(t)
            prev = t
        out.append(toks)
    return out


class ServingModel:
    """Callable wrapper over one exported artifact directory."""

    def __init__(self, artifact_dir: str | Path):
        d = Path(artifact_dir)
        manifest = json.loads((d / "manifest.json").read_text())
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')!r} != "
                f"supported {FORMAT_VERSION} — re-export with this runtime")
        self.manifest = manifest
        self.vocab_size = int(manifest["vocab_size"])
        self.blank_id = manifest.get("blank_id")
        self.emit = tuple(manifest["emit"])

        from jax import export as jax_export
        with np.load(d / "params.npz") as z:
            self._params = params_to_tree({k: z[k] for k in z.files})
        self._fns = {}
        for b in manifest["buckets"]:
            key = (int(b["batch"]), int(b["samples"]))
            self._fns[key] = jax_export.deserialize(
                (d / b["file"]).read_bytes())
        if not self._fns:
            raise ValueError("artifact has no shape buckets")

    @property
    def buckets(self) -> list[tuple[int, int]]:
        return sorted(self._fns)

    def _pick(self, B: int, S: int) -> tuple[int, int]:
        fits = [k for k in self._fns if k[0] >= B and k[1] >= S]
        if not fits:
            raise ValueError(
                f"no bucket fits batch={B} samples={S}; available: "
                f"{self.buckets} (longer audio must be chunked upstream)")
        return min(fits, key=lambda k: (k[0] * k[1], k))

    def __call__(self, wave: np.ndarray, wave_lens: np.ndarray) -> dict:
        """wave [B, S] float32, wave_lens [B] int -> dict of numpy outputs
        (per manifest emit: enc_lengths, frame_ids, log_probs, aed_ids),
        sliced back to the caller's batch size."""
        wave = np.asarray(wave, np.float32)
        wave_lens = np.asarray(wave_lens, np.int32)
        B, S = wave.shape
        bb, bs = self._pick(B, S)
        if (B, S) != (bb, bs):
            w = np.zeros((bb, bs), np.float32)
            w[:B, :S] = wave
            l = np.zeros((bb,), np.int32)
            l[:B] = wave_lens
            wave, wave_lens = w, l
        out = self._fns[(bb, bs)].call(self._params, wave, wave_lens)
        return {k: np.asarray(v)[:B] for k, v in out.items()}

    def transcribe_ids(self, wave: np.ndarray,
                       wave_lens: np.ndarray) -> list[list[int]]:
        """Greedy token ids per utterance (CTC collapse of frame_ids)."""
        if "frame_ids" not in self.emit:
            raise ValueError(f"artifact emits {self.emit}, not frame_ids")
        out = self(wave, wave_lens)
        return collapse_ctc(out["frame_ids"], out["enc_lengths"], self.blank_id)


def load_serving_artifact(artifact_dir: str | Path) -> ServingModel:
    return ServingModel(artifact_dir)


if __name__ == "__main__":  # smoke: python runtime.py <artifact_dir> <wav...>
    import sys
    m = load_serving_artifact(sys.argv[1])
    print(json.dumps({"buckets": m.buckets, "emit": list(m.emit),
                      "vocab_size": m.vocab_size}))
