"""Interp orchestration: boundary reports, probes, robustness, emergence.

Capability spec: reference src/dcasr/interp/driver.py. The audit mandates from
the reference's verification history are enforced structurally:

(a) probe train/test disjointness is asserted on the utterance ids ACTUALLY
    consumed from the loaders — contamination silently inflates accuracy;
(b) every scored utterance must have a TRUE audio duration (the random
    baseline's dart board; the last-unit fallback inflates the floor);
(c) word probes carry their top-k kept fractions on both sides;
(d) a random-baseline floor is computed and stored beside every boundary
    metric block.

Waveform perturbations run on the host (numpy) and each carries the time-
coordinate transform that maps CLEAN-time instants into perturbed time — it is
applied to the MFA truth AND to the clean boundaries, so robustness can
separate "boundaries moved" from "truth moved".
"""
from __future__ import annotations

import zlib
from pathlib import Path
from typing import Callable, Mapping, Sequence

import numpy as np

from hnet_mamba_asr_tpu.data.audio import apply_speed_perturb, read_audio
from hnet_mamba_asr_tpu.data.dataset import ASRDataset
from hnet_mamba_asr_tpu.data.manifests import SAMPLE_RATE, feat_frames
from hnet_mamba_asr_tpu.interp.boundary_align import (
    DEFAULT_TOL_S, aggregate, collect_boundaries, match_boundaries,
    random_baseline, score_utterances,
)
from hnet_mamba_asr_tpu.interp.probes import (
    collect_probe_data, subsample, to_classes, top_k_filter, train_probe,
)
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


# ═══ waveform perturbations ═══════════════════════════════════════════════════
def utt_seed(seed: int, uid: str) -> int:
    """Stable per-utterance RNG seed (crc32-based; python hash() is salted)."""
    return (zlib.crc32(str(uid).encode("utf-8"))
            ^ (int(seed) * 0x9E3779B9)) & 0x7FFFFFFF


class Perturbation:
    """Identity base. Subclasses override ``apply_wave`` (audio) and ``_t``
    (the clean-time -> perturbed-time map used for truth + clean boundaries)."""

    kind = "identity"
    name = "identity"

    # audio ------------------------------------------------------------------
    def apply_wave(self, wave: np.ndarray, uid: str, *, seed: int = 1,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
        return wave

    # time coordinates ---------------------------------------------------------
    def _t(self, t: float, duration: float) -> float:
        return t

    def transform_times(self, times: Sequence[float],
                        duration: float) -> list[float]:
        return [self._t(float(t), duration) for t in times]

    def transform_record(self, record: Mapping, duration: float) -> dict:
        moved = {k: v for k, v in record.items()
                 if k not in ("words", "phones")}
        for tier in ("words", "phones"):
            moved[tier] = [
                [label, self._t(float(s), duration), self._t(float(e), duration)]
                for label, s, e in record[tier]]
        return moved

    def transform_duration(self, duration: float) -> float:
        return duration

    def transform_samples(self, n: int) -> int:
        return int(n)


class NoisePerturbation(Perturbation):
    """White Gaussian noise at a target SNR. Time axis untouched."""

    kind = "noise"

    def __init__(self, snr_db: float):
        self.snr_db = float(snr_db)
        self.name = f"noise_snr{self.snr_db:g}"

    def apply_wave(self, wave, uid, *, seed=1, sample_rate=SAMPLE_RATE):
        signal_power = float(np.mean(np.square(wave)))
        if signal_power <= 0.0:
            return wave
        noise_rms = (signal_power / 10.0 ** (self.snr_db / 10.0)) ** 0.5
        gen = np.random.default_rng(utt_seed(seed, uid))
        return wave + noise_rms * gen.standard_normal(wave.shape)


class SpeedPerturbation(Perturbation):
    """Playback at factor-x speed via resampling; clean times scale 1/factor."""

    kind = "speed"

    def __init__(self, factor: float):
        if factor <= 0:
            raise ValueError(f"speed factor must be positive, got {factor}")
        self.factor = float(factor)
        self.name = f"speed_{self.factor:g}"

    def apply_wave(self, wave, uid, *, seed=1, sample_rate=SAMPLE_RATE):
        return apply_speed_perturb(wave, sample_rate, self.factor)

    def _t(self, t, duration):
        return t / self.factor

    def transform_duration(self, duration):
        return duration / self.factor

    def transform_samples(self, n):
        return round(n / self.factor)


class SilencePerturbation(Perturbation):
    """Digital silence spliced in at a fraction of the utterance; clean times
    at/after the splice shift right by its duration."""

    kind = "silence"

    def __init__(self, duration_s: float, at_frac: float = 0.5):
        if duration_s <= 0 or not 0.0 <= at_frac <= 1.0:
            raise ValueError("need duration_s > 0 and at_frac in [0, 1], got "
                             f"{duration_s}, {at_frac}")
        self.duration_s = float(duration_s)
        self.at_frac = float(at_frac)
        self.name = f"silence_{self.duration_s:g}s_at{self.at_frac:g}"

    def apply_wave(self, wave, uid, *, seed=1, sample_rate=SAMPLE_RATE):
        cut = round(self.at_frac * len(wave))
        hole = np.zeros(round(self.duration_s * sample_rate), dtype=wave.dtype)
        return np.concatenate([wave[:cut], hole, wave[cut:]])

    def _t(self, t, duration):
        return t if t < self.at_frac * duration else t + self.duration_s

    def window(self, duration: float) -> tuple[float, float]:
        """The inserted-silence interval, in perturbed-time coordinates."""
        begin = self.at_frac * duration
        return begin, begin + self.duration_s

    def transform_duration(self, duration):
        return duration + self.duration_s

    def transform_samples(self, n):
        return int(n) + round(self.duration_s * SAMPLE_RATE)


def perturbations_from_config(cfg: Mapping) -> list[Perturbation]:
    """robustness config block -> perturbation list."""
    out: list[Perturbation] = []
    out += [NoisePerturbation(snr) for snr in cfg.get("noise_snr_db", (20, 10, 5, 0))]
    out += [SpeedPerturbation(f) for f in cfg.get("speed_factors", (0.9, 1.1))]
    silence_cfg = cfg.get("silence", {})
    if silence_cfg is not None and silence_cfg is not False:
        silence_cfg = silence_cfg or {}
        out.append(SilencePerturbation(float(silence_cfg.get("duration_s", 0.5)),
                                       float(silence_cfg.get("at_frac", 0.5))))
    return out


class PerturbedDataset(ASRDataset):
    """Eval dataset that perturbs the waveform before batching; item lengths
    are recomputed from perturbed sample counts (approximate for speed —
    resampler rounding; the sampler only budgets with them)."""

    def __init__(self, entries, tokenizer, perturbation: Perturbation,
                 seed: int = 1):
        super().__init__(entries, tokenizer, augment=False)
        self.perturbation = perturbation
        self.perturb_seed = int(seed)
        self.lengths = [feat_frames(perturbation.transform_samples(e["frames"]))
                        for e in self.entries]

    def __getitem__(self, i: int) -> dict:
        entry = self.entries[self.items[i][0]]
        wave, _sr = read_audio(entry["audio"])
        wave = self.perturbation.apply_wave(
            wave, entry["id"], seed=self.perturb_seed,
            sample_rate=self.sample_rate)
        return {"wave": wave.astype(np.float32), "n_samples": len(wave),
                "tokens": np.asarray(self.tokenizer.encode(entry["text"]),
                                     dtype=np.int32),
                "id": entry["id"], "index": i}


# ═══ shared plumbing ══════════════════════════════════════════════════════════
def durations_from_entries(entries: Sequence[Mapping]) -> dict[str, float]:
    return {e["id"]: e["frames"] / SAMPLE_RATE for e in entries}


def assert_disjoint(a: set, b: set, what: str = "probe train/test") -> None:
    shared = set(a) & set(b)
    if shared:
        raise ValueError(
            f"{what} utterance sets overlap: {len(shared)} shared ids "
            f"(e.g. {sorted(shared)[:5]}) — contamination silently inflates "
            "probe accuracy; use disjoint splits")
    logger.info("%s disjointness verified: %d vs %d utts, 0 shared",
                what, len(set(a)), len(set(b)))


class RecordingLoader:
    """Loader proxy accumulating every consumed utterance id in ``.seen``."""

    def __init__(self, loader):
        self.loader = loader
        self.seen: set[str] = set()

    def __iter__(self):
        for batch in self.loader:
            self.seen.update(batch.get("ids", []))
            yield batch


def list_epoch_checkpoints(ckpt_dir: str | Path) -> list[tuple[int, Path]]:
    found = []
    for path in Path(ckpt_dir).glob("epoch*.ckpt"):
        try:
            found.append((int(path.stem[5:]), path))
        except ValueError:
            continue
    if not found:
        raise FileNotFoundError(
            f"no epoch*.ckpt checkpoints under {ckpt_dir} — emergence needs "
            "retained epochs (keep_all_checkpoints: true)")
    return sorted(found)


def matched_deltas(pred: Sequence[float], true: Sequence[float],
                   tol: float = DEFAULT_TOL_S) -> list[float]:
    """Signed pred-true offsets of the greedy matcher's hit pairs (same walk
    as match_boundaries, so len(result) == its hit count)."""
    ps, ts = sorted(pred), sorted(true)
    slack = tol + 1e-9
    deltas: list[float] = []
    pi = ti = 0
    while pi < len(ps) and ti < len(ts):
        gap = ps[pi] - ts[ti]
        if abs(gap) <= slack:
            deltas.append(gap)
            pi += 1
            ti += 1
        elif gap < 0:
            pi += 1
        else:
            ti += 1
    return deltas


# ═══ boundary report (mandates b + d + coverage) ═════════════════════════════
def boundary_report(encode_fn, loader, alignments: Mapping[str, Mapping],
                    durations: Mapping[str, float], *, tol: float = DEFAULT_TOL_S,
                    baseline_trials: int = 20, baseline_seed: int = 1,
                    require_coverage: bool = True) -> tuple[dict, dict]:
    """Collect + score boundaries per stage x tier with floors attached."""
    bounds = collect_boundaries(encode_fn, loader)
    if not bounds or not next(iter(bounds.values()), {}):
        raise ValueError("collect_boundaries returned nothing — empty loader?")
    scored_ids = set().union(*bounds.values()) & set(alignments)
    undurated = sorted(scored_ids - set(durations))
    if undurated:
        raise ValueError(f"{len(undurated)} scored utterances lack a true "
                         f"duration (e.g. {undurated[:5]}) — the random "
                         "baseline needs real audio durations")
    report: dict = {}
    for stage_idx in sorted(bounds):
        block: dict = {}
        for tier in ("words", "phones"):
            metrics = score_utterances(bounds[stage_idx], alignments, tier,
                                       tol, durations=durations)
            if require_coverage and metrics["missing_boundaries"]:
                raise ValueError(
                    f"stage {stage_idx}: {len(metrics['missing_boundaries'])} "
                    "aligned utterances have no boundaries (e.g. "
                    f"{metrics['missing_boundaries'][:5]}) — a partial "
                    "collection biases the corpus metric")
            metrics["random_baseline"] = random_baseline(
                metrics.pop("_per_utt"), tol, seed=baseline_seed,
                trials=baseline_trials)
            block[tier] = metrics
        report[f"stage{stage_idx}"] = block
    return report, bounds


# ═══ probe report (mandates a + c) ═══════════════════════════════════════════
def _fit_probe(Xtr, ytr, Xte, yte, *, train_cap, test_cap, max_iter, C, seed,
               backend="sklearn"):
    collected = (len(ytr), len(yte))
    Xtr, ytr = subsample(Xtr, ytr, train_cap, seed=seed)
    Xte, yte = subsample(Xte, yte, test_cap, seed=seed)
    result = train_probe(Xtr, ytr, Xte, yte, max_iter=max_iter, C=C, seed=seed,
                         backend=backend)
    result["n_collected_train"], result["n_collected_test"] = collected
    return result


def probe_report(encode_fn, train_loader, test_loader,
                 train_alignments: Mapping[str, Mapping],
                 test_alignments: Mapping[str, Mapping], *, n_stages: int,
                 levels: Sequence[str] = ("frames", "chunks"),
                 top_k_words: int = 500, train_cap: int = 50000,
                 test_cap: int = 20000, max_iter: int = 1000, C: float = 1.0,
                 seed: int = 1, backend: str = "sklearn") -> dict:
    """phone_id / phone_class / word_id probes per representation level."""
    bad_levels = set(levels) - {"frames", "chunks"}
    if bad_levels:
        raise ValueError(f"unknown probe levels {sorted(bad_levels)}; "
                         "choose from 'frames', 'chunks'")
    train_loader = RecordingLoader(train_loader)
    test_loader = RecordingLoader(test_loader)
    plan = ([("frames", 0)] if "frames" in levels else []) \
        + ([("chunks", s) for s in range(int(n_stages))]
           if "chunks" in levels else [])
    if not plan:
        raise ValueError(f"no probe levels selected from {levels!r}")

    fit_kw = dict(train_cap=train_cap, test_cap=test_cap, max_iter=max_iter,
                  C=C, seed=seed, backend=backend)
    report: dict = {}
    for level, stage in plan:
        key = "frames" if level == "frames" else f"chunks_s{stage}"
        entry: dict = {}
        # phones: id + manner class from one collection pass
        Xtr, ytr = collect_probe_data(encode_fn, train_loader, train_alignments,
                                      "phones", level=level, stage=stage)
        Xte, yte = collect_probe_data(encode_fn, test_loader, test_alignments,
                                      "phones", level=level, stage=stage)
        assert_disjoint(train_loader.seen, test_loader.seen)
        entry["phone_id"] = _fit_probe(Xtr, ytr, Xte, yte, **fit_kw)
        entry["phone_class"] = _fit_probe(Xtr, to_classes(ytr),
                                          Xte, to_classes(yte), **fit_kw)
        # words: restrict to the training set's top-k, report kept fractions
        Xtr, ytr = collect_probe_data(encode_fn, train_loader, train_alignments,
                                      "words", level=level, stage=stage)
        Xte, yte = collect_probe_data(encode_fn, test_loader, test_alignments,
                                      "words", level=level, stage=stage)
        assert_disjoint(train_loader.seen, test_loader.seen)
        Xtr, ytr, train_cov = top_k_filter(Xtr, ytr, top_k_words)
        vocab = set(ytr)
        keep_rows = [i for i, lab in enumerate(yte) if lab in vocab]
        test_cov = len(keep_rows) / max(1, len(yte))
        word = _fit_probe(Xtr, ytr, [Xte[i] for i in keep_rows],
                          [yte[i] for i in keep_rows], **fit_kw)
        word.update(top_k=top_k_words, train_kept_fraction=train_cov,
                    test_kept_fraction=test_cov)
        entry["word_id"] = word
        report[key] = entry
    return report


# ═══ robustness ═══════════════════════════════════════════════════════════════
def score_perturbation(pert: Perturbation, clean_bounds: Mapping[int, Mapping],
                       pert_bounds: Mapping[int, Mapping],
                       alignments: Mapping[str, Mapping],
                       durations: Mapping[str, float], *,
                       tol: float = DEFAULT_TOL_S, baseline_trials: int = 10,
                       baseline_seed: int = 1) -> dict:
    """Score perturbed boundaries against (i) the time-transformed truth and
    (ii) the time-transformed CLEAN boundaries (consistency: did they move?)."""
    moved_truth = {uid: pert.transform_record(alignments[uid], durations[uid])
                   for uid in alignments if uid in durations}
    moved_durations = {uid: pert.transform_duration(d)
                       for uid, d in durations.items()}
    out: dict = {}
    for stage_idx in sorted(pert_bounds):
        block: dict = {}
        for tier in ("words", "phones"):
            metrics = score_utterances(pert_bounds[stage_idx], moved_truth,
                                       tier, tol, durations=moved_durations)
            metrics["random_baseline"] = random_baseline(
                metrics.pop("_per_utt"), tol, seed=baseline_seed,
                trials=baseline_trials)
            block[tier] = metrics
        overlap = sorted(set(pert_bounds[stage_idx])
                         & set(clean_bounds.get(stage_idx, {}))
                         & set(durations))
        if not overlap:
            raise ValueError(f"stage {stage_idx}: no shared utterances between "
                             f"clean and {pert.name} boundary collections")
        pair_counts, shifts = [], []
        for uid in overlap:
            moved_clean = pert.transform_times(clean_bounds[stage_idx][uid],
                                               durations[uid])
            pair_counts.append(match_boundaries(pert_bounds[stage_idx][uid],
                                                moved_clean, tol))
            shifts.extend(matched_deltas(pert_bounds[stage_idx][uid],
                                         moved_clean, tol))
        consistency = aggregate(pair_counts)
        consistency["mean_abs_shift_s"] = (
            float(np.mean(np.abs(shifts))) if shifts else 0.0)
        block["consistency"] = consistency
        if isinstance(pert, SilencePerturbation):
            block["inserted_window"] = _window_stats(
                pert, pert_bounds[stage_idx], durations)
        out[f"stage{stage_idx}"] = block
    return out


def _window_stats(pert: SilencePerturbation,
                  bounds: Mapping[str, Sequence[float]],
                  durations: Mapping[str, float]) -> dict:
    """Boundary rate strictly INSIDE the inserted-silence window vs overall —
    boundaries inside pure silence track acoustics, not linguistic content
    (the window edges are real speech/silence transitions, not counted)."""
    inside = everywhere = 0
    window_seconds = total_seconds = 0.0
    for uid, times in bounds.items():
        if uid not in durations:
            continue
        lo, hi = pert.window(durations[uid])
        inside += sum(1 for t in times if lo < t < hi)
        everywhere += len(times)
        window_seconds += pert.duration_s
        total_seconds += pert.transform_duration(durations[uid])
    return {"n_in_window": inside, "n_total": everywhere,
            "window_rate_per_s": inside / window_seconds if window_seconds else 0.0,
            "overall_rate_per_s": everywhere / total_seconds if total_seconds else 0.0}


def robustness_report(perturbations: Sequence[Perturbation],
                      collect_fn: Callable[[Perturbation], Mapping[int, Mapping]],
                      clean_bounds: Mapping[int, Mapping],
                      alignments: Mapping[str, Mapping],
                      durations: Mapping[str, float], *,
                      tol: float = DEFAULT_TOL_S, baseline_trials: int = 10,
                      baseline_seed: int = 1) -> dict:
    names = [p.name for p in perturbations]
    collisions = sorted({n for n in names if names.count(n) > 1})
    if collisions:
        raise ValueError(f"duplicate perturbation names {collisions} would "
                         "silently overwrite each other's results")
    report = {}
    for pert in perturbations:
        logger.info("robustness: collecting boundaries under %s", pert.name)
        report[pert.name] = score_perturbation(
            pert, clean_bounds, collect_fn(pert), alignments, durations,
            tol=tol, baseline_trials=baseline_trials,
            baseline_seed=baseline_seed)
    return report


# ═══ emergence curves ═════════════════════════════════════════════════════════
_CURVE_KEYS = {"precision", "recall", "f1", "r_value", "over_seg", "accuracy",
               "balanced_accuracy", "majority_baseline", "chance",
               "train_kept_fraction", "test_kept_fraction", "mean_abs_shift_s"}


def flatten_metrics(nested: Mapping, prefix: str = "interp") -> dict[str, float]:
    """Nested report -> {slash/joined/key: float} for curve-worthy leaves
    (random-baseline floors included — mandate d)."""
    flat: dict[str, float] = {}

    def descend(node, trail):
        for key, value in node.items():
            if isinstance(value, Mapping):
                descend(value, trail + [str(key)])
            elif key in _CURVE_KEYS and isinstance(value, (int, float)):
                flat["/".join(trail + [str(key)])] = float(value)

    descend(nested, [prefix])
    return flat


def emergence_report(make_encode_fn: Callable[[Path], Callable],
                     checkpoints: Sequence[tuple[int, Path]], loader,
                     alignments: Mapping[str, Mapping],
                     durations: Mapping[str, float], *,
                     tol: float = DEFAULT_TOL_S, baseline_trials: int = 10,
                     baseline_seed: int = 1, probe_fn: Callable | None = None,
                     mlogger=None) -> list[dict]:
    """Boundary metrics (+ optional probes) per retained epoch checkpoint;
    ``make_encode_fn(path)`` builds the encoder forward for that checkpoint,
    and scalars land on ``mlogger`` at step == epoch."""
    rows = []
    for epoch, path in checkpoints:
        encode_fn = make_encode_fn(path)
        report, _ = boundary_report(encode_fn, loader, alignments, durations,
                                    tol=tol, baseline_trials=baseline_trials,
                                    baseline_seed=baseline_seed)
        row: dict = {"epoch": int(epoch), "checkpoint": str(path),
                     "boundaries": report}
        if probe_fn is not None:
            row["probes"] = probe_fn(encode_fn)
        if mlogger is not None:
            mlogger.log_scalars(
                flatten_metrics({k: v for k, v in row.items()
                                 if isinstance(v, dict)}),
                step=int(epoch), epoch=int(epoch))
        logger.info("emergence: epoch %d done (%s)", epoch, Path(path).name)
        rows.append(row)
    return rows
