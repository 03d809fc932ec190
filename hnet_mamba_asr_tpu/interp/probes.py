"""Linear probes on frozen representations: phone id / phone class / word id.

A probe is a plain multinomial logistic regression — too weak to compute
anything itself, so probe accuracy measures what is LINEARLY readable from a
representation (behavioral spec: reference src/dcasr/interp/probes.py). Labels
come from forced alignment: a 25 Hz frame gets the unit whose interval
contains its center time (the verified 0.04*i + 0.0425 s geometry); a chunk
gets the majority label over its fine-frame span. Stress digits collapse
(AH0 -> AH); 'spn' (OOV) and silence positions are excluded; the word probe
restricts to the top-K most frequent TRAINING words (coverage reported).

Backends: 'sklearn' (the verified reference) or 'lbfgs' — scipy L-BFGS-B on
sklearn's EXACT convex objective 0.5*||W||^2 + C * sum CE_i (bias unpenalized,
fp64, gtol 1e-4). The problem is convex with a unique optimum, so both reach
the same solution; the lbfgs path avoids sklearn's per-class overhead at frame
scale. ('jax'/'torch' config values alias to 'lbfgs'.)
"""
from __future__ import annotations

import random
from collections import Counter
from typing import Mapping, Sequence

import numpy as np

from hnet_mamba_asr_tpu.interp.boundary_align import BOUNDARY_OFFSET_S, FRAME_PERIOD_S
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)

FRAME0_CENTER_S = BOUNDARY_OFFSET_S + FRAME_PERIOD_S / 2      # 0.0425

_PHONE_CLASSES = {
    **{p: "vowel" for p in ("AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
                            "IH", "IY", "OW", "OY", "UH", "UW")},
    **{p: "stop" for p in ("B", "D", "G", "K", "P", "T")},
    **{p: "affricate" for p in ("CH", "JH")},
    **{p: "fricative" for p in ("DH", "F", "HH", "S", "SH", "TH", "V", "Z", "ZH")},
    **{p: "nasal" for p in ("M", "N", "NG")},
    **{p: "liquid" for p in ("L", "R")},
    **{p: "glide" for p in ("W", "Y")},
}
EXCLUDED_PHONES = {"spn"}


def collapse_stress(phone: str) -> str:
    return phone.rstrip("012")


def phone_class(phone: str) -> str | None:
    return _PHONE_CLASSES.get(collapse_stress(phone))


def to_classes(labels: Sequence[str]) -> list[str]:
    out = []
    for lab in labels:
        c = phone_class(lab)
        if c is None:
            raise ValueError(f"phone {lab!r} has no manner class")
        out.append(c)
    return out


def frame_time(i: int) -> float:
    return FRAME_PERIOD_S * i + FRAME0_CENTER_S


def frame_labels(record: Mapping, n_frames: int, tier: str) -> list[str | None]:
    """Per 25 Hz frame: the unit containing the frame CENTER (None = silence)."""
    units = record[tier]
    out: list[str | None] = [None] * int(n_frames)
    k = 0
    for i in range(int(n_frames)):
        t = frame_time(i)
        while k < len(units) and float(units[k][2]) <= t:
            k += 1
        if k < len(units) and float(units[k][1]) <= t < float(units[k][2]):
            label = str(units[k][0])
            if tier == "phones":
                if label in EXCLUDED_PHONES:
                    continue
                label = collapse_stress(label)
            out[i] = label
    return out


def chunk_spans(b_row: Sequence[float], length: int) -> list[tuple[int, int]]:
    """Boundary vector -> [(start, end_exclusive)] per chunk. Frames before the
    first boundary merge into chunk 0 (membership = clamp(cumsum(b)-1, 0))."""
    if int(length) <= 0:
        return []
    starts = [i for i in range(int(length)) if float(b_row[i]) >= 0.5]
    if not starts:
        starts = [0]
    elif starts[0] != 0:
        starts[0] = 0
    ends = starts[1:] + [int(length)]
    return list(zip(starts, ends))


def majority_label(labels: Sequence[str | None]) -> str | None:
    counts = Counter(l for l in labels if l is not None)
    return counts.most_common(1)[0][0] if counts else None


def collect_probe_data(encode_fn, loader, alignments: Mapping[str, Mapping],
                       tier: str, *, level: str = "frames",
                       stage: int = 0) -> tuple[list, list]:
    """Run the encoder; return (vectors, labels) for labeled positions only.

    ``encode_fn(batch) -> EncoderOutput``. level='frames' uses the fine-rate
    output; level='chunks' uses stage-N chunk embeddings labeled by majority
    over the chunk's fine span (stage 1 spans map through stage-0 chunks).

    CONTRACT: probe train/test loaders must cover DISJOINT utterances —
    contamination silently inflates accuracy (+0.77 measured on a random
    encoder in the reference's audit). The driver asserts this.
    """
    if level not in ("frames", "chunks"):
        raise ValueError(f"level must be 'frames' or 'chunks', got {level!r}")
    X, y = [], []
    for batch in loader:
        ids = batch.get("ids", [])
        enc = encode_fn(batch)
        feats = np.asarray(enc.features, dtype=np.float32)
        lengths = np.asarray(enc.lengths)
        for bi, uid in enumerate(ids):
            if uid not in alignments:
                continue
            L = int(lengths[bi])
            labels = frame_labels(alignments[uid], L, tier)
            if level == "frames":
                for i, lab in enumerate(labels):
                    if lab is not None:
                        X.append(feats[bi, i])
                        y.append(lab)
                continue
            b0 = np.asarray(enc.boundaries[0][1][bi], dtype=np.float32)
            spans = chunk_spans(b0, L)
            if stage == 0:
                z = np.asarray(enc.chunk_embeddings[0][bi], dtype=np.float32)
            else:
                if len(enc.chunk_embeddings) < 2:
                    raise ValueError("stage 1 requested but encoder has one stage")
                z = np.asarray(enc.chunk_embeddings[1][bi], dtype=np.float32)
                b1 = np.asarray(enc.boundaries[1][1][bi], dtype=np.float32)
                s2 = chunk_spans(b1, len(spans))
                spans = [(spans[a][0], spans[b - 1][1]) for a, b in s2
                         if b <= len(spans)]
            for j, (a, b) in enumerate(spans):
                if j >= z.shape[0]:
                    break
                lab = majority_label(labels[a:b])
                if lab is not None:
                    X.append(z[j])
                    y.append(lab)
    logger.info("probe data: level=%s tier=%s stage=%d -> %d labeled samples",
                level, tier, stage, len(X))
    return X, y


def subsample(X: Sequence, y: Sequence, cap: int, seed: int = 1):
    if len(X) <= cap:
        return list(X), list(y)
    idx = list(range(len(X)))
    random.Random(seed).shuffle(idx)
    idx = sorted(idx[:cap])
    return [X[i] for i in idx], [y[i] for i in idx]


def top_k_filter(X: Sequence, y: Sequence, k: int):
    """Restrict to the top-k most frequent labels; (X, y, kept fraction).
    Call on the probe TRAINING side only."""
    counts = Counter(y)
    keep = {lab for lab, _ in counts.most_common(k)}
    pairs = [(x, lab) for x, lab in zip(X, y) if lab in keep]
    coverage = len(pairs) / max(1, len(y))
    return [p[0] for p in pairs], [p[1] for p in pairs], coverage


def _lbfgs_fit(X_train, y_train, X_test, *, max_iter: int, C: float):
    """scipy L-BFGS-B on sklearn's exact multinomial objective (fp64, W init 0,
    bias unpenalized, gtol 1e-4). Returns (predicted labels, n_iter)."""
    from scipy.optimize import minimize

    classes = sorted(set(y_train))
    idx = {c: i for i, c in enumerate(classes)}
    Xt = np.asarray(X_train, dtype=np.float64)
    yt = np.asarray([idx[c] for c in y_train])
    n, d = Xt.shape
    k = len(classes)
    onehot = np.zeros((n, k))
    onehot[np.arange(n), yt] = 1.0

    def objective(theta):
        W = theta[:d * k].reshape(d, k)
        b = theta[d * k:]
        logits = Xt @ W + b
        logits -= logits.max(axis=1, keepdims=True)
        logZ = np.log(np.exp(logits).sum(axis=1))
        ce = (logZ - logits[np.arange(n), yt]).sum()
        loss = 0.5 * (W ** 2).sum() + C * ce
        probs = np.exp(logits - logZ[:, None])
        grad_logits = C * (probs - onehot)
        gW = Xt.T @ grad_logits + W
        gb = grad_logits.sum(axis=0)
        return loss, np.concatenate([gW.ravel(), gb])

    theta0 = np.zeros(d * k + k)
    res = minimize(objective, theta0, jac=True, method="L-BFGS-B",
                   options={"maxiter": int(max_iter), "gtol": 1e-4})
    W = res.x[:d * k].reshape(d, k)
    b = res.x[d * k:]
    pred_idx = (np.asarray(X_test, dtype=np.float64) @ W + b).argmax(axis=1)
    return np.asarray([classes[i] for i in pred_idx]), int(res.nit)


def train_probe(X_train, y_train, X_test, y_test, *, max_iter: int = 200,
                C: float = 1.0, seed: int = 1, backend: str = "sklearn") -> dict:
    """Fit + score a probe; accuracy and balanced accuracy vs majority/chance.

    Test items of classes never seen in training are dropped and counted in
    ``n_test_dropped_unseen`` — report it beside accuracy (on skewed labels the
    headline can otherwise describe under half the frames)."""
    from sklearn.metrics import balanced_accuracy_score

    backend = {"jax": "lbfgs", "torch": "lbfgs", "scipy": "lbfgs"}.get(backend,
                                                                       backend)
    if backend not in ("sklearn", "lbfgs"):
        raise ValueError(f"backend must be 'sklearn' or 'lbfgs', got {backend!r}")
    train_classes = set(y_train)
    if len(train_classes) < 2:
        raise ValueError(f"probe needs >= 2 training classes, got {len(train_classes)}")
    kept = [i for i, lab in enumerate(y_test) if lab in train_classes]
    dropped_test = len(y_test) - len(kept)
    X_test = [X_test[i] for i in kept]
    y_test = [y_test[i] for i in kept]
    if not y_train or not y_test:
        raise ValueError("empty probe train or test set")
    if backend == "lbfgs" and len(train_classes) == 2:
        # sklearn parameterizes 2 classes as a binary sigmoid — a different
        # regularized optimum than a 2-column softmax. Binary fits are cheap:
        # stay on the reference (production probes have >= 7 classes).
        backend = "sklearn"
    if backend == "sklearn":
        from sklearn.linear_model import LogisticRegression
        clf = LogisticRegression(max_iter=max_iter, C=C, random_state=seed)
        clf.fit(np.asarray(X_train), y_train)
        pred = clf.predict(np.asarray(X_test))
        n_iter = int(np.max(clf.n_iter_))
    else:
        pred, n_iter = _lbfgs_fit(X_train, y_train, X_test,
                                  max_iter=max_iter, C=C)
    acc = float(np.mean(pred == np.asarray(y_test)))
    majority = Counter(y_train).most_common(1)[0][0]
    return {"accuracy": acc,
            "balanced_accuracy": float(balanced_accuracy_score(y_test, pred)),
            "majority_baseline": sum(l == majority for l in y_test) / len(y_test),
            "chance": 1.0 / len(train_classes), "n_classes": len(train_classes),
            "n_train": len(y_train), "n_test": len(y_test),
            "n_test_dropped_unseen": dropped_test,
            "n_iter": n_iter, "backend": backend}
