"""Linear probes on frozen representations: phone id / phone class / word id.

A probe is a plain multinomial logistic regression — too weak to compute
anything itself, so its accuracy measures what is LINEARLY readable from a
representation (capability spec: reference src/dcasr/interp/probes.py).
Labeling geometry: a 25 Hz frame takes the unit whose interval contains its
center time (0.04*i + 0.0425 s, the verified frontend+conv timing model); a
chunk takes the majority label over its fine-frame span. ARPA stress digits
collapse (AH0 -> AH); 'spn' (OOV) and silence stay unlabeled; the word probe
restricts to the top-K most frequent TRAINING words with coverage reported.

Backends (all minimizing sklearn's EXACT convex objective
0.5*||W||^2 + C * sum_i CE_i, bias unpenalized — convexity gives a unique
optimum, so they agree):
  - 'sklearn': the verified reference implementation (host CPU);
  - 'lbfgs':   scipy L-BFGS-B (host CPU, fp64, gtol 1e-4); 'scipy' aliases;
  - 'jax':     jitted optax.lbfgs on the accelerator — the TPU analog of the
               reference's ~135x torch-LBFGS GPU backend (reference:
               src/dcasr/interp/probes.py:189-236); 'torch' aliases here.
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

_MANNER = {
    "vowel": "AA AE AH AO AW AY EH ER EY IH IY OW OY UH UW",
    "stop": "B D G K P T",
    "affricate": "CH JH",
    "fricative": "DH F HH S SH TH V Z ZH",
    "nasal": "M N NG",
    "liquid": "L R",
    "glide": "W Y",
}
_PHONE_CLASSES = {phone: manner
                  for manner, phones in _MANNER.items()
                  for phone in phones.split()}
EXCLUDED_PHONES = {"spn"}                         # OOV pseudo-phone


def collapse_stress(phone: str) -> str:
    """AH0/AH1/AH2 -> AH (MFA ARPA phones carry stress digits)."""
    return phone.rstrip("012")


def phone_class(phone: str) -> str | None:
    return _PHONE_CLASSES.get(collapse_stress(phone))


def to_classes(labels: Sequence[str]) -> list[str]:
    """Phones -> manner classes; raises on classless labels (a label reaching
    here without a class is a wiring bug, not data)."""
    classes = []
    for label in labels:
        manner = phone_class(label)
        if manner is None:
            raise ValueError(f"phone {label!r} has no manner class")
        classes.append(manner)
    return classes


def frame_time(i: int) -> float:
    return FRAME_PERIOD_S * i + FRAME0_CENTER_S


def frame_labels(record: Mapping, n_frames: int, tier: str) -> list[str | None]:
    """Per 25 Hz frame: the unit whose interval contains the frame CENTER
    (None where none does — silence / padding)."""
    units = record[tier]
    n = int(n_frames)
    if not units or n <= 0:
        return [None] * n
    centers = FRAME_PERIOD_S * np.arange(n) + FRAME0_CENTER_S
    starts = np.asarray([float(u[1]) for u in units])
    ends = np.asarray([float(u[2]) for u in units])
    # unit index whose start is the last one <= center; then verify coverage
    slot = np.searchsorted(starts, centers, side="right") - 1
    labels: list[str | None] = [None] * n
    for i in range(n):
        k = slot[i]
        if k < 0 or not (centers[i] < ends[k]):
            continue
        text = str(units[k][0])
        if tier == "phones":
            if text in EXCLUDED_PHONES:
                continue
            text = collapse_stress(text)
        labels[i] = text
    return labels


def chunk_spans(b_row: Sequence[float], length: int) -> list[tuple[int, int]]:
    """Boundary vector -> per-chunk [start, end) frame spans, chunk order.

    Mirrors membership = clamp(cumsum(b) - 1, 0): frames BEFORE the first
    boundary merge into chunk 0 (only reachable with duck-typed encoders —
    the production router forces b[0] = 1)."""
    n = int(length)
    if n <= 0:
        return []
    starts = np.nonzero(np.asarray(b_row[:n], dtype=np.float32) >= 0.5)[0]
    starts = starts.tolist() or [0]
    if starts[0] != 0:
        starts[0] = 0
    return list(zip(starts, starts[1:] + [n]))


def majority_label(labels: Sequence[str | None]) -> str | None:
    tally = Counter(l for l in labels if l is not None)
    return tally.most_common(1)[0][0] if tally else None


def collect_probe_data(encode_fn, loader, alignments: Mapping[str, Mapping],
                       tier: str, *, level: str = "frames",
                       stage: int = 0) -> tuple[list, list]:
    """Run the encoder; return (vectors, labels) for labeled positions only.

    level='frames': fine-rate outputs per frame. level='chunks': stage-N chunk
    embeddings labeled by majority over the chunk's fine span (stage 1 spans
    compose through stage-0 chunks).

    CONTRACT: probe train/test loaders must cover DISJOINT utterances — the
    reference's audit measured +0.77 accuracy from contamination on a RANDOM
    encoder. The driver asserts this on consumed ids.
    """
    if level not in ("frames", "chunks"):
        raise ValueError(f"level must be 'frames' or 'chunks', got {level!r}")
    vectors, labels = [], []
    for batch in loader:
        ids = batch.get("ids", [])
        enc = encode_fn(batch)
        feats = np.asarray(enc.features, dtype=np.float32)
        lengths = np.asarray(enc.lengths)
        for row, uid in enumerate(ids):
            if uid not in alignments:
                continue
            L = int(lengths[row])
            frame_y = frame_labels(alignments[uid], L, tier)
            if level == "frames":
                for i, lab in enumerate(frame_y):
                    if lab is not None:
                        vectors.append(feats[row, i])
                        labels.append(lab)
                continue
            b0 = np.asarray(enc.boundaries[0][1][row], dtype=np.float32)
            spans = chunk_spans(b0, L)
            if stage == 0:
                z = np.asarray(enc.chunk_embeddings[0][row], dtype=np.float32)
            else:
                if len(enc.chunk_embeddings) < 2:
                    raise ValueError("stage 1 requested but encoder has one stage")
                z = np.asarray(enc.chunk_embeddings[1][row], dtype=np.float32)
                b1 = np.asarray(enc.boundaries[1][1][row], dtype=np.float32)
                level2 = chunk_spans(b1, len(spans))      # spans over stage-0 chunks
                spans = [(spans[a][0], spans[b - 1][1])
                         for a, b in level2 if b <= len(spans)]
            for j, (a, b) in enumerate(spans):
                if j >= z.shape[0]:
                    break
                lab = majority_label(frame_y[a:b])
                if lab is not None:
                    vectors.append(z[j])
                    labels.append(lab)
    logger.info("probe data: level=%s tier=%s stage=%d -> %d labeled samples",
                level, tier, stage, len(vectors))
    return vectors, labels


def subsample(X: Sequence, y: Sequence, cap: int, seed: int = 1):
    """Seeded uniform subsample to at most ``cap`` (pairing preserved)."""
    if len(X) <= cap:
        return list(X), list(y)
    keep = list(range(len(X)))
    random.Random(seed).shuffle(keep)
    keep = sorted(keep[:cap])
    return [X[i] for i in keep], [y[i] for i in keep]


def top_k_filter(X: Sequence, y: Sequence, k: int):
    """Keep only the k most frequent labels; returns (X, y, kept fraction).
    Call on the TRAINING side only — the keep-set must come from train
    frequencies (the test side follows via the unseen-class drop)."""
    frequent = {label for label, _ in Counter(y).most_common(k)}
    rows = [i for i, label in enumerate(y) if label in frequent]
    return ([X[i] for i in rows], [y[i] for i in rows],
            len(rows) / max(1, len(y)))


def _lbfgs_fit(X_train, y_train, X_test, *, max_iter: int, C: float):
    """scipy L-BFGS-B on sklearn's exact multinomial objective."""
    from scipy.optimize import minimize

    classes = sorted(set(y_train))
    index = {c: i for i, c in enumerate(classes)}
    X = np.asarray(X_train, dtype=np.float64)
    y = np.asarray([index[c] for c in y_train])
    n, d = X.shape
    k = len(classes)
    Y = np.zeros((n, k))
    Y[np.arange(n), y] = 1.0

    def value_and_grad(theta):
        W = theta[:d * k].reshape(d, k)
        bias = theta[d * k:]
        z = X @ W + bias
        z -= z.max(axis=1, keepdims=True)
        logZ = np.log(np.exp(z).sum(axis=1))
        nll = (logZ - z[np.arange(n), y]).sum()
        probs = np.exp(z - logZ[:, None])
        g_logits = C * (probs - Y)
        return (0.5 * (W ** 2).sum() + C * nll,
                np.concatenate([(X.T @ g_logits + W).ravel(),
                                g_logits.sum(axis=0)]))

    sol = minimize(value_and_grad, np.zeros(d * k + k), jac=True,
                   method="L-BFGS-B",
                   options={"maxiter": int(max_iter), "gtol": 1e-4})
    W = sol.x[:d * k].reshape(d, k)
    bias = sol.x[d * k:]
    scores = np.asarray(X_test, dtype=np.float64) @ W + bias
    return np.asarray([classes[i] for i in scores.argmax(axis=1)]), int(sol.nit)


@__import__("functools").lru_cache(maxsize=32)
def _jax_lbfgs_prog(d: int, k: int, max_iter: int, C: float):
    """Compiled LBFGS fit for feature dim d, k classes: ``fit(X, y) ->
    (theta, n_iter)``. Cached per SHAPE so a probe report's many fits reuse
    one executable (a closure-per-fit jit would re-trace and re-compile
    every call — measured as the dominant cost)."""
    import jax
    import jax.numpy as jnp
    import optax
    import optax.tree_utils as otu

    def objective(theta, X, y):
        W = theta[:d * k].reshape(d, k)
        bias = theta[d * k:]
        z = X @ W + bias
        nll = (jax.nn.logsumexp(z, axis=1)
               - jnp.take_along_axis(z, y[:, None], 1)[:, 0]).sum()
        return 0.5 * (W ** 2).sum() + C * nll

    opt = optax.lbfgs()

    @jax.jit
    def fit(X, y):
        obj = lambda theta: objective(theta, X, y)
        value_and_grad = optax.value_and_grad_from_state(obj)

        def step(carry):
            theta, state = carry
            value, grad = value_and_grad(theta, state=state)
            updates, state = opt.update(grad, state, theta, value=value,
                                        grad=grad, value_fn=obj)
            return optax.apply_updates(theta, updates), state

        def continuing(carry):
            _, state = carry
            count = otu.tree_get(state, "count")
            grad = otu.tree_get(state, "grad")
            return (count == 0) | ((count < max_iter)
                                   & (jnp.abs(grad).max() >= 1e-5))

        theta0 = jnp.zeros(d * k + k, jnp.float32)
        theta, state = jax.lax.while_loop(
            continuing, step, (theta0, opt.init(theta0)))
        return theta, otu.tree_get(state, "count")

    return fit


def _jax_lbfgs_fit(X_train, y_train, X_test, *, max_iter: int, C: float):
    """Device-side L-BFGS on sklearn's exact multinomial objective — the TPU
    analog of the reference's ~135x torch-LBFGS GPU backend (reference:
    src/dcasr/interp/probes.py:189-236, README.md:175).

    One jitted ``lax.while_loop`` of optax.lbfgs steps (zoom linesearch)
    runs entirely on device; the convex objective has a unique optimum, so
    predictions match sklearn (parity-tested to the reference's own 2e-5
    bar on predicted probabilities). Stops at inf-norm(grad) < 1e-5 (tighter
    than scipy L-BFGS-B's 1e-4 gtol — fp32 needs the extra slack consumed to
    hold the 2e-5 probability parity) or ``max_iter``. The compiled program
    is cached per (d, k, max_iter, C) — see _jax_lbfgs_prog."""
    import jax.numpy as jnp

    classes = sorted(set(y_train))
    index = {c: i for i, c in enumerate(classes)}
    X = jnp.asarray(np.asarray(X_train, dtype=np.float32))
    y = jnp.asarray(np.asarray([index[c] for c in y_train], dtype=np.int32))
    d = X.shape[1]
    k = len(classes)
    theta, n_iter = _jax_lbfgs_prog(d, k, int(max_iter), float(C))(X, y)
    W = np.asarray(theta[:d * k]).reshape(d, k)
    bias = np.asarray(theta[d * k:])
    scores = np.asarray(X_test, dtype=np.float32) @ W + bias
    return (np.asarray([classes[i] for i in scores.argmax(axis=1)]),
            int(n_iter))


_BACKEND_ALIASES = {"torch": "jax", "scipy": "lbfgs"}


def train_probe(X_train, y_train, X_test, y_test, *, max_iter: int = 200,
                C: float = 1.0, seed: int = 1, backend: str = "sklearn") -> dict:
    """Fit + score a probe vs majority/chance baselines.

    Test items whose class never appears in training are dropped and counted
    in ``n_test_dropped_unseen`` — report it beside accuracy (on skewed labels
    the headline could otherwise describe under half the frames)."""
    from sklearn.metrics import balanced_accuracy_score

    backend = _BACKEND_ALIASES.get(backend, backend)
    if backend not in ("sklearn", "lbfgs", "jax"):
        raise ValueError(
            f"backend must be 'sklearn', 'lbfgs' or 'jax', got {backend!r}")
    seen_classes = set(y_train)
    if len(seen_classes) < 2:
        raise ValueError(f"probe needs >= 2 training classes, got {len(seen_classes)}")
    keep = [i for i, label in enumerate(y_test) if label in seen_classes]
    dropped = len(y_test) - len(keep)
    X_test = [X_test[i] for i in keep]
    y_test = [y_test[i] for i in keep]
    if not y_train or not y_test:
        raise ValueError("empty probe train or test set")
    if backend in ("lbfgs", "jax") and len(seen_classes) == 2:
        # sklearn's 2-class model is a BINARY sigmoid (one penalized weight
        # vector) — a different regularized optimum than a 2-column softmax.
        # Binary fits are cheap; stay on the reference backend.
        backend = "sklearn"
    if backend == "sklearn":
        from sklearn.linear_model import LogisticRegression
        model = LogisticRegression(max_iter=max_iter, C=C, random_state=seed)
        model.fit(np.asarray(X_train), y_train)
        predictions = model.predict(np.asarray(X_test))
        n_iter = int(np.max(model.n_iter_))
    elif backend == "jax":
        predictions, n_iter = _jax_lbfgs_fit(X_train, y_train, X_test,
                                             max_iter=max_iter, C=C)
    else:
        predictions, n_iter = _lbfgs_fit(X_train, y_train, X_test,
                                         max_iter=max_iter, C=C)
    majority = Counter(y_train).most_common(1)[0][0]
    return {"accuracy": float(np.mean(predictions == np.asarray(y_test))),
            "balanced_accuracy": float(balanced_accuracy_score(y_test, predictions)),
            "majority_baseline": sum(l == majority for l in y_test) / len(y_test),
            "chance": 1.0 / len(seen_classes), "n_classes": len(seen_classes),
            "n_train": len(y_train), "n_test": len(y_test),
            "n_test_dropped_unseen": dropped,
            "n_iter": n_iter, "backend": backend}
