"""Weight-only int8 quantization for serving artifacts.

Decode-time inference at serving batch sizes is weight-bound: every step
streams the full parameter set from HBM while activations are comparatively
tiny. Storing matrices as int8 with per-output-channel fp32 scales
quarters that traffic (and the artifact size); the dequantize happens INSIDE
the traced program, where XLA fuses it into the consuming matmul so the
fp32 weights never round-trip through HBM. The reference serves fp32 torch
checkpoints only (no quantization path exists).

Scheme: symmetric per-output-channel absmax. For a kernel w[..., out]:

    scale[out] = max|w[..., out]| / 127        (0 -> 1, avoids div-by-zero)
    q8 = round(w / scale)  in [-127, 127]
    w' = q8 * scale        (max elementwise error scale/2 ~ 0.4% of channel
                            amax — inaudible through a log-mel front end,
                            bounded-tested in tests/test_serving_export.py)

Only leaves with ndim >= 2 and size >= ``min_size`` quantize (projections,
conv kernels, embeddings); biases, norm scales, and per-head vectors stay
fp32. A quantized leaf becomes the subtree {"~q8": int8, "~scale": f32} —
still a plain pytree, so checkpoint path-keying, npz round-trips, and the
runtime's nested-dict rebuild all work unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Q8_KEY, SCALE_KEY = "~q8", "~scale"


def quantize_tree(params, min_size: int = 4096):
    """fp params pytree -> same tree with large >=2-D leaves int8-quantized."""
    def q(leaf):
        a = np.asarray(leaf)
        if a.ndim < 2 or a.size < min_size or not np.issubdtype(
                a.dtype, np.floating):
            return a
        a = a.astype(np.float32)
        amax = np.max(np.abs(a), axis=tuple(range(a.ndim - 1)))
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q8 = np.clip(np.round(a / scale), -127, 127).astype(np.int8)
        return {Q8_KEY: q8, SCALE_KEY: scale}
    return jax.tree_util.tree_map(q, params)


def _is_q(node) -> bool:
    return isinstance(node, dict) and set(node) == {Q8_KEY, SCALE_KEY}


def dequantize_tree(qparams):
    """Inverse of quantize_tree; traceable (runs inside the exported fn)."""
    if _is_q(qparams):
        return qparams[Q8_KEY].astype(jnp.float32) * qparams[SCALE_KEY]
    if isinstance(qparams, dict):
        return {k: dequantize_tree(v) for k, v in qparams.items()}
    return qparams


def quantization_error(params, qparams) -> float:
    """Max |w - dq(q(w))| / channel-amax over quantized leaves (<= 1/254)."""
    worst = 0.0
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    as_dict = {jax.tree_util.keystr(k): v for k, v in flat_p}
    flat_q = jax.tree_util.tree_flatten_with_path(
        qparams, is_leaf=_is_q)[0]
    for k, v in flat_q:
        if _is_q(v):
            w = np.asarray(as_dict[jax.tree_util.keystr(k)], np.float32)
            dq = v[Q8_KEY].astype(np.float32) * v[SCALE_KEY]
            amax = np.maximum(np.max(np.abs(w), axis=tuple(range(w.ndim - 1))),
                              1e-12)
            worst = max(worst, float(np.max(np.abs(w - dq) / amax)))
    return worst
