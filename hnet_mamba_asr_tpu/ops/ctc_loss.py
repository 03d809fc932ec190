"""CTC loss: log-space forward algorithm, jittable with padded static shapes.

TPU-native replacement for torch's native ``F.ctc_loss`` (reference:
src/dcasr/decoders/ctc.py:104-115 uses it with ``zero_infinity=True`` and
``reduction='mean'``). Semantics reproduced exactly:

- blank can be any class id (the framework pins it to ``vocab_size``)
- ``zero_infinity``: an infeasible utterance (T < U + #adjacent-repeats, or any
  non-finite loss) contributes 0 loss AND 0 gradient
- ``reduction='mean'``: each utterance's loss is divided by its target length
  (clamped to 1) and the batch is averaged — torch's documented behavior

The forward lattice is the standard extended label sequence
[blank, y1, blank, y2, ..., blank] with the skip transition allowed between
distinct consecutive labels. The time recursion is a ``lax.scan`` whose body is
pure vectorized elementwise work over [B, S] — cheap next to the encoder; the
gradient comes from autodiff through the scan (the classic alpha-beta backward
is the same computation XLA derives here).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _log_add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Stable log(exp(a) + exp(b)) treating _NEG_INF as log(0)."""
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    return hi + jnp.log1p(jnp.exp(lo - hi))


def ctc_infeasible(feat_lengths: jax.Array, targets: jax.Array,
                   target_lengths: jax.Array) -> jax.Array:
    """[B] bool: utterances a CTC alignment cannot emit (enc_len < tok_len +
    #adjacent-repeats). The reference counts these for training health
    (reference: src/dcasr/tasks/asr_task.py:110-119)."""
    B, U = targets.shape
    if U > 1:
        pair_ok = jnp.arange(U - 1)[None, :] < (target_lengths - 1)[:, None]
        reps = ((targets[:, 1:] == targets[:, :-1]) & pair_ok).sum(axis=1)
    else:
        reps = jnp.zeros((B,), dtype=jnp.int32)
    return feat_lengths < target_lengths + reps


@partial(jax.jit, static_argnames=("blank_id", "reduction"))
def ctc_loss(log_probs: jax.Array, feat_lengths: jax.Array, targets: jax.Array,
             target_lengths: jax.Array, *, blank_id: int,
             reduction: str = "mean") -> jax.Array:
    """log_probs [B, T, C] (log-softmaxed), feat_lengths [B], targets [B, U]
    (ids in [0, C), pad beyond target_lengths ignored), target_lengths [B].

    Returns a scalar for reduction in {"mean", "sum"} or [B] for "none".
    """
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1
    lp = log_probs.astype(jnp.float32)

    # extended symbol sequence: even slots blank, odd slots the labels
    ext = jnp.full((B, S), blank_id, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    # skip transition s-2 -> s allowed at odd s when label != previous label
    can_skip = jnp.zeros((B, S), dtype=bool)
    if U > 1:
        distinct = targets[:, 1:] != targets[:, :-1]                # [B, U-1]
        can_skip = can_skip.at[:, 3::2].set(distinct)

    ext_lp = jnp.take_along_axis(lp, ext[:, None, :].astype(jnp.int32),
                                 axis=2)                            # [B, T, S]

    alpha0 = jnp.full((B, S), _NEG_INF, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(ext_lp[:, 0, 0])
    if U > 0:
        has_label = (target_lengths > 0)
        alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, ext_lp[:, 0, 1], _NEG_INF))

    def step(alpha, inp):
        lp_t, t = inp                                               # [B, S], scalar
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, jnp.float32), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), _NEG_INF, jnp.float32), alpha[:, :-2]], axis=1)
        acc = _log_add(alpha, shift1)
        acc = jnp.where(can_skip, _log_add(acc, shift2), acc)
        new = acc + lp_t
        # freeze rows whose valid time span has ended (t >= feat_length)
        active = (t < feat_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0,
                            (ext_lp.transpose(1, 0, 2)[1:], jnp.arange(1, T)))

    # final prob: last blank + last label states of each row's true lattice
    s_last = 2 * target_lengths                                     # [B]
    take = lambda idx: jnp.take_along_axis(alpha, idx[:, None].astype(jnp.int32),
                                           axis=1)[:, 0]
    final = _log_add(take(s_last), take(jnp.maximum(s_last - 1, 0)))
    final = jnp.where(target_lengths > 0, final, take(s_last))      # empty target: all blank
    nll = -final                                                    # [B]

    # zero_infinity: infeasible / non-finite rows contribute 0 loss and 0 grad
    bad = ctc_infeasible(feat_lengths, targets, target_lengths) | ~jnp.isfinite(nll) \
        | (nll > 0.5 * -_NEG_INF)
    nll = jnp.where(bad, 0.0, nll)

    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        return (nll / jnp.maximum(target_lengths, 1)).mean()
    raise ValueError(f"unknown reduction {reduction!r}")
