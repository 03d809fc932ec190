"""RNN-T (transducer) loss in log-space JAX — static shapes, TPU-friendly.

Beyond the reference (which ships CTC + AED + joint only): the transducer
objective marginalizes all monotonic alignments of a label sequence y[0:U)
to T encoder frames through the (T+?, U+1) lattice

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank(t-1, u),
                            alpha[t, u-1] + label(t, u-1, y_u-1))
    loss = -(alpha[T-1, U] + blank(T-1, U))

Design (mirrors the repo's CTC port, ops/ctc_loss.py):
- one ``lax.scan`` over T frames with the alpha ROW [B, U+1] as carry — the
  U-dimension recurrence inside a step is an associative prefix (log-domain
  cumulative max-plus... exactly: alpha[t, u] = logaddexp over v<=u of
  (alpha_blank[t, v] + sum of label scores v..u-1)), computed with a masked
  ``jax.lax.associative_scan`` in log space;
- fp32 throughout; padded frames/labels are masked to exact no-ops, so one
  compiled program serves every length in the padded batch;
- per-row "none" reduction plus "mean"/"sum", matching the torchaudio
  rnnt_loss contract (reduction over batch; no per-length normalization —
  callers divide like the trainer's CTC path if they want per-token means).

Verified against a brute-force numpy lattice DP (values AND grads) in
tests/test_rnnt.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def rnnt_loss(logits: jax.Array, feat_lengths: jax.Array, targets: jax.Array,
              target_lengths: jax.Array, *, blank_id: int,
              reduction: str = "mean") -> jax.Array:
    """logits [B, T, U+1, V] (UNnormalized joint outputs; log-softmax is
    taken here in fp32), feat_lengths [B], targets [B, U] (ids in [0, V),
    pad beyond target_lengths ignored), target_lengths [B] <= U.

    Returns -log P(y | x): scalar for reduction in {"mean", "sum"} or [B]
    for "none". Label emissions do not consume frames, so any U is feasible
    at any T >= 1 — no CTC-style infeasibility masking exists. Rows with
    feat_length == 0 return garbage; mask them with row_mask like every
    other per-row loss in this repo.
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    if targets.shape[1] != U:
        raise ValueError(f"targets U={targets.shape[1]} != logits U+1-1={U}")
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # blank scores b[t, u] and label scores l[t, u] = lp[t, u, y_u]
    blank = lp[..., blank_id]                                  # [B, T, U+1]
    tgt = jnp.clip(targets, 0, V - 1).astype(jnp.int32)        # [B, U]
    lab = jnp.take_along_axis(
        lp[:, :, :U, :], tgt[:, None, :, None], axis=-1)[..., 0]  # [B, T, U]

    # label transition u -> u+1 exists only for u < target_length. Mask with
    # a SOFT -inf: the cumulative-sum trick below cumsums label scores, and
    # cumsumming -1e30 overflows into inf - inf = NaN (the exp/where landmine
    # class, CLAUDE.md). -3e4 underflows exp() to exactly 0 in fp32 while
    # keeping every sum finite (U=512 -> ~1.5e7), and the prefix structure
    # keeps garbage strictly beyond each row's target_length.
    SOFT_NEG = -3.0e4
    u_ids = jnp.arange(U)
    lab = jnp.where((u_ids[None, :] < target_lengths[:, None])[:, None, :],
                    lab, SOFT_NEG)                             # [B, T, U]

    alpha0 = jnp.full((B, U1), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    def step(alpha, inp):
        # carry ``alpha`` = base(u) entering frame t: alpha(t-1, u) +
        # blank(t-1, u) (alpha0 for t = 0). The within-frame label chain
        #   A_t(u) = logaddexp(base(u), A_t(u-1) + l_t[u-1])
        # unrolls to A_t(u) = logsumexp_{v<=u}(base(v) + sum_{w=v}^{u-1}
        # l_t[w]); with c = exclusive-cumsum(l_t) this is one cumulative
        # logsumexp: A_t(u) = c[u] + logcumsumexp_u(base - c).
        b_t, l_t, t_real = inp                                 # [B,U+1],[B,U]
        c = jnp.concatenate([jnp.zeros((B, 1), jnp.float32),
                             jnp.cumsum(l_t, axis=1)], axis=1)  # [B, U+1]
        shifted = alpha - c
        cum = jax.lax.associative_scan(jnp.logaddexp, shifted, axis=1)
        beta = c + cum                                 # A_t(u), [B, U+1]
        new_alpha = beta + b_t                         # consume frame t
        new_alpha = jnp.where(t_real[:, None], new_alpha, alpha)
        return new_alpha, beta

    t_ids = jnp.arange(T)
    t_real = t_ids[None, :] < feat_lengths[:, None]             # [B, T]
    alpha, betas = jax.lax.scan(
        step, alpha0, (blank.transpose(1, 0, 2), lab.transpose(1, 0, 2),
                       t_real.transpose(1, 0)))
    # betas[t] holds beta(t, :) BEFORE the frame-t blank. Total log-prob =
    # beta(T_b - 1, U_b) + blank(T_b - 1, U_b): pick each row's last frame.
    last = jnp.maximum(feat_lengths - 1, 0)                     # [B]
    beta_last = jnp.take_along_axis(
        betas.transpose(1, 0, 2), last[:, None, None], axis=1)[:, 0]  # [B,U+1]
    b_last = jnp.take_along_axis(blank, last[:, None, None],
                                 axis=1)[:, 0]                  # [B, U+1]
    u_last = jnp.clip(target_lengths, 0, U)
    total = jnp.take_along_axis(beta_last + b_last, u_last[:, None],
                                axis=1)[:, 0]                   # [B]
    loss = -total
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        return loss.mean()
    raise ValueError(f"unknown reduction {reduction!r}")
