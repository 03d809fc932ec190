"""Causal EMA smoother for H-Net dechunking (paper Eq. 5), TPU matmul form.

Recurrence over the *compressed* sequence with per-slot probabilities P:

    zbar_t = P_t * z_t + (1 - P_t) * zbar_{t-1}        (zbar_0 = z_0)

vectorized as one causal matmul: with S = cumsum(log(1 - P)) (S_0 = 0) and
s_0 = z_0, s_j = P_j z_j,

    zbar_t = sum_{j<=t} exp(S_t - S_j) * s_j

which is an L x L lower-triangular weight matrix applied per batch — already
matmul-shaped, exactly what the MXU wants (the reference reached the same form
for its GPU build: src/dcasr/models/hnet_chunk.py:226-248).

P is HARD-clamped to [p_clamp, 1 - p_clamp] with ZERO gradient at saturation —
``jnp.clip``'s native VJP. The reference documents that a backward-identity
clamp amplifies gradients by up to 1/(1-p) ~ 1e6 per saturated boundary and
caused a real divergence; the zero-gradient semantics here are load-bearing
and pinned by tests (test_hnet_chunk.py::test_ema_saturated_grad_zero).

Weight/cumsum math is fp32 regardless of input dtype; the final matmul runs in
the input dtype (bf16 in training).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("p_clamp",))
def ema_smooth(z: jax.Array, p: jax.Array, p_clamp: float = 1e-4) -> jax.Array:
    """z [B, M, D], p [B, M] -> EMA-smoothed [B, M, D] (causal, zbar_0 = z_0)."""
    B, M, D = z.shape
    if M == 1:
        return z
    pc = jnp.clip(p, p_clamp, 1.0 - p_clamp)            # zero grad at saturation
    src = jnp.concatenate([z[:, :1], pc[:, 1:, None].astype(z.dtype) * z[:, 1:]], axis=1)
    log_keep = jnp.log1p(-pc[:, 1:].astype(jnp.float32))            # log(1 - P), fp32
    S = jnp.pad(jnp.cumsum(log_keep, axis=1), ((0, 0), (1, 0)))     # [B, M], S_0 = 0
    logw = S[:, :, None] - S[:, None, :]                            # S_t - S_j
    causal = jnp.tril(jnp.ones((M, M), dtype=bool))
    # mask BEFORE exp: future-position logw is large positive (S decreases), and
    # exp overflow in an unselected where-branch would leak NaN into gradients
    logw = jnp.where(causal[None], logw, -jnp.inf)
    W = jnp.exp(logw).astype(z.dtype)
    return jnp.einsum("bts,bsd->btd", W, src)


def ema_smooth_sequential(z: jax.Array, p: jax.Array, p_clamp: float = 1e-4) -> jax.Array:
    """Sequential oracle for tests: the literal recurrence via lax.scan."""
    pc = jnp.clip(p, p_clamp, 1.0 - p_clamp).astype(jnp.float32)
    zf = z.astype(jnp.float32)

    def step(carry, inp):
        z_t, p_t = inp                                   # [B, D], [B]
        out = p_t[:, None] * z_t + (1.0 - p_t[:, None]) * carry
        return out, out

    z0 = zf[:, 0]
    _, rest = jax.lax.scan(step, z0, (zf[:, 1:].transpose(1, 0, 2),
                                      pc[:, 1:].transpose(1, 0)))
    out = jnp.concatenate([z0[:, None], rest.transpose(1, 0, 2)], axis=1)
    return out.astype(z.dtype)
