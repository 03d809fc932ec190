"""H-Net dynamic chunking: router, ratio loss, static-shape chunk/dechunk.

The scientific core (behavioral spec: reference src/dcasr/models/hnet_chunk.py,
itself faithful to Hwang, Wang & Gu, arXiv:2507.07955). A sequence of encoder
frames x [B, L, D] is compressed at *learned* boundaries and later expanded:

    router:   p_t = 1/2 (1 - cos(W_q x_t, W_k x_{t-1})),  b_t = 1[p_t >= 0.5],
              p_1 == 1 (first frame always a boundary); causal by construction.
    ratio:    L_ratio = N/(N-1) [ (N-1) F G + (1-F)(1-G) ],  F = mean b (hard),
              G = mean p (soft); fp32; identically 0 at N = 1.
    chunk:    kept frames scatter to slots membership = cumsum(b) - 1.
    dechunk:  EMA-smooth the compressed stream with downsampled P (ops/ema.py),
              gather-upsample via membership, then the confidence STE
              c_t = p^b (1-p)^(1-b): forward == 1.0, gradient proportional to c.

TPU-first reformulation — the key departure from the reference: the reference
computes M = counts.max() per batch and does data-dependent scatters; under XLA
everything must be static-shape, so the compressed buffer is fixed at M = L and
the scatter becomes a **one-hot matmul** (collision-free because each kept
frame owns a unique slot): z = einsum(onehot(membership) * keep, x). Because
membership is a contiguous integer cumsum, z_mask is simply arange(L) < counts.
Pad slots carry P = 0 -> clamped EMA decay, and are never gathered back, so
they are inert. Compute waste on the compressed stack is bounded by the
realized keep fraction (~1/N); correctness and interpretability come first
(the reference's oracle tests are ported against this formulation).

N = 1 is an exact identity passthrough — no router params, no ratio loss — the
no-chunk control where the encoder reduces to pure Mamba.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.ops.ema import ema_smooth


class ChunkOutput(NamedTuple):
    """Everything dechunk, the losses, and interpretability need (pytree)."""
    z: jax.Array            # [B, M, D]  compressed vectors (M = L, padded)
    z_mask: jax.Array       # [B, M]     True where a real (non-pad) chunk
    p: jax.Array            # [B, L]     soft boundary probabilities
    b: jax.Array            # [B, L]     hard boundary indicators {0., 1.}
    membership: jax.Array   # [B, L]     chunk slot of each fine frame (int32)
    ratio_loss: jax.Array   # scalar     0.0 when N == 1
    kept_fraction: jax.Array  # scalar   realized mean keep fraction


def identity_chunk(x: jax.Array, mask: jax.Array | None) -> ChunkOutput:
    """The shared N=1 passthrough: every frame is its own boundary."""
    B, L, _ = x.shape
    ones = jnp.ones((B, L), dtype=x.dtype)
    if mask is not None:
        ones = ones * mask.astype(x.dtype)
        z_mask = mask
    else:
        z_mask = jnp.ones((B, L), dtype=bool)
    memb = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    return ChunkOutput(z=x, z_mask=z_mask, p=ones, b=ones, membership=memb,
                       ratio_loss=jnp.zeros((), jnp.float32),
                       kept_fraction=jnp.ones((), jnp.float32))


class RoutingModule(nn.Module):
    """Cosine-dissimilarity boundary router; near-identity init so cos(q, k)
    is meaningful from step 0 (reference: hnet_chunk.py:88-90)."""

    d_model: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None):
        eye = lambda key, shape, dtype: jnp.eye(shape[0], shape[1], dtype=dtype)
        q = nn.Dense(self.d_model, use_bias=False, kernel_init=eye,
                     dtype=self.dtype, param_dtype=jnp.float32, name="W_q")(x)
        k = nn.Dense(self.d_model, use_bias=False, kernel_init=eye,
                     dtype=self.dtype, param_dtype=jnp.float32, name="W_k")(x)
        k_prev = jnp.roll(k, shift=1, axis=1)            # k_{t-1}; row 0 wraps (unused)
        qf, kf = q.astype(jnp.float32), k_prev.astype(jnp.float32)
        # clamp INSIDE the sqrt: norm() has an infinite gradient at 0, and a
        # zero frame (e.g. an empty scatter slot feeding a Type B stage-2
        # router) would leak 0 * inf = NaN into the backward pass even though
        # the clamped forward value is masked out downstream
        sq = jnp.sum(qf * qf, axis=-1) * jnp.sum(kf * kf, axis=-1)
        denom = jnp.sqrt(jnp.maximum(sq, self.eps ** 2))
        cos = jnp.sum(qf * kf, axis=-1) / denom
        p = 0.5 * (1.0 - cos)
        p = p.at[:, 0].set(1.0)                          # first frame: boundary
        p = jnp.clip(p, 0.0, 1.0)
        b = (p >= 0.5).astype(p.dtype)
        if mask is not None:
            m = mask.astype(p.dtype)
            p, b = p * m, b * m
        return p, b


def ratio_loss(p: jax.Array, b: jax.Array, N: float,
               mask: jax.Array | None = None) -> jax.Array:
    """Steers the mean keep fraction toward 1/N; 0 at N == 1. fp32 sums."""
    if N == 1:
        return jnp.zeros((), jnp.float32)
    pf, bf = p.astype(jnp.float32), b.astype(jnp.float32)
    if mask is None:
        F = bf.mean()
        G = pf.mean()
    else:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        F = (bf * m).sum() / denom
        G = (pf * m).sum() / denom
    coef = N / (N - 1.0)
    return coef * ((N - 1.0) * F * G + (1.0 - F) * (1.0 - G))


def _scatter_to_slots(values: jax.Array, membership: jax.Array,
                      keep: jax.Array) -> jax.Array:
    """Collision-free scatter of kept rows into their slots as a one-hot matmul.

    values [B, L, D] (or [B, L] -> treated as D=1), membership [B, L] int,
    keep [B, L] bool -> [B, L(slots), D]. Each kept frame owns a unique slot,
    so the sum IS the scatter; the einsum maps straight onto the MXU.
    """
    squeeze = values.ndim == 2
    if squeeze:
        values = values[..., None]
    B, L, D = values.shape
    onehot = jax.nn.one_hot(membership, L, dtype=values.dtype, axis=-1)   # [B,L,M]
    onehot = onehot * keep.astype(values.dtype)[..., None]
    out = jnp.einsum("blm,bld->bmd", onehot, values)
    return out[..., 0] if squeeze else out


class DynamicChunker(nn.Module):
    """One H-Net dynamic-chunking block with a static-shape compressed buffer."""

    d_model: int
    N: float = 1
    ema_smoothing: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.N < 1:
            raise ValueError(f"N must be >= 1, got {self.N}")
        self.identity = self.N == 1
        if not self.identity:
            self.router = RoutingModule(self.d_model, dtype=self.dtype)

    # ---- chunk (downsample) --------------------------------------------------
    def chunk(self, x: jax.Array, mask: jax.Array | None = None) -> ChunkOutput:
        B, L, D = x.shape
        if self.identity:
            return identity_chunk(x, mask)
        p, b = self.router(x, mask)
        rl = ratio_loss(p, b, self.N, mask)
        keep = b > 0.5
        memb = jnp.maximum(jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1, 0)
        counts = keep.sum(axis=1)                                    # [B]
        z = _scatter_to_slots(x, memb, keep)                         # [B, L, D]
        z_mask = jnp.arange(L)[None, :] < counts[:, None]            # contiguous slots
        valid = (mask.sum() if mask is not None
                 else jnp.asarray(B * L, jnp.float32))
        kept = keep.sum().astype(jnp.float32) / jnp.maximum(valid.astype(jnp.float32), 1.0)
        return ChunkOutput(z=z, z_mask=z_mask, p=p, b=b, membership=memb,
                           ratio_loss=rl, kept_fraction=kept)

    # ---- dechunk (upsample) ---------------------------------------------------
    def dechunk(self, z_proc: jax.Array, co: ChunkOutput) -> jax.Array:
        """Paper order Eq. 5 -> 8 -> 9: EMA at chunk rate, gather-upsample,
        confidence STE last (forward == 1.0, grad proportional to c_t)."""
        if self.identity:
            return z_proc
        B, L = co.membership.shape
        if self.ema_smoothing:
            keep = co.b > 0.5
            P = _scatter_to_slots(co.p, co.membership, keep)         # [B, M]
            z_proc = ema_smooth(z_proc, P)
        idx = co.membership[:, :, None]
        x_up = jnp.take_along_axis(z_proc, idx.astype(jnp.int32), axis=1)   # Eq. 8
        c = jnp.where(co.b > 0.5, co.p, 1.0 - co.p)                  # [B, L]
        ste = (c + jax.lax.stop_gradient(1.0 - c))[..., None]        # fwd == 1.0
        return x_up * ste.astype(x_up.dtype)                         # Eq. 9

    def __call__(self, x, mask=None):
        return self.chunk(x, mask)
