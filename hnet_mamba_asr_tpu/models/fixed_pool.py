"""Fixed-stride pooling chunker — the "learned vs fixed" H2 control.

Drop-in replacement for DynamicChunker at the same compression rate 1/N:
boundaries sit on a fixed stride-N schedule and each window is masked
mean-pooled; no parameters, no ratio loss (behavioral spec: reference
src/dcasr/models/fixed_pool.py). Same ``chunk()/dechunk()/ChunkOutput``
contract, so the encoder swaps chunkers from config alone.

Needs an INTEGER stride: Type A passes N directly; Type B passes sqrt(N), so
fixed-pool Type B exists only at perfect-square N. N=1 coincides field-for-
field with DynamicChunker's identity passthrough.

Static shapes: the pooled buffer is kept at M = L slots (windows occupy the
first ceil(len/s) of them), matching DynamicChunker's buffer so either chunker
feeds the same main stack. Pooling accumulates in fp32.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.hnet_chunk import ChunkOutput, identity_chunk


class FixedPoolChunker(nn.Module):
    """Masked mean pooling over fixed windows of N frames (H2 control)."""

    d_model: int
    N: float = 1
    ema_smoothing: bool = True            # interface parity; no-op here
    dtype: Any = jnp.float32

    def setup(self):
        stride = int(round(float(self.N)))
        if abs(float(self.N) - stride) > 1e-6:
            raise ValueError(
                f"FixedPoolChunker needs an integer stride; got N={self.N!r}. "
                "Fixed-stride pooling has no fractional window — Type B fixed-pool "
                "is only defined at perfect-square N (so sqrt(N) is an integer).")
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        self.stride = stride
        self.identity = stride == 1

    def chunk(self, x: jax.Array, mask: jax.Array | None = None) -> ChunkOutput:
        B, L, D = x.shape
        if self.identity:
            return identity_chunk(x, mask)
        s = self.stride
        if mask is not None:
            lengths = mask.sum(axis=1)
            m = mask.astype(jnp.float32)
        else:
            lengths = jnp.full((B,), L, dtype=jnp.int32)
            m = jnp.ones((B, L), jnp.float32)
        nwin = jnp.maximum((lengths + s - 1) // s, 1)                # [B]
        pos = jnp.arange(L)
        memb = jnp.broadcast_to((pos // s)[None, :], (B, L)).astype(jnp.int32)
        onehot = jax.nn.one_hot(memb, L, dtype=jnp.float32) * m[..., None]   # [B,L,M]
        acc = jnp.einsum("blm,bld->bmd", onehot, x.astype(jnp.float32))
        cnt = onehot.sum(axis=1)                                     # [B, M]
        z = (acc / jnp.maximum(cnt, 1.0)[..., None]).astype(x.dtype)
        z_mask = cnt > 0
        b = ((pos % s == 0).astype(x.dtype)[None] * m.astype(x.dtype))
        kept = (nwin.sum().astype(jnp.float32)
                / jnp.maximum(lengths.sum().astype(jnp.float32), 1.0))
        return ChunkOutput(z=z, z_mask=z_mask, p=b, b=b, membership=memb,
                           ratio_loss=jnp.zeros((), jnp.float32), kept_fraction=kept)

    def dechunk(self, z_proc: jax.Array, co: ChunkOutput) -> jax.Array:
        """Broadcast each window vector back over its frames (identity at N=1)."""
        if self.identity:
            return z_proc
        idx = jnp.minimum(co.membership, z_proc.shape[1] - 1)[:, :, None]
        return jnp.take_along_axis(z_proc, idx.astype(jnp.int32), axis=1)

    def __call__(self, x, mask=None):
        return self.chunk(x, mask)
