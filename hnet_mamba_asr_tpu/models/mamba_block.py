"""Pre-norm residual Mamba-2 blocks + stacks, with length-aware bidirection.

The encoder building blocks (behavioral spec: reference
src/dcasr/models/mamba_block.py): a block is
``y = x + Mamba2_fwd(LN(x)) [+ reverse(Mamba2_bwd(reverse(LN(x))))]`` where
``reverse`` flips only the valid span of each sequence (padding stays in
place), so a double reverse is the identity on real frames and the causal scan
never leaks padding into valid outputs. A stack is N blocks + a final
LayerNorm. Everything is shape-preserving [B, T, d_model] and fully jittable
with static shapes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.mamba2 import Mamba2


def reverse_sequences(x: jax.Array, lengths: jax.Array | None = None) -> jax.Array:
    """Reverse along time; with lengths, only each row's valid span [0, L) is
    reversed and padding positions are untouched."""
    if lengths is None:
        return jnp.flip(x, axis=1)
    B, T = x.shape[0], x.shape[1]
    pos = jnp.arange(T)[None, :]                                   # [1, T]
    L = lengths.reshape(B, 1)
    idx = jnp.where(pos < L, L - 1 - pos, pos)
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class MambaBlock(nn.Module):
    """Pre-norm residual Mamba-2 layer; bidirectional adds a reversed pass."""

    d_model: int
    bidirectional: bool = True
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    chunk_size: int = 256
    ssd_intra_dtype: str | None = None
    ssd_out_compute_dtype: bool = False
    dtype: Any = jnp.float32
    use_reference_scan: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array | None = None) -> jax.Array:
        kw = dict(d_model=self.d_model, d_state=self.d_state, d_conv=self.d_conv,
                  expand=self.expand, headdim=self.headdim, chunk_size=self.chunk_size,
                  ssd_intra_dtype=self.ssd_intra_dtype,
                  ssd_out_compute_dtype=self.ssd_out_compute_dtype,
                  dtype=self.dtype, use_reference_scan=self.use_reference_scan)
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        y = Mamba2(**kw, name="fwd")(h)
        if self.bidirectional:
            hr = reverse_sequences(h, lengths)
            y = y + reverse_sequences(Mamba2(**kw, name="bwd")(hr), lengths)
        return x + y


class MambaStack(nn.Module):
    """n_layers MambaBlocks + a final LayerNorm; shape-preserving.

    ``remat=True`` wraps each block in jax.checkpoint: the backward pass
    recomputes block activations instead of keeping every SSD intermediate
    live — the standard HBM/FLOPs trade that lets the reference batch budget
    (64k frames/device) fit training on a 16 GB chip.
    """

    n_layers: int
    d_model: int
    bidirectional: bool = True
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    chunk_size: int = 256
    ssd_intra_dtype: str | None = None
    ssd_out_compute_dtype: bool = False
    dtype: Any = jnp.float32
    use_reference_scan: bool = False
    remat: bool = True
    remat_policy: str = "full"     # full | dots | none (encoder_conf.remat_policy)

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array | None = None) -> jax.Array:
        # "full" = recompute everything in backward (fits the 64k-frame budget
        # on 16 GB); "dots" = keep matmul outputs (dots_saveable — exceeds
        # 16 GB by ~0.5 GB at 64k frames, viable at halved budgets);
        # "none" = no remat (small models/short sequences only)
        if not self.remat or self.remat_policy == "none":
            block_cls = MambaBlock
        elif self.remat_policy == "dots":
            block_cls = nn.remat(
                MambaBlock, policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat_policy == "full":
            block_cls = nn.remat(MambaBlock)
        else:
            raise ValueError(f"unknown remat_policy {self.remat_policy!r}; "
                             "choices: full, dots, none")
        for i in range(self.n_layers):
            x = block_cls(
                d_model=self.d_model, bidirectional=self.bidirectional,
                d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
                headdim=self.headdim, chunk_size=self.chunk_size, dtype=self.dtype,
                ssd_intra_dtype=self.ssd_intra_dtype,
                ssd_out_compute_dtype=self.ssd_out_compute_dtype,
                use_reference_scan=self.use_reference_scan, name=f"block_{i}")(x, lengths)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
