"""The Mamba–H-Net encoder sandwich (Type A one-stage / Type B two-stage).

Pipeline (behavioral spec: reference src/dcasr/models/encoder.py): conv
subsample x4 (100 -> 25 Hz) -> enc Mamba stack (d_outer) -> [chunk -> proj_in
-> main Mamba stack (d_main, compressed rate) -> proj_out -> dechunk] ->
residual ``x_enc + x_dech`` (the fine-detail bypass) -> dec Mamba stack.
Type B nests two sqrt(N) chunk levels with mid stacks at d_main. N=1 turns
every chunker into an identity passthrough, reducing the encoder to pure
bidirectional Mamba (the no-chunk control).

Returns per-stage boundaries / chunk embeddings / kept fractions for the
interpretability program plus the summed ratio loss for training. Everything
is static-shape and jittable; the compressed stream lives in an M = L buffer
with ``z_mask`` (see models/hnet_chunk.py for the TPU reformulation).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.fixed_pool import FixedPoolChunker
from hnet_mamba_asr_tpu.models.hnet_chunk import DynamicChunker
from hnet_mamba_asr_tpu.models.mamba_block import MambaStack

CHUNKERS = {"dynamic": DynamicChunker, "fixed": FixedPoolChunker}


def build_chunker(kind: str, d_model: int, N, ema_smoothing: bool = True,
                  dtype=jnp.float32, name: str | None = None):
    kind = str(kind).lower()
    if kind not in CHUNKERS:
        raise ValueError(f"unknown chunker {kind!r}; choices: {sorted(CHUNKERS)}")
    return CHUNKERS[kind](d_model=d_model, N=N, ema_smoothing=ema_smoothing,
                          dtype=dtype, name=name)


class EncoderOutput(NamedTuple):
    features: jax.Array         # [B, L0, d_outer] frame-rate output
    lengths: jax.Array          # [B] valid frames after subsampling
    ratio_loss: jax.Array       # scalar, summed over stages (0 at N=1)
    boundaries: tuple           # per stage: (p [B,L], b [B,L])
    chunk_embeddings: tuple     # per stage: z [B, M, d]
    kept_fractions: tuple       # per stage: scalar realized keep fraction


def subsampled_length(lengths: jax.Array) -> jax.Array:
    """Valid length after two k=3, s=2 VALID convs: ((L-1)//2 - 1)//2."""
    return jnp.maximum(((lengths - 1) // 2 - 1) // 2, 0)


def lengths_to_mask(lengths: jax.Array, T: int) -> jax.Array:
    return jnp.arange(T)[None, :] < lengths[:, None]


class ConvSubsampling4(nn.Module):
    """x4 time downsample: two Conv(k=3, s=2, VALID) + ReLU, flatten freq -> Dense."""

    n_mels: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        # feats [B, T, n_mels] -> NHWC [B, T, F, 1]
        x = feats.astype(self.dtype)[..., None]
        conv_kw = dict(kernel_size=(3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.relu(nn.Conv(self.d_model, **conv_kw, name="conv1")(x))
        x = nn.relu(nn.Conv(self.d_model, **conv_kw, name="conv2")(x))
        B, T, F, C = x.shape
        x = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(x.reshape(B, T, F * C))
        return x, subsampled_length(lengths)


class DCASREncoder(nn.Module):
    """Type A (one chunk level at factor N) or Type B (two sqrt(N) levels)."""

    n_mels: int = 80
    d_outer: int = 384
    d_main: int = 512
    n_enc: int = 4
    n_main: int = 12
    n_dec: int = 4
    n_mid: int = 4
    arch_type: str = "A"
    N: float = 1
    bidirectional: bool = True
    hnet_ema: bool = True
    chunker: str = "dynamic"
    d_state: int = 128
    headdim: int = 64
    chunk_size: int = 256          # SSD scan chunk, not the H-Net N
    ssd_intra_dtype: str | None = None   # 'bf16': halve intra-chunk HBM traffic
    ssd_out_compute_dtype: bool = False  # round the SSD fp32 output to compute dtype
    dtype: Any = jnp.float32
    use_reference_scan: bool = False
    remat_policy: str = "full"     # per-block remat: full | dots | none

    def setup(self):
        if self.arch_type not in ("A", "B"):
            raise ValueError(f"arch_type must be 'A' or 'B', got {self.arch_type!r}")
        stack_kw = dict(bidirectional=self.bidirectional, d_state=self.d_state,
                        headdim=self.headdim, chunk_size=self.chunk_size,
                        ssd_intra_dtype=self.ssd_intra_dtype,
                        ssd_out_compute_dtype=self.ssd_out_compute_dtype,
                        dtype=self.dtype, use_reference_scan=self.use_reference_scan,
                        remat_policy=self.remat_policy)
        dense_kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.subsample = ConvSubsampling4(self.n_mels, self.d_outer, dtype=self.dtype)
        self.enc = MambaStack(self.n_enc, self.d_outer, **stack_kw)
        self.dec = MambaStack(self.n_dec, self.d_outer, **stack_kw)
        if self.arch_type == "A":
            self.chunk = build_chunker(self.chunker, self.d_outer, self.N,
                                       self.hnet_ema, self.dtype)
            self.proj_in = nn.Dense(self.d_main, **dense_kw)
            self.main = MambaStack(self.n_main, self.d_main, **stack_kw)
            self.proj_out = nn.Dense(self.d_outer, **dense_kw)
        else:                                          # Type B: two sqrt(N) stages
            nb = math.sqrt(self.N)
            self.chunk1 = build_chunker(self.chunker, self.d_outer, nb,
                                        self.hnet_ema, self.dtype)
            self.proj1_in = nn.Dense(self.d_main, **dense_kw)
            self.mid = MambaStack(self.n_mid, self.d_main, **stack_kw)
            self.chunk2 = build_chunker(self.chunker, self.d_main, nb,
                                        self.hnet_ema, self.dtype)
            self.main = MambaStack(self.n_main, self.d_main, **stack_kw)
            self.mid_dec = MambaStack(self.n_mid, self.d_main, **stack_kw)
            self.proj1_out = nn.Dense(self.d_outer, **dense_kw)

    def __call__(self, feats: jax.Array, feat_lengths: jax.Array) -> EncoderOutput:
        x, lengths = self.subsample(feats, feat_lengths)
        mask = lengths_to_mask(lengths, x.shape[1])
        x_enc = self.enc(x, lengths)
        if self.arch_type == "A":
            return self._forward_a(x_enc, mask, lengths)
        return self._forward_b(x_enc, mask, lengths)

    def _forward_a(self, x_enc, mask, lengths) -> EncoderOutput:
        co = self.chunk.chunk(x_enc, mask)
        z = self.proj_in(co.z)
        z = self.main(z, co.z_mask.sum(axis=1))
        z = self.proj_out(z)
        x_dech = self.chunk.dechunk(z, co)
        x_out = self.dec(x_enc + x_dech, lengths)        # fine-detail bypass residual
        return EncoderOutput(x_out, lengths, co.ratio_loss,
                             ((co.p, co.b),), (co.z,), (co.kept_fraction,))

    def _forward_b(self, x_enc, mask, lengths) -> EncoderOutput:
        co1 = self.chunk1.chunk(x_enc, mask)             # stage 1: frames -> units
        z1 = self.mid(self.proj1_in(co1.z), co1.z_mask.sum(axis=1))
        co2 = self.chunk2.chunk(z1, co1.z_mask)          # stage 2: units -> words
        z2 = self.main(co2.z, co2.z_mask.sum(axis=1))
        z1_dec = self.mid_dec(z1 + self.chunk2.dechunk(z2, co2), co1.z_mask.sum(axis=1))
        x_dech = self.chunk1.dechunk(self.proj1_out(z1_dec), co1)
        x_out = self.dec(x_enc + x_dech, lengths)
        return EncoderOutput(x_out, lengths, co1.ratio_loss + co2.ratio_loss,
                             ((co1.p, co1.b), (co2.p, co2.b)), (co1.z, co2.z),
                             (co1.kept_fraction, co2.kept_fraction))
