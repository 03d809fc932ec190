"""Mamba-2 layer (selective SSM with the SSD scan) as a flax module.

Functional re-creation of the mamba_ssm ``Mamba2`` layer the reference builds
its encoder from (reference: src/dcasr/models/mamba_block.py:12,38-39 with
defaults d_state=128, d_conv=4, expand=2, headdim=64), mapped onto the TPU:

    u --in_proj--> [z | xBC | dt]
    xBC --causal depthwise conv(d_conv) -> SiLU--> [x | B | C]
    dt = softplus(dt + dt_bias);  A = -exp(A_log)
    y = SSD(x, dt, A, B, C) + D * x          (ops/ssd.py chunked matmul scan)
    y = RMSNorm(y * SiLU(z)) * g             (gated RMSNorm, fp32)
    out = y @ out_proj

Parameterization mirrors the original (A_log/D/dt_bias per head, conv over the
concatenated x|B|C channels, bias-free in/out projections) so configs and
param-count accounting line up; initialization follows the same recipes
(A ~ U(1,16) via log, dt ~ LogUniform(1e-3, 0.1) through inverse softplus with
a 1e-4 floor). Compute dtype is configurable (bf16 for training); decay math
inside the scan is always fp32.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hnet_mamba_asr_tpu.ops.ssd import ssd


def _a_log_init(a_range: tuple[float, float]):
    def init(key, shape, dtype=jnp.float32):
        lo, hi = a_range
        a = jax.random.uniform(key, shape, jnp.float32, lo, hi)
        return jnp.log(a).astype(dtype)
    return init


def _dt_bias_init(dt_min: float, dt_max: float, floor: float):
    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (np.log(dt_max) - np.log(dt_min)) + np.log(dt_min))
        dt = jnp.maximum(dt, floor)
        # inverse softplus so that softplus(dt_bias) == dt at init
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)
    return init


class Mamba2(nn.Module):
    """One Mamba-2 mixing layer: [B, L, d_model] -> [B, L, d_model]."""

    d_model: int
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    ssd_intra_dtype: str | None = None
    ssd_out_compute_dtype: bool = False
    dtype: Any = jnp.float32
    a_init_range: tuple[float, float] = (1.0, 16.0)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    use_reference_scan: bool = False
    scan_backend: str = "xla"      # 'xla' (training) | 'pallas' (serving fwd)

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        d_inner = self.expand * self.d_model
        if d_inner % self.headdim != 0:
            raise ValueError(f"expand*d_model ({d_inner}) must be divisible by "
                             f"headdim ({self.headdim})")
        n_heads = d_inner // self.headdim
        d_bc = self.ngroups * self.d_state
        Bsz, L, _ = u.shape

        zxbcdt = nn.Dense(2 * d_inner + 2 * d_bc + n_heads, use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="in_proj")(u.astype(self.dtype))
        z, xBC, dt_raw = jnp.split(zxbcdt, [d_inner, 2 * d_inner + 2 * d_bc], axis=-1)

        # causal depthwise conv over the concatenated x|B|C channels
        conv_dim = d_inner + 2 * d_bc
        conv_w = self.param("conv_w", nn.initializers.lecun_normal(),
                            (self.d_conv, conv_dim), jnp.float32)
        conv_b = self.param("conv_b", nn.initializers.zeros, (conv_dim,), jnp.float32)
        xBC_pad = jnp.pad(xBC, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        conv = sum(xBC_pad[:, k:k + L, :] * conv_w[k].astype(self.dtype)
                   for k in range(self.d_conv))
        xBC = nn.silu(conv + conv_b.astype(self.dtype))

        x, B_mat, C_mat = jnp.split(xBC, [d_inner, d_inner + d_bc], axis=-1)
        x = x.reshape(Bsz, L, n_heads, self.headdim)
        B_mat = B_mat.reshape(Bsz, L, self.ngroups, self.d_state)
        C_mat = C_mat.reshape(Bsz, L, self.ngroups, self.d_state)

        dt_bias = self.param("dt_bias",
                             _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
                             (n_heads,), jnp.float32)
        a_log = self.param("a_log", _a_log_init(self.a_init_range),
                           (n_heads,), jnp.float32)
        d_skip = self.param("d_skip", nn.initializers.ones, (n_heads,), jnp.float32)

        dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + dt_bias)       # [B,L,H]
        A = -jnp.exp(a_log)                                              # [H], < 0

        y = ssd(x, dt, A, B_mat, C_mat, chunk_size=self.chunk_size,
                intra_dtype=self.ssd_intra_dtype,
                use_reference=self.use_reference_scan,
                backend=self.scan_backend)                               # [B,L,H,P]
        y = y + d_skip[None, None, :, None].astype(y.dtype) * x
        if self.ssd_out_compute_dtype:
            # RETRACTED no-op kept for config compat: ops/ssd.py casts y to
            # x.dtype (== self.dtype here) before returning, so this convert
            # folds away — flag on/off compiles to an IDENTICAL jaxpr
            # (verified at production dims, r3). The "+14-18%" once recorded
            # for it (docs/results/config_ab_ssd_out_dtype.json) was relay
            # drift between interleaved arms, not a real effect; see the
            # arms-identical guard in scripts/analysis/bench_config_ab.py.
            y = y.astype(self.dtype)
        y = y.reshape(Bsz, L, d_inner)

        # gated RMSNorm (norm after gating, mamba_ssm convention): statistics
        # in fp32; the gated product inherits y's dtype (fp32 unless
        # ssd_out_compute_dtype rounds it above).
        g = self.param("norm_scale", nn.initializers.ones, (d_inner,), jnp.float32)
        gated = y * nn.silu(z).astype(y.dtype)
        rms = jax.lax.rsqrt(
            jnp.mean(jnp.square(gated.astype(jnp.float32)), axis=-1,
                     keepdims=True) + 1e-5)
        y = (gated.astype(jnp.float32) * rms * g).astype(self.dtype)

        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(y)
