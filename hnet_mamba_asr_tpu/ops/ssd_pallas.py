"""Fused Pallas TPU kernel for the Mamba-2 SSD scan (forward / serving path).

One kernel instance processes one (batch, head) pair's chunk k: it computes
the intra-chunk decay attention, adds the inter-chunk contribution from the
running state, and updates the state — all in VMEM, so the [Q, Q] score and
decay matrices never round-trip through HBM (the XLA path in ops/ssd.py
materializes them between fusions). The recurrence across chunks rides the
TPU's sequential grid execution: the state lives in a VMEM scratch buffer that
persists across grid steps along the chunk axis and is reset at k == 0.

Grid: (B*H, K) with K innermost. Per-block shapes: x [Q, P], B/C [Q, N],
dt/a [1, Q] (a = dt * A precomputed outside; A < 0 so exp terms stay <= 1 and
masked future positions are set to -inf BEFORE the exp). Matmuls declare fp32
accumulation; the state is fp32.

This kernel is the inference/decode fast path — it has no VJP (training uses
the autodiff-able chunked XLA formulation; a hand-written backward kernel is
the planned follow-up). Numerics match ``ssd_reference`` to fp32 tolerance
(tested in interpret mode on CPU and against the XLA path on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnet_mamba_asr_tpu.ops.ssd import _expand_groups


def _ssd_kernel(aux_ref, x_ref, b_ref, c_ref, o_ref, state):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    aux = aux_ref[0]                                 # [Q, 8] fp32 (dt | ac | 0...)
    dt_col = aux[:, 0:1]                             # [Q, 1]
    ac_col = aux[:, 1:2]                             # [Q, 1] within-chunk cumsum of
    x = x_ref[0]                                     # [Q, P]    a = dt * A (<= 0);
    b = b_ref[0]                                     # [Q, N]    cumsum precomputed
    c = c_ref[0]                                     # [Q, N]    outside (no TPU
    Q = x.shape[0]                                   #            cumsum lowering)
    ac_row = jnp.transpose(ac_col)                   # [1, Q]
    # seg[q, s] = ac[q] - ac[s]; mask future (s > q) BEFORE exp (overflow-safe)
    seg = ac_col - ac_row                            # [Q, Q]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    seg = jnp.where(rows >= cols, seg, -jnp.inf)
    decay = jnp.exp(seg)                             # [Q, Q] fp32

    scores = jax.lax.dot_general(c, b, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)   # [Q, Q]
    w = (scores * decay * jnp.transpose(dt_col)).astype(x.dtype)
    y = jnp.dot(w, x, preferred_element_type=jnp.float32)              # [Q, P]

    # inter-chunk: y += exp(ac[q]) * C_q @ state_before
    y_inter = jnp.dot(c.astype(jnp.float32), state[:],
                      preferred_element_type=jnp.float32)              # [Q, P]
    y = y + y_inter * jnp.exp(ac_col)

    # state update: S = exp(ac[last]) * S + sum_s exp(ac[last]-ac[s]) dt_s B_s x_s^T
    ac_last = ac_col[Q - 1, 0]
    wb = (b.astype(jnp.float32)
          * (jnp.exp(ac_last - ac_col) * dt_col))                      # [Q, N]
    new_state = jnp.exp(ac_last) * state[:] + jax.lax.dot_general(
        wb, x.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                            # [N, P]
    state[:] = new_state
    o_ref[0] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("chunk_size", "interpret"))
def ssd_pallas(x: jax.Array, dt: jax.Array, A: jax.Array, B: jax.Array,
               C: jax.Array, chunk_size: int = 256,
               interpret: bool = False) -> jax.Array:
    """Fused-forward SSD. Same contract as ops.ssd.ssd_chunked (no VJP).

    x [B, L, H, P], dt [B, L, H], A [H], B/C [B, L, G, N] -> y [B, L, H, P].
    """
    Bsz, L, H, P = x.shape
    Q = int(chunk_size)
    pad = (-L) % Q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    K = Lp // Q
    N = B.shape[-1]

    Bh = _expand_groups(B, H)
    Ch = _expand_groups(C, H)
    # head-major flattening: one grid row per (batch, head)
    xf = x.transpose(0, 2, 1, 3).reshape(Bsz * H, Lp, P)
    bf = Bh.transpose(0, 2, 1, 3).reshape(Bsz * H, Lp, N)
    cf = Ch.transpose(0, 2, 1, 3).reshape(Bsz * H, Lp, N)
    dtf = dt.transpose(0, 2, 1).reshape(Bsz * H, Lp).astype(jnp.float32)
    # a = dt * A_head; rows are (b, h) flattened b-major/h-minor -> tile A per b
    a_rows = jnp.tile(A.astype(jnp.float32), (Bsz,))         # [B*H]
    af = dtf * a_rows[:, None]
    # within-chunk cumsum precomputed here (Pallas TPU has no cumsum lowering)
    acf = jnp.cumsum(af.reshape(Bsz * H, K, Q), axis=2).reshape(Bsz * H, Lp)
    # scalars-per-position pack into an 8-lane aux tensor (TPU tile alignment:
    # the last two block dims must be (8k, 128k) or match the array)
    aux = jnp.zeros((Bsz * H, Lp, 8), jnp.float32)
    aux = aux.at[:, :, 0].set(dtf).at[:, :, 1].set(acf)

    grid = (Bsz * H, K)
    vec_spec = lambda d: pl.BlockSpec((1, Q, d), lambda bh, k: (bh, k, 0),
                                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _ssd_kernel,
        grid=grid,
        in_specs=[vec_spec(8), vec_spec(P), vec_spec(N), vec_spec(N)],
        out_specs=vec_spec(P),
        out_shape=jax.ShapeDtypeStruct((Bsz * H, Lp, P), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, P), jnp.float32)],
        interpret=interpret,
    )(aux, xf, bf, cf)

    y = out.reshape(Bsz, H, Lp, P).transpose(0, 2, 1, 3)
    return y[:, :L]
