"""Mamba-2 selective state-space scan (SSD) — the encoder's core compute op.

TPU-native replacement for the mamba_ssm CUDA kernels the reference depends on
(reference: src/dcasr/models/mamba_block.py:12 imports mamba_ssm.Mamba2). Two
implementations with identical semantics:

- ``ssd_reference``: per-timestep linear recurrence via ``lax.scan`` — the
  ground-truth oracle for tests (and a fallback path).
- ``ssd_chunked``: the blockwise ("chunked") SSD form: the sequence is split
  into chunks of length Q; within a chunk the recurrence unrolls into a masked
  decay-weighted attention-like matmul (MXU work), chunk boundary states are
  summarized into one [N, P] matrix per head, and a short ``lax.scan`` over the
  L/Q chunk states carries the recurrence across chunks. All heavy compute is
  batched matmuls with fp32 accumulation; decays are computed in fp32 as
  exponentials of *differences* of cumulative sums (always <= 1, so no
  overflow). This is the standard SSD decomposition (Dao & Gu 2024) — chosen
  here because it maps directly onto the TPU MXU with XLA-fused elementwise
  decay application, unlike the per-element CUDA scan the reference uses.

Recurrence (per batch b, head h; state S in R^{N x P}):

    a_t = dt_t * A_h                       (A_h < 0, so exp(a_t) in (0, 1])
    S_t = exp(a_t) * S_{t-1} + dt_t * B_t outer x_t
    y_t = C_t @ S_t                        (+ D_h * x_t skip, applied by caller)

Shapes: x [B,L,H,P], dt [B,L,H], A [H], B/C [B,L,G,N] with G groups shared by
H//G heads each.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand_groups(mat: jax.Array, n_heads: int) -> jax.Array:
    """[B, L, G, N] -> [B, L, H, N] by repeating each group over its heads."""
    B, L, G, N = mat.shape
    if G == n_heads:
        return mat
    assert n_heads % G == 0, f"n_heads={n_heads} not divisible by groups={G}"
    return jnp.repeat(mat, n_heads // G, axis=2)


def ssd_reference(x: jax.Array, dt: jax.Array, A: jax.Array, B: jax.Array,
                  C: jax.Array, initial_state: jax.Array | None = None,
                  return_final: bool = False):
    """Sequential oracle: scan over L. fp32 state. Returns y [B, L, H, P]
    (or ``(y, S_final [B, H, N, P])`` with ``return_final`` — the carried
    recurrence state for chunk-wise streaming inference)."""
    Bsz, L, H, P = x.shape
    N = B.shape[-1]
    Bh = _expand_groups(B, H).astype(jnp.float32)
    Ch = _expand_groups(C, H).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)

    def step(S, inp):
        x_t, dt_t, B_t, C_t = inp                       # [B,H,P], [B,H], [B,H,N], [B,H,N]
        decay = jnp.exp(dt_t * Af)[..., None, None]     # [B,H,1,1]
        S = decay * S + (dt_t[..., None, None]
                         * B_t[..., :, None] * x_t[..., None, :])   # [B,H,N,P]
        y_t = jnp.einsum("bhn,bhnp->bhp", C_t, S)
        return S, y_t

    S0 = (jnp.zeros((Bsz, H, N, P), dtype=jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))
    S_final, ys = jax.lax.scan(step, S0,
                               (xf.transpose(1, 0, 2, 3), dtf.transpose(1, 0, 2),
                                Bh.transpose(1, 0, 2, 3), Ch.transpose(1, 0, 2, 3)))
    y = ys.transpose(1, 0, 2, 3).astype(x.dtype)        # [B, L, H, P]
    return (y, S_final) if return_final else y


@partial(jax.jit, static_argnames=("chunk_size", "return_final",
                                   "intra_dtype"))
def ssd_chunked(x: jax.Array, dt: jax.Array, A: jax.Array, B: jax.Array,
                C: jax.Array, chunk_size: int = 256,
                initial_state: jax.Array | None = None,
                return_final: bool = False, intra_dtype: str | None = None):
    """Chunked SSD: identical outputs to ``ssd_reference`` (fp32-accumulated).

    L is padded up to a multiple of ``chunk_size`` internally (dt=0 padding is
    an exact no-op for the recurrence: decay=1 and no state update).
    ``initial_state``/``return_final`` carry the [B, H, N, P] recurrence state
    across calls for chunk-wise streaming inference.

    ``intra_dtype='bf16'`` stores the [B, K, H, Q, Q] intra-chunk
    score/decay intermediates in bfloat16 (matmul accumulation stays fp32 on
    the MXU). The train step is at the HBM-bandwidth roofline
    (docs/results/roofline_tpu.json) and these tensors are its largest
    reducible term; decay values are in (0, 1] and scores are O(1) dot
    products, so bf16's 8 mantissa bits cost ~1e-2 relative error on y —
    acceptable for training, opt-in via encoder_conf.ssd_intra_dtype.
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
    # head-major chunked views [B, K, H, Q, *]: (b, k, h) become pure batch
    # dims so every einsum below is a clean QxN / NxS / SxP tile on the MXU
    # (head counts are small — putting H in a minor axis wastes ~10x in lanes)
    xc = x.reshape(Bsz, K, Q, H, P).transpose(0, 1, 3, 2, 4)
    dtc = dt.reshape(Bsz, K, Q, H).transpose(0, 1, 3, 2).astype(jnp.float32)
    Bc = Bh.reshape(Bsz, K, Q, H, N).transpose(0, 1, 3, 2, 4)
    Cc = Ch.reshape(Bsz, K, Q, H, N).transpose(0, 1, 3, 2, 4)

    a = dtc * A.astype(jnp.float32)[None, None, :, None]          # [B,K,H,Q] (<= 0)
    ac = jnp.cumsum(a, axis=3)                                    # within-chunk cumsum

    # ── intra-chunk: masked decay attention ──────────────────────────────────
    # decay(j -> q) = exp(ac[q] - ac[j]) for j <= q (excludes a_j itself).
    # Mask BEFORE exp: future-position differences are POSITIVE (up to
    # |A|*dt*Q) and their exp overflows; an overflow in the unselected where
    # branch leaks NaN into the backward pass (zero cotangent times inf).
    seg = ac[..., :, None] - ac[..., None, :]                     # [B,K,H,Q,S]
    causal = jnp.tril(jnp.ones((Q, Q), dtype=bool))
    seg = jnp.where(causal, seg, -jnp.inf)
    if intra_dtype == "bf16":
        # halve the HBM traffic of the two largest intermediates; the exp is
        # still computed in fp32 (differences <= 0, no overflow) and only the
        # STORED tensors round to bf16
        decay_qs = jnp.exp(seg).astype(jnp.bfloat16)
        scores = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                            preferred_element_type=jnp.bfloat16)
        weights = (scores * decay_qs
                   * dtc[..., None, :].astype(jnp.bfloat16)).astype(x.dtype)
    else:
        decay_qs = jnp.exp(seg)
        scores = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                            preferred_element_type=jnp.float32)   # C_q . B_s
        weights = (scores * decay_qs * dtc[..., None, :]).astype(x.dtype)
    y_intra = jnp.einsum("bkhqs,bkhsp->bkhqp", weights, xc,
                         preferred_element_type=jnp.float32)

    # ── chunk boundary states ────────────────────────────────────────────────
    # S_k = sum_s exp(ac[last] - ac[s]) * dt_s * B_s outer x_s   -> [B,K,H,N,P]
    decay_to_end = jnp.exp(ac[..., -1:] - ac)                     # [B,K,H,Q]
    wB = (Bc * (decay_to_end * dtc)[..., None]).astype(x.dtype)   # [B,K,H,Q,N]
    states = jnp.einsum("bkhqn,bkhqp->bkhnp", wB, xc,
                        preferred_element_type=jnp.float32)

    # ── inter-chunk recurrence over K chunk states ───────────────────────────
    chunk_decay = jnp.exp(ac[..., -1])                            # [B,K,H] total decay

    def carry_step(S_prev, inp):
        S_k, d_k = inp                                            # [B,H,N,P], [B,H]
        S_new = d_k[..., None, None] * S_prev + S_k
        return S_new, S_prev                                      # emit state BEFORE chunk k

    S0 = (jnp.zeros((Bsz, H, N, P), dtype=jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))
    S_final, S_before = jax.lax.scan(
        carry_step, S0,
        (states.transpose(1, 0, 2, 3, 4), chunk_decay.transpose(1, 0, 2)))
    S_before = S_before.transpose(1, 0, 2, 3, 4)                  # [B,K,H,N,P]

    # ── inter-chunk contribution: y_inter[q] = exp(ac[q]) * C_q @ S_before ──
    y_inter = jnp.einsum("bkhqn,bkhnp->bkhqp", Cc,
                         S_before.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    y_inter = y_inter * jnp.exp(ac)[..., None]

    y = (y_intra + y_inter).transpose(0, 1, 3, 2, 4).reshape(Bsz, Lp, H, P)
    y = y[:, :L].astype(x.dtype)
    return (y, S_final) if return_final else y


def ssd(x, dt, A, B, C, chunk_size: int = 256, use_reference: bool = False,
        backend: str = "xla", intra_dtype: str | None = None):
    """Dispatch: 'xla' chunked (default; differentiable), 'pallas' fused
    forward kernel (serving path, no VJP), or the sequential reference."""
    if use_reference:
        return ssd_reference(x, dt, A, B, C)
    if backend == "pallas":
        from hnet_mamba_asr_tpu.ops.ssd_pallas import ssd_pallas
        return ssd_pallas(x, dt, A, B, C, chunk_size=chunk_size)
    return ssd_chunked(x, dt, A, B, C, chunk_size=chunk_size,
                       intra_dtype=intra_dtype)
