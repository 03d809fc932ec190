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


def _normalize_intra_dtype(intra_dtype: str | None) -> str | None:
    """'bf16'/'bfloat16' -> 'bf16'; None/'fp32'/'float32' -> None; else raise.

    A silently-unrecognized value would fall through to the fp32 path and
    double the intra-chunk HBM traffic — fail loudly instead (this repo's
    bytes-breakdown tool itself hit exactly that with 'bfloat16')."""
    if intra_dtype in (None, "", "fp32", "float32"):
        return None
    if intra_dtype in ("bf16", "bfloat16"):
        return "bf16"
    raise ValueError(f"ssd intra_dtype must be None/'fp32' or 'bf16', "
                     f"got {intra_dtype!r}")


def _intra_impl(ac, dtc, Cc, Bc, xc, intra_dtype: str | None):
    """Intra-chunk masked decay attention: y[q] = sum_{s<=q} w[q,s] x[s] with
    w = (C_q.B_s) * exp(ac_q - ac_s) * dt_s. Returns (y_intra fp32, weights)."""
    Q = ac.shape[-1]
    seg = ac[..., :, None] - ac[..., None, :]                     # [B,K,H,Q,S]
    causal = jnp.tril(jnp.ones((Q, Q), dtype=bool))
    # mask BEFORE exp: future-position differences are POSITIVE and their exp
    # overflows; an overflow in the unselected where branch leaks NaN into
    # gradients (zero cotangent times inf)
    seg = jnp.where(causal, seg, -jnp.inf)
    if intra_dtype == "bf16":
        decay = jnp.exp(seg).astype(jnp.bfloat16)
        scores = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                            preferred_element_type=jnp.bfloat16)
        weights = (scores * decay
                   * dtc[..., None, :].astype(jnp.bfloat16)).astype(xc.dtype)
    else:
        decay = jnp.exp(seg)
        scores = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                            preferred_element_type=jnp.float32)   # C_q . B_s
        weights = (scores * decay * dtc[..., None, :]).astype(xc.dtype)
    y = jnp.einsum("bkhqs,bkhsp->bkhqp", weights, xc,
                   preferred_element_type=jnp.float32)
    return y, weights


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _intra_attn(ac, dtc, Cc, Bc, xc, intra_dtype: str | None):
    """Intra-chunk attention with a hand-written, flash-style backward.

    Autodiff of the inline version saves three [B,K,H,Q,Q] residuals between
    forward and backward and materializes its backward QQ intermediates in
    fp32 (the transpose einsums inherit preferred_element_type=f32): at the
    production shape those fp32 QQ tensors were the single largest HBM shape
    family in the compiled step (docs/results/bytes_breakdown.json). The step
    sits AT the v5e HBM-bandwidth roofline with MFU ~0.12, so FLOPs are free
    and bytes are everything. This VJP therefore:

    - saves only O(L) residuals (ac/dt/C/B/x and the fp32 y output) and
      recomputes the QQ tensors in the backward (flash-attention recipe);
    - keeps every backward QQ intermediate in ``intra_dtype`` (matmul
      accumulation stays fp32 on the MXU);
    - uses the flash-attention row-sum identity
      sum_s dW[q,s] * W[q,s] = sum_p g[q,p] * y_intra[q,p]
      so the positive d_ac term needs no QQ tensor at all, and phrases the
      remaining QQ reductions as multiply->reduce chains XLA fuses without
      materializing their products.
    """
    y, _ = _intra_impl(ac, dtc, Cc, Bc, xc, intra_dtype)
    return y


def _intra_attn_fwd(ac, dtc, Cc, Bc, xc, intra_dtype):
    y, _ = _intra_impl(ac, dtc, Cc, Bc, xc, intra_dtype)
    return y, (ac, dtc, Cc, Bc, xc, y)


def _intra_attn_bwd(intra_dtype, res, g):
    ac, dtc, Cc, Bc, xc, y = res
    D = jnp.bfloat16 if intra_dtype == "bf16" else jnp.float32
    _, weights = _intra_impl(ac, dtc, Cc, Bc, xc, intra_dtype)    # recompute
    Q = ac.shape[-1]
    seg = ac[..., :, None] - ac[..., None, :]
    causal = jnp.tril(jnp.ones((Q, Q), dtype=bool))
    decay = jnp.exp(jnp.where(causal, seg, -jnp.inf)).astype(D)
    scores = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                        preferred_element_type=D)
    dtD = dtc[..., None, :].astype(D)

    gD = g.astype(D)
    d_xc = jnp.einsum("bkhqs,bkhqp->bkhsp", weights, g,
                      preferred_element_type=jnp.float32).astype(xc.dtype)
    d_weights = jnp.einsum("bkhqp,bkhsp->bkhqs", gD, xc.astype(D),
                           preferred_element_type=D)

    # d_ac[q] += sum_s dW*W  (flash row identity: == sum_p g*y, no QQ tensor);
    # d_ac[s] -= sum_q dW*W  (multiply->reduce, fuses without materializing)
    row = jnp.sum(g * y, axis=-1, dtype=jnp.float32)              # [B,K,H,Q]
    col = jnp.sum((d_weights * weights.astype(D)).astype(jnp.float32),
                  axis=-2)                                        # [B,K,H,S]
    d_ac = row - col

    # dt enters as the per-source column scale of weights
    d_dt = jnp.sum((d_weights * scores * decay).astype(jnp.float32),
                   axis=-2)                                       # [B,K,H,S]

    d_scores = d_weights * decay * dtD
    d_Cc = jnp.einsum("bkhqs,bkhsn->bkhqn", d_scores, Bc.astype(D),
                      preferred_element_type=jnp.float32).astype(Cc.dtype)
    d_Bc = jnp.einsum("bkhqs,bkhqn->bkhsn", d_scores, Cc.astype(D),
                      preferred_element_type=jnp.float32).astype(Bc.dtype)
    return d_ac, d_dt, d_Cc, d_Bc, d_xc


_intra_attn.defvjp(_intra_attn_fwd, _intra_attn_bwd)


@partial(jax.jit, static_argnames=("chunk_size", "return_final",
                                   "intra_dtype", "custom_vjp"))
def ssd_chunked(x: jax.Array, dt: jax.Array, A: jax.Array, B: jax.Array,
                C: jax.Array, chunk_size: int = 256,
                initial_state: jax.Array | None = None,
                return_final: bool = False, intra_dtype: str | None = None,
                custom_vjp: bool = False):
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

    ``custom_vjp=True`` opts into the flash-style hand-written backward for
    the intra-chunk attention (O(L) residuals, recomputed QQ tensors in
    ``intra_dtype``). Measured on the v5e at the production shape it is
    ~2.5% SLOWER within-run than plain autodiff (208.5k vs 213.6k and
    187.7k vs 193.4k frames/s in interleaved arms —
    docs/results/custom_vjp_ab.json): the step is HBM-bound but XLA's
    autodiff schedule already overlaps the QQ materializations well, and
    the recompute adds traffic of its own. Kept as an off-by-default
    measurement aid (same reasoning as the Pallas forward kernel).
    """
    intra_dtype = _normalize_intra_dtype(intra_dtype)
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
    if custom_vjp:
        y_intra = _intra_attn(ac, dtc, Cc, Bc, xc, intra_dtype)
    else:
        y_intra, _ = _intra_impl(ac, dtc, Cc, Bc, xc, intra_dtype)

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
        backend: str = "xla", intra_dtype: str | None = None,
        custom_vjp: bool = False):
    """Dispatch: 'xla' chunked (default; differentiable), 'pallas' fused
    forward kernel (serving path, no VJP), or the sequential reference."""
    if use_reference:
        return ssd_reference(x, dt, A, B, C)
    if backend == "pallas":
        from hnet_mamba_asr_tpu.ops.ssd_pallas import ssd_pallas
        return ssd_pallas(x, dt, A, B, C, chunk_size=chunk_size)
    return ssd_chunked(x, dt, A, B, C, chunk_size=chunk_size,
                       intra_dtype=intra_dtype, custom_vjp=custom_vjp)
