"""Sequence parallelism: time-sharded exact encoder execution over an 'sp' axis.

Beyond-reference capability (the reference's only parallel plane is DDP —
SURVEY.md §2.10); this module shards the TIME axis of the encoder across a
mesh axis so long-form audio whose activations exceed one chip's HBM can be
trained and encoded exactly. TPU-native design (no reference counterpart):

- mel frames are block-sharded over ``sp``; the x4 conv subsampling needs a
  3-frame right halo (receptive field 7, stride 4) exchanged with one
  ``ppermute`` per step;
- every Mamba2 layer is causal linear recurrence, so the only cross-shard
  coupling is (a) the depthwise-conv tail (d_conv-1 = 3 frames, one
  ``ppermute``) and (b) the SSD recurrence state: each shard computes its
  local pass from a zero state, then one tiny ``all_gather`` of per-shard
  ``(log decay-sum [B,H], final state [B,H,N,P])`` pairs + an exclusive
  log-domain prefix gives the shard's true incoming state, whose
  contribution is added in closed form (``y_t += C_t · exp(A·cumsum dt_t) ·
  S_in`` — the same algebra ops/ssd.py uses for its inter-chunk pass). No
  sequential relay across shards: every collective is O(states), not O(L).
- the backward (right-to-left) direction of bidirectional blocks reuses the
  same machinery on a block-reversed sequence (one ``ppermute`` with the
  mirror permutation + a local flip). Offline semantics reverse only each
  row's valid span (models/mamba_block.reverse_sequences); under SP the full
  buffer is reversed instead and padding frames are made EXACT no-ops by
  zeroing dt (SSD decay 1, no update) and the conv input at pad positions —
  the same no-op algebra the streaming encoder uses (models/streaming.py).
  Valid positions then see identical context and the results match offline.

Scope: Type A AND Type B configs, causal or bidirectional, N == 1 (identity
chunker) and N > 1 (dynamic chunker). Type B nests the same machinery twice:
the stage-2 router runs ON the per-shard valid-compacted stage-1 stream (its
k_{t-1} relay is the last GLOBALLY-valid stage-1 row, ``_last_valid_tail``),
stage-2 compaction compacts within the already-compacted buffer (counts2 <=
counts1 per shard), and both dechunks ride the same EMA state relay — the
level-2 dechunk lands on the level-1 layout, the level-1 dechunk on the fine
grid. Dynamic chunking under SP does NOT rebalance
compacted tokens across shards (that would need a data-dependent all_to_all):
each shard compacts ITS OWN kept frames to the front of an equal-size local
buffer — the same valid-compacted invariant models/streaming.py proved for
block streaming — so the global compressed stream is the true one with pad
holes only at shard-segment tails. Pads are EXACT no-ops (dt zeroed -> SSD
decay 1/no update; EMA P forced to 0 -> carry passes through) and the three
extra cross-shard couplings are tiny relays:

- the router's k_{t-1} halo (1 frame, ``ppermute``);
- the compressed conv tail = the last d_conv-1 GLOBALLY-valid rows before
  the shard (``all_gather`` of each shard's last 3 valid rows + a static
  top-k over sp*3 candidates — counts < 3 chain through earlier shards);
- the EMA dechunk state (scalar-decay analogue of the SSD relay: exclusive
  log-domain prefix of per-shard (sum log(1-P), final zbar) pairs), which
  also provides the gather-upsample fallback for frames preceding their
  shard's first boundary (their chunk lives on an earlier shard).

Bidirectional compressed stacks reverse the VALID span per shard + mirror
the shards (offline semantics reverse only each row's valid span), then run
the identical causal machinery. Compute waste is the offline formulation's
own (fixed M = L buffer, hnet_chunk.py design note) sliced per shard; the
EMA's L x L weight matrix shrinks to (L/sp)^2 per shard. One inherent
caveat: the hard router threshold b = 1[p >= 0.5] can flip under float
reduction-boundary noise when some p sits within ~1e-6 of 0.5 — the same
sensitivity any reordered reduction has on thresholded routing.

The module re-derives the encoder computation functionally from the param
pytree (the streaming module's proven approach) and mirrors
models/mamba2.Mamba2.__call__'s dtype choreography exactly; exactness vs the
offline encoder is locked by tests/test_seq_parallel.py on a virtual device
mesh (fp32 tight, bf16 loose — SP changes only reduction boundaries).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from hnet_mamba_asr_tpu.models.encoder import (ConvSubsampling4, EncoderOutput,
                                               subsampled_length)
from hnet_mamba_asr_tpu.models.hnet_chunk import _scatter_to_slots
from hnet_mamba_asr_tpu.ops.ssd import ssd_chunked

# ── cross-shard primitives ───────────────────────────────────────────────────


def _halo_from_left(x: jax.Array, n: int, axis: str, sp: int) -> jax.Array:
    """Previous shard's last ``n`` time frames (zeros on shard 0)."""
    if x.shape[1] < n:
        # a shorter slice would silently broadcast in the conv sum below
        raise ValueError(f"local block ({x.shape[1]} frames) shorter than the "
                         f"halo ({n}); use fewer sp shards for this length")
    if sp == 1:
        return jnp.zeros_like(x[:, :n])
    return lax.ppermute(x[:, -n:], axis, [(j, j + 1) for j in range(sp - 1)])


def _halo_from_right(x: jax.Array, n: int, axis: str, sp: int) -> jax.Array:
    """Next shard's first ``n`` time frames (zeros on the last shard)."""
    if sp == 1:
        return jnp.zeros_like(x[:, :n])
    return lax.ppermute(x[:, :n], axis, [(j + 1, j) for j in range(sp - 1)])


def _block_reverse(x: jax.Array, axis: str, sp: int) -> jax.Array:
    """Reverse the GLOBAL time axis: local flip + mirror shard permutation."""
    x = jnp.flip(x, axis=1)
    if sp == 1:
        return x
    return lax.ppermute(x, axis, [(j, sp - 1 - j) for j in range(sp)])


def _mirror(x: jax.Array, axis: str, sp: int) -> jax.Array:
    """Mirror shard permutation (shard j <-> shard sp-1-j), no local change."""
    if sp == 1:
        return x
    return lax.ppermute(x, axis, [(j, sp - 1 - j) for j in range(sp)])


def _reverse_valid(x: jax.Array, counts: jax.Array) -> jax.Array:
    """Per-row reverse of the first ``counts`` rows; pad rows become zeros.

    The local half of reversing a valid-compacted stream: the result is
    again valid-compacted (reversed valid rows at the front)."""
    L = x.shape[1]
    idx = counts[:, None] - 1 - jnp.arange(L)[None, :]            # [B, L]
    out = jnp.take_along_axis(x, jnp.maximum(idx, 0)[..., None], axis=1)
    return jnp.where((idx >= 0)[..., None], out, jnp.zeros_like(out))


def _mirror_compressed(x: jax.Array, counts: jax.Array, axis: str,
                       sp: int) -> tuple[jax.Array, jax.Array]:
    """Globally reverse a per-shard valid-compacted stream: reverse each
    shard's valid span locally, then mirror the shards. Returns the
    transformed stream and its per-shard counts (the mirrored counts).
    Self-inverse up to pad contents: apply ``_mirror`` then
    ``_reverse_valid`` with the ORIGINAL counts to undo."""
    return _mirror(_reverse_valid(x, counts), axis, sp), _mirror(counts, axis, sp)


def _last_valid_tail(x: jax.Array, counts: jax.Array, n: int, axis: str,
                     sp: int) -> jax.Array:
    """The last ``n`` GLOBALLY-valid rows strictly before this shard's
    segment, oldest -> newest; zeros where fewer than ``n`` exist.

    ``x`` [B, L, D] is valid-compacted per shard (rows [0, counts) real).
    Each shard contributes its last min(n, count) valid rows; a static
    top-k over the sp*n candidates (keyed by global order, invalid = -1)
    selects the true tail even when nearer shards kept fewer than ``n``
    rows — the chain through earlier shards costs nothing extra."""
    B, L, D = x.shape
    j = jnp.arange(n)
    idx = counts[:, None] - n + j[None, :]                        # [B, n]
    cand = jnp.take_along_axis(x, jnp.maximum(idx, 0)[..., None], axis=1)
    valid = idx >= 0
    if sp == 1:
        return jnp.zeros((B, n, D), x.dtype)
    gv, gvalid = lax.all_gather((cand, valid), axis)   # [sp,B,n,D], [sp,B,n]
    me = lax.axis_index(axis)
    shard = jnp.arange(sp)[:, None, None]
    key = jnp.where(gvalid & (shard < me),
                    (shard * n + j[None, None, :]).astype(jnp.int32), -1)
    key = key.transpose(1, 0, 2).reshape(B, sp * n)               # [B, sp*n]
    vals = gv.transpose(1, 0, 2, 3).reshape(B, sp * n, D)
    topk, pos = lax.top_k(key, n)                                 # newest first
    tail = jnp.take_along_axis(vals, pos[..., None], axis=1)
    tail = jnp.where((topk >= 0)[:, :, None], tail, jnp.zeros_like(tail))
    return jnp.flip(tail, axis=1)                                 # oldest first


# ── Mamba2 layer, time-sharded ───────────────────────────────────────────────


def _mamba2_sp(p: dict, u: jax.Array, *, axis: str, sp: int, chunk_size: int,
               dtype: Any, intra_dtype: str | None, out_compute: bool,
               pad_mask: jax.Array | None,
               counts: jax.Array | None = None) -> jax.Array:
    """One Mamba2 layer on a local time block [B, Ls, D].

    Mirrors models/mamba2.Mamba2.__call__ (same dtype casts, same SSD
    kernel); the three SP insertions are the conv-tail halo, the optional
    padding no-op mask (``pad_mask`` True = real frame; required for the
    reversed direction, where padding precedes valid frames), and the
    cross-shard SSD state relay + closed-form correction.

    ``counts`` [B] switches to compressed-stream mode (a per-shard
    valid-compacted buffer with pads TRAILING each shard segment): the pad
    mask derives from the counts and the conv tail is the last d_conv-1
    globally-valid rows (``_last_valid_tail``) instead of the previous
    shard's last positions — which would be pads there.
    """
    B_, L, _ = u.shape
    kernel = p["in_proj"]["kernel"]
    d_inner = p["out_proj"]["kernel"].shape[0]
    n_heads = p["a_log"].shape[0]
    headdim = d_inner // n_heads
    conv_dim = p["conv_w"].shape[1]
    d_bc = (conv_dim - d_inner) // 2                    # ngroups == 1 layout
    d_conv = p["conv_w"].shape[0]

    zxbcdt = u.astype(dtype) @ kernel.astype(dtype)
    z, xBC, dt_raw = jnp.split(zxbcdt, [d_inner, d_inner + conv_dim], axis=-1)

    if counts is not None:
        pad_mask = jnp.arange(L)[None, :] < counts[:, None]
    if pad_mask is not None:
        # zero BEFORE the conv so padded frames contribute zeros to their
        # neighbours' receptive fields — identical to the offline boundary
        xBC = xBC * pad_mask[:, :, None].astype(xBC.dtype)
    if counts is not None:
        tail = _last_valid_tail(xBC, counts, d_conv - 1, axis, sp)
    else:
        tail = _halo_from_left(xBC, d_conv - 1, axis, sp)
    conv_in = jnp.concatenate([tail, xBC], axis=1)
    conv = sum(conv_in[:, k:k + L, :] * p["conv_w"][k].astype(dtype)
               for k in range(d_conv))
    xBC = nn.silu(conv + p["conv_b"].astype(dtype))

    x, B_mat, C_mat = jnp.split(xBC, [d_inner, d_inner + d_bc], axis=-1)
    x = x.reshape(B_, L, n_heads, headdim)
    B_mat = B_mat.reshape(B_, L, 1, d_bc)
    C_mat = C_mat.reshape(B_, L, 1, d_bc)

    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"])   # [B,L,H]
    if pad_mask is not None:
        dt = jnp.where(pad_mask[:, :, None], dt, 0.0)  # decay 1, no update
    A = -jnp.exp(p["a_log"])                                          # [H] < 0

    y0, S_local = ssd_chunked(x, dt, A, B_mat, C_mat, chunk_size=chunk_size,
                              intra_dtype=intra_dtype, return_final=True)

    if sp > 1:
        # cross-shard state relay: exclusive prefix of (decay, state) pairs.
        # a_sum <= 0 always (dt >= 0, A < 0) so every exp below is <= 1.
        a_sum = jnp.sum(dt, axis=1) * A[None, :]                      # [B,H]
        ga, gS = lax.all_gather((a_sum, S_local.astype(jnp.float32)), axis)
        c = jnp.cumsum(ga, axis=0)                                    # [sp,B,H]
        idx = lax.axis_index(axis)
        c_top = lax.dynamic_index_in_dim(c, jnp.maximum(idx - 1, 0),
                                         axis=0, keepdims=False)
        sel = (jnp.arange(sp) < idx)[:, None, None]
        # mask in LOG domain before exp (never where(mask, exp(x), 0) —
        # the unselected branch's gradient would leak NaN; see ops/ssd.py)
        logw = jnp.where(sel, c_top[None] - c, -jnp.inf)
        S_in = jnp.einsum("sbh,sbhnp->bhnp", jnp.exp(logw), gS)
        # closed-form contribution of the incoming state at every position:
        # y_t += C_t · exp(A · cumsum(dt)_t) · S_in   (inclusive cumsum — the
        # same convention as ops/ssd.py's inter-chunk emission)
        cum = jnp.cumsum(dt, axis=1) * A[None, None, :]               # [B,L,H]
        # ngroups == 1: the single C group serves every head (g summed out)
        w = C_mat.astype(jnp.float32)                                 # [B,L,1,N]
        corr = jnp.einsum("blgn,blh,bhnp->blhp", w, jnp.exp(cum), S_in)
        y = (y0.astype(jnp.float32) + corr).astype(y0.dtype)
    else:
        y = y0

    y = y + p["d_skip"][None, None, :, None].astype(y.dtype) * x
    if out_compute:
        y = y.astype(dtype)
    y = y.reshape(B_, L, d_inner)

    g = p["norm_scale"]
    gated = y * nn.silu(z).astype(y.dtype)
    rms = lax.rsqrt(jnp.mean(jnp.square(gated.astype(jnp.float32)),
                             axis=-1, keepdims=True) + 1e-5)
    y = (gated.astype(jnp.float32) * rms * g).astype(dtype)
    return y @ p["out_proj"]["kernel"].astype(dtype)


def _block_sp(p: dict, x: jax.Array, rev_mask: jax.Array | None, *,
              bidirectional: bool, axis: str, sp: int, chunk_size: int,
              dtype: Any, intra_dtype: str | None, out_compute: bool) -> jax.Array:
    """Pre-norm residual MambaBlock on a local time block (mirrors
    models/mamba_block.MambaBlock.__call__)."""
    kw = dict(axis=axis, sp=sp, chunk_size=chunk_size, dtype=dtype,
              intra_dtype=intra_dtype, out_compute=out_compute)
    h = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32).apply(
        {"params": p["norm"]}, x)
    y = _mamba2_sp(p["fwd"], h, pad_mask=None, **kw)
    if bidirectional:
        hr = _block_reverse(h, axis, sp)
        yb = _mamba2_sp(p["bwd"], hr, pad_mask=rev_mask, **kw)
        y = y + _block_reverse(yb, axis, sp)
    return x + y


def _stack_sp(p: dict, x: jax.Array, rev_mask: jax.Array | None, n_layers: int,
              *, remat: bool, **kw) -> jax.Array:
    """MambaStack: n blocks + final LayerNorm."""
    blk = partial(_block_sp, **kw)
    if remat:
        blk = jax.checkpoint(blk, static_argnums=())
    for i in range(n_layers):
        x = blk(p[f"block_{i}"], x, rev_mask)
    return nn.LayerNorm(dtype=kw["dtype"], param_dtype=jnp.float32).apply(
        {"params": p["norm"]}, x)


# ── compressed (chunk-rate) stream: stacks, router, EMA under SP ─────────────


def _block_sp_c(p: dict, z: jax.Array, counts: jax.Array, *,
                bidirectional: bool, axis: str, sp: int, chunk_size: int,
                dtype: Any, intra_dtype: str | None,
                out_compute: bool) -> jax.Array:
    """Pre-norm residual MambaBlock on the per-shard valid-compacted
    compressed stream. The backward direction of bidirectional blocks
    reverses the VALID span (offline: mamba_block.reverse_sequences with
    lengths = counts) via ``_mirror_compressed`` and runs the identical
    causal machinery on the reversed layout."""
    kw = dict(axis=axis, sp=sp, chunk_size=chunk_size, dtype=dtype,
              intra_dtype=intra_dtype, out_compute=out_compute, pad_mask=None)
    h = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32).apply(
        {"params": p["norm"]}, z)
    y = _mamba2_sp(p["fwd"], h, counts=counts, **kw)
    if bidirectional:
        hr, cr = _mirror_compressed(h, counts, axis, sp)
        yb = _mamba2_sp(p["bwd"], hr, counts=cr, **kw)
        y = y + _reverse_valid(_mirror(yb, axis, sp), counts)
    return z + y


def _stack_sp_c(p: dict, z: jax.Array, counts: jax.Array, n_layers: int, *,
                remat: bool, **kw) -> jax.Array:
    """MambaStack over the compressed stream: n blocks + final LayerNorm."""
    blk = partial(_block_sp_c, **kw)
    if remat:
        blk = jax.checkpoint(blk)
    for i in range(n_layers):
        z = blk(p[f"block_{i}"], z, counts)
    return nn.LayerNorm(dtype=kw["dtype"], param_dtype=jnp.float32).apply(
        {"params": p["norm"]}, z)


def _router_sp(rp: dict, x: jax.Array, mask: jax.Array, *, axis: str, sp: int,
               dtype: Any, eps: float = 1e-6) -> tuple[jax.Array, jax.Array]:
    """RoutingModule on a local fine block (models/hnet_chunk.py:67 numerics:
    dtype matmuls, fp32 cosine, clamp INSIDE the sqrt — the norm-at-zero
    gradient landmine). k_{t-1} for a shard's first frame is the previous
    shard's last-POSITION key (offline uses jnp.roll over the fine sequence,
    whose padding trails globally); only the global first frame forces
    p = 1."""
    L = x.shape[1]
    q = x @ rp["W_q"]["kernel"].astype(dtype)
    k = x @ rp["W_k"]["kernel"].astype(dtype)
    k_first = _halo_from_left(k, 1, axis, sp)          # zeros on shard 0
    k_prev = jnp.concatenate([k_first, k[:, :-1]], axis=1)
    qf, kf = q.astype(jnp.float32), k_prev.astype(jnp.float32)
    sq = jnp.sum(qf * qf, axis=-1) * jnp.sum(kf * kf, axis=-1)
    cos = jnp.sum(qf * kf, axis=-1) / jnp.sqrt(jnp.maximum(sq, eps ** 2))
    p = 0.5 * (1.0 - cos)
    idx = lax.axis_index(axis) if sp > 1 else 0
    first = (jnp.arange(L)[None, :] == 0) & (idx == 0)
    p = jnp.where(first, 1.0, p)
    p = jnp.clip(p, 0.0, 1.0)
    b = (p >= 0.5).astype(p.dtype)
    m = mask.astype(p.dtype)
    return p * m, b * m


def _router_sp_c(rp: dict, z: jax.Array, counts: jax.Array, *, axis: str,
                 sp: int, dtype: Any,
                 eps: float = 1e-6) -> tuple[jax.Array, jax.Array]:
    """RoutingModule on a per-shard valid-compacted COMPRESSED stream (Type
    B stage 2). Within the valid span slot t-1 is the previous valid row;
    a shard's slot 0 takes the last GLOBALLY-valid row before the shard
    (``_last_valid_tail`` — offline the compacted buffer has no interior
    holes, so the previous slot is always the previous valid row). Only the
    global first row (shard 0 slot 0 — always valid: the fine frame 0 is a
    forced stage-1 boundary) forces p = 1."""
    L = z.shape[1]
    q = z @ rp["W_q"]["kernel"].astype(dtype)
    k = z @ rp["W_k"]["kernel"].astype(dtype)
    k_last = _last_valid_tail(k, counts, 1, axis, sp)  # zeros on shard 0
    k_prev = jnp.concatenate([k_last, k[:, :-1]], axis=1)
    qf, kf = q.astype(jnp.float32), k_prev.astype(jnp.float32)
    sq = jnp.sum(qf * qf, axis=-1) * jnp.sum(kf * kf, axis=-1)
    cos = jnp.sum(qf * kf, axis=-1) / jnp.sqrt(jnp.maximum(sq, eps ** 2))
    p = 0.5 * (1.0 - cos)
    idx = lax.axis_index(axis) if sp > 1 else 0
    first = (jnp.arange(L)[None, :] == 0) & (idx == 0)
    p = jnp.where(first, 1.0, p)
    p = jnp.clip(p, 0.0, 1.0)
    b = (p >= 0.5).astype(p.dtype)
    m = (jnp.arange(L)[None, :] < counts[:, None]).astype(p.dtype)
    return p * m, b * m


def _ratio_sp(p: jax.Array, b: jax.Array, mask: jax.Array, N_stage: float,
              axes) -> tuple[jax.Array, jax.Array]:
    """Global-batch ratio loss + realized kept fraction for one chunk stage
    (hnet_chunk.ratio_loss semantics with psummed fp32 sums — the offline
    full-batch means)."""
    mf = mask.astype(jnp.float32)
    denom = jnp.maximum(lax.psum(mf.sum(), axes), 1.0)
    F = lax.psum((b.astype(jnp.float32) * mf).sum(), axes) / denom
    G = lax.psum((p.astype(jnp.float32) * mf).sum(), axes) / denom
    coef = N_stage / (N_stage - 1.0)
    return coef * ((N_stage - 1.0) * F * G + (1.0 - F) * (1.0 - G)), F


def _compact_sp(x: jax.Array, p: jax.Array, b: jax.Array):
    """Per-shard compaction of kept rows into an equal-size local buffer.
    Returns (keep, lm, memb, counts, z_buf, P_buf): lm is the LOCAL
    membership (-1 = no local boundary yet — those rows take the relayed
    dechunk state), memb = max(lm, 0) indexes the buffer."""
    keep = b > 0.5
    lm = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    memb = jnp.maximum(lm, 0)
    counts = keep.sum(axis=1).astype(jnp.int32)                # [B]
    z_buf = _scatter_to_slots(x, memb, keep)                   # [B, L, D]
    P_buf = _scatter_to_slots(p, memb, keep)                   # [B, L]
    return keep, lm, memb, counts, z_buf, P_buf


def _dechunk_sp(zc: jax.Array, P_buf: jax.Array, counts: jax.Array,
                memb: jax.Array, lm: jax.Array, p: jax.Array, b: jax.Array,
                *, hnet_ema: bool, axis: str, sp: int) -> jax.Array:
    """DynamicChunker.dechunk under SP (paper Eq. 5 -> 8 -> 9): EMA at
    chunk rate with the cross-shard state relay, gather-upsample (rows
    before the shard's first boundary take the relayed state — their chunk
    lives on an earlier shard), confidence STE last (forward == 1.0)."""
    L = zc.shape[1]
    z_mask = jnp.arange(L)[None, :] < counts[:, None]
    if hnet_ema:
        zbar, zbar_in = _ema_sp(zc, P_buf, z_mask, axis=axis, sp=sp)
        prev = zbar_in.astype(zbar.dtype)
    else:
        zbar = zc
        prev = _last_valid_tail(zc, counts, 1, axis, sp)[:, 0]
    x_up = jnp.take_along_axis(zbar, memb[..., None], axis=1)
    x_up = jnp.where((lm >= 0)[..., None], x_up, prev[:, None])
    c = jnp.where(b > 0.5, p, 1.0 - p)
    ste = (c + lax.stop_gradient(1.0 - c))[..., None]
    return x_up * ste.astype(x_up.dtype)


def _ema_sp(z: jax.Array, P: jax.Array, z_mask: jax.Array, *, axis: str,
            sp: int, p_clamp: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """Causal EMA (ops/ema.py Eq. 5 numerics) on the per-shard
    valid-compacted stream with a cross-shard state relay.

    Interior pads are EXACT no-ops: their P is forced to 0 (NOT clamped to
    p_clamp — offline pads trail and never matter, but here a mid-stream
    pad with P = 1e-4 would perturb every later weight), so log(1-P) = 0
    and the carry passes through. The relay is the scalar-decay analogue of
    the SSD one: all_gather per-shard (sum log(1-P), final zbar) and take
    the exclusive log-domain prefix. Returns (zbar [B,L,D] in z.dtype,
    zbar_in [B,D] fp32 — the true EMA state entering this shard, i.e. the
    last valid chunk's smoothed value in the global prefix, which the
    gather-upsample uses for frames preceding the shard's first boundary).
    """
    B, L, D = z.shape
    zf = z.astype(jnp.float32)
    pc = jnp.where(z_mask,
                   jnp.clip(P.astype(jnp.float32), p_clamp, 1.0 - p_clamp),
                   0.0)
    idx = lax.axis_index(axis) if sp > 1 else 0
    first = (jnp.arange(L)[None, :] == 0) & (idx == 0)     # global slot 0
    src = jnp.where(first[..., None], zf, pc[..., None] * zf)   # zbar_0 = z_0
    log_keep = jnp.where(first, 0.0, jnp.log1p(-pc))
    S = jnp.cumsum(log_keep, axis=1)                       # inclusive, <= 0
    logw = S[:, :, None] - S[:, None, :]
    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    # mask BEFORE exp (the ops/ema.py gradient-NaN discipline)
    logw = jnp.where(causal[None], logw, -jnp.inf)
    zbar = jnp.einsum("bts,bsd->btd", jnp.exp(logw), src)
    if sp > 1:
        gd, gz = lax.all_gather((S[:, -1], zbar[:, -1]), axis)  # [sp,B],[sp,B,D]
        c = jnp.cumsum(gd, axis=0)
        c_top = lax.dynamic_index_in_dim(c, jnp.maximum(idx - 1, 0),
                                         axis=0, keepdims=False)
        sel = (jnp.arange(sp) < idx)[:, None]
        w = jnp.exp(jnp.where(sel, c_top[None] - c, -jnp.inf))
        zbar_in = jnp.einsum("sb,sbd->bd", w, gz)
        zbar = zbar + jnp.exp(S)[..., None] * zbar_in[:, None]
    else:
        zbar_in = jnp.zeros((B, D), jnp.float32)
    return zbar.astype(z.dtype), zbar_in


# ── the encoder body (runs inside shard_map) ─────────────────────────────────


def _encoder_body(eparams: dict, feats: jax.Array, flens: jax.Array, *,
                  enc_cfg: dict, axis: str, sp: int, dp_axis: str,
                  remat: bool):
    """Type A: conv ↓4 → enc stack → [dynamic chunk] → proj_in → main stack
    → proj_out → [dechunk] → fine-detail bypass residual → dec stack
    (models/encoder._forward_a; N == 1 inlines the identity chunker).
    Type B (models/encoder._forward_b): two nested sqrt(N) stages — chunk1
    → proj1_in → mid → chunk2 → main → dechunk2 → mid_dec → proj1_out →
    dechunk1 — with the stage-2 router/compaction/dechunk running on the
    per-shard valid-compacted stage-1 stream.

    Returns (features, ratio_loss, kept [S], p [S,B,Ls], b [S,B,Ls]) with
    S = 1 (Type A) or 2 (Type B) stages stacked; the scalars are psummed
    over (dp, sp) so they replicate, matching the offline global-batch
    means. Type B stage-2 p/b are reported in the SP per-shard-compacted
    layout (offline compacts globally — same values, different slots)."""
    dtype = enc_cfg["dtype"]
    Ts = feats.shape[1]                                    # local mel frames
    halo = _halo_from_right(feats, 3, axis, sp)
    sub = ConvSubsampling4(enc_cfg["n_mels"], enc_cfg["d_outer"], dtype=dtype)
    x, _ = sub.apply({"params": eparams["subsample"]},
                     jnp.concatenate([feats, halo], axis=1), flens)
    Ls = Ts // 4
    x = x[:, :Ls]                                          # [B, Ls, d_outer]

    # reversed-direction real-frame mask: global reversed position l' maps to
    # original position L_tot-1-l', real iff that is < enc_lens
    L_tot = sp * Ls
    enc_lens = subsampled_length(flens)
    idx = lax.axis_index(axis) if sp > 1 else 0
    gpos = idx * Ls + jnp.arange(Ls)[None, :]
    rev_mask = gpos >= (L_tot - enc_lens)[:, None]
    fwd_mask = gpos < enc_lens[:, None]

    kw = dict(axis=axis, sp=sp, bidirectional=enc_cfg["bidirectional"],
              chunk_size=enc_cfg["chunk_size"], dtype=dtype,
              intra_dtype=enc_cfg["intra_dtype"],
              out_compute=enc_cfg["out_compute"], remat=remat)
    x_enc = _stack_sp(eparams["enc"], x, rev_mask, enc_cfg["n_enc"], **kw)
    dense = dict(dtype=dtype, param_dtype=jnp.float32)
    N = enc_cfg["N"]
    arch = enc_cfg["arch"]
    axes = (dp_axis, axis)
    ckw = {k: v for k, v in kw.items() if k != "remat"}
    dkw = dict(hnet_ema=enc_cfg["hnet_ema"], axis=axis, sp=sp)
    fmask32 = fwd_mask.astype(jnp.float32)

    if N == 1 and arch == "A":
        z = nn.Dense(enc_cfg["d_main"], **dense).apply(
            {"params": eparams["proj_in"]}, x_enc)
        z = _stack_sp(eparams["main"], z, rev_mask, enc_cfg["n_main"], **kw)
        x_dech = nn.Dense(enc_cfg["d_outer"], **dense).apply(
            {"params": eparams["proj_out"]}, z)
        ratio = jnp.zeros((), jnp.float32)
        kept = jnp.ones((1,), jnp.float32)
        p = b = fmask32[None]                              # identity_chunk
    elif arch == "A":
        p1, b1 = _router_sp(eparams["chunk"]["router"], x_enc, fwd_mask,
                            axis=axis, sp=sp, dtype=dtype)
        ratio, F = _ratio_sp(p1, b1, fwd_mask, N, axes)
        keep, lm, memb, counts, z_buf, P_buf = _compact_sp(x_enc, p1, b1)
        zc = nn.Dense(enc_cfg["d_main"], **dense).apply(
            {"params": eparams["proj_in"]}, z_buf)
        zc = _stack_sp_c(eparams["main"], zc, counts, enc_cfg["n_main"],
                         remat=kw["remat"], **ckw)
        zc = nn.Dense(enc_cfg["d_outer"], **dense).apply(
            {"params": eparams["proj_out"]}, zc)
        x_dech = _dechunk_sp(zc, P_buf, counts, memb, lm, p1, b1, **dkw)
        kept = F[None]
        p, b = p1[None], b1[None]
    elif N == 1:                                           # Type B identity
        z1 = nn.Dense(enc_cfg["d_main"], **dense).apply(
            {"params": eparams["proj1_in"]}, x_enc)
        z1 = _stack_sp(eparams["mid"], z1, rev_mask, enc_cfg["n_mid"], **kw)
        z2 = _stack_sp(eparams["main"], z1, rev_mask, enc_cfg["n_main"], **kw)
        z1_dec = _stack_sp(eparams["mid_dec"], z1 + z2, rev_mask,
                           enc_cfg["n_mid"], **kw)
        x_dech = nn.Dense(enc_cfg["d_outer"], **dense).apply(
            {"params": eparams["proj1_out"]}, z1_dec)
        ratio = jnp.zeros((), jnp.float32)
        kept = jnp.ones((2,), jnp.float32)
        p = b = jnp.stack([fmask32, fmask32])
    else:                                                  # Type B, N > 1
        nb = N ** 0.5                                      # per-stage factor
        p1, b1 = _router_sp(eparams["chunk1"]["router"], x_enc, fwd_mask,
                            axis=axis, sp=sp, dtype=dtype)
        ratio1, F1 = _ratio_sp(p1, b1, fwd_mask, nb, axes)
        kp1, lm1, memb1, counts1, z1_buf, P1_buf = _compact_sp(x_enc, p1, b1)
        z1 = nn.Dense(enc_cfg["d_main"], **dense).apply(
            {"params": eparams["proj1_in"]}, z1_buf)
        z1 = _stack_sp_c(eparams["mid"], z1, counts1, enc_cfg["n_mid"],
                         remat=kw["remat"], **ckw)
        z1_mask = jnp.arange(Ls)[None, :] < counts1[:, None]
        p2, b2 = _router_sp_c(eparams["chunk2"]["router"], z1, counts1,
                              axis=axis, sp=sp, dtype=dtype)
        ratio2, F2 = _ratio_sp(p2, b2, z1_mask, nb, axes)
        kp2, lm2, memb2, counts2, z2_buf, P2_buf = _compact_sp(z1, p2, b2)
        z2 = _stack_sp_c(eparams["main"], z2_buf, counts2, enc_cfg["n_main"],
                         remat=kw["remat"], **ckw)
        x2 = _dechunk_sp(z2, P2_buf, counts2, memb2, lm2, p2, b2, **dkw)
        z1_dec = _stack_sp_c(eparams["mid_dec"], z1 + x2, counts1,
                             enc_cfg["n_mid"], remat=kw["remat"], **ckw)
        z1_out = nn.Dense(enc_cfg["d_outer"], **dense).apply(
            {"params": eparams["proj1_out"]}, z1_dec)
        x_dech = _dechunk_sp(z1_out, P1_buf, counts1, memb1, lm1, p1, b1,
                             **dkw)
        ratio = ratio1 + ratio2
        kept = jnp.stack([F1, F2])
        p, b = jnp.stack([p1, p2]), jnp.stack([b1, b2])

    x_out = _stack_sp(eparams["dec"], x_enc + x_dech, rev_mask,
                      enc_cfg["n_dec"], **kw)
    return x_out, ratio, kept, p, b


# ── public API ───────────────────────────────────────────────────────────────


def sp_supported(encoder) -> tuple[bool, str]:
    if float(encoder.N) != 1.0 and encoder.chunker != "dynamic":
        return False, ("N > 1 sequence parallelism supports the dynamic "
                       f"chunker only (got chunker={encoder.chunker!r})")
    return True, ""


def sp_encode(model, params: dict, feats: jax.Array, flens: jax.Array,
              mesh: Mesh, *, dp_axis: str = "dp", sp_axis: str = "sp",
              remat: bool = True) -> EncoderOutput:
    """Time-sharded encoder forward, exact vs ``model.encoder.apply``.

    ``feats`` [B, T, n_mels] is block-sharded over ``sp_axis`` (T must divide
    by 4*sp); the returned features are [B, T//4, d_outer] laid out
    P(dp, sp, None). T//4 is one frame LONGER than the offline conv output —
    the tail frame sits beyond every valid length (subsampled_length < T//4)
    and is masked by ``lengths`` exactly like ordinary padding.
    """
    enc = model.encoder
    ok, why = sp_supported(enc)
    if not ok:
        raise ValueError(why)
    sp = mesh.shape[sp_axis]
    B, T = feats.shape[0], feats.shape[1]
    if T % (4 * sp):
        raise ValueError(
            f"mel frame count {T} must be divisible by 4*sp ({4 * sp}); pad "
            "the waveform so frame_count(samples) lands on the grid")
    if T // (4 * sp) < 4:
        raise ValueError(
            f"per-shard encoder block T/(4*sp) = {T // (4 * sp)} is shorter "
            "than the conv halo (d_conv-1 = 3 frames); use fewer sp shards")
    enc_cfg = dict(n_mels=enc.n_mels, d_outer=enc.d_outer, d_main=enc.d_main,
                   n_enc=enc.n_enc, n_main=enc.n_main, n_dec=enc.n_dec,
                   n_mid=enc.n_mid, arch=enc.arch_type,
                   bidirectional=enc.bidirectional, chunk_size=enc.chunk_size,
                   dtype=enc.dtype, intra_dtype=enc.ssd_intra_dtype,
                   out_compute=enc.ssd_out_compute_dtype,
                   N=float(enc.N), hnet_ema=enc.hnet_ema)
    body = partial(_encoder_body, enc_cfg=enc_cfg, axis=sp_axis, sp=sp,
                   dp_axis=dp_axis, remat=remat)
    # check_vma=False: ops/ssd.py creates fresh-zero scan carries whose
    # varying-axis annotation differs from data-derived arrays — the body is
    # SPMD-correct (every cross-shard exchange is explicit) but the static
    # VMA propagation can't prove it without pcast noise inside the kernel.
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(), P(dp_axis, sp_axis, None), P(dp_axis)),
                       out_specs=(P(dp_axis, sp_axis, None), P(), P(),
                                  P(None, dp_axis, sp_axis),
                                  P(None, dp_axis, sp_axis)),
                       check_vma=False)
    features, ratio, kept, p, b = fn(params["encoder"], feats, flens)
    lengths = subsampled_length(flens)
    n_stages = p.shape[0]
    return EncoderOutput(features, lengths, ratio,
                         tuple((p[s], b[s]) for s in range(n_stages)),
                         (features,),
                         tuple(kept[s] for s in range(n_stages)))


class SPModel:
    """Duck-typed Trainer adapter (model contract: training/trainer.py:17)
    that executes the encoder sequence-parallel — long-form training becomes
    config-only: ``train.sp: N`` (scripts/train.py builds the (dp, sp) mesh
    and wraps the model; everything else in the Trainer is untouched).

    Constraint inherited from sp_encode: every batch's mel frame count must
    divide by 4*sp — pick data batch grids accordingly (the error message is
    self-diagnosing). Validation loss runs SP too; ``greedy_decode``
    delegates to the offline path (dev batches are small).
    """

    def __init__(self, model, mesh: Mesh, *, dp_axis: str = "dp",
                 sp_axis: str = "sp", remat: bool = True):
        ok, why = sp_supported(model.encoder)
        if not ok:
            raise ValueError(why)
        if sp_axis not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no {sp_axis!r} axis")
        self.model, self.mesh = model, mesh
        self.dp_axis, self.sp_axis, self.remat = dp_axis, sp_axis, remat

    def init_params(self, key):
        return self.model.init_params(key)

    def loss_fn(self, params, batch, step, train):
        return sp_loss_fn(self.model, params, batch, step, train, self.mesh,
                          dp_axis=self.dp_axis, sp_axis=self.sp_axis,
                          remat=self.remat)

    def greedy_decode(self, params, batch):
        return self.model.greedy_decode(params, batch)

    def __getattr__(self, name):                 # ctc/aed/encoder/weights/...
        return getattr(self.model, name)


def sp_loss_fn(model, params: dict, batch: dict, step, train: bool,
               mesh: Mesh, *, dp_axis: str = "dp", sp_axis: str = "sp",
               remat: bool = True):
    """``DCASRModel.loss_fn`` with the encoder executed sequence-parallel.

    Everything outside the encoder (log-mel, CMVN, SpecAugment, CTC/AED
    heads + losses) runs under ordinary GSPMD — the heads need the full
    time axis anyway (CTC's DP, AED's cross-attention), and their cost is
    a small fraction of the step. Matches loss_fn output structure
    (tasks/asr_task.py:161).
    """
    from hnet_mamba_asr_tpu.models.aed import label_smoothing_loss
    from hnet_mamba_asr_tpu.ops.ctc_loss import ctc_infeasible, ctc_loss
    from hnet_mamba_asr_tpu.training.loss import combine_losses

    row_mask = batch["row_mask"]
    feats, flens = model.features(batch, train)
    enc = sp_encode(model, params, feats, flens, mesh, dp_axis=dp_axis,
                    sp_axis=sp_axis, remat=remat)
    n_real = jnp.maximum(row_mask.sum().astype(jnp.float32), 1.0)
    ctc = aed = None
    stats: dict[str, Any] = {}
    if model.ctc is not None:
        logp = model.ctc.apply({"params": params["ctc"]}, enc.features,
                               method="log_probs")
        rows = ctc_loss(logp, enc.lengths, batch["tokens"],
                        batch["token_lens"], blank_id=model.ctc.blank_id,
                        reduction="none")
        rows = rows / jnp.maximum(batch["token_lens"], 1)
        ctc = (rows * row_mask).sum() / n_real
        infeasible = ctc_infeasible(enc.lengths, batch["tokens"],
                                    batch["token_lens"])
        stats["ctc_infeasible"] = (infeasible & row_mask).sum()
    if model.aed is not None:
        ys_in, ys_out, out_lens = model.aed.add_sos_eos(batch["tokens"],
                                                        batch["token_lens"])
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(17), step)} \
            if train else None
        logits = model.aed.apply({"params": params["aed"]}, enc.features,
                                 enc.lengths, ys_in, deterministic=not train,
                                 rngs=rngs)
        aed = label_smoothing_loss(logits, ys_out, out_lens,
                                   model.aed.lsm_weight, row_mask=row_mask)
    out = combine_losses(model.weights, ctc_loss=ctc, aed_loss=aed,
                         ratio_loss=enc.ratio_loss)
    stats.update({k: lax.stop_gradient(v) for k, v in out.items()})
    stats["kept_fraction"] = lax.stop_gradient(enc.kept_fractions[0])
    stats["batch_weight"] = row_mask.sum()
    return out["loss/total"], stats
