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

Scope: N == 1 (identity chunker) Type A configs, causal or bidirectional —
the production no-chunk control and the long-form fine-tune shape. Dynamic
chunking compacts a data-dependent number of frames per shard and needs a
different (load-rebalancing) design; ``sp_encode`` raises on N != 1.

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


# ── Mamba2 layer, time-sharded ───────────────────────────────────────────────


def _mamba2_sp(p: dict, u: jax.Array, *, axis: str, sp: int, chunk_size: int,
               dtype: Any, intra_dtype: str | None, out_compute: bool,
               pad_mask: jax.Array | None) -> jax.Array:
    """One Mamba2 layer on a local time block [B, Ls, D].

    Mirrors models/mamba2.Mamba2.__call__ (same dtype casts, same SSD
    kernel); the three SP insertions are the conv-tail halo, the optional
    padding no-op mask (``pad_mask`` True = real frame; required for the
    reversed direction, where padding precedes valid frames), and the
    cross-shard SSD state relay + closed-form correction.
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

    if pad_mask is not None:
        # zero BEFORE the conv so padded frames contribute zeros to their
        # neighbours' receptive fields — identical to the offline boundary
        xBC = xBC * pad_mask[:, :, None].astype(xBC.dtype)
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


# ── the encoder body (runs inside shard_map) ─────────────────────────────────


def _encoder_body(eparams: dict, feats: jax.Array, flens: jax.Array, *,
                  enc_cfg: dict, axis: str, sp: int, remat: bool) -> jax.Array:
    """Type A, N == 1: conv ↓4 → enc stack → proj_in → main stack → proj_out
    → fine-detail bypass residual → dec stack (models/encoder._forward_a with
    the identity chunker inlined)."""
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

    kw = dict(axis=axis, sp=sp, bidirectional=enc_cfg["bidirectional"],
              chunk_size=enc_cfg["chunk_size"], dtype=dtype,
              intra_dtype=enc_cfg["intra_dtype"],
              out_compute=enc_cfg["out_compute"], remat=remat)
    x_enc = _stack_sp(eparams["enc"], x, rev_mask, enc_cfg["n_enc"], **kw)
    dense = dict(dtype=dtype, param_dtype=jnp.float32)
    z = nn.Dense(enc_cfg["d_main"], **dense).apply(
        {"params": eparams["proj_in"]}, x_enc)
    z = _stack_sp(eparams["main"], z, rev_mask, enc_cfg["n_main"], **kw)
    x_dech = nn.Dense(enc_cfg["d_outer"], **dense).apply(
        {"params": eparams["proj_out"]}, z)
    return _stack_sp(eparams["dec"], x_enc + x_dech, rev_mask,
                     enc_cfg["n_dec"], **kw)


# ── public API ───────────────────────────────────────────────────────────────


def sp_supported(encoder) -> tuple[bool, str]:
    if encoder.arch_type != "A":
        return False, "sequence parallelism supports Type A configs (v1)"
    if float(encoder.N) != 1.0:
        return False, ("sequence parallelism requires N == 1 (the dynamic "
                       "chunker compacts a data-dependent frame count per "
                       "shard; shard-rebalancing is future work)")
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
                   bidirectional=enc.bidirectional, chunk_size=enc.chunk_size,
                   dtype=enc.dtype, intra_dtype=enc.ssd_intra_dtype,
                   out_compute=enc.ssd_out_compute_dtype)
    body = partial(_encoder_body, enc_cfg=enc_cfg, axis=sp_axis, sp=sp,
                   remat=remat)
    # check_vma=False: ops/ssd.py creates fresh-zero scan carries whose
    # varying-axis annotation differs from data-derived arrays — the body is
    # SPMD-correct (every cross-shard exchange is explicit) but the static
    # VMA propagation can't prove it without pcast noise inside the kernel.
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(), P(dp_axis, sp_axis, None), P(dp_axis)),
                       out_specs=P(dp_axis, sp_axis, None), check_vma=False)
    features = fn(params["encoder"], feats, flens)
    lengths = subsampled_length(flens)
    L = features.shape[1]
    ones = jnp.ones((B, L), dtype=features.dtype)
    return EncoderOutput(features, lengths, jnp.zeros((), jnp.float32),
                         ((ones, ones),), (features,),
                         (jnp.ones((), jnp.float32),))


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
    stats["kept_fraction"] = jnp.ones((), jnp.float32)
    stats["batch_weight"] = row_mask.sum()
    return out["loss/total"], stats
