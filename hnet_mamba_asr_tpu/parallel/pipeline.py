"""Pipeline parallelism: the main Mamba stack split into stages over 'pp'.

Beyond-reference capability (the reference's only plane is DDP — SURVEY.md
§2.10): the deepest, widest stack (the d_main trunk, 12 of the 20 blocks at
2x the width in the flagship) is partitioned layer-wise across a ``pp`` mesh
axis and driven with a GPipe-style microbatch schedule, so models whose
trunk exceeds one chip's HBM train across chips without tensor-splitting
individual matmuls (composable with dp on a ('dp','pp') mesh).

TPU-native design:
- per-stage weights: the n_main identical blocks' params are STACKED on a
  leading layer axis and shard_map'ed with spec P('pp') — stage s holds only
  its n_main/pp layers; no parameter broadcast ever happens.
- schedule: ticks t = 0 .. M+pp-2 (M = microbatches). At tick t stage s
  processes microbatch t-s: stage 0 injects microbatch t, every stage
  applies its local blocks, one ``ppermute`` ships activations to stage
  s+1. Because the schedule is deterministic, per-microbatch metadata
  (valid lengths for the bidirectional reverse) is recomputed locally from
  (t, s) instead of being shipped.
- output: the last stage accumulates finished microbatches; one masked
  ``psum`` over 'pp' replicates the result (the natural broadcast point —
  everything downstream of the trunk is replicated).
- autodiff: the backward schedule (reverse ticks, reversed ppermute) falls
  out of JAX's transpose of the forward scan — no hand-written 1F1B.

The per-block math reuses parallel/seq_parallel._mamba2_sp with sp=1 (at
one shard it is exactly models/mamba2.Mamba2.__call__) plus the stock
valid-span reverse, so PP composes with any chunking config: only the
plain MambaStack call is replaced; conv/chunker/dechunk/heads run through
the ordinary flax modules via an ``apply(method=...)`` override.

Exactness (forward, grads, one optimizer step) is locked by
tests/test_pipeline.py on a virtual ('dp','pp') CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from hnet_mamba_asr_tpu.models.encoder import EncoderOutput, lengths_to_mask
from hnet_mamba_asr_tpu.models.mamba_block import reverse_sequences
from hnet_mamba_asr_tpu.parallel.seq_parallel import _mamba2_sp


def _block_full(p: dict, x: jax.Array, lengths: jax.Array | None, *,
                bidirectional: bool, chunk_size: int, dtype: Any,
                intra_dtype: str | None, out_compute: bool) -> jax.Array:
    """One MambaBlock on a full (un-time-sharded) sequence — exactly
    models/mamba_block.MambaBlock.__call__ via the functional layer."""
    kw = dict(axis="_unused_", sp=1, chunk_size=chunk_size, dtype=dtype,
              intra_dtype=intra_dtype, out_compute=out_compute, pad_mask=None)
    h = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32).apply(
        {"params": p["norm"]}, x)
    y = _mamba2_sp(p["fwd"], h, **kw)
    if bidirectional:
        hr = reverse_sequences(h, lengths)
        y = y + reverse_sequences(_mamba2_sp(p["bwd"], hr, **kw), lengths)
    return x + y


def stack_block_params(stack_params: dict, n_layers: int, pp: int):
    """{block_0..block_{n-1}} -> leaves stacked [pp, k, ...] (k = n/pp).

    Stage s's k consecutive blocks live in row s; shard_map spec P('pp')
    places exactly one stage's weights per device.
    """
    if n_layers % pp:
        raise ValueError(f"n_layers {n_layers} not divisible by pp={pp}")
    blocks = [stack_params[f"block_{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    k = n_layers // pp
    return jax.tree_util.tree_map(
        lambda a: a.reshape((pp, k) + a.shape[1:]), stacked)


def pp_stack_apply(stack_params: dict, x: jax.Array, lengths: jax.Array,
                   mesh: Mesh, *, n_layers: int, bidirectional: bool,
                   chunk_size: int, dtype: Any, intra_dtype: str | None,
                   out_compute: bool, dp_axis: str = "dp",
                   pp_axis: str = "pp", microbatches: int | None = None,
                   remat: bool = True) -> jax.Array:
    """MambaStack (blocks + final LN) with the blocks pipelined over 'pp'.

    ``x`` [B, L, D] (B dp-sharded, replicated over pp), ``lengths`` [B].
    Identical output to ``MambaStack.apply`` up to float noise.
    """
    pp = mesh.shape[pp_axis]
    stacked = stack_block_params(stack_params, n_layers, pp)
    k = n_layers // pp
    M = int(microbatches or pp)

    cfg = dict(bidirectional=bidirectional, chunk_size=chunk_size,
               dtype=dtype, intra_dtype=intra_dtype, out_compute=out_compute)

    def body(st, xloc, lenloc):
        # st: [1, k, ...] my stage's blocks; xloc [Bl, L, D]; lenloc [Bl]
        my = jax.tree_util.tree_map(lambda a: a[0], st)
        Bl, L, D = xloc.shape
        if Bl % M:
            raise ValueError(f"local batch {Bl} not divisible by "
                             f"microbatches={M}")
        bm = Bl // M
        x_mb = xloc.reshape(M, bm, L, D)
        len_mb = lenloc.reshape(M, bm)
        s = lax.axis_index(pp_axis)

        def stage_fn(h, lens):
            blk = partial(_block_full, **cfg)
            if remat:
                blk = jax.checkpoint(blk)
            for i in range(k):
                h = blk(jax.tree_util.tree_map(lambda a: a[i], my), h, lens)
            return h

        def tick(carry, t):
            recv, buf = carry
            # stage s works on microbatch t-s (schedule is deterministic, so
            # lengths are recomputed locally instead of shipped)
            mb = jnp.clip(t - s, 0, M - 1)
            lens = lax.dynamic_index_in_dim(len_mb, mb, 0, keepdims=False)
            inj = lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1), 0,
                                           keepdims=False)
            cur = jnp.where(s == 0, inj, recv)
            out = stage_fn(cur, lens)
            if pp > 1:
                send = lax.ppermute(out, pp_axis,
                                    [(j, j + 1) for j in range(pp - 1)])
            else:
                send = out
            done = jnp.clip(t - (pp - 1), 0, M - 1)
            upd = lax.dynamic_update_slice_in_dim(buf, out[None], done, 0)
            take = (s == pp - 1) & (t >= pp - 1)
            buf = jnp.where(take, upd, buf)
            return (send, buf), None

        buf0 = jnp.zeros((M, bm, L, D), xloc.dtype)
        (_, buf), _ = lax.scan(tick, (jnp.zeros((bm, L, D), xloc.dtype),
                                      buf0), jnp.arange(M + pp - 1))
        # replicate the last stage's finished buffer to every pp rank
        out = lax.psum(jnp.where(s == pp - 1, buf, 0.0), pp_axis)
        return out.reshape(Bl, L, D)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(pp_axis), P(dp_axis, None, None), P(dp_axis)),
        out_specs=P(dp_axis, None, None), check_vma=False)
    y = fn(stacked, x, lengths)
    return nn.LayerNorm(dtype=cfg["dtype"], param_dtype=jnp.float32).apply(
        {"params": stack_params["norm"]}, y)


# ── encoder / Trainer integration ────────────────────────────────────────────


def pp_encode(model, params: dict, feats: jax.Array, flens: jax.Array,
              mesh: Mesh, *, dp_axis: str = "dp", pp_axis: str = "pp",
              microbatches: int | None = None, remat: bool = True):
    """Type A encoder forward with the MAIN stack pipelined over 'pp'.

    Everything else (conv, enc/dec stacks, chunk/dechunk at any N) runs
    through the stock flax modules — a ``method=`` override re-plumbs only
    the main-stack call (mirrors models/encoder._forward_a).
    """
    enc = model.encoder
    if enc.arch_type != "A":
        raise ValueError("pipeline parallelism supports Type A configs (v1);"
                         " Type B has three compressed stacks to pipeline")
    pp_kw = dict(n_layers=enc.n_main, bidirectional=enc.bidirectional,
                 chunk_size=enc.chunk_size, dtype=enc.dtype,
                 intra_dtype=enc.ssd_intra_dtype,
                 out_compute=enc.ssd_out_compute_dtype, dp_axis=dp_axis,
                 pp_axis=pp_axis, microbatches=microbatches, remat=remat)
    main_params = params["encoder"]["main"]

    def method(self, feats, feat_lengths):
        x, lengths = self.subsample(feats, feat_lengths)
        mask = lengths_to_mask(lengths, x.shape[1])
        x_enc = self.enc(x, lengths)
        co = self.chunk.chunk(x_enc, mask)
        z = self.proj_in(co.z)
        z = pp_stack_apply(main_params, z, co.z_mask.sum(axis=1), mesh,
                           **pp_kw)
        z = self.proj_out(z)
        x_dech = self.chunk.dechunk(z, co)
        x_out = self.dec(x_enc + x_dech, lengths)
        return EncoderOutput(x_out, lengths, co.ratio_loss,
                             ((co.p, co.b),), (co.z,), (co.kept_fraction,))

    return model.encoder.apply({"params": params["encoder"]}, feats, flens,
                               method=method)


def pp_loss_fn(model, params: dict, batch: dict, step, train: bool,
               mesh: Mesh, *, dp_axis: str = "dp", pp_axis: str = "pp",
               microbatches: int | None = None, remat: bool = True):
    """DCASRModel.loss_fn with the main stack pipelined (same output
    structure as tasks/asr_task.py:161)."""
    from hnet_mamba_asr_tpu.models.aed import label_smoothing_loss
    from hnet_mamba_asr_tpu.ops.ctc_loss import ctc_infeasible, ctc_loss
    from hnet_mamba_asr_tpu.training.loss import combine_losses

    row_mask = batch["row_mask"]
    feats, flens = model.features(batch, train)
    enc = pp_encode(model, params, feats, flens, mesh, dp_axis=dp_axis,
                    pp_axis=pp_axis, microbatches=microbatches, remat=remat)
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


class PPModel:
    """Duck-typed Trainer adapter: ``train.pp: N`` pipelines the main stack
    (scripts/train.py builds the ('dp','pp') mesh and wraps the model)."""

    def __init__(self, model, mesh: Mesh, *, dp_axis: str = "dp",
                 pp_axis: str = "pp", microbatches: int | None = None,
                 remat: bool = True):
        if pp_axis not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no {pp_axis!r} axis")
        if model.encoder.arch_type != "A":
            raise ValueError("pipeline parallelism supports Type A (v1)")
        if model.encoder.n_main % mesh.shape[pp_axis]:
            raise ValueError(
                f"n_main={model.encoder.n_main} not divisible by "
                f"pp={mesh.shape[pp_axis]}")
        self.model, self.mesh = model, mesh
        self.dp_axis, self.pp_axis = dp_axis, pp_axis
        self.microbatches, self.remat = microbatches, remat

    def init_params(self, key):
        return self.model.init_params(key)

    def loss_fn(self, params, batch, step, train):
        return pp_loss_fn(self.model, params, batch, step, train, self.mesh,
                          dp_axis=self.dp_axis, pp_axis=self.pp_axis,
                          microbatches=self.microbatches, remat=self.remat)

    def greedy_decode(self, params, batch):
        return self.model.greedy_decode(params, batch)

    def __getattr__(self, name):
        return getattr(self.model, name)
