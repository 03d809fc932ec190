"""AED head: autoregressive Transformer decoder with QK-RMSNorm attention.

The attention read-out head complementing CTC (behavioral spec: reference
src/dcasr/decoders/aed.py). Pre-LN decoder layers (self-attn -> cross-attn ->
GELU FFN) where every attention RMS-normalizes Q and K per head before the
scaled dot product — the reference measured an attention-entropy-collapse
divergence with plain attention (cross-attn key bias grew 14x -> softmax
saturation) and QK-norm removes it by bounding the logit range.

Target contract: bare token ids in [0, V); the head wraps them internally as
decoder input [bos, y..] / target [y.., eos] (tokenizer contract bos=1/eos=2/
pad=3). Right-side padding + causal mask means no key-padding mask is needed
on the decoder side (avoids fully-masked-row NaNs). Loss is label-smoothed CE
in fp32 with length masking. Greedy decode runs a fixed-size lax.scan (static
shapes; bos/pad non-emittable; finished rows emit eos).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    assert d_model % 2 == 0, "d_model must be even for sinusoidal PE"
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def causal_mask(size: int) -> jax.Array:
    """[size, size] additive mask: NEG_INF above the diagonal."""
    return jnp.where(jnp.tril(jnp.ones((size, size), bool)), 0.0, NEG_INF)


def pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B, max_len] bool, True at PADDED positions."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


class MHAQKNorm(nn.Module):
    """Multi-head attention with per-head RMSNorm on Q and K (Henry et al.
    2020; ViT-22B). Normalizing q, k bounds pre-softmax logits independent of
    their magnitude."""

    d_model: int
    n_heads: int
    dropout: float = 0.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    def setup(self):
        dense = lambda: nn.Dense(self.d_model, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.q_proj, self.k_proj = dense(), dense()
        self.v_proj, self.out_proj = dense(), dense()
        dh = self.d_model // self.n_heads
        self.q_g = self.param("q_g", nn.initializers.ones, (dh,), jnp.float32)
        self.k_g = self.param("k_g", nn.initializers.ones, (dh,), jnp.float32)
        self.attn_drop = nn.Dropout(self.dropout)

    def _rms(self, x, g):
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf ** 2, axis=-1, keepdims=True) + self.eps)
        return (n * g).astype(self.dtype)

    def project_q(self, query):
        B, Tq, _ = query.shape
        q = self.q_proj(query).reshape(B, Tq, self.n_heads, -1)
        return self._rms(q, self.q_g)

    def project_kv(self, key, value):
        B, Tk, _ = key.shape
        k = self.k_proj(key).reshape(B, Tk, self.n_heads, -1)
        v = self.v_proj(value).reshape(B, Tk, self.n_heads, -1)
        return self._rms(k, self.k_g), v

    def attend(self, q, k, v, attn_mask=None, key_padding_mask=None,
               deterministic: bool = True):
        """q [B,Tq,H,dh] (RMS'd), k/v [B,Tk,H,dh] (k RMS'd) -> [B,Tq,d]."""
        B, Tq = q.shape[0], q.shape[1]
        dh = q.shape[-1]
        logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                  / math.sqrt(dh))
        if key_padding_mask is not None:                 # [B, Tk] True = pad
            logits = logits + jnp.where(key_padding_mask, NEG_INF,
                                        0.0)[:, None, None, :]
        if attn_mask is not None:                        # [Tq, Tk] additive
            logits = logits + attn_mask[None, None]
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.dropout > 0.0:
            w = self.attn_drop(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Tq, self.d_model)
        return self.out_proj(out)

    def __call__(self, query, key, value, attn_mask=None, key_padding_mask=None,
                 deterministic: bool = True):
        q = self.project_q(query)
        k, v = self.project_kv(key, value)
        return self.attend(q, k, v, attn_mask=attn_mask,
                           key_padding_mask=key_padding_mask,
                           deterministic=deterministic)


class DecoderLayerQKNorm(nn.Module):
    """Pre-LN decoder layer: self-attn -> cross-attn -> GELU FFN."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32
    moe_experts: int = 0            # > 0: routed MoE FFN (models/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.self_attn = MHAQKNorm(self.d_model, self.n_heads, self.dropout,
                                   dtype=self.dtype)
        self.cross_attn = MHAQKNorm(self.d_model, self.n_heads, self.dropout,
                                    dtype=self.dtype)
        self.norm1 = nn.LayerNorm(**kw)
        self.norm2 = nn.LayerNorm(**kw)
        self.norm3 = nn.LayerNorm(**kw)
        if self.moe_experts > 0:
            from hnet_mamba_asr_tpu.models.moe import MoEFFN
            self.moe = MoEFFN(self.d_model, self.d_ff, self.moe_experts,
                              top_k=self.moe_top_k,
                              capacity_factor=self.moe_capacity_factor,
                              dtype=self.dtype)
        else:
            self.linear1 = nn.Dense(self.d_ff, **kw)
            self.linear2 = nn.Dense(self.d_model, **kw)
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x, deterministic, token_mask=None):
        h = self.norm3(x)
        if self.moe_experts > 0:
            return x + self.drop(self.moe(h, token_mask=token_mask),
                                 deterministic=deterministic)
        ff = self.drop(nn.gelu(self.linear1(h)), deterministic=deterministic)
        return x + self.drop(self.linear2(ff), deterministic=deterministic)

    def __call__(self, x, memory, tgt_mask, memory_key_padding_mask,
                 deterministic: bool = True, token_mask=None):
        h = self.norm1(x)
        x = x + self.drop(self.self_attn(h, h, h, attn_mask=tgt_mask,
                                         deterministic=deterministic),
                          deterministic=deterministic)
        h = self.norm2(x)
        x = x + self.drop(self.cross_attn(h, memory, memory,
                                          key_padding_mask=memory_key_padding_mask,
                                          deterministic=deterministic),
                          deterministic=deterministic)
        return self._ffn(x, deterministic, token_mask=token_mask)

    # ---- KV-cached incremental decode (beyond the reference, which re-runs
    # the full decoder per emitted token: reference joint.py:136-141) --------
    def init_cache(self, memory, cap: int):
        """Per-layer cache: self-attn K/V rings [B, cap, H, dh] + the
        memory K/V projected ONCE per utterance."""
        B = memory.shape[0]
        H = self.n_heads
        dh = self.d_model // H
        mem_k, mem_v = self.cross_attn.project_kv(memory, memory)
        return {"self_k": jnp.zeros((B, cap, H, dh), self.dtype),
                "self_v": jnp.zeros((B, cap, H, dh), self.dtype),
                "mem_k": mem_k, "mem_v": mem_v}

    def step(self, x_t, cache, pos, memory_key_padding_mask):
        """One position: x_t [B, 1, d], pos scalar -> (y_t [B, 1, d], cache)."""
        h = self.norm1(x_t)
        k_new, v_new = self.self_attn.project_kv(h, h)
        cache = dict(cache,
                     self_k=jax.lax.dynamic_update_slice_in_dim(
                         cache["self_k"], k_new, pos, axis=1),
                     self_v=jax.lax.dynamic_update_slice_in_dim(
                         cache["self_v"], v_new, pos, axis=1))
        cap = cache["self_k"].shape[1]
        kpm_self = jnp.arange(cap)[None, :] > pos        # future slots masked
        q = self.self_attn.project_q(h)
        x_t = x_t + self.self_attn.attend(q, cache["self_k"], cache["self_v"],
                                          key_padding_mask=kpm_self)
        h = self.norm2(x_t)
        q = self.cross_attn.project_q(h)
        x_t = x_t + self.cross_attn.attend(q, cache["mem_k"], cache["mem_v"],
                                           key_padding_mask=memory_key_padding_mask)
        return self._ffn(x_t, True), cache


class AEDHead(nn.Module):
    """Transformer-decoder head over the tokenizer's V-token vocabulary."""

    vocab_size: int
    d_model: int
    n_layers: int = 6
    n_heads: int = 4
    d_ff: int = 2048
    dropout: float = 0.1
    lsm_weight: float = 0.1
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 3
    d_memory: int | None = None
    max_decode_len: int = 512     # > longest LibriSpeech ref (230 tokens @ bpe-500)
    max_pe_len: int = 5000
    dtype: Any = jnp.float32
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              dtype=self.dtype, param_dtype=jnp.float32)
        self.pe = jnp.asarray(sinusoidal_pe(self.max_pe_len, self.d_model))
        self.layers = [DecoderLayerQKNorm(self.d_model, self.n_heads, self.d_ff,
                                          self.dropout, dtype=self.dtype,
                                          name=f"layer_{i}",
                                          moe_experts=self.moe_experts,
                                          moe_top_k=self.moe_top_k,
                                          moe_capacity_factor=self.moe_capacity_factor)
                       for i in range(self.n_layers)]
        self.final_norm = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)
        self.out = nn.Dense(self.vocab_size, dtype=self.dtype,
                            param_dtype=jnp.float32)
        if self.d_memory is not None and self.d_memory != self.d_model:
            self.mem_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                     param_dtype=jnp.float32)
        else:
            self.mem_proj = None

    # ---- target prep ---------------------------------------------------------
    def add_sos_eos(self, ys: jax.Array, ys_lens: jax.Array):
        """bare [B, U] -> (ys_in = [bos, y..], ys_out = [y.., eos], lens + 1)."""
        B, U = ys.shape
        valid = jnp.arange(U)[None, :] < ys_lens[:, None]
        ys_clean = jnp.where(valid, ys, self.pad_id)     # robust to non-pad tails
        ys_in = jnp.full((B, U + 1), self.pad_id, dtype=ys.dtype)
        ys_in = ys_in.at[:, 0].set(self.bos_id).at[:, 1:].set(ys_clean)
        ys_out = jnp.full((B, U + 1), self.pad_id, dtype=ys.dtype)
        ys_out = ys_out.at[:, :U].set(ys_clean)
        ys_out = ys_out.at[jnp.arange(B), ys_lens].set(self.eos_id)
        return ys_in, ys_out, ys_lens + 1

    # ---- forward ---------------------------------------------------------------
    def __call__(self, memory: jax.Array, memory_lengths: jax.Array,
                 ys_in: jax.Array, deterministic: bool = True,
                 token_mask: jax.Array | None = None) -> jax.Array:
        """memory [B, S, d_mem], ys_in [B, T] -> logits [B, T, V]."""
        mem = self.mem_proj(memory) if self.mem_proj is not None \
            else memory.astype(self.dtype)
        emb = self.embed(ys_in) * math.sqrt(self.d_model)
        emb = jnp.where((ys_in == self.pad_id)[..., None], 0.0, emb)   # pad row zero
        x = (emb + self.pe[None, :ys_in.shape[1]]).astype(self.dtype)
        tmask = causal_mask(ys_in.shape[1])
        kpm = pad_mask(memory_lengths, mem.shape[1])
        if token_mask is None and self.moe_experts > 0:
            token_mask = ys_in != self.pad_id       # routing skips pad slots
        for layer in self.layers:
            x = layer(x, mem, tmask, kpm, deterministic=deterministic,
                      token_mask=token_mask)
        return self.out(self.final_norm(x))

    # ---- loss -------------------------------------------------------------------
    def loss(self, memory: jax.Array, memory_lengths: jax.Array,
             targets: jax.Array, target_lengths: jax.Array,
             deterministic: bool = True) -> jax.Array:
        """Label-smoothed per-token-mean CE over [y.., eos] (fp32)."""
        ys_in, ys_out, out_lens = self.add_sos_eos(targets, target_lengths)
        logits = self(memory, memory_lengths, ys_in, deterministic=deterministic)
        return label_smoothing_loss(logits, ys_out, out_lens, self.lsm_weight)

    # ---- greedy decode -----------------------------------------------------------
    # ---- beam-facing incremental decode API ---------------------------------
    def decode_start(self, memory: jax.Array, memory_lengths: jax.Array,
                     cap: int):
        """Prepare per-layer caches + the memory padding mask for decode_step."""
        mem = self.mem_proj(memory) if self.mem_proj is not None \
            else memory.astype(self.dtype)
        kpm = pad_mask(memory_lengths, mem.shape[1])
        caches = tuple(layer.init_cache(mem, cap) for layer in self.layers)
        return caches, kpm

    def decode_step(self, caches, kpm, parents: jax.Array, tokens: jax.Array,
                    pos):
        """One label-synchronous step for R rows: gather each row's self-attn
        cache from its parent row, append the token at ``pos``, return
        next-token log-probs [R, V] + updated caches."""
        new_caches = []
        gathered = []
        for cache in caches:
            gathered.append(dict(cache,
                                 self_k=cache["self_k"][parents],
                                 self_v=cache["self_v"][parents]))
        emb = self.embed(tokens[:, None]) * math.sqrt(self.d_model)
        x = (emb + jax.lax.dynamic_slice_in_dim(self.pe, pos, 1, axis=0)[None]
             ).astype(self.dtype)
        for layer, cache in zip(self.layers, gathered):
            x, cache = layer.step(x, cache, pos, kpm)
            new_caches.append(cache)
        logits = self.out(self.final_norm(x))[:, 0].astype(jnp.float32)
        logits = logits.at[:, self.bos_id].set(NEG_INF)
        logits = logits.at[:, self.pad_id].set(NEG_INF)
        return jax.nn.log_softmax(logits, axis=-1), tuple(new_caches)

    def greedy_decode(self, memory: jax.Array, memory_lengths: jax.Array,
                      max_len: int | None = None) -> jax.Array:
        """Batched KV-cached greedy decode (O(cap) per step, not O(cap^2)).

        Returns ids [B, cap]; each row is the emitted sequence, eos-filled
        after termination (host strips at first eos). The reference re-runs
        its full decoder per step with no cache (reference aed.py:227-256);
        the per-layer K/V rings make each step one incremental attention.
        """
        cap = self.max_decode_len if max_len is None else int(max_len)
        B = memory.shape[0]
        mem = self.mem_proj(memory) if self.mem_proj is not None \
            else memory.astype(self.dtype)
        kpm = pad_mask(memory_lengths, mem.shape[1])
        emb_scale = math.sqrt(self.d_model)
        caches = [layer.init_cache(mem, cap + 1) for layer in self.layers]

        def body(carry, t):
            tok, finished, caches = carry               # [B], [B], per-layer
            emb = self.embed(tok[:, None]) * emb_scale
            emb = jnp.where((tok[:, None] == self.pad_id)[..., None], 0.0, emb)
            x = (emb + jax.lax.dynamic_slice_in_dim(self.pe, t, 1, axis=0)[None]
                 ).astype(self.dtype)
            new_caches = []
            for layer, cache in zip(self.layers, caches):
                x, cache = layer.step(x, cache, t, kpm)
                new_caches.append(cache)
            step_logits = self.out(self.final_norm(x))[:, 0].astype(jnp.float32)
            step_logits = step_logits.at[:, self.bos_id].set(NEG_INF)
            step_logits = step_logits.at[:, self.pad_id].set(NEG_INF)
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, self.eos_id, nxt)
            finished = finished | (nxt == self.eos_id)
            return (nxt, finished, new_caches), nxt

        tok0 = jnp.full((B,), self.bos_id, jnp.int32)
        _, ys = jax.lax.scan(body, (tok0, jnp.zeros((B,), bool), caches),
                             jnp.arange(cap))
        return ys.T                                     # [B, cap]


def label_smoothing_loss(logits: jax.Array, target: jax.Array,
                         target_lengths: jax.Array, lsm_weight: float,
                         row_mask: jax.Array | None = None) -> jax.Array:
    """Label-smoothed CE over [B, T, V] vs [B, T]; positions >= length ignored.

    ``row_mask`` [B] additionally drops entire padded batch rows (static-shape
    batching pads B; those rows must contribute neither loss nor count).
    """
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    on = 1.0 - lsm_weight
    off = lsm_weight / (V - 1)
    tgt_logp = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
    nll = -(off * logp.sum(-1) + (on - off) * tgt_logp)
    mask = ~pad_mask(target_lengths, target.shape[1])
    if row_mask is not None:
        mask = mask & row_mask[:, None]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)


def strip_hypothesis(ids, eos_id: int) -> list[int]:
    """Host-side: cut a decoded row at its first eos."""
    out = []
    for i in ids:
        i = int(i)
        if i == eos_id:
            break
        out.append(i)
    return out
