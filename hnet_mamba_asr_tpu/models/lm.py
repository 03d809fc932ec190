"""Decoder-only causal Transformer LM for the +LM decode columns.

Trained separately on the LM corpus over the SAME BPE vocabulary as the ASR
decoder, so decode-time integration is adding log-probs over identical tokens
(behavioral spec: reference src/dcasr/decoders/lm_fusion.py:55-112). Pre-LN
self-attention blocks with GELU FFNs (no QK-norm here, matching the reference's
plain TransformerEncoder layers), sinusoidal PE, tied target contract with the
AED head: loss input is [bos, w..], target [w.., eos], label-smoothed CE with
optional next-token accuracy.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.aed import (
    causal_mask, label_smoothing_loss, sinusoidal_pe,
)


class LMBlock(nn.Module):
    """Pre-LN self-attention block: LN -> MHA -> +res; LN -> FFN -> +res.

    ``moe_experts > 0`` swaps the dense GELU FFN for a routed MoE FFN
    (models/moe.py) — the expert-parallel plane, beyond the reference."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True, token_mask=None):
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, param_dtype=jnp.float32,
            dropout_rate=self.dropout, name="self_attn")(
            h, h, mask=mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        if self.moe_experts > 0:
            from hnet_mamba_asr_tpu.models.moe import MoEFFN
            ff = MoEFFN(self.d_model, self.d_ff, self.moe_experts,
                        top_k=self.moe_top_k,
                        capacity_factor=self.moe_capacity_factor,
                        dtype=self.dtype, name="moe")(h, token_mask=token_mask)
        else:
            ff = nn.Dense(self.d_ff, dtype=self.dtype, param_dtype=jnp.float32,
                          name="linear1")(h)
            ff = nn.Dropout(self.dropout)(nn.gelu(ff),
                                          deterministic=deterministic)
            ff = nn.Dense(self.d_model, dtype=self.dtype,
                          param_dtype=jnp.float32, name="linear2")(ff)
        return x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)


class TransformerLM(nn.Module):
    """ids [B, T] -> next-token logits [B, T, V] (causal self-attention)."""

    vocab_size: int
    d_model: int = 512
    n_layers: int = 16
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    lsm_weight: float = 0.1
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 3
    max_pe_len: int = 5000
    dtype: Any = jnp.float32
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                              param_dtype=jnp.float32)
        self.pe = jnp.asarray(sinusoidal_pe(self.max_pe_len, self.d_model))
        self.blocks = [LMBlock(self.d_model, self.n_heads, self.d_ff, self.dropout,
                               dtype=self.dtype, name=f"block_{i}",
                               moe_experts=self.moe_experts,
                               moe_top_k=self.moe_top_k,
                               moe_capacity_factor=self.moe_capacity_factor)
                       for i in range(self.n_layers)]
        self.out = nn.Dense(self.vocab_size, dtype=self.dtype, param_dtype=jnp.float32)

    def __call__(self, ids: jax.Array, deterministic: bool = True,
                 token_mask: jax.Array | None = None) -> jax.Array:
        T = ids.shape[1]
        emb = self.embed(ids) * math.sqrt(self.d_model)
        emb = jnp.where((ids == self.pad_id)[..., None], 0.0, emb)
        x = (emb + self.pe[None, :T]).astype(self.dtype)
        # flax MHA wants a boolean mask [B, H, Q, K]; True = attend
        mask = (causal_mask(T) == 0.0)[None, None]
        for block in self.blocks:
            x = block(x, mask, deterministic=deterministic,
                      token_mask=token_mask)
        return self.out(x)

    def loss(self, tokens: jax.Array, token_lengths: jax.Array,
             return_acc: bool = False, deterministic: bool = True,
             row_mask: jax.Array | None = None):
        """Next-token label-smoothed CE over [w.., eos]; optional accuracy.

        ``row_mask`` [B] drops padded batch rows entirely (they would otherwise
        contribute their forced eos position)."""
        B, U = tokens.shape
        valid = jnp.arange(U)[None, :] < token_lengths[:, None]
        tokens = jnp.where(valid, tokens, self.pad_id)
        ys_in = jnp.full((B, U + 1), self.pad_id, dtype=tokens.dtype)
        ys_in = ys_in.at[:, 0].set(self.bos_id).at[:, 1:].set(tokens)
        ys_out = jnp.full((B, U + 1), self.pad_id, dtype=tokens.dtype)
        ys_out = ys_out.at[:, :U].set(tokens)
        ys_out = ys_out.at[jnp.arange(B), token_lengths].set(self.eos_id)
        tok_mask = jnp.arange(U + 1)[None, :] < (token_lengths + 1)[:, None]
        if row_mask is not None:
            tok_mask = tok_mask & row_mask[:, None]
        logits = self(ys_in, deterministic=deterministic,
                      token_mask=tok_mask if self.moe_experts > 0 else None)
        loss = label_smoothing_loss(logits, ys_out, token_lengths + 1,
                                    self.lsm_weight, row_mask=row_mask)
        if not return_acc:
            return loss
        mask = jnp.arange(U + 1)[None, :] < (token_lengths + 1)[:, None]
        if row_mask is not None:
            mask = mask & row_mask[:, None]
        acc = ((jnp.argmax(logits, -1) == ys_out) & mask).sum() / jnp.maximum(mask.sum(), 1)
        return loss, acc
