"""CTC head: linear projection to V+1 classes (blank appended at id V).

Reads the encoder's fine-rate output [B, L, d_model] and scores each frame over
the tokenizer's V pieces plus the CTC blank at id V (the tokenizer contract);
targets are bare ids in [0, V). Loss goes through the jittable log-space CTC
op (ops/ctc_loss.py). Greedy decode = per-frame argmax -> collapse repeats ->
drop blank; ``frame_argmax`` exposes the raw CTC spikes for interpretability.
(Behavioral spec: reference src/dcasr/decoders/ctc.py:88-131.)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.ops.ctc_loss import ctc_loss


class CTCHead(nn.Module):
    """d_model -> vocab_size + 1 linear CTC head."""

    d_model: int
    vocab_size: int
    dtype: Any = jnp.float32

    @property
    def blank_id(self) -> int:
        return self.vocab_size

    @property
    def num_classes(self) -> int:
        return self.vocab_size + 1

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        """[B, L, d_model] -> logits [B, L, V+1]."""
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(features)

    def log_probs(self, features: jax.Array) -> jax.Array:
        """fp32 log-softmax over classes (stable CTC input)."""
        return jax.nn.log_softmax(self(features).astype(jnp.float32), axis=-1)

    def loss(self, features: jax.Array, feat_lengths: jax.Array,
             targets: jax.Array, target_lengths: jax.Array,
             reduction: str = "mean") -> jax.Array:
        return ctc_loss(self.log_probs(features), feat_lengths, targets,
                        target_lengths, blank_id=self.blank_id, reduction=reduction)

    def frame_argmax(self, features: jax.Array) -> jax.Array:
        """Per-frame top class incl. blank [B, L] — the raw CTC spikes."""
        return jnp.argmax(self(features), axis=-1)


def ctc_greedy_collapse(frame_ids, blank_id: int) -> list[int]:
    """Collapse consecutive duplicates then drop blanks (host-side).

    A blank between identical labels keeps them distinct (a _ a -> a a).
    """
    out: list[int] = []
    prev = None
    for s in frame_ids:
        s = int(s)
        if s != prev:
            if s != blank_id:
                out.append(s)
            prev = s
    return out


def greedy_decode(frame_ids, feat_lengths, blank_id: int) -> list[list[int]]:
    """Device argmax output [B, L] + lengths -> bare-id lists per utterance."""
    import numpy as np
    ids = np.asarray(frame_ids)
    lens = np.asarray(feat_lengths)
    return [ctc_greedy_collapse(ids[i, :int(lens[i])], blank_id)
            for i in range(ids.shape[0])]
