"""SpecAugment (frequency + time masking) as a jittable op with explicit keys.

Reproduces the reference policy (reference: src/dcasr/data/features.py:123-177):
- ``freq_masks`` masks of width ~ U{0..freq_width} over the mel axis
- ``time_masks`` masks whose width cap is either the fixed ``time_width`` (LD
  policy) or, when ``time_width_ratio`` is set, an adaptive per-utterance
  ``ratio * length`` frames; time masks never start inside padding
- masks fill with 0.0 (== the global mean after CMVN)

Randomness is an explicit ``jax.random`` key **per utterance** — the caller
derives it from (seed, epoch, dataset index), which makes augmentation a pure
deterministic function of those three integers and therefore resume-exact, the
same guarantee the reference gets from its seeded torch.Generator.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mask_any(size: int, widths: jax.Array, starts: jax.Array) -> jax.Array:
    """[n_masks] widths/starts -> [size] bool, True where any mask covers."""
    pos = jnp.arange(size)
    hit = (pos[None, :] >= starts[:, None]) & (pos[None, :] < (starts + widths)[:, None])
    return hit.any(axis=0)


def _augment_one(feats: jax.Array, length: jax.Array, key: jax.Array, *,
                 freq_masks: int, freq_width: int, time_masks: int,
                 time_width: int, time_width_ratio: float | None) -> jax.Array:
    """One utterance [T, F] -> masked [T, F]."""
    T, F = feats.shape
    k_fw, k_fs, k_tw, k_ts = jax.random.split(key, 4)
    if freq_masks > 0:
        fw = jax.random.randint(k_fw, (freq_masks,), 0, freq_width + 1)
        max_start = jnp.maximum(F - fw, 0)
        fs = (jax.random.uniform(k_fs, (freq_masks,)) * (max_start + 1)).astype(jnp.int32)
        feats = jnp.where(_mask_any(F, fw, fs)[None, :], 0.0, feats)
    if time_masks > 0:
        if time_width_ratio is not None:
            cap = (time_width_ratio * length).astype(jnp.int32)
            tw = (jax.random.uniform(k_tw, (time_masks,)) * (cap + 1)).astype(jnp.int32)
        else:
            tw = jax.random.randint(k_tw, (time_masks,), 0, time_width + 1)
            tw = jnp.minimum(tw, length)
        max_start = jnp.maximum(length - tw, 0)
        ts = (jax.random.uniform(k_ts, (time_masks,)) * (max_start + 1)).astype(jnp.int32)
        feats = jnp.where(_mask_any(T, tw, ts)[:, None], 0.0, feats)
    return feats


@partial(jax.jit, static_argnames=("freq_masks", "freq_width", "time_masks",
                                   "time_width", "time_width_ratio"))
def spec_augment(feats: jax.Array, lengths: jax.Array, keys: jax.Array, *,
                 freq_masks: int = 2, freq_width: int = 27, time_masks: int = 2,
                 time_width: int = 100, time_width_ratio: float | None = None):
    """Batched SpecAugment. feats [B,T,F], lengths [B], keys [B] (one per utt)."""
    fn = partial(_augment_one, freq_masks=freq_masks, freq_width=freq_width,
                 time_masks=time_masks, time_width=time_width,
                 time_width_ratio=time_width_ratio)
    return jax.vmap(fn)(feats, lengths, keys)


def augment_key(base_seed: int, epoch: int, index: int) -> jax.Array:
    """The (seed, epoch, index) -> key derivation that makes augmentation
    deterministic and resume-exact."""
    key = jax.random.PRNGKey(base_seed)
    key = jax.random.fold_in(key, epoch)
    return jax.random.fold_in(key, index)
