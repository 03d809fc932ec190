"""Hybrid training loss: w_ctc*CTC + w_aed*AED + w_rnnt*RNNT + w_ratio*ratio.

The recognition heads compute their own scalars and the encoder returns the
summed ratio loss; this module weights and adds them, returning the raw
components for metric logging, and fails loudly when a positive weight has no
matching component (reference: src/dcasr/training/loss.py:54-71). The go/no-go
run is CTC-only (w_ctc=1, w_aed=0, w_ratio=0 with N=1 so ratio == 0).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class HybridLossWeights:
    ctc_weight: float = 1.0
    aed_weight: float = 0.0
    ratio_weight: float = 0.0
    rnnt_weight: float = 0.0      # transducer head (beyond the reference)

    @classmethod
    def from_config(cls, model_conf) -> "HybridLossWeights":
        g = (model_conf or {}).get
        return cls(float(g("ctc_weight", 1.0)), float(g("aed_weight", 0.0)),
                   float(g("hnet_ratio_beta", g("ratio_weight", 0.0))),
                   float(g("rnnt_weight", 0.0)))


def combine_losses(weights: HybridLossWeights, *, ctc_loss=None, aed_loss=None,
                   ratio_loss=None, rnnt_loss=None) -> dict:
    """-> {"loss/total", "loss/ctc", "loss/aed", "loss/rnnt", "loss/ratio"}.

    Raises when a positive weight has no component (wiring bug, fail loudly).
    """
    provided = [t for t in (ctc_loss, aed_loss, ratio_loss, rnnt_loss)
                if t is not None]
    if not provided:
        raise ValueError("combine_losses got no loss components")
    for name, value, w in (("ctc", ctc_loss, weights.ctc_weight),
                           ("aed", aed_loss, weights.aed_weight),
                           ("ratio", ratio_loss, weights.ratio_weight),
                           ("rnnt", rnnt_loss, weights.rnnt_weight)):
        if w > 0.0 and value is None:
            raise ValueError(f"{name}_weight={w} but no {name}_loss was provided")
    zero = jnp.zeros((), jnp.float32)
    ctc = ctc_loss if ctc_loss is not None else zero
    aed = aed_loss if aed_loss is not None else zero
    ratio = ratio_loss if ratio_loss is not None else zero
    rnnt = rnnt_loss if rnnt_loss is not None else zero
    total = (weights.ctc_weight * ctc + weights.aed_weight * aed
             + weights.ratio_weight * ratio + weights.rnnt_weight * rnnt)
    return {"loss/total": total, "loss/ctc": ctc, "loss/aed": aed,
            "loss/rnnt": rnnt, "loss/ratio": ratio}
