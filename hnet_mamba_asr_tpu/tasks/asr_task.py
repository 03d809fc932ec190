"""ASR task assembly: resolved config -> the wired, trainable DC-ASR model.

The single seam between YAML and Python (behavioral spec: reference
src/dcasr/tasks/asr_task.py). ``build_model(cfg, vocab_size)`` selects classes
by string name via registries and assembles ``DCASRModel`` = device frontend +
encoder + (CTC head iff ctc_weight > 0) + (AED head iff aed_weight > 0) +
hybrid loss.

TPU-first model contract (consumed by training/trainer.py): the model owns the
WHOLE jittable step body — batches carry raw padded waveforms and the loss
function runs log-mel -> CMVN -> SpecAugment -> encoder -> heads as one fused
XLA computation. Batch dict: {wave, wave_lens, tokens, token_lens, row_mask,
aug_ref = [seed, epoch], item_index}. Padded batch rows (static shapes) are
excluded from every loss/stat via row_mask.

Stats include per-stage kept fractions and the ``ctc_infeasible`` counter
(utterances whose encoder output is too short for their target — zero_infinity
silently zeroes them; counting keeps training health observable, reference:
asr_task.py:110-119).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from hnet_mamba_asr_tpu.data.features import GlobalCMVN
from hnet_mamba_asr_tpu.models.aed import (
    AEDHead, label_smoothing_loss, strip_hypothesis,
)
from hnet_mamba_asr_tpu.models.ctc_head import CTCHead, greedy_decode as ctc_host_greedy
from hnet_mamba_asr_tpu.models.encoder import DCASREncoder
from hnet_mamba_asr_tpu.ops.ctc_loss import ctc_infeasible, ctc_loss
from hnet_mamba_asr_tpu.ops.melspec import log_mel_spectrogram
from hnet_mamba_asr_tpu.ops.specaug import spec_augment
from hnet_mamba_asr_tpu.training.loss import HybridLossWeights, combine_losses
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)

_DTYPES = {"bf16": jnp.bfloat16, "fp32": jnp.float32, "fp16": jnp.float16}


def _build_dcasr_encoder(config, dtype) -> DCASREncoder:
    ec = config["encoder_conf"]
    h = ec.get("hnet", {}) or {}
    return DCASREncoder(
        n_mels=int(config.get("frontend_conf", {}).get("n_mels", 80)),
        d_outer=int(ec["d_outer"]), d_main=int(ec["d_main"]),
        n_enc=int(ec["n_enc"]), n_main=int(ec["n_main"]), n_dec=int(ec["n_dec"]),
        n_mid=int(ec.get("n_mid", 4)), arch_type=str(ec["arch_type"]),
        N=h.get("compression_N", 1),
        bidirectional=bool(ec.get("bidirectional", True)),
        hnet_ema=bool(h.get("ema_smoothing", True)),
        chunker=str(h.get("chunker", "dynamic")),
        d_state=int(ec.get("d_state", 128)), headdim=int(ec.get("headdim", 64)),
        chunk_size=int(ec.get("ssd_chunk_size", 256)),
        ssd_intra_dtype=ec.get("ssd_intra_dtype"),
        ssd_out_compute_dtype=bool(ec.get("ssd_out_compute_dtype", False)),
        remat_policy=str(ec.get("remat_policy", "full")), dtype=dtype)


ENCODER_BUILDERS = {"dcasr": _build_dcasr_encoder}


def build_encoder(config, dtype=jnp.float32) -> DCASREncoder:
    name = str(config.get("encoder", "dcasr")).lower()
    if name not in ENCODER_BUILDERS:
        raise ValueError(f"unknown encoder {name!r}; choices: {sorted(ENCODER_BUILDERS)}")
    return ENCODER_BUILDERS[name](config, dtype)


HEAD_BUILDERS = {
    "ctc": lambda config, vocab_size, dtype: CTCHead(
        d_model=int(config["encoder_conf"]["d_outer"]), vocab_size=int(vocab_size),
        dtype=dtype),
}


def build_head(config, vocab_size: int, dtype=jnp.float32) -> CTCHead:
    name = str(config.get("head", "ctc")).lower()
    if name not in HEAD_BUILDERS:
        raise ValueError(f"unknown head {name!r}; choices: {sorted(HEAD_BUILDERS)}")
    return HEAD_BUILDERS[name](config, vocab_size, dtype)


def build_aed_head(config, vocab_size: int, dtype=jnp.float32) -> AEDHead:
    ec = config["encoder_conf"]
    ac = config.get("aed_conf", {}) or {}
    mc = config.get("model_conf", {}) or {}
    return AEDHead(vocab_size=int(vocab_size), d_model=int(ec["d_outer"]),
                   n_layers=int(ac.get("n_layers", 6)),
                   n_heads=int(ac.get("n_heads", 4)),
                   d_ff=int(ac.get("d_ff", 2048)),
                   dropout=float(ac.get("dropout", 0.1)),
                   lsm_weight=float(mc.get("lsm_weight", 0.1)),
                   max_decode_len=int(ac.get("max_decode_len", 512)), dtype=dtype,
                   moe_experts=int((ac.get("moe", {}) or {}).get("n_experts", 0)),
                   moe_top_k=int((ac.get("moe", {}) or {}).get("top_k", 2)),
                   moe_capacity_factor=float(
                       (ac.get("moe", {}) or {}).get("capacity_factor", 1.25)))


def build_rnnt_head(config, vocab_size: int, dtype=jnp.float32):
    """Transducer head from rnnt_conf (beyond the reference — models/rnnt.py)."""
    from hnet_mamba_asr_tpu.models.rnnt import RNNTHead
    ec = config["encoder_conf"]
    rc = config.get("rnnt_conf", {}) or {}
    return RNNTHead(vocab_size=int(vocab_size), d_memory=int(ec["d_outer"]),
                    d_pred=int(rc.get("d_pred", 256)),
                    d_joint=int(rc.get("d_joint", 512)),
                    context=int(rc.get("context", 2)),
                    max_symbols=int(rc.get("max_symbols", 4)),
                    max_decode_len=int(rc.get("max_decode_len", 512)),
                    dtype=dtype)


class DCASRModel:
    """Frontend + encoder + CTC/AED/RNNT heads + hybrid loss, one jittable body."""

    def __init__(self, encoder: DCASREncoder, ctc_head: CTCHead | None,
                 aed_head: AEDHead | None, weights: HybridLossWeights, *,
                 rnnt_head=None,
                 n_mels: int = 80, win_length: int = 400, hop_length: int = 160,
                 sample_rate: int = 16000, cmvn: GlobalCMVN | None = None,
                 specaug_conf: dict | None = None, init_frames: int = 64,
                 moe_aux_weight: float = 0.01):
        if ctc_head is None and aed_head is None and rnnt_head is None:
            raise ValueError(
                "DCASRModel needs at least one of ctc/aed/rnnt heads")
        self.rnnt = rnnt_head
        self.moe_aux_weight = moe_aux_weight
        self.encoder = encoder
        self.ctc = ctc_head
        self.aed = aed_head
        self.weights = weights
        self.n_mels, self.win, self.hop = n_mels, win_length, hop_length
        self.sample_rate = sample_rate
        self.cmvn = cmvn
        self.specaug = dict(specaug_conf) if specaug_conf else None
        self.init_frames = init_frames

    # ---- params ---------------------------------------------------------------
    def init_params(self, key) -> dict:
        T = self.init_frames
        feats = jnp.zeros((1, T, self.n_mels), jnp.float32)
        lens = jnp.asarray([T])
        k_enc, k_ctc, k_aed = jax.random.split(key, 3)
        params = {"encoder": self.encoder.init(k_enc, feats, lens)["params"]}
        d_outer = self.encoder.d_outer
        l_out = max((T - 1) // 2 // 2, 4)
        mem = jnp.zeros((1, l_out, d_outer), jnp.float32)
        if self.ctc is not None:
            params["ctc"] = self.ctc.init(k_ctc, mem)["params"]
        if self.aed is not None:
            ys = jnp.zeros((1, 4), jnp.int32)
            params["aed"] = self.aed.init(k_aed, mem, jnp.asarray([l_out]),
                                          ys)["params"]
        if self.rnnt is not None:
            k_rnnt = jax.random.fold_in(key, 3)
            params["rnnt"] = self.rnnt.init(
                k_rnnt, mem, jnp.asarray([l_out]), jnp.zeros((1, 4), jnp.int32),
                jnp.asarray([4]), method="loss")["params"]
        return params

    # ---- frontend --------------------------------------------------------------
    def features(self, batch: dict, train: bool):
        feats, flens = log_mel_spectrogram(
            batch["wave"], batch["wave_lens"], win_length=self.win,
            hop_length=self.hop, n_mels=self.n_mels, sample_rate=self.sample_rate)
        if self.cmvn is not None:
            feats = (feats - jnp.asarray(self.cmvn.mean)) * jnp.asarray(self.cmvn.istd)
        if train and self.specaug is not None:
            seed_ref = batch["aug_ref"]                  # [seed, epoch]
            # same derivation as ops.specaug.augment_key(seed, epoch, index)
            base = jax.random.fold_in(jax.random.PRNGKey(seed_ref[0]), seed_ref[1])
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(batch["item_index"])
            feats = spec_augment(feats, flens, keys, **self.specaug)
        return feats, flens

    # ---- encoder ----------------------------------------------------------------
    def encode(self, params: dict, batch: dict, train: bool = False):
        feats, flens = self.features(batch, train)
        return self.encoder.apply({"params": params["encoder"]}, feats, flens)

    # ---- loss ---------------------------------------------------------------------
    def loss_fn(self, params: dict, batch: dict, step, train: bool):
        row_mask = batch["row_mask"]
        enc = self.encode(params, batch, train)
        n_real = jnp.maximum(row_mask.sum().astype(jnp.float32), 1.0)
        ctc = aed = None
        stats: dict[str, Any] = {}
        if self.ctc is not None:
            logp = self.ctc.apply({"params": params["ctc"]}, enc.features,
                                  method="log_probs")
            rows = ctc_loss(logp, enc.lengths, batch["tokens"], batch["token_lens"],
                            blank_id=self.ctc.blank_id, reduction="none")
            rows = rows / jnp.maximum(batch["token_lens"], 1)      # torch 'mean'
            ctc = (rows * row_mask).sum() / n_real
            infeasible = ctc_infeasible(enc.lengths, batch["tokens"],
                                        batch["token_lens"])
            stats["ctc_infeasible"] = (infeasible & row_mask).sum()
        if self.aed is not None:
            ys_in, ys_out, out_lens = self.aed.add_sos_eos(batch["tokens"],
                                                           batch["token_lens"])
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(17), step)} \
                if train else None
            moe = self.aed.moe_experts > 0
            tok_mask = ((jnp.arange(ys_in.shape[1])[None, :]
                         <= batch["token_lens"][:, None])
                        & row_mask[:, None]) if moe else None
            out_ = self.aed.apply({"params": params["aed"]}, enc.features,
                                  enc.lengths, ys_in,
                                  deterministic=not train, rngs=rngs,
                                  token_mask=tok_mask,
                                  mutable=["moe"] if moe else False)
            logits, moe_vars = out_ if moe else (out_, {})
            aed = label_smoothing_loss(logits, ys_out, out_lens,
                                       self.aed.lsm_weight, row_mask=row_mask)
            if moe:
                from hnet_mamba_asr_tpu.models.moe import moe_aux_from_vars
                aux, moe_stats = moe_aux_from_vars(moe_vars,
                                                   self.moe_aux_weight)
                aed = aed + aux
                stats.update(moe_stats)
        rnnt = None
        if self.rnnt is not None:
            rows = self.rnnt.apply({"params": params["rnnt"]}, enc.features,
                                   enc.lengths, batch["tokens"],
                                   batch["token_lens"], method="loss")
            rows = rows / jnp.maximum(batch["token_lens"] + 1, 1)  # per-symbol
            rnnt = (rows * row_mask).sum() / n_real
        out = combine_losses(self.weights, ctc_loss=ctc, aed_loss=aed,
                             ratio_loss=enc.ratio_loss, rnnt_loss=rnnt)
        stats.update({k: jax.lax.stop_gradient(v) for k, v in out.items()})
        for i, kf in enumerate(enc.kept_fractions):
            stats["kept_fraction" if i == 0 else f"kept_fraction_{i}"] = \
                jax.lax.stop_gradient(kf)
        stats["batch_weight"] = row_mask.sum()
        return out["loss/total"], stats

    # ---- validation decode -----------------------------------------------------------
    def greedy_decode(self, params: dict, batch: dict) -> list[list[int]]:
        """CTC greedy when a CTC head exists (fast, non-autoregressive), else
        AED greedy. Host-side list output for the real rows."""
        enc = self.encode(params, batch, train=False)
        if self.ctc is not None:
            ids = self.ctc.apply({"params": params["ctc"]}, enc.features,
                                 method="frame_argmax")
            return ctc_host_greedy(ids, enc.lengths, self.ctc.blank_id)
        if self.rnnt is not None:
            from hnet_mamba_asr_tpu.models.rnnt import rnnt_host_greedy
            toks, lens = self.rnnt.apply(
                {"params": params["rnnt"]}, enc.features, enc.lengths,
                method="greedy_decode")
            return rnnt_host_greedy(toks, lens)
        ids = self.aed.apply({"params": params["aed"]}, enc.features, enc.lengths,
                             method="greedy_decode")
        return [strip_hypothesis(row, self.aed.eos_id) for row in np.asarray(ids)]


def build_model(config, vocab_size: int, cmvn: GlobalCMVN | None = None) -> DCASRModel:
    """Assemble the full model from config: heads exist iff their weight > 0."""
    mc = config.get("model_conf", {}) or {}
    weights = HybridLossWeights.from_config(mc)
    if weights.ctc_weight <= 0.0 and weights.aed_weight <= 0.0 \
            and weights.rnnt_weight <= 0.0:
        raise ValueError(
            "model_conf needs ctc_weight, aed_weight or rnnt_weight > 0")
    dtype = _DTYPES[str((config.get("train", {}) or {}).get("precision", "fp32"))] \
        if isinstance(config.get("train"), dict) else jnp.float32
    fc = config.get("frontend_conf", {}) or {}
    sc = config.get("specaug_conf")
    specaug = specaug_kwargs(sc) if sc else None
    ctc_head = build_head(config, vocab_size, dtype) if weights.ctc_weight > 0 else None
    aed_head = build_aed_head(config, vocab_size, dtype) if weights.aed_weight > 0 else None
    rnnt_head = build_rnnt_head(config, vocab_size, dtype) \
        if weights.rnnt_weight > 0 else None
    model = DCASRModel(build_encoder(config, dtype), ctc_head, aed_head, weights,
                       rnnt_head=rnnt_head,
                       n_mels=int(fc.get("n_mels", 80)),
                       win_length=int(fc.get("win_length", 400)),
                       hop_length=int(fc.get("hop_length", 160)),
                       sample_rate=int(fc.get("sample_rate", 16000)),
                       cmvn=cmvn, specaug_conf=specaug,
                       moe_aux_weight=float(
                           ((config.get("aed_conf", {}) or {}).get("moe", {})
                            or {}).get("aux_weight", 0.01)))
    logger.info("build_model: encoder=%s ctc=%s aed=%s vocab=%d",
                config.get("encoder", "dcasr"), ctc_head is not None,
                aed_head is not None, vocab_size)
    return model


def specaug_kwargs(sc: dict) -> dict:
    """specaug_conf block -> ops.spec_augment kwargs (reference:
    src/dcasr/tasks/build.py:78-93)."""
    out = {"freq_masks": int(sc.get("num_freq_mask", 2)),
           "freq_width": int((sc.get("freq_mask_width_range") or [0, 27])[1]),
           "time_masks": int(sc.get("num_time_mask", 2))}
    ratio = sc.get("time_mask_width_ratio_range")
    if ratio is not None:
        out["time_width_ratio"] = float(ratio[1])
        out["time_width"] = 0
    else:
        out["time_width"] = int((sc.get("time_mask_width_range") or [0, 100])[1])
        out["time_width_ratio"] = None
    return out
