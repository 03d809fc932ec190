"""Streaming (chunked, bounded-latency) encoder inference — beyond parity.

The reference has NO streaming mode (offline decode only); this module adds
one without touching the trained model: overlapping-window inference. Encoder
frames for an emission segment are computed by running the offline encoder
over [segment_start - left_ctx, segment_end + lookahead) mel frames and
keeping only the segment. Alignment is exact by construction — window starts
are multiples of 4 mel frames, so the x4 VALID conv grid of window frames
coincides with the offline grid (enc frame m covers mel frames [4m, 4m+6]) —
and the only approximation is context truncation:

  - forward SSM scans lose history before ``left_ctx``: error decays as
    exp(sum dt*|A|) over the truncated span (the SSD recurrence's decay);
  - backward scans (bidirectional blocks) lose the future past ``lookahead``:
    same decay, mirrored. At end-of-audio the truncation is exact.

Both errors vanish as the contexts grow (tested: tests/test_streaming.py
drives the real encoder and checks convergence to the offline outputs and
exactness when the window covers the whole utterance). Latency is
``(seg_frames + lookahead) * 10 ms`` plus compute; every window reuses ONE
compiled executable (fixed padded window, valid lengths masked).

ops/ssd.py additionally supports carried recurrence states
(``initial_state``/``return_final``) — the groundwork for exact-causal
streaming of unidirectional configs without any window recompute.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def subsampled_count(n_mel: int) -> int:
    """Mel frames -> encoder frames under the x4 VALID conv stack."""
    return ((n_mel - 1) // 2 - 1) // 2


class StreamingEncoder:
    """Feed waveform samples incrementally; receive encoder-frame segments.

    All frame quantities are MEL frames (10 ms hop) and must be multiples of
    4 (the subsampling factor): ``seg_frames`` per emission, ``left_ctx``
    history, ``lookahead`` future. Usage::

        se = StreamingEncoder(model, params)
        for block in audio_blocks:
            for feats in se.accept(block):   # [E_seg, d] encoder frames
                ...
        tail = se.finish()                   # remaining frames (exact at EOF)
    """

    def __init__(self, model, params, *, seg_frames: int = 96,
                 left_ctx: int = 512, lookahead: int = 32):
        for name, v in (("seg_frames", seg_frames), ("left_ctx", left_ctx),
                        ("lookahead", lookahead)):
            if v % 4 != 0 or v < 4:
                raise ValueError(f"{name} must be a positive multiple of 4, "
                                 f"got {v}")
        self.model = model
        self.params = params
        self.seg = int(seg_frames)
        self.left_ctx = int(left_ctx)
        self.lookahead = int(lookahead)
        self.hop, self.win = int(model.hop), int(model.win)
        self.max_mel = self.left_ctx + self.seg + self.lookahead
        self.max_samples = (self.max_mel - 1) * self.hop + self.win

        def encode_window(wave, wave_lens):
            batch = {"wave": wave, "wave_lens": wave_lens}
            enc = model.encode(params, batch, train=False)
            return enc.features, enc.lengths

        self._encode = jax.jit(encode_window)
        self.reset()

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)      # samples from _buf_start on
        self._buf_start = 0                      # absolute sample offset
        self._e0 = 0                             # next emission start (mel)
        self._total = 0                          # absolute samples received

    # ── internals ──────────────────────────────────────────────────────────
    def _mel_ready(self) -> int:
        """Highest mel-frame count computable from the received samples."""
        return max(0, (self._total - self.win) // self.hop + 1)

    def _run_window(self, w0: int, w1: int) -> np.ndarray:
        """Encode mel window [w0, w1) -> encoder frames of that window."""
        s0 = w0 * self.hop
        s1 = (w1 - 1) * self.hop + self.win
        seg = self._buf[s0 - self._buf_start:s1 - self._buf_start]
        wave = np.zeros((1, self.max_samples), np.float32)
        wave[0, :len(seg)] = seg
        feats, lens = self._encode(jnp.asarray(wave),
                                   jnp.asarray([len(seg)], jnp.int32))
        n_enc = subsampled_count(w1 - w0)
        return np.asarray(feats)[0, :n_enc]

    def _emit(self, end_mel: int) -> np.ndarray:
        """Emit encoder frames for mel span [self._e0, end_mel); the window
        extends ``lookahead`` frames further (accept() guarantees they exist)."""
        w0 = max(0, self._e0 - self.left_ctx)
        out = self._run_window(w0, end_mel + self.lookahead)
        lo = self._e0 // 4 - w0 // 4
        hi = end_mel // 4 - w0 // 4
        self._e0 = end_mel
        # drop samples no longer needed by any future window
        keep_from = max(0, (self._e0 - self.left_ctx)) * self.hop
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        return out[lo:hi]

    # ── public API ─────────────────────────────────────────────────────────
    def accept(self, samples) -> list[np.ndarray]:
        """Add samples; return zero or more [E_seg, d] encoder segments."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._total += len(samples)
        out = []
        while self._mel_ready() >= self._e0 + self.seg + self.lookahead:
            out.append(self._emit(self._e0 + self.seg))
        return out

    def finish(self) -> np.ndarray | None:
        """Flush: encode the remaining mel frames (exact — no future exists)."""
        n_mel = self._mel_ready()
        total_enc = subsampled_count(n_mel)
        if total_enc <= self._e0 // 4:
            return None
        # emit everything left; window ends at the true audio end
        end_mel = n_mel
        w0 = max(0, self._e0 - self.left_ctx)
        out = self._run_window(w0, end_mel)
        lo = self._e0 // 4 - w0 // 4
        self._e0 = end_mel
        return out[lo:total_enc - w0 // 4]


# ═══ exact-causal streaming (carried per-layer states) ════════════════════════
def _layer_norm(x, p, eps: float = 1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mamba2_stream(p, x, state, *, headdim: int, d_state: int,
                   chunk_size: int, n_real=None):
    """One Mamba2 layer over a chunk with carried state — numerics mirror
    models/mamba2.Mamba2.__call__ exactly (fp32). ``state`` = {"conv":
    [B, d_conv-1, conv_dim] xBC tail, "ssd": [B, H, N, P] recurrence state}.

    ``n_real`` (traced scalar or per-row [B] vector) marks the first
    ``n_real`` rows as real and the rest as padding — the compacted-buffer
    streaming mode for chunked stacks. Padding rows are exact no-ops on the
    carried state: dt is zeroed (SSD decay 1, no update) and the conv tail
    is gathered at the per-row dynamic offset ``n_real`` so it holds the
    last d_conv-1 REAL rows. Their outputs are garbage and must be
    discarded by the caller."""
    from hnet_mamba_asr_tpu.ops.ssd import ssd_chunked

    B, L, d_model = x.shape
    if n_real is not None:
        n_real = jnp.asarray(n_real)
        if n_real.ndim == 0:
            n_real = jnp.full((B,), n_real)
    kernel = p["in_proj"]["kernel"]
    d_inner = 2 * d_model                         # expand=2 (the build default)
    n_heads = d_inner // headdim
    assert kernel.shape[1] == 2 * d_inner + 2 * d_state + n_heads, (
        f"in_proj width {kernel.shape[1]} does not match expand=2 layout")
    conv_dim = d_inner + 2 * d_state

    zxbcdt = x @ kernel
    z, xBC, dt_raw = jnp.split(zxbcdt, [d_inner, d_inner + conv_dim], axis=-1)

    d_conv = p["conv_w"].shape[0]
    conv_in = jnp.concatenate([state["conv"], xBC], axis=1)
    conv = sum(conv_in[:, k:k + L, :] * p["conv_w"][k] for k in range(d_conv))
    xBC_act = jax.nn.silu(conv + p["conv_b"])
    if n_real is None:
        new_conv_state = conv_in[:, -(d_conv - 1):]
    else:
        idx = n_real[:, None] + jnp.arange(d_conv - 1)[None, :]   # [B, dc-1]
        new_conv_state = jnp.take_along_axis(
            conv_in, idx[..., None], axis=1)

    xh, B_mat, C_mat = jnp.split(xBC_act, [d_inner, d_inner + d_state], axis=-1)
    xh = xh.reshape(B, L, n_heads, headdim)
    B_mat = B_mat.reshape(B, L, 1, d_state)
    C_mat = C_mat.reshape(B, L, 1, d_state)
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"])
    if n_real is not None:
        real = (jnp.arange(L)[None, :] < n_real[:, None])[..., None]
        dt = jnp.where(real, dt, 0.0)
    A = -jnp.exp(p["a_log"])

    y, S = ssd_chunked(xh, dt, A, B_mat, C_mat, chunk_size=chunk_size,
                       initial_state=state["ssd"], return_final=True)
    y = y + p["d_skip"][None, None, :, None] * xh
    y = y.reshape(B, L, d_inner)
    gated = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    rms = jax.lax.rsqrt(jnp.mean(gated ** 2, axis=-1, keepdims=True) + 1e-5)
    y = gated * rms * p["norm_scale"]
    out = y @ p["out_proj"]["kernel"]
    return out, {"conv": new_conv_state, "ssd": S}


def _stack_stream(p, x, states, *, headdim: int, d_state: int,
                  chunk_size: int, n_real=None):
    """Causal MambaStack over a chunk: pre-norm residual blocks + final LN."""
    new_states = []
    for i, st in enumerate(states):
        bp = p[f"block_{i}"]
        h = _layer_norm(x, bp["norm"])
        y, st2 = _mamba2_stream(bp["fwd"], h, st, headdim=headdim,
                                d_state=d_state, chunk_size=chunk_size,
                                n_real=n_real)
        x = x + y
        new_states.append(st2)
    return _layer_norm(x, p["norm"]), new_states


# ── chunk-stage streaming (N > 1): router / compact / EMA carried states ─────
def _router_stream(rp, x, n_real, st, eps: float = 1e-6):
    """RoutingModule over a block with carried previous-key state.

    Rows [0, n_real) are real per batch row (``n_real`` scalar or [B];
    compacted buffers keep real rows contiguous). ``st`` = {"k_last": [B, D]
    W_k of the last REAL frame seen, "started": [B] bool}. The global first
    frame gets p = 1 (models/hnet_chunk.py:92); every later block's row 0
    chains through k_last. Returns (p, b, st')."""
    B, E = x.shape[0], x.shape[1]
    n_real = jnp.asarray(n_real)
    if n_real.ndim == 0:
        n_real = jnp.full((B,), n_real)
    q = x @ rp["W_q"]["kernel"]
    k = x @ rp["W_k"]["kernel"]
    k_prev = jnp.concatenate([st["k_last"][:, None], k[:, :-1]], axis=1)
    qf, kf = q.astype(jnp.float32), k_prev.astype(jnp.float32)
    sq = jnp.sum(qf * qf, axis=-1) * jnp.sum(kf * kf, axis=-1)
    cos = jnp.sum(qf * kf, axis=-1) / jnp.sqrt(jnp.maximum(sq, eps ** 2))
    p = 0.5 * (1.0 - cos)
    p = p.at[:, 0].set(jnp.where(st["started"], p[:, 0], 1.0))
    p = jnp.clip(p, 0.0, 1.0)
    real = (jnp.arange(E)[None, :] < n_real[:, None]).astype(p.dtype)
    p = p * real
    b = (p >= 0.5).astype(p.dtype) * real
    last = jnp.take_along_axis(
        k, jnp.maximum(n_real - 1, 0)[:, None, None], axis=1)[:, 0]
    k_new = jnp.where((n_real > 0)[:, None], last, st["k_last"])
    return p, b, {"k_last": k_new, "started": st["started"] | (n_real > 0)}


def _compact(x, p, b):
    """Scatter kept rows (and their p) to the front of an equal-size buffer
    (the block-local form of hnet_chunk._scatter_to_slots). Returns per-row
    kept counts [B] — every downstream stage is per-row exact, so batched
    (pooled multi-session) streaming works for chunked configs too."""
    keep = b > 0.5
    memb = jnp.maximum(jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1, 0)
    onehot = jax.nn.one_hot(memb, x.shape[1], dtype=x.dtype, axis=-1) \
        * keep.astype(x.dtype)[..., None]
    z = jnp.einsum("ble,bld->bed", onehot, x)
    P = jnp.einsum("ble,bl->be", onehot.astype(p.dtype), p)
    return z, P, keep.sum(axis=1)


def _ema_stream(z, P, n_real, st, p_clamp: float = 1e-4):
    """Carried-state EMA (ops/ema.py recurrence) over a compacted block.

    ``st`` = {"ema": [B, D] fp32 carry, "has": [B] bool}. The global first
    chunk takes its value verbatim (zbar_0 = z_0); padding rows are exact
    no-ops and emit the carry (never gathered). fp32 like the offline op."""
    B, E = z.shape[0], z.shape[1]
    zf = z.astype(jnp.float32)
    pc = jnp.clip(P.astype(jnp.float32), p_clamp, 1.0 - p_clamp)
    n_real = jnp.asarray(n_real)
    if n_real.ndim == 0:
        n_real = jnp.full((B,), n_real)
    real = jnp.arange(E)[:, None] < n_real[None, :]          # [E, B]

    def step(carry, inp):
        ema, has = carry
        z_t, p_t, r_t = inp
        upd = jnp.where(has[:, None], p_t[:, None] * z_t
                        + (1.0 - p_t[:, None]) * ema, z_t)
        ema2 = jnp.where(r_t[:, None], upd, ema)
        return (ema2, has | r_t), ema2

    (ema, has), outs = jax.lax.scan(
        step, (st["ema"], st["has"]),
        (zf.transpose(1, 0, 2), pc.transpose(1, 0), real))
    return outs.transpose(1, 0, 2), {"ema": ema, "has": has}


def _upsample_stream(ema_out, b, prev_st):
    """Gather-upsample a block: fine row i takes the EMA value of the latest
    kept row <= i, falling back to the carried EMA for rows before this
    block's first boundary. (Confidence STE forward == 1.0 — identity at
    inference, models/hnet_chunk.py:184.)"""
    idx = jnp.cumsum((b > 0.5).astype(jnp.int32), axis=1) - 1
    gathered = jnp.take_along_axis(ema_out, jnp.maximum(idx, 0)[..., None],
                                   axis=1)
    prev = jnp.where(prev_st["has"][:, None], prev_st["ema"], 0.0)
    return jnp.where((idx >= 0)[..., None], gathered, prev[:, None, :])


class CausalStreamingEncoder:
    """EXACT streaming for causal configs (``bidirectional: false``): the
    conv subsampling has a finite receptive field (7 mel frames) so it
    streams exactly by window overlap; every Mamba2 layer carries its true
    state (depthwise-conv tail + SSD recurrence state, via ops/ssd's
    ``initial_state``/``return_final``); and for chunked configs (N > 1,
    Type A or B, dynamic chunker) the H-Net machinery streams exactly too —
    chunking/dechunking is causal by construction (router p_t reads
    (x_t, x_{t-1}); the EMA is a causal recurrence; the gather-upsample
    takes the latest kept frame):

      - router: carry W_k x of the last real frame + a started flag (the
        global first frame's p == 1);
      - compressed stacks (main / mid / mid_dec): each block's kept frames
        compact to the FRONT of an equal-size buffer; padding rows are
        exact state no-ops (dt zeroed, conv tail sliced at the kept count);
      - dechunk: carried EMA scalar state + gather with carried fallback;
        Type B composes two of these stages (stage 2 consumes stage 1's
        compacted stream).

    Outputs match the offline encoder to numeric noise at ANY block size,
    with latency = one emission block. Emits ``block_enc`` encoder frames
    per step from ``4*block_enc`` fresh mel frames. For bidirectional
    production models use StreamingEncoder (window approximation) instead;
    this class raises on non-streamable configs.
    """

    def __init__(self, model, params, *, block_enc: int = 16):
        enc = model.encoder
        if enc.bidirectional:
            raise ValueError(
                "CausalStreamingEncoder requires bidirectional=false — use "
                "StreamingEncoder (window approximation) for bidirectional "
                "configs")
        if float(enc.N) != 1.0 and enc.chunker != "dynamic":
            raise ValueError(
                "exact chunked streaming supports the dynamic chunker only "
                f"(got chunker={enc.chunker!r})")
        self.model = model
        self.enc_params = params["encoder"]
        self.hop, self.win = int(model.hop), int(model.win)
        self.E = int(block_enc)
        self.W_mel = 4 * self.E + 4              # covers mel [4j, 4j+6] per j
        self.d_state = int(enc.d_state)
        self.headdim = int(enc.headdim)
        self._spec = dict(headdim=self.headdim, d_state=self.d_state,
                          chunk_size=max(8, self.E))
        self._identity = float(enc.N) == 1.0
        self._type_b = enc.arch_type == "B" and not self._identity

        def dense(p, x):
            return x @ p["kernel"] + p["bias"]

        def chunk_stage(rp, x_fine, n_fine, st, inner):
            """One dynamic-chunk stage: route -> compact -> inner(z, n_kept)
            -> EMA -> upsample. Returns (x_dech at fine rate, z_compact,
            n_kept, st')."""
            p, b, st_r = _router_stream(rp, x_fine, n_fine, st["router"])
            ema_prev = st["ema"]        # inner may overwrite "ema" (Type B's
            z, P, n_kept = _compact(x_fine, p, b)   # nested stage-2 scratch)
            z_proc, st = inner(z, n_kept, st)
            ema_out, st_e = _ema_stream(z_proc, P, n_kept, ema_prev)
            x_up = _upsample_stream(ema_out, b, ema_prev)
            return (x_up.astype(x_fine.dtype), z, n_kept,
                    dict(st, router=st_r, ema=st_e))

        def step(params, mel, states):
            # subsample the mel window -> exactly E encoder frames
            sub = params["subsample"]
            x = mel[..., None]
            for name in ("conv1", "conv2"):
                k, b = sub[name]["kernel"], sub[name]["bias"]
                x = jax.lax.conv_general_dilated(
                    x, k, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                x = jax.nn.relu(x)
            Bz, T, F, C = x.shape
            x = x.reshape(Bz, T, F * C) @ sub["proj"]["kernel"] + sub["proj"]["bias"]

            st = dict(states)
            x_enc, st["enc"] = _stack_stream(params["enc"], x, st["enc"],
                                             **self._spec)
            E = x_enc.shape[1]
            if self._identity:
                z = dense(params["proj_in"], x_enc)
                z, st["main"] = _stack_stream(params["main"], z, st["main"],
                                              **self._spec)
                x_dech = dense(params["proj_out"], z)
            elif not self._type_b:                       # Type A, N > 1
                def inner_a(z, n_kept, sti):
                    zi = dense(params["proj_in"], z)
                    zm, st_m = _stack_stream(params["main"], zi, sti["main"],
                                             n_real=n_kept, **self._spec)
                    return dense(params["proj_out"], zm), dict(sti, main=st_m)
                x_dech, _, _, st2 = chunk_stage(
                    params["chunk"]["router"], x_enc, E, st, inner_a)
                st.update(st2)
            else:                                        # Type B, two stages
                def inner_b(z1c, k1, sti):
                    z1 = dense(params["proj1_in"], z1c)
                    z1, st_mid = _stack_stream(params["mid"], z1, sti["mid"],
                                               n_real=k1, **self._spec)

                    def inner_b2(z2c, k2, sti2):
                        zm, st_m = _stack_stream(
                            params["main"], z2c, sti2["main2"],
                            n_real=k2, **self._spec)
                        return zm, dict(sti2, main2=st_m)

                    up2, _, _, sti = chunk_stage(
                        params["chunk2"]["router"], z1, k1,
                        dict(sti, mid=st_mid,
                             router=sti["router2"], ema=sti["ema2"]),
                        inner_b2)
                    sti["router2"], sti["ema2"] = sti["router"], sti["ema"]
                    z1d, st_md = _stack_stream(params["mid_dec"], z1 + up2,
                                               sti["mid_dec"], n_real=k1,
                                               **self._spec)
                    return (dense(params["proj1_out"], z1d),
                            dict(sti, mid_dec=st_md))
                x_dech, _, _, st2 = chunk_stage(
                    params["chunk1"]["router"], x_enc, E,
                    dict(st, router=st["router1"], ema=st["ema1"]), inner_b)
                st2["router1"], st2["ema1"] = st2["router"], st2["ema"]
                st.update({k: v for k, v in st2.items()
                           if k not in ("router", "ema")})
            x_out, st["dec"] = _stack_stream(params["dec"], x_enc + x_dech,
                                             st["dec"], **self._spec)
            return x_out, st

        self._step = jax.jit(step)
        self.reset()

    def _fresh_states(self):
        def stack_states(n_layers, d):
            d_inner = 2 * d
            conv_dim = d_inner + 2 * self.d_state
            H = d_inner // self.headdim
            return [{"conv": jnp.zeros((1, 3, conv_dim), jnp.float32),
                     "ssd": jnp.zeros((1, H, self.d_state, self.headdim),
                                      jnp.float32)}
                    for _ in range(n_layers)]

        def chunk_states(d_router, d_ema):
            return ({"k_last": jnp.zeros((1, d_router), jnp.float32),
                     "started": jnp.zeros((1,), bool)},
                    {"ema": jnp.zeros((1, d_ema), jnp.float32),
                     "has": jnp.zeros((1,), bool)})

        enc = self.model.encoder
        st = {"enc": stack_states(enc.n_enc, enc.d_outer),
              "dec": stack_states(enc.n_dec, enc.d_outer)}
        if self._type_b:
            st["mid"] = stack_states(enc.n_mid, enc.d_main)
            st["main2"] = stack_states(enc.n_main, enc.d_main)
            st["mid_dec"] = stack_states(enc.n_mid, enc.d_main)
            st["router1"], st["ema1"] = chunk_states(enc.d_outer, enc.d_outer)
            st["router2"], st["ema2"] = chunk_states(enc.d_main, enc.d_main)
        else:
            st["main"] = stack_states(enc.n_main, enc.d_main)
            if not self._identity:
                st["router"], st["ema"] = chunk_states(enc.d_outer,
                                                       enc.d_outer)
        return st

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0                      # absolute sample offset
        self._e0 = 0                             # emitted encoder frames
        self._total = 0
        self._states = self._fresh_states()

    def _mel_ready(self) -> int:
        return max(0, (self._total - self.win) // self.hop + 1)

    def _mel_window(self, m0: int, n: int) -> np.ndarray:
        """CMVN'd log-mel frames [m0, m0+n) (zero-padded past the audio)."""
        from hnet_mamba_asr_tpu.ops.melspec import log_mel_spectrogram
        s0 = m0 * self.hop
        s1 = (m0 + n - 1) * self.hop + self.win
        lo = s0 - self._buf_start
        seg = self._buf[lo:lo + (s1 - s0)]
        wave = np.zeros(s1 - s0, np.float32)
        wave[:len(seg)] = seg
        feats, _ = log_mel_spectrogram(wave[None], np.array([len(wave)]),
                                       win_length=self.win, hop_length=self.hop,
                                       n_mels=self.model.n_mels)
        feats = np.asarray(feats)
        if self.model.cmvn is not None:
            feats = (feats - self.model.cmvn.mean) * self.model.cmvn.istd
        return feats.astype(np.float32)

    def _advance(self, n_valid_enc: int) -> np.ndarray:
        mel = self._mel_window(4 * self._e0, self.W_mel)
        out, self._states = self._step(self.enc_params, jnp.asarray(mel),
                                       self._states)
        self._e0 += n_valid_enc
        keep_from = 4 * self._e0 * self.hop
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        return np.asarray(out)[0, :n_valid_enc]

    def accept(self, samples) -> list[np.ndarray]:
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._total += len(samples)
        out = []
        while self._mel_ready() >= 4 * (self._e0 + self.E) + 4:
            out.append(self._advance(self.E))
        return out

    def finish(self) -> np.ndarray | None:
        total_enc = subsampled_count(self._mel_ready())
        remaining = total_enc - self._e0
        if remaining <= 0:
            return None
        return self._advance(remaining)          # zero-padded tail is causal-safe


class StreamingCTCGreedy:
    """Incremental CTC-greedy transcription over a StreamingEncoder.

    Carries the collapse state (previous frame label) across segments so the
    emitted token stream equals collapsing the concatenated frame argmaxes.
    """

    def __init__(self, model, params, stream: StreamingEncoder):
        self.blank = model.ctc.blank_id
        self._prev = self.blank
        ctc_params = {"params": params["ctc"]}
        self._argmax = jax.jit(lambda f: model.ctc.apply(
            ctc_params, f[None], method="frame_argmax")[0])
        self.stream = stream

    def reset(self) -> None:
        self._prev = self.blank
        self.stream.reset()

    def _collapse(self, frame_ids: np.ndarray) -> list[int]:
        out = []
        for fid in frame_ids.tolist():
            if fid != self._prev and fid != self.blank:
                out.append(int(fid))
            self._prev = fid
        return out

    def accept(self, samples) -> list[int]:
        toks: list[int] = []
        for feats in self.stream.accept(samples):
            toks += self._collapse(np.asarray(self._argmax(jnp.asarray(feats))))
        return toks

    def finish(self) -> list[int]:
        feats = self.stream.finish()
        if feats is None or len(feats) == 0:
            return []
        return self._collapse(np.asarray(self._argmax(jnp.asarray(feats))))
