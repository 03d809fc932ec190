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
