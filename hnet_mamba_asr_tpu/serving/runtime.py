"""Serving runtime: load and run exported ASR artifacts with jax + numpy ONLY.

This module is deliberately SELF-CONTAINED — no imports from the rest of the
package — so a deployment host can copy this one file next to an artifact
directory and serve the model without installing the framework (the test
suite proves it: tests/test_serving_export.py runs this file from a temp dir
with the repo stripped from sys.path). The reference has no deployment-export
story at all (torch checkpoints require the full source tree to load); this
is the TPU-idiomatic equivalent of a TorchScript/ONNX export: ahead-of-time
traced StableHLO programs (jax.export) that XLA compiles for whatever
devices the serving host has.

Artifact layout (produced by hnet_mamba_asr_tpu.serving.export):

    manifest.json     format/version, vocab contract, emit set, shape buckets
    params.npz        path-keyed flat weights (keys are jax keystr paths)
    f_<B>x<S>.shlo    one serialized jax.export function per (batch, samples)
                      bucket; called as fn(params_pytree, wave, wave_lens)

Calls pick the smallest bucket that fits, zero-pad rows/samples up to it, and
slice the outputs back. Padded rows carry wave_len 0 and come back with
enc_length 0 (the encoder's length formula maps 0 samples to 0 frames), so
they are inert without masking logic here.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1
_KEY_RE = re.compile(r"\['([^']*)'\]|\[(\d+)\]")


def params_to_tree(flat: dict):
    """Path-keyed flat dict (jax keystr paths like "['a'][0]['b']") ->
    nested dicts/lists. Integer segments ("[0]") become list indices, so
    state pytrees containing per-layer lists round-trip too."""
    tree: dict = {}
    for path, leaf in flat.items():
        keys = [name if name else int(idx)
                for name, idx in _KEY_RE.findall(path)]
        if not keys or "".join(_KEY_RE.sub("", path).split()):
            raise ValueError(f"unparseable params key {path!r}")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(isinstance(k, int) for k in node):
            if sorted(node) != list(range(len(node))):
                raise ValueError(f"non-contiguous list indices {sorted(node)}")
            return [node[i] for i in range(len(node))]
        return node

    return listify(tree)


def collapse_ctc(frame_ids: np.ndarray, lengths: np.ndarray,
                 blank_id: int) -> list[list[int]]:
    """Standard CTC collapse: drop repeats, then blanks, per valid row span."""
    out = []
    for row, n in zip(np.asarray(frame_ids), np.asarray(lengths)):
        prev, toks = -1, []
        for t in row[: int(n)]:
            t = int(t)
            if t != prev and t != blank_id:
                toks.append(t)
            prev = t
        out.append(toks)
    return out


class ServingModel:
    """Callable wrapper over one exported artifact directory."""

    def __init__(self, artifact_dir: str | Path):
        d = Path(artifact_dir)
        manifest = json.loads((d / "manifest.json").read_text())
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')!r} != "
                f"supported {FORMAT_VERSION} — re-export with this runtime")
        self.manifest = manifest
        self.vocab_size = int(manifest["vocab_size"])
        self.blank_id = manifest.get("blank_id")
        self.emit = tuple(manifest["emit"])

        import jax
        from jax import export as jax_export
        # params live ON DEVICE from load: .call device_puts numpy args on
        # EVERY invocation, and re-shipping ~weights-sized traffic per call
        # dominates tick latency on high-latency transports (measured: the
        # Small streaming solo tick fell ~3 s -> ~0.1 s through the TPU
        # relay once params stopped round-tripping)
        with np.load(d / "params.npz") as z:
            self._params = jax.device_put(
                params_to_tree({k: z[k] for k in z.files}))
        self._fns = {}
        for b in manifest["buckets"]:
            key = (int(b["batch"]), int(b["samples"]))
            self._fns[key] = jax_export.deserialize(
                (d / b["file"]).read_bytes())
        if not self._fns:
            raise ValueError("artifact has no shape buckets")

    @property
    def buckets(self) -> list[tuple[int, int]]:
        return sorted(self._fns)

    def _pick(self, B: int, S: int) -> tuple[int, int]:
        fits = [k for k in self._fns if k[0] >= B and k[1] >= S]
        if not fits:
            raise ValueError(
                f"no bucket fits batch={B} samples={S}; available: "
                f"{self.buckets} (longer audio must be chunked upstream)")
        return min(fits, key=lambda k: (k[0] * k[1], k))

    def __call__(self, wave: np.ndarray, wave_lens: np.ndarray) -> dict:
        """wave [B, S] float32, wave_lens [B] int -> dict of numpy outputs
        (per manifest emit: enc_lengths, frame_ids, log_probs, aed_ids),
        sliced back to the caller's batch size."""
        wave = np.asarray(wave, np.float32)
        wave_lens = np.asarray(wave_lens, np.int32)
        B, S = wave.shape
        bb, bs = self._pick(B, S)
        if (B, S) != (bb, bs):
            w = np.zeros((bb, bs), np.float32)
            w[:B, :S] = wave
            l = np.zeros((bb,), np.int32)
            l[:B] = wave_lens
            wave, wave_lens = w, l
        out = self._fns[(bb, bs)].call(self._params, wave, wave_lens)
        return {k: np.asarray(v)[:B] for k, v in out.items()}

    def transcribe_ids(self, wave: np.ndarray,
                       wave_lens: np.ndarray) -> list[list[int]]:
        """Token ids per utterance: the exported CTC prefix beam when the
        artifact emits beam_ids, else CTC greedy (collapse of frame_ids)."""
        if "beam_ids" in self.emit:
            out = self(wave, wave_lens)
            toks, blen = out["beam_ids"], out["beam_lens"]
            return [toks[b, :int(blen[b])].tolist()
                    for b in range(toks.shape[0])]
        if "frame_ids" in self.emit:
            out = self(wave, wave_lens)
            return collapse_ctc(out["frame_ids"], out["enc_lengths"],
                                self.blank_id)
        for key in ("rnnt_beam_ids", "rnnt_ids"):   # beam beats greedy
            if key in self.emit:
                out = self(wave, wave_lens)
                toks = out[key]
                tl = out[key.replace("ids", "lens")]
                return [toks[b, :int(tl[b])].tolist()
                        for b in range(toks.shape[0])]
        raise ValueError(f"artifact emits {self.emit}, not "
                         "frame_ids/beam_ids/rnnt_ids/rnnt_beam_ids")

    def transcribe_text(self, wave: np.ndarray,
                        wave_lens: np.ndarray) -> list[str]:
        """Greedy transcripts; needs a manifest exported with tokenizer=."""
        tok = self.manifest.get("tokenizer")
        if tok is None:
            raise ValueError("artifact has no embedded tokenizer — re-export "
                             "with save_serving_artifact(..., tokenizer=tok) "
                             "or consume transcribe_ids() instead")
        return [detokenize(tok, ids)
                for ids in self.transcribe_ids(wave, wave_lens)]


def detokenize(tok_meta: dict, ids) -> str:
    """ids -> text from the manifest's embedded tokenizer table (exported
    with ``tokenizer=`` — mirrors data/tokenizer.Tokenizer.decode: drop
    specials/out-of-range, join pieces, map the word boundary to space)."""
    pieces = tok_meta["pieces"]
    drop = set(tok_meta.get("drop_ids", ()))
    wb = tok_meta.get("word_boundary", "▁")
    out = [pieces[int(i)] for i in ids
           if 0 <= int(i) < len(pieces) and int(i) not in drop]
    return "".join(out).replace(wb, " ").strip()


def load_serving_artifact(artifact_dir: str | Path) -> ServingModel:
    return ServingModel(artifact_dir)


class StreamingServingModel:
    """Incremental transcription over a streaming artifact (kind=streaming).

    The artifact holds ONE exported step program
    ``f(params, wave_window, states) -> (frame_ids, new_states)`` plus the
    initial state pytree (states.npz). This class only buffers samples,
    slices fixed windows, carries the states, and collapses CTC frames —
    all trivially host-side, so streaming deployment needs nothing beyond
    this file either. Feed arbitrary-size sample blocks; token ids stream
    back with one-block latency; ``finish()`` drains the causal-safe
    zero-padded tail.
    """

    def __init__(self, artifact_dir: str | Path):
        d = Path(artifact_dir)
        manifest = json.loads((d / "manifest.json").read_text())
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')!r} != "
                f"supported {FORMAT_VERSION} — re-export with this runtime")
        if manifest.get("kind") != "streaming":
            raise ValueError("not a streaming artifact — use "
                             "load_serving_artifact for offline kinds")
        self.manifest = manifest
        s = manifest["streaming"]
        self.E = int(s["block_enc"])
        self.hop, self.win = int(s["hop"]), int(s["win"])
        self.W_mel = int(s["w_mel"])
        self.S_win = int(s["s_win"])
        self.blank_id = int(manifest["blank_id"])
        # transducer streaming artifacts emit final ids directly (the label
        # history rides in the state pytree); CTC artifacts emit frame ids
        # this class collapses. Beam artifacts ("decode": "beam") return the
        # CURRENT BEST full hypothesis each block — the beam may rewrite
        # earlier output, so nothing is "newly final" until finish():
        # feed() returns [], the running best is readable via .partial.
        self._rnnt = "rnnt_ids" in manifest.get("emit", [])
        self._beam = s.get("decode") == "beam"
        if int(s.get("batch", 1)) != 1:
            raise ValueError(
                f"artifact exported at batch {s['batch']} — use "
                "StreamingSessionPool for multi-session artifacts")

        import jax
        from jax import export as jax_export
        # device-resident params + state template: the carried states stay
        # on device across feeds (only token outputs are fetched), and
        # params never re-ship after load (see ServingModel)
        with np.load(d / "params.npz") as z:
            self._params = jax.device_put(
                params_to_tree({k: z[k] for k in z.files}))
        with np.load(d / "states.npz") as z:
            self._states0 = jax.device_put(
                params_to_tree({k: z[k] for k in z.files}))
        self._fn = jax_export.deserialize((d / s["file"]).read_bytes())
        self.reset()

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0                      # absolute sample offset
        self._e0 = 0                             # emitted encoder frames
        self._total = 0
        self._prev = -1                          # CTC collapse carry
        self._states = self._states0
        self._partial: list[int] = []            # beam: running best

    def _mel_ready(self) -> int:
        return max(0, (self._total - self.win) // self.hop + 1)

    def _advance(self, n_valid: int) -> list[int]:
        s0 = 4 * self._e0 * self.hop
        seg = self._buf[s0 - self._buf_start:s0 - self._buf_start + self.S_win]
        wave = np.zeros((1, self.S_win), np.float32)
        wave[0, : len(seg)] = seg
        if self._rnnt:
            (ids, tl), self._states = self._fn.call(
                self._params, wave, np.array([n_valid], np.int32),
                self._states)
        else:
            ids, self._states = self._fn.call(self._params, wave,
                                              self._states)
        self._e0 += n_valid
        keep = 4 * self._e0 * self.hop
        if keep > self._buf_start:
            self._buf = self._buf[keep - self._buf_start:]
            self._buf_start = keep
        if self._rnnt:
            final = [int(t) for t in
                     np.asarray(ids)[0, : int(np.asarray(tl)[0])]]
            if self._beam:
                self._partial = final            # full best-so-far, replaces
                return []
            return final
        toks = []
        for t in np.asarray(ids)[0, : n_valid]:
            t = int(t)
            if t != self._prev and t != self.blank_id:
                toks.append(t)
            self._prev = t
        return toks

    def feed(self, samples) -> list[int]:
        """Accept any number of samples; return newly final token ids."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._total += len(samples)
        out = []
        while self._mel_ready() >= 4 * (self._e0 + self.E) + 4:
            out.extend(self._advance(self.E))
        return out

    @property
    def partial(self) -> list[int]:
        """Beam artifacts: the current best full hypothesis (may rewrite)."""
        return list(self._partial)

    def finish(self) -> list[int]:
        """Drain the tail (zero-padded window is causal-safe). For beam
        artifacts returns the FINAL full transcript (feed() returned [])."""
        total_enc = max(0, ((self._mel_ready() - 1) // 2 - 1) // 2)
        out = []
        while total_enc - self._e0 > 0:
            out.extend(self._advance(min(self.E, total_enc - self._e0)))
        return list(self._partial) if self._beam else out


def load_streaming_artifact(artifact_dir: str | Path) -> StreamingServingModel:
    return StreamingServingModel(artifact_dir)


class _StreamSession:
    __slots__ = ("buf", "buf_start", "e0", "total", "prev", "states",
                 "pending", "finishing", "target_enc", "partial")

    def __init__(self, states):
        self.buf = np.zeros(0, np.float32)
        self.buf_start = 0
        self.e0 = 0
        self.total = 0
        self.prev = -1
        self.states = states                     # pytree, leading dim 1
        self.pending: list[int] = []             # ids emitted by pool ticks
        self.finishing = False
        self.partial: list[int] = []             # beam: running best
        self.target_enc = 0


class StreamingSessionPool:
    """Multi-session streaming transcription over a batch-B artifact.

    One exported step f(params, wave [B, s_win], states) advances up to B
    concurrent sessions per call: sessions map to batch rows only for the
    duration of a tick; their state rows are gathered before and scattered
    back after, so row independence (exact at N == 1 — every step op is
    batch-parallel) makes pooled sessions bitwise equal to running each
    alone. Unused rows carry zero audio + template states and are ignored.

    open() -> sid; feed(sid, samples) -> newly final ids (for ANY progress
    the tick made on that session); finish(sid) drains the tail and frees
    the slot. Thread-safe (one lock around ticks).
    """

    def __init__(self, artifact_dir: str | Path):
        import threading
        d = Path(artifact_dir)
        manifest = json.loads((d / "manifest.json").read_text())
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')!r} != "
                f"supported {FORMAT_VERSION} — re-export with this runtime")
        if manifest.get("kind") != "streaming":
            raise ValueError("not a streaming artifact")
        self.manifest = manifest
        s = manifest["streaming"]
        self.B = int(s.get("batch", 1))
        self.E = int(s["block_enc"])
        self.hop, self.win = int(s["hop"]), int(s["win"])
        self.S_win = int(s["s_win"])
        self.blank_id = int(manifest["blank_id"])
        self._rnnt = "rnnt_ids" in manifest.get("emit", [])
        self._beam = s.get("decode") == "beam"
        import jax
        from jax import export as jax_export
        with np.load(d / "params.npz") as z:
            self._params = jax.device_put(
                params_to_tree({k: z[k] for k in z.files}))
        with np.load(d / "states.npz") as z:
            self._template = params_to_tree({k: z[k] for k in z.files})
        self._fn = jax_export.deserialize((d / s["file"]).read_bytes())
        self._sessions: dict[int, _StreamSession] = {}
        self._next_sid = 0
        self._lock = threading.Lock()
        # Continuous batching: one drainer at a time ticks the pool with the
        # lock RELEASED during each device call, so concurrent feed()s
        # deposit audio meanwhile and the drainer's next readiness scan
        # picks them up — interleaved single-session feeds coalesce into
        # full-B lockstep groups instead of B singleton program calls.
        self._cond = threading.Condition(self._lock)
        self._draining = False
        self.n_ticks = 0          # program calls made (coalescing evidence)
        # Device-resident pooled state: after a tick, the [B, ...] state tree
        # stays ON DEVICE paired with its slot->sid layout. The next tick
        # reuses it directly when the layout is unchanged (the steady
        # lockstep case), so steady-state ticks move ZERO state bytes over
        # the transport — only the token outputs are fetched. Host rows are
        # materialized lazily, only when sessions churn slots.
        # HMASR_POOL_HOST_STATES=1 restores the gather/scatter-every-tick
        # path (A/B + debugging).
        import os
        self._resident = None            # (device state tree, slot sids)
        self._host_states = os.environ.get("HMASR_POOL_HOST_STATES") == "1"

    # -- session lifecycle ----------------------------------------------------
    def open(self) -> int:
        with self._lock:
            sid = self._next_sid
            self._next_sid += 1
            self._sessions[sid] = _StreamSession(_tree_copy(self._template))
            return sid

    def close(self, sid: int) -> None:
        with self._lock:
            self._sessions.pop(sid, None)

    @property
    def active(self) -> int:
        with self._lock:
            return len(self._sessions)

    def feed(self, sid: int, samples) -> list[int]:
        samples = np.asarray(samples, np.float32).reshape(-1)
        with self._cond:
            ses = self._sessions[sid]
            if ses.finishing:
                raise ValueError(f"session {sid} is finished")
            ses.buf = np.concatenate([ses.buf, samples])
            ses.total += len(samples)
            self._drain((sid,))
            out, ses.pending = ses.pending, []
            return out

    def feed_many(self, items) -> dict[int, list[int]]:
        """Deposit audio for several sessions, then drain ONCE.

        The synchronous twin of concurrent feed() coalescing: a single
        driver advancing B sessions round-robin with feed() would tick each
        session alone (its deposit is the only ready one when its drain
        runs); depositing the whole round first lets every ready session
        share full-B lockstep program calls — and the stable slot layout
        keeps the pooled state device-resident between ticks.

        ``items``: iterable of (sid, samples). Returns {sid: new final ids}.
        """
        out: dict[int, list[int]] = {}
        with self._cond:
            for sid, samples in items:
                ses = self._sessions[sid]
                if ses.finishing:
                    raise ValueError(f"session {sid} is finished")
                samples = np.asarray(samples, np.float32).reshape(-1)
                ses.buf = np.concatenate([ses.buf, samples])
                ses.total += len(samples)
                out[sid] = []
            self._drain(tuple(out))
            for sid in out:
                ses = self._sessions[sid]
                out[sid], ses.pending = ses.pending, []
            return out

    def finish(self, sid: int) -> list[int]:
        with self._cond:
            ses = self._sessions[sid]
            ses.finishing = True
            mel = max(0, (ses.total - self.win) // self.hop + 1)
            ses.target_enc = max(0, ((mel - 1) // 2 - 1) // 2)
            self._drain((sid,))
            out = list(ses.partial) if self._beam else ses.pending
            del self._sessions[sid]
            return out

    def partial(self, sid: int) -> list[int]:
        """Beam artifacts: the session's current best full hypothesis."""
        with self._lock:
            return list(self._sessions[sid].partial)

    # -- pooled ticking ---------------------------------------------------------
    def _ready(self, ses: _StreamSession) -> int:
        """Encoder frames this session can finalize in one tick (0 = not
        ready). Same advance rule as StreamingServingModel."""
        mel = max(0, (ses.total - self.win) // self.hop + 1)
        if mel >= 4 * (ses.e0 + self.E) + 4:
            return self.E
        if ses.finishing and ses.target_enc - ses.e0 > 0:
            return min(self.E, ses.target_enc - ses.e0)
        return 0

    def _drain(self, interest=None) -> None:
        """Caller holds self._cond's lock. Single-flight: the first thread
        to find work becomes the drainer and ticks until nothing is ready;
        the lock is RELEASED during each device call (see _tick), so other
        threads deposit audio meanwhile and the drainer's next scan batches
        them into the same program calls (continuous batching).

        ``interest`` (sids): return as soon as NONE of these sessions has
        ready work — even while a drain is in flight. A feed whose deposit
        is not yet a full emission block must NOT park behind someone
        else's drain: parking would admit exactly one new deposit per
        drain cycle and serialize the pool into singleton ticks (the bug
        the coalescing test pins). A caller whose session IS ready waits;
        the in-flight drainer's next scan ticks it (batched with every
        other ready session), or the caller becomes the next drainer."""
        while True:
            if interest is None:
                mine = [(sid, n) for sid, ses in self._sessions.items()
                        if (n := self._ready(ses)) > 0]
            else:
                mine = [sid for sid in interest
                        if (ses := self._sessions.get(sid)) is not None
                        and self._ready(ses) > 0]
            if not mine:
                return
            if self._draining:
                self._cond.wait()
                continue
            self._draining = True
            try:
                while True:
                    ready = [(sid, n) for sid, ses in self._sessions.items()
                             if (n := self._ready(ses)) > 0]
                    if not ready:
                        break
                    for i in range(0, len(ready), self.B):
                        self._tick(ready[i:i + self.B])
            finally:
                self._draining = False
                self._cond.notify_all()

    def _sync_host(self) -> None:
        """Materialize the device-resident state rows into their sessions.
        Lazy: runs only when the next tick's slot layout differs from the
        resident one (session churn) — never in the steady lockstep case.
        ONE device_get for the whole tree; removed sessions' rows are
        dropped."""
        if self._resident is None:
            return
        import jax
        dev_states, slots = self._resident
        self._resident = None
        host = jax.device_get(dev_states)
        for slot, sid in enumerate(slots):
            ses = self._sessions.get(sid)
            if ses is not None:
                ses.states = _tree_row(host, slot)

    def _tick(self, group: list[tuple[int, int]]) -> None:
        """One pooled program call. Caller (the single-flight drainer) holds
        the lock; it is RELEASED for the duration of the device call so
        concurrent feed()/open()/close() proceed — the snapshot before and
        the scatter after run locked, and sessions closed mid-call are
        skipped on scatter (sids are never reused)."""
        group = [(sid, n) for sid, n in group if sid in self._sessions]
        if not group:
            return
        self.n_ticks += 1
        wave = np.zeros((self.B, self.S_win), np.float32)
        sids = tuple(sid for sid, _n in group)
        for slot, (sid, _n) in enumerate(group):
            ses = self._sessions[sid]
            s0 = 4 * ses.e0 * self.hop
            seg = ses.buf[s0 - ses.buf_start:s0 - ses.buf_start + self.S_win]
            wave[slot, :len(seg)] = seg
        if (self._resident is not None and self._resident[1] == sids
                and not self._host_states):
            # layout unchanged -> the last tick's output tree IS this
            # tick's input; it never left the device. (Pad rows beyond
            # len(group) carry evolved-from-template junk states, which is
            # fine: batch rows are independent and pad outputs/states are
            # never read.)
            states = self._resident[0]
        else:
            self._sync_host()
            rows = [self._sessions[sid].states for sid in sids]
            while len(rows) < self.B:
                rows.append(self._template)
            states = _tree_concat(rows)
        nv = None
        if self._rnnt:
            nv = np.zeros((self.B,), np.int32)
            for slot, (_sid, n) in enumerate(group):
                nv[slot] = n
        self._cond.release()
        try:
            if self._rnnt:
                (toks, tl), new_states = self._fn.call(self._params, wave,
                                                       nv, states)
                toks, tl = np.asarray(toks), np.asarray(tl)
            else:
                ids, new_states = self._fn.call(self._params, wave, states)
                ids = np.asarray(ids)
            host = None
            if self._host_states:
                import jax
                # one host copy per leaf per tick; the per-row slicing
                # below then costs nothing (np.asarray of a fetched jax
                # array re-copies the WHOLE leaf, so slicing rows before
                # this fetch paid B full-leaf transfers per leaf)
                host = jax.device_get(new_states)
        finally:
            self._cond.acquire()
        if self._host_states:
            self._resident = None
            for slot, sid in enumerate(sids):
                if sid in self._sessions:
                    self._sessions[sid].states = _tree_row(host, slot)
        else:
            self._resident = (new_states, sids)
        for slot, (sid, n_valid) in enumerate(group):
            ses = self._sessions.get(sid)
            if ses is None:                      # closed while we computed
                continue
            ses.e0 += n_valid
            keep = 4 * ses.e0 * self.hop
            if keep > ses.buf_start:
                ses.buf = ses.buf[keep - ses.buf_start:]
                ses.buf_start = keep
            if self._rnnt:
                final = [int(t) for t in toks[slot, :int(tl[slot])]]
                if self._beam:
                    ses.partial = final          # full best-so-far, replaces
                else:
                    ses.pending.extend(final)
                continue
            for t in ids[slot, :n_valid]:
                t = int(t)
                if t != ses.prev and t != self.blank_id:
                    ses.pending.append(t)
                ses.prev = t


def _tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _tree_copy(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_copy(v) for v in tree]
    return np.array(tree, copy=True)


def _tree_concat(rows):
    """Concatenate a list of one-row pytrees along the leading axis."""
    first = rows[0]
    if isinstance(first, dict):
        return {k: _tree_concat([r[k] for r in rows]) for k in first}
    if isinstance(first, list):
        return [_tree_concat([r[i] for r in rows]) for i in range(len(first))]
    return np.concatenate([np.asarray(r) for r in rows], axis=0)


def _tree_row(tree, i: int):
    """Slice row i of every leaf, keeping the leading dim (-> one-row tree)."""
    if isinstance(tree, dict):
        return {k: _tree_row(v, i) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_row(v, i) for v in tree]
    return np.asarray(tree)[i:i + 1]


def load_streaming_pool(artifact_dir: str | Path) -> StreamingSessionPool:
    return StreamingSessionPool(artifact_dir)


if __name__ == "__main__":  # smoke: python runtime.py <artifact_dir> <wav...>
    import sys
    m = load_serving_artifact(sys.argv[1])
    print(json.dumps({"buckets": m.buckets, "emit": list(m.emit),
                      "vocab_size": m.vocab_size}))
