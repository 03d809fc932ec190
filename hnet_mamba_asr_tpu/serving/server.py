"""Micro-batching ASR serving server over an exported artifact.

Production serving shape for the TPU artifacts (serving/export.py): many
concurrent client requests, one accelerator that is only efficient when
batched. A background worker coalesces requests that arrive within a short
window into ONE padded batch per exported shape bucket (the TPU program is
AOT-traced per bucket, so batching costs nothing extra), runs the model, and
fans results back out. The reference has no serving path at all; this is the
deployment tier above the one-file runtime.

Like runtime.py, this file is SELF-CONTAINED (stdlib + numpy + the sibling
runtime.py): copy both next to the artifact directory and run

    python server.py <artifact_dir> --port 8000

HTTP surface (JSON responses):
    POST /v1/transcribe   body = WAV (PCM16 mono) or raw float32 PCM
                          (Content-Type: application/octet-stream);
                          -> {"ids": [...], "text": "...", "enc_frames": N}
                          (text only when the manifest embeds a tokenizer)
    GET  /v1/health       -> {"status": "ok", buckets, emit, pending}
    GET  /v1/stats        -> request/batch counters, mean batch occupancy,
                             p50/p95 end-to-end latency ms

Tested in-process (tests/test_serving_server.py): batched transcripts are
identical to direct ServingModel calls, concurrent requests coalesce, and
the HTTP round-trip works over a real socket.
"""
from __future__ import annotations

import io
import json
import threading
import time
import wave as wave_mod
from collections import deque
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

try:                                    # installed package
    from hnet_mamba_asr_tpu.serving.runtime import (detokenize,
                                                    load_serving_artifact)
except ImportError:                     # copied next to runtime.py
    from runtime import detokenize, load_serving_artifact  # type: ignore


def decode_audio(body: bytes, content_type: str) -> np.ndarray:
    """Request body -> float32 waveform in [-1, 1]. WAV must be PCM16 mono."""
    if content_type.startswith("application/octet-stream"):
        if len(body) % 4:
            raise ValueError("raw PCM body length must be a multiple of 4 "
                             "(little-endian float32)")
        return np.frombuffer(body, "<f4").astype(np.float32)
    with wave_mod.open(io.BytesIO(body)) as w:
        if w.getcomptype() != "NONE" or w.getsampwidth() != 2:
            raise ValueError("WAV must be uncompressed PCM16")
        n, ch = w.getnframes(), w.getnchannels()
        pcm = np.frombuffer(w.readframes(n), "<i2").astype(np.float32)
        if ch > 1:                       # downmix — serving is mono
            pcm = pcm.reshape(-1, ch).mean(axis=1)
        return pcm / 32768.0


class MicroBatcher:
    """Coalesce concurrent requests into padded batches for the model.

    Requests that arrive within ``max_wait_ms`` of the first pending one (or
    until ``max_batch`` is reached) run as ONE program call. Each submit
    returns a Future resolving to the per-utterance result dict.
    """

    def __init__(self, model, max_batch: int | None = None,
                 max_wait_ms: float = 20.0):
        self.model = model
        self.max_batch = int(max_batch or max(b for b, _ in model.buckets))
        self.max_samples = max(s for _, s in model.buckets)
        self.max_wait = max_wait_ms / 1e3
        self._q: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self.n_requests = 0
        self.n_batches = 0
        self.occupancy_sum = 0
        self._lat = deque(maxlen=1024)          # end-to-end seconds
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ----------------------------------------------------------
    def submit(self, wave: np.ndarray) -> Future:
        wave = np.asarray(wave, np.float32).reshape(-1)
        if wave.shape[0] > self.max_samples:
            raise ValueError(
                f"utterance of {wave.shape[0]} samples exceeds the largest "
                f"exported bucket ({self.max_samples}); chunk upstream or "
                "use a streaming artifact")
        fut: Future = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._q.append((wave, fut, time.perf_counter()))
            self._cv.notify()
        return fut

    @property
    def pending(self) -> int:
        with self._cv:
            return len(self._q)

    def stats(self) -> dict:
        with self._cv:
            lat = sorted(self._lat)
        pct = lambda p: (lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3  # noqa: E731
                         if lat else None)
        return {
            "requests": self.n_requests, "batches": self.n_batches,
            "mean_batch_occupancy": (self.occupancy_sum / self.n_batches
                                     if self.n_batches else None),
            "latency_ms_p50": pct(0.50), "latency_ms_p95": pct(0.95),
        }

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=5)

    # -- worker side ----------------------------------------------------------
    def _take_batch(self) -> list | None:
        with self._cv:
            while not self._q and not self._closed:
                self._cv.wait()
            if not self._q:
                return None                      # closed and drained
            deadline = time.perf_counter() + self.max_wait
            while (len(self._q) < self.max_batch and not self._closed):
                left = deadline - time.perf_counter()
                if left <= 0 or not self._cv.wait(timeout=left):
                    break
            n = min(len(self._q), self.max_batch)
            return [self._q.popleft() for _ in range(n)]

    def _run(self):
        while True:
            items = self._take_batch()
            if items is None:
                return
            waves = [w for w, _, _ in items]
            lens = np.asarray([w.shape[0] for w in waves], np.int32)
            batch = np.zeros((len(waves), int(lens.max())), np.float32)
            for i, w in enumerate(waves):
                batch[i, :w.shape[0]] = w
            try:
                out = self.model(batch, lens)
                results = self._per_row(out, len(waves))
            except Exception as e:               # resolve, don't kill worker
                for _, fut, _ in items:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            now = time.perf_counter()
            with self._cv:
                self.n_requests += len(items)
                self.n_batches += 1
                self.occupancy_sum += len(items)
                for _, _, t0 in items:
                    self._lat.append(now - t0)
            for (_, fut, _), res in zip(items, results):
                if not fut.cancelled():
                    fut.set_result(res)

    def _per_row(self, out: dict, n: int) -> list[dict]:
        tok = self.model.manifest.get("tokenizer")
        rows = []
        if "frame_ids" in out:
            from_ids = _collapse_rows(out["frame_ids"], out["enc_lengths"],
                                      self.model.blank_id)
        for i in range(n):
            r: dict = {"enc_frames": int(out["enc_lengths"][i])}
            if "beam_ids" in out:         # exported prefix beam beats greedy
                r["ids"] = [int(t) for t in
                            out["beam_ids"][i][:int(out["beam_lens"][i])]]
            elif "frame_ids" in out:
                r["ids"] = from_ids[i]
            elif "rnnt_beam_ids" in out:  # transducer beam beats greedy
                r["ids"] = [int(t) for t in
                            out["rnnt_beam_ids"][i]
                            [:int(out["rnnt_beam_lens"][i])]]
            elif "rnnt_ids" in out:       # transducer greedy
                r["ids"] = [int(t) for t in
                            out["rnnt_ids"][i][:int(out["rnnt_lens"][i])]]
            elif "aed_ids" in out:
                row = [int(t) for t in out["aed_ids"][i]]
                eos = self.model.manifest.get("eos_id", 2) or 2
                r["ids"] = row[:row.index(eos)] if eos in row else row
            if tok is not None and "ids" in r:
                r["text"] = detokenize(tok, r["ids"])
            rows.append(r)
        return rows


def _collapse_rows(frame_ids, enc_lengths, blank_id) -> list[list[int]]:
    out = []
    for row, n in zip(np.asarray(frame_ids), np.asarray(enc_lengths)):
        ids, prev = [], -1
        for t in row[:int(n)]:
            t = int(t)
            if t != prev and t != blank_id:
                ids.append(t)
            prev = t
        out.append(ids)
    return out


def make_streaming_server(artifact_dir: str | Path, host: str = "127.0.0.1",
                          port: int = 0):
    """HTTP front for a multi-session streaming artifact (kind=streaming).

    POST /v1/stream/open            -> {"sid": n}
    POST /v1/stream/<sid>           body = audio chunk -> {"ids", "text"}
    POST /v1/stream/<sid>/finish    -> tail {"ids", "text"}; frees the slot
    GET  /v1/stream/<sid>/partial   -> beam artifacts: running best so far
    GET  /v1/health                 -> kind/batch/active sessions

    Beam artifacts ("decode": "beam"): feeds return empty ids (the beam may
    rewrite earlier output); poll /partial for the running best; finish
    returns the final transcript.

    Up to manifest ``streaming.batch`` concurrent sessions advance in ONE
    program call per tick (runtime.StreamingSessionPool).
    """
    try:
        from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    except ImportError:
        from runtime import StreamingSessionPool  # type: ignore
    pool = StreamingSessionPool(artifact_dir)
    tok = pool.manifest.get("tokenizer")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if self.path == "/v1/health":
                self._json(200, {"status": "ok", "kind": "streaming",
                                 "batch": pool.B, "active": pool.active})
            elif (len(parts) == 4 and parts[:2] == ["v1", "stream"]
                    and parts[3] == "partial"):
                try:
                    ids = pool.partial(int(parts[2]))
                    res = {"ids": ids}
                    if tok is not None:
                        res["text"] = detokenize(tok, ids)
                    self._json(200, res)
                except (ValueError, KeyError) as e:
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            parts = self.path.strip("/").split("/")
            try:
                if parts == ["v1", "stream", "open"]:
                    self._json(200, {"sid": pool.open()})
                    return
                if len(parts) >= 3 and parts[:2] == ["v1", "stream"]:
                    sid = int(parts[2])
                    if len(parts) == 4 and parts[3] == "finish":
                        ids = pool.finish(sid)
                    else:
                        n = int(self.headers.get("Content-Length", 0))
                        wave = decode_audio(
                            self.rfile.read(n),
                            self.headers.get("Content-Type", ""))
                        ids = pool.feed(sid, wave)
                    res = {"ids": ids}
                    if tok is not None:
                        res["text"] = detokenize(tok, ids)
                    self._json(200, res)
                    return
                self._json(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError) as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.pool = pool
    return httpd, pool


def make_server(artifact_dir: str | Path, host: str = "127.0.0.1",
                port: int = 0, max_wait_ms: float = 20.0,
                max_batch: int | None = None):
    """Build (ThreadingHTTPServer, MicroBatcher); caller runs serve_forever.

    port=0 binds an ephemeral port (tests); the bound port is
    ``server.server_address[1]``. Streaming artifacts (kind=streaming)
    route to ``make_streaming_server`` automatically.
    """
    manifest = json.loads((Path(artifact_dir) / "manifest.json").read_text())
    if manifest.get("kind") == "streaming":
        return make_streaming_server(artifact_dir, host, port)
    model = load_serving_artifact(artifact_dir)
    batcher = MicroBatcher(model, max_batch=max_batch,
                           max_wait_ms=max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):               # quiet; stats endpoint instead
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/health":
                self._json(200, {"status": "ok",
                                 "buckets": model.buckets,
                                 "emit": list(model.emit),
                                 "pending": batcher.pending})
            elif self.path == "/v1/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/v1/transcribe":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                wave = decode_audio(self.rfile.read(n),
                                    self.headers.get("Content-Type", ""))
                res = batcher.submit(wave).result(timeout=120)
                self._json(200, res)
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface, don't crash
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.batcher = batcher                      # for tests / shutdown hooks
    return httpd, batcher


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("artifact_dir")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--max-batch", type=int, default=None)
    args = ap.parse_args(argv)
    httpd, ctl = make_server(args.artifact_dir, args.host, args.port,
                             args.max_wait_ms, args.max_batch)
    if isinstance(ctl, MicroBatcher):
        print(f"serving {args.artifact_dir} on {httpd.server_address} "
              f"(buckets {ctl.model.buckets}, emit {ctl.model.emit})",
              flush=True)
    else:
        print(f"serving STREAMING {args.artifact_dir} on "
              f"{httpd.server_address} (pool batch {ctl.B})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        if isinstance(ctl, MicroBatcher):
            ctl.close()


if __name__ == "__main__":
    main()
