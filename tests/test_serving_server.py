"""Micro-batching serving server (serving/server.py): batched results are
identical to direct ServingModel calls, concurrent requests coalesce into
one program call, text decoding rides the manifest-embedded tokenizer, and
the HTTP surface round-trips over a real socket."""
import io
import json
import threading
import urllib.error
import urllib.request
import wave as wave_mod
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pytest

import jax  # noqa: E402  (conftest pins the cpu platform)

VOCAB = 30


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.serving import save_serving_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    td = tmp_path_factory.mktemp("srv")
    tok = Tokenizer.train(["the cat sat", "a dog ran", "cats and dogs"],
                          td / "tok", vocab_size=VOCAB,
                          hard_vocab_limit=False)
    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    art = td / "artifact"
    save_serving_artifact(art, model, params, buckets=[(4, 4000)],
                          emit=("frame_ids",), tokenizer=tok)
    return art, tok


def _wave(S=3200, seed=0):
    return (np.random.default_rng(seed).normal(size=S) * 0.1).astype(np.float32)


def test_manifest_embeds_tokenizer(artifact):
    art, tok = artifact
    man = json.loads((art / "manifest.json").read_text())
    assert man["tokenizer"]["pieces"] == list(tok.pieces)
    assert set(man["tokenizer"]["drop_ids"]) == {tok.bos_id, tok.eos_id,
                                                 tok.pad_id}


def test_transcribe_text_matches_tokenizer_decode(artifact):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    art, tok = artifact
    sm = load_serving_artifact(art)
    wave = np.stack([_wave(seed=1), _wave(seed=2)])
    lens = np.array([3200, 2500], np.int32)
    ids = sm.transcribe_ids(wave, lens)
    text = sm.transcribe_text(wave, lens)
    assert text == [tok.decode(r) for r in ids]


def test_batcher_matches_direct_calls(artifact):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    from hnet_mamba_asr_tpu.serving.server import MicroBatcher
    art, tok = artifact
    sm = load_serving_artifact(art)
    b = MicroBatcher(sm, max_wait_ms=50)
    waves = [_wave(3200 - 173 * i, seed=i) for i in range(6)]
    try:
        futs = [b.submit(w) for w in waves]
        got = [f.result(timeout=60) for f in futs]
    finally:
        b.close()
    for w, r in zip(waves, got):
        direct = sm.transcribe_ids(w[None, :], np.array([len(w)], np.int32))[0]
        assert r["ids"] == direct
        assert r["text"] == tok.decode(direct)
    st = b.stats()
    assert st["requests"] == 6
    # 6 requests into a max-batch-4 bucket: at most 3 program calls, and at
    # least one batch must have coalesced more than one request
    assert st["batches"] <= 3 and st["mean_batch_occupancy"] > 1.0


def test_batcher_rejects_oversized(artifact):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    from hnet_mamba_asr_tpu.serving.server import MicroBatcher
    sm = load_serving_artifact(artifact[0])
    b = MicroBatcher(sm)
    try:
        with pytest.raises(ValueError, match="exceeds the largest"):
            b.submit(np.zeros(5000, np.float32))
    finally:
        b.close()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_http_roundtrip(artifact):
    from hnet_mamba_asr_tpu.serving import load_serving_artifact
    from hnet_mamba_asr_tpu.serving.server import make_server
    art, tok = artifact
    sm = load_serving_artifact(art)
    httpd, batcher = make_server(art, port=0, max_wait_ms=5)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(base + "/v1/health", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["buckets"] == [[4, 4000]]

        w = _wave(seed=3)
        # raw float32 PCM
        res = _post(base + "/v1/transcribe", w.tobytes(),
                    "application/octet-stream")
        direct = sm.transcribe_ids(w[None, :], np.array([len(w)], np.int32))[0]
        assert res["ids"] == direct and res["text"] == tok.decode(direct)

        # WAV PCM16 (quantized to int16 — transcribe the quantized wave
        # directly for the parity check)
        pcm = np.clip(w * 32768.0, -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(16000)
            wv.writeframes(pcm.tobytes())
        res2 = _post(base + "/v1/transcribe", buf.getvalue(), "audio/wav")
        wq = (pcm.astype(np.float32) / 32768.0)
        direct2 = sm.transcribe_ids(wq[None, :],
                                    np.array([len(wq)], np.int32))[0]
        assert res2["ids"] == direct2

        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["requests"] >= 2 and st["latency_ms_p50"] is not None
    finally:
        httpd.shutdown()
        batcher.close()


def test_http_bad_requests(artifact):
    from hnet_mamba_asr_tpu.serving.server import make_server
    httpd, batcher = make_server(artifact[0], port=0, max_wait_ms=5)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/transcribe", b"abc",
                  "application/octet-stream")      # not a multiple of 4
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/nope", b"", "application/octet-stream")
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        batcher.close()


# ── multi-session streaming pool ─────────────────────────────────────────────

@pytest.fixture(scope="module")
def pool_artifact(tmp_path_factory):
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.serving import save_streaming_artifact
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    td = tmp_path_factory.mktemp("pool")
    tok = Tokenizer.train(["streaming pools serve many"], td / "tok",
                          vocab_size=30, hard_vocab_limit=False)
    cfg = _small_config(tiny=True)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    art = td / "stream3"
    save_streaming_artifact(art, model, params, block_enc=8, batch=3,
                            tokenizer=tok)
    return model, params, art, tok


def _offline_greedy(model, params, wave):
    return model.greedy_decode(
        params, {"wave": wave[None],
                 "wave_lens": np.array([len(wave)], np.int32)})[0]


def test_pool_single_session_matches_offline(pool_artifact):
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    model, params, art, tok = pool_artifact
    pool = StreamingSessionPool(art)
    assert pool.B == 3
    wave = _wave(12000, seed=7)
    sid = pool.open()
    toks, i = [], 0
    for sz in (700, 2500, 4000, 1800):
        toks += pool.feed(sid, wave[i:i + sz]); i += sz
    toks += pool.feed(sid, wave[i:])
    toks += pool.finish(sid)
    assert toks == _offline_greedy(model, params, wave)
    assert pool.active == 0


def test_pool_concurrent_sessions_are_independent(pool_artifact):
    """Interleaved sessions (different lengths and block schedules) each
    produce exactly their solo offline transcript — pooled rows never
    interact."""
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    model, params, art, tok = pool_artifact
    pool = StreamingSessionPool(art)
    waves = [_wave(9000 + 1700 * k, seed=10 + k) for k in range(4)]  # > B
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    # ragged interleaving: session k feeds chunks of distinct sizes
    pos = [0] * len(waves)
    sizes = [900, 1400, 2100, 650]
    while any(pos[k] < len(waves[k]) for k in range(len(waves))):
        for k, sid in enumerate(sids):
            if pos[k] < len(waves[k]):
                nxt = waves[k][pos[k]:pos[k] + sizes[k]]
                pos[k] += sizes[k]
                got[sid] += pool.feed(sid, nxt)
    for k, sid in enumerate(sids):
        got[sid] += pool.finish(sid)
        assert got[sid] == _offline_greedy(model, params, waves[k]), k


def test_pool_guards(pool_artifact):
    from hnet_mamba_asr_tpu.serving.runtime import (StreamingServingModel,
                                                    StreamingSessionPool)
    model, params, art, tok = pool_artifact
    with pytest.raises(ValueError, match="StreamingSessionPool"):
        StreamingServingModel(art)               # single-session loader
    pool = StreamingSessionPool(art)
    sid = pool.open()
    pool.finish(sid)
    with pytest.raises(KeyError):
        pool.feed(sid, np.zeros(100, np.float32))


def test_pool_feed_many_lockstep_exact_and_batched(pool_artifact):
    """feed_many deposits a whole round then drains once: transcripts are
    exactly the solo offline decodes AND the rounds share full-B program
    calls (n_ticks ~ rounds, not sessions x rounds) with a stable slot
    layout (the device-resident state path)."""
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    model, params, art, tok = pool_artifact
    pool = StreamingSessionPool(art)
    waves = [_wave(11000 + 900 * k, seed=20 + k) for k in range(3)]
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    chunk = 2000
    pos = 0
    while any(pos < len(w) for w in waves):
        items = [(sid, waves[k][pos:pos + chunk])
                 for k, sid in enumerate(sids) if pos < len(waves[k])]
        for sid, toks in pool.feed_many(items).items():
            got[sid] += toks
        pos += chunk
    n_rounds_ticks = pool.n_ticks
    for k, sid in enumerate(sids):
        got[sid] += pool.finish(sid)
        assert got[sid] == _offline_greedy(model, params, waves[k]), k
    # every mid-stream tick carried all 3 ready sessions: had they ticked
    # one-by-one the count would be ~3x
    n_rounds = (max(len(w) for w in waves) + chunk - 1) // chunk
    assert n_rounds_ticks <= n_rounds + 2, (n_rounds_ticks, n_rounds)


def test_pool_concurrent_thread_feeds_exact(pool_artifact):
    """Continuous batching under real concurrency: client threads calling
    feed() in parallel (the HTTP server's traffic shape) still produce
    exactly the solo offline transcripts — deposits made while the
    single-flight drainer holds the device call are picked up by its next
    scan, and scatter survives arbitrary interleavings."""
    import threading as th

    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    model, params, art, tok = pool_artifact
    pool = StreamingSessionPool(art)
    waves = [_wave(9000 + 1300 * k, seed=30 + k) for k in range(4)]  # > B
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    errs = []

    def client(k, sid, sz):
        try:
            p = 0
            while p < len(waves[k]):
                got[sid] += pool.feed(sid, waves[k][p:p + sz])
                p += sz
            got[sid] += pool.finish(sid)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ths = [th.Thread(target=client, args=(k, sid, 800 + 450 * k))
           for k, sid in enumerate(sids)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs
    for k, sid in enumerate(sids):
        assert got[sid] == _offline_greedy(model, params, waves[k]), k
    assert pool.active == 0


def test_pool_concurrent_feeds_coalesce_when_call_yields(pool_artifact):
    """The continuous-batching mechanism itself: when the in-flight device
    call yields to other threads (standard PJRT backends release the GIL;
    emulated here by wrapping _fn.call with a sleep), deposits made during
    a tick are batched by the drainer's next scan — total program calls
    land well under one-per-feed. (Through the axon HTTP relay the call
    does NOT yield, so the threaded arm of bench_streaming_pool measures
    one tick per feed; this test pins the logic independent of backend.)"""
    import threading as th
    import time as _time

    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    model, params, art, tok = pool_artifact
    pool = StreamingSessionPool(art)
    real_fn = pool._fn

    class SlowFn:
        def call(self, *a):
            out = real_fn.call(*a)
            _time.sleep(0.05)       # models a long device call that yields
            return out
    pool._fn = SlowFn()
    waves = [_wave(16000, seed=40 + k) for k in range(3)]
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    errs = []

    def client(k, sid):
        try:
            p, sz = 0, 2000
            while p < len(waves[k]):
                got[sid] += pool.feed(sid, waves[k][p:p + sz])
                p += sz
            got[sid] += pool.finish(sid)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ths = [th.Thread(target=client, args=(k, sid))
           for k, sid in enumerate(sids)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs
    for k, sid in enumerate(sids):
        assert got[sid] == _offline_greedy(model, params, waves[k]), k
    # singleton baseline: the same feed schedule driven serially ticks each
    # ready session alone — the threaded run must beat it by coalescing
    # (not a strict equality bound: scheduler noise decides HOW MUCH
    # overlap happens, but with 50 ms yielding calls some must)
    serial = StreamingSessionPool(art)
    ssids = [serial.open() for _ in waves]
    for k, sid in enumerate(ssids):
        p = 0
        while p < len(waves[k]):
            serial.feed(sid, waves[k][p:p + 2000])
            p += 2000
        serial.finish(sid)
    assert pool.n_ticks < serial.n_ticks, (pool.n_ticks, serial.n_ticks)


def test_pool_chunked_n2_sessions_match_offline(tmp_path):
    """Pooled multi-session streaming for a DYNAMIC-CHUNKING config (N=2):
    the step's router/compaction/EMA/state-no-op machinery is per-row exact
    (models/streaming vectorizes kept counts over the batch), so ragged
    interleaved sessions each reproduce their solo offline transcript."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import save_streaming_artifact
    from hnet_mamba_asr_tpu.serving.runtime import StreamingSessionPool
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["encoder_conf"] = dict(cfg["encoder_conf"], bidirectional=False,
                               hnet={"compression_N": 2})
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, 30)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "stream_n2_pool"
    save_streaming_artifact(art, model, params, block_enc=8, batch=2)
    pool = StreamingSessionPool(art)
    waves = [_wave(9000, seed=21), _wave(12000, seed=22)]
    sids = [pool.open() for _ in waves]
    got = {s: [] for s in sids}
    pos = [0, 0]
    sizes = [1100, 1900]
    while any(pos[k] < len(waves[k]) for k in range(2)):
        for k, sid in enumerate(sids):
            if pos[k] < len(waves[k]):
                got[sid] += pool.feed(sid, waves[k][pos[k]:pos[k] + sizes[k]])
                pos[k] += sizes[k]
    for k, sid in enumerate(sids):
        got[sid] += pool.finish(sid)
        assert got[sid] == _offline_greedy(model, params, waves[k]), k


def test_streaming_http_server(pool_artifact):
    from hnet_mamba_asr_tpu.serving.server import make_server
    model, params, art, tok = pool_artifact
    httpd, pool = make_server(art, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(base + "/v1/health", timeout=30) as r:
            h = json.loads(r.read())
        assert h["kind"] == "streaming" and h["batch"] == 3
        sid = _post(base + "/v1/stream/open", b"",
                    "application/octet-stream")["sid"]
        wave = _wave(11000, seed=21)
        ids = []
        for i in range(0, len(wave), 3000):
            res = _post(base + f"/v1/stream/{sid}",
                        wave[i:i + 3000].tobytes(),
                        "application/octet-stream")
            ids += res["ids"]
        fin = _post(base + f"/v1/stream/{sid}/finish", b"",
                    "application/octet-stream")
        ids += fin["ids"]
        assert ids == _offline_greedy(model, params, wave)
    finally:
        httpd.shutdown()


def test_server_file_is_standalone(artifact, tmp_path):
    """server.py + runtime.py copied next to the artifact serve without the
    repo on sys.path (the deployment story, same bar as runtime.py)."""
    import shutil
    import subprocess
    import sys
    REPO = Path(__file__).resolve().parent.parent
    art, tok = artifact
    shutil.copy(REPO / "hnet_mamba_asr_tpu" / "serving" / "runtime.py",
                tmp_path / "runtime.py")
    shutil.copy(REPO / "hnet_mamba_asr_tpu" / "serving" / "server.py",
                tmp_path / "server.py")
    drive = tmp_path / "drive.py"
    drive.write_text(f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, {str(tmp_path)!r})
import numpy as np
from server import MicroBatcher
from runtime import load_serving_artifact
sm = load_serving_artifact({str(art)!r})
b = MicroBatcher(sm, max_wait_ms=5)
w = (np.random.default_rng(5).normal(size=3000) * 0.1).astype(np.float32)
res = b.submit(w).result(timeout=120)
b.close()
direct = sm.transcribe_ids(w[None, :], np.array([3000], np.int32))[0]
assert res["ids"] == direct, (res["ids"], direct)
assert isinstance(res.get("text", ""), str)
print("STANDALONE-SERVER-OK")
""")
    env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "HOME": str(tmp_path)}
    r = subprocess.run([sys.executable, "drive.py"], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=600)
    assert "STANDALONE-SERVER-OK" in r.stdout, r.stdout + r.stderr


def test_batcher_serves_beam_ids(tmp_path):
    """A beam_ids artifact through the micro-batcher: per-row ids come from
    the exported prefix beam and match the runtime's transcribe_ids."""
    from __graft_entry__ import _small_config
    from hnet_mamba_asr_tpu.serving import (
        load_serving_artifact, save_serving_artifact,
    )
    from hnet_mamba_asr_tpu.serving.server import MicroBatcher
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = _small_config(tiny=True)
    cfg["model_conf"] = {"ctc_weight": 1.0, "aed_weight": 0.0}
    cfg["train"] = {"precision": "fp32"}
    model = build_model(cfg, VOCAB)
    params = model.init_params(jax.random.PRNGKey(0))
    art = tmp_path / "beam_art"
    save_serving_artifact(art, model, params, buckets=[(2, 4000)],
                          emit=("beam_ids",), beam_size=4, pre_beam=8)
    sm = load_serving_artifact(art)
    b = MicroBatcher(sm, max_wait_ms=20)
    w = _wave(3200)
    try:
        got = b.submit(w).result(timeout=120)
    finally:
        b.close()
    direct = sm.transcribe_ids(w[None, :], np.array([len(w)], np.int32))[0]
    assert got["ids"] == direct
