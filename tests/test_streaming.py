"""Streaming encoder inference: SSD carried-state exactness, window-grid
alignment with the offline encoder, convergence to offline outputs as the
contexts grow, incremental CTC-greedy equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.models.streaming import (
    StreamingCTCGreedy, StreamingEncoder, subsampled_count,
)
from hnet_mamba_asr_tpu.ops.ssd import ssd_chunked, ssd_reference
from hnet_mamba_asr_tpu.tasks.asr_task import build_model


# ── SSD carried recurrence state (groundwork for exact-causal streaming) ─────
def _ssd_inputs(rng, B=2, L=48, H=3, P=8, N=6):
    x = rng.normal(size=(B, L, H, P)).astype(np.float32)
    dt = rng.uniform(0.01, 0.2, size=(B, L, H)).astype(np.float32)
    A = -rng.uniform(0.5, 4.0, size=(H,)).astype(np.float32)
    Bm = rng.normal(size=(B, L, 1, N)).astype(np.float32)
    C = rng.normal(size=(B, L, 1, N)).astype(np.float32)
    return x, dt, A, Bm, C


def test_ssd_state_carry_matches_full_sequence(rng):
    """Running [0, L1) then [L1, L) with the carried state must equal one full
    pass — for BOTH the sequential oracle and the chunked form."""
    x, dt, A, Bm, C = _ssd_inputs(rng)
    full = ssd_reference(x, dt, A, Bm, C)
    for fn, kw in ((ssd_reference, {}), (ssd_chunked, {"chunk_size": 16})):
        L1 = 20
        y1, S = fn(x[:, :L1], dt[:, :L1], A, Bm[:, :L1], C[:, :L1],
                   return_final=True, **kw)
        y2 = fn(x[:, L1:], dt[:, L1:], A, Bm[:, L1:], C[:, L1:],
                initial_state=S, **kw)
        y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
        np.testing.assert_allclose(y, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_ssd_chunked_final_state_matches_reference(rng):
    x, dt, A, Bm, C = _ssd_inputs(rng, L=37)
    _, S_ref = ssd_reference(x, dt, A, Bm, C, return_final=True)
    _, S_chk = ssd_chunked(x, dt, A, Bm, C, chunk_size=16, return_final=True)
    np.testing.assert_allclose(np.asarray(S_chk), np.asarray(S_ref),
                               rtol=2e-4, atol=2e-4)


# ── streaming encoder vs offline ──────────────────────────────────────────────
def _tiny_model(compression_n=1):
    cfg = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1, "n_main": 1,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "hnet": {"compression_N": compression_n}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    model = build_model(cfg, 12)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _offline(model, params, wave):
    batch = {"wave": wave[None], "wave_lens": np.array([len(wave)], np.int32)}
    enc = model.encode(params, batch, train=False)
    n = int(np.asarray(enc.lengths)[0])
    return np.asarray(enc.features)[0, :n]


def _stream_all(model, params, wave, **kw):
    se = StreamingEncoder(model, params, **kw)
    segs = []
    # feed in uneven blocks to exercise buffering
    rng = np.random.default_rng(0)
    i = 0
    while i < len(wave):
        n = int(rng.integers(800, 4000))
        segs += se.accept(wave[i:i + n])
        i += n
    tail = se.finish()
    if tail is not None:
        segs.append(tail)
    return np.concatenate(segs, axis=0) if segs else np.zeros((0,))


def test_stream_exact_when_window_covers_everything(rng):
    """With left_ctx >= the whole utterance and one final flush, every window
    sees the full history — outputs must match offline to numeric noise."""
    model, params = _tiny_model()
    wave = rng.normal(size=9600).astype(np.float32) * 0.1      # 0.6 s
    off = _offline(model, params, wave)
    st = _stream_all(model, params, wave, seg_frames=16, left_ctx=1024,
                     lookahead=64)
    assert st.shape == off.shape
    np.testing.assert_allclose(st, off, rtol=1e-4, atol=1e-4)


def test_stream_frame_count_matches_offline(rng):
    model, params = _tiny_model()
    for n in (6400, 9973, 16000):
        wave = rng.normal(size=n).astype(np.float32) * 0.1
        off = _offline(model, params, wave)
        st = _stream_all(model, params, wave, seg_frames=16, left_ctx=64,
                         lookahead=16)
        assert st.shape == off.shape, n


def test_stream_converges_with_context(rng):
    """Truncation error must shrink as (left_ctx, lookahead) grow."""
    model, params = _tiny_model()
    wave = rng.normal(size=24000).astype(np.float32) * 0.1     # 1.5 s
    off = _offline(model, params, wave)

    def err(left, la):
        st = _stream_all(model, params, wave, seg_frames=16, left_ctx=left,
                         lookahead=la)
        return float(np.abs(st - off).max())

    small = err(16, 8)
    big = err(512, 128)
    assert big <= small + 1e-6
    assert big < 0.15 * max(small, 1e-9) or big < 1e-3


def test_stream_n2_dynamic_chunking_runs(rng):
    """Streaming must also run over an ACTIVE H-Net chunker (approximate:
    boundary decisions near window edges may differ; shapes must align)."""
    model, params = _tiny_model(compression_n=2)
    wave = rng.normal(size=12000).astype(np.float32) * 0.1
    off = _offline(model, params, wave)
    st = _stream_all(model, params, wave, seg_frames=16, left_ctx=512,
                     lookahead=64)
    assert st.shape == off.shape
    np.testing.assert_allclose(st, off, rtol=1e-3, atol=1e-3)


def test_streaming_collapse_carry_across_segments():
    """The collapse state must carry across segment boundaries: a label
    spanning two segments stays ONE token; a blank between repeats splits."""
    from types import SimpleNamespace
    sc = StreamingCTCGreedy.__new__(StreamingCTCGreedy)
    sc.blank = 9
    sc._prev = sc.blank
    out = sc._collapse(np.array([9, 4, 4]))
    out += sc._collapse(np.array([4, 9, 4]))       # 4 continues, then restarts
    out += sc._collapse(np.array([5, 5, 9]))
    assert out == [4, 4, 5]


def test_streaming_ctc_greedy_matches_offline(rng):
    """With contexts covering the whole (short) utterance every window equals
    the offline computation — the incremental transcript must match exactly."""
    from hnet_mamba_asr_tpu.models.ctc_head import greedy_decode
    model, params = _tiny_model()
    wave = rng.normal(size=16000).astype(np.float32) * 0.3
    batch = {"wave": wave[None], "wave_lens": np.array([len(wave)], np.int32)}
    enc = model.encode(params, batch, train=False)
    frame_ids = model.ctc.apply({"params": params["ctc"]}, enc.features,
                                method="frame_argmax")
    off = greedy_decode(frame_ids, np.asarray(enc.lengths),
                        model.ctc.blank_id)[0]

    se = StreamingEncoder(model, params, seg_frames=16, left_ctx=1024,
                          lookahead=128)          # lookahead past EOF: exact
    sc = StreamingCTCGreedy(model, params, se)
    toks = []
    for i in range(0, len(wave), 3200):
        toks += sc.accept(wave[i:i + 3200])
    toks += sc.finish()
    assert toks == off


def test_causal_streaming_exact(rng):
    """bidirectional=false + carried per-layer states: streaming outputs must
    equal the offline encoder to numeric noise at ANY block size."""
    from hnet_mamba_asr_tpu.models.streaming import CausalStreamingEncoder
    model, params = _tiny_model()
    # rebuild causal
    cfg = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 2, "n_main": 2,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "bidirectional": False,
                         "hnet": {"compression_N": 1}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    model = build_model(cfg, 12)
    params = model.init_params(jax.random.PRNGKey(1))
    wave = rng.normal(size=19000).astype(np.float32) * 0.1
    off = _offline(model, params, wave)

    for block in (8, 16):
        cs = CausalStreamingEncoder(model, params, block_enc=block)
        segs = []
        i = 0
        r = np.random.default_rng(1)
        while i < len(wave):
            n = int(r.integers(700, 3500))
            segs += cs.accept(wave[i:i + n])
            i += n
        tail = cs.finish()
        if tail is not None:
            segs.append(tail)
        st = np.concatenate(segs, axis=0)
        assert st.shape == off.shape, block
        np.testing.assert_allclose(st, off, rtol=2e-4, atol=2e-4,
                                   err_msg=f"block={block}")


def test_causal_streaming_rejects_bidirectional(rng):
    from hnet_mamba_asr_tpu.models.streaming import CausalStreamingEncoder
    model, params = _tiny_model()                  # bidirectional default
    with pytest.raises(ValueError, match="bidirectional"):
        CausalStreamingEncoder(model, params)


def test_bad_frame_params_raise():
    model, params = _tiny_model()
    with pytest.raises(ValueError, match="multiple of 4"):
        StreamingEncoder(model, params, seg_frames=10)
    with pytest.raises(ValueError, match="multiple of 4"):
        StreamingEncoder(model, params, lookahead=2)


def _causal_chunked_model(rng, *, arch_type="A", N=2.0):
    cfg = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1, "n_main": 2,
                         "n_dec": 1, "n_mid": 1, "arch_type": arch_type,
                         "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                         "bidirectional": False,
                         "hnet": {"compression_N": N}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0,
                       "ratio_weight": 0.03},
    }
    model = build_model(cfg, 12)
    params = model.init_params(jax.random.PRNGKey(1))
    # randomize the router(s) away from the near-identity init so boundaries
    # actually fire AND actually skip (both branches of the carry machinery)
    enc_p = params["encoder"]
    for key in ("chunk", "chunk1", "chunk2"):
        if key in enc_p:
            for w in ("W_q", "W_k"):
                kern = enc_p[key]["router"][w]["kernel"]
                enc_p[key]["router"][w]["kernel"] = (
                    0.6 * np.asarray(kern)
                    + 0.6 * rng.normal(size=kern.shape).astype(np.float32))
    return model, params


@pytest.mark.parametrize("arch,N", [("A", 2.0), ("B", 4.0)])
def test_causal_streaming_exact_chunked(rng, arch, N):
    """Exact-causal streaming for ACTIVE dynamic chunking: Type A N=2 and
    Type B N=4 (nested sqrt-N stages) must match the offline encoder to the
    same 2e-4 bar as the N=1 case, at any block size, with carried router /
    EMA / compacted-stack states."""
    from hnet_mamba_asr_tpu.models.streaming import CausalStreamingEncoder

    model, params = _causal_chunked_model(rng, arch_type=arch, N=N)
    wave = rng.normal(size=19000).astype(np.float32) * 0.1

    # sanity: the router must produce a MIX of kept/skipped frames
    batch = {"wave": wave[None], "wave_lens": np.array([len(wave)], np.int32)}
    enc = model.encode(params, batch, train=False)
    kept = float(np.asarray(enc.kept_fractions[0]))
    assert 0.05 < kept < 0.95, f"degenerate routing (kept={kept}); " \
        "the test would not exercise the chunk carry"
    off = _offline(model, params, wave)

    for block in (8, 16, 32):
        cs = CausalStreamingEncoder(model, params, block_enc=block)
        segs = []
        i = 0
        r = np.random.default_rng(2)
        while i < len(wave):
            n = int(r.integers(700, 3500))
            segs += cs.accept(wave[i:i + n])
            i += n
        tail = cs.finish()
        if tail is not None:
            segs.append(tail)
        st = np.concatenate(segs, axis=0)
        assert st.shape == off.shape, block
        np.testing.assert_allclose(st, off, rtol=2e-4, atol=2e-4,
                                   err_msg=f"arch={arch} N={N} block={block}")


def test_causal_streaming_rejects_fixed_pool_chunked(rng):
    from hnet_mamba_asr_tpu.models.streaming import CausalStreamingEncoder

    cfg = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1, "n_main": 1,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "bidirectional": False,
                         "hnet": {"compression_N": 4.0, "chunker": "fixed"}},
        "model_conf": {"ctc_weight": 1.0, "aed_weight": 0.0},
    }
    model = build_model(cfg, 12)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="dynamic"):
        CausalStreamingEncoder(model, params)
