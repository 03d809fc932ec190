"""ctypes loader for the native host-runtime library (native/hmasr_native.cpp).

Load order: prebuilt ``native/libhmasr_native.so`` -> on-demand g++ build into
``~/.cache/hmasr_native`` -> None (callers fall back to their pure-Python
paths). Every exported symbol gets a thin numpy wrapper here; call sites only
ever check ``if native.lib is not None``.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "hmasr_native.cpp"
_PREBUILT = _SRC.parent / "libhmasr_native.so"

_I64 = ctypes.POINTER(ctypes.c_int64)
_I32 = ctypes.POINTER(ctypes.c_int32)
_U8 = ctypes.POINTER(ctypes.c_uint8)
_F64 = ctypes.POINTER(ctypes.c_double)


def _try_load(path: Path):
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.hmasr_edit_distance.restype = ctypes.c_int64
    lib.hmasr_edit_distance.argtypes = [_I64, ctypes.c_int64, _I64, ctypes.c_int64]
    lib.hmasr_levenshtein_counts.restype = None
    lib.hmasr_levenshtein_counts.argtypes = [_I64, ctypes.c_int64, _I64,
                                             ctypes.c_int64, _I64]
    lib.hmasr_resample_poly.restype = None
    lib.hmasr_resample_poly.argtypes = [_F64, ctypes.c_int64, _F64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, _F64, ctypes.c_int64]
    try:
        lib.hmasr_bpe_segment.restype = ctypes.c_int64
        lib.hmasr_bpe_segment.argtypes = [_I64, ctypes.c_int64, _I64, _I64,
                                          _I64, ctypes.c_int64,
                                          ctypes.c_int64, _I64]
        lib.hmasr_flac_decode.restype = ctypes.c_int64
        lib.hmasr_flac_decode.argtypes = [_U8, ctypes.c_int64, _I32,
                                          ctypes.c_int64, _I64]
        lib.hmasr_bpe_train.restype = ctypes.c_int64
        lib.hmasr_bpe_train.argtypes = [_I64, _I64, _I64, ctypes.c_int64,
                                        _U8, _I64, ctypes.c_int64,
                                        ctypes.c_int64, _I64]
        lib.hmasr_ctc_prefix_score.restype = None
        lib.hmasr_ctc_prefix_score.argtypes = [
            _F64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _F64, _I64,
            ctypes.c_int64, _F64, _F64]
    except AttributeError:                      # stale prebuilt .so
        return None
    return lib


def _build_on_demand() -> Path | None:
    if not _SRC.exists():
        return None
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    cache = Path(os.environ.get("HMASR_NATIVE_CACHE",
                                Path.home() / ".cache" / "hmasr_native"))
    out = cache / f"libhmasr_native-{digest}.so"
    if out.exists():
        return out
    cache.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                        "-o", str(tmp), str(_SRC)],
                       check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        logger.info("built native library -> %s", out)
        return out
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("native build failed (%s); using pure-Python fallbacks", e)
        return None


def _load():
    if _PREBUILT.exists():
        lib = _try_load(_PREBUILT)
        if lib is not None:
            return lib
    built = _build_on_demand()
    return _try_load(built) if built is not None else None


lib = _load()


def _as_i64(seq) -> np.ndarray:
    return np.ascontiguousarray(seq, dtype=np.int64)


def edit_distance(a, b) -> int:
    """Native Levenshtein distance over int64 codes (lib must be loaded)."""
    a, b = _as_i64(a), _as_i64(b)
    return int(lib.hmasr_edit_distance(a.ctypes.data_as(_I64), len(a),
                                       b.ctypes.data_as(_I64), len(b)))


def levenshtein_counts(ref, hyp) -> tuple[int, int, int, int]:
    """Native (sub, del, ins, cor) with the canonical backtrace order."""
    ref, hyp = _as_i64(ref), _as_i64(hyp)
    out = np.zeros(4, dtype=np.int64)
    lib.hmasr_levenshtein_counts(ref.ctypes.data_as(_I64), len(ref),
                                 hyp.ctypes.data_as(_I64), len(hyp),
                                 out.ctypes.data_as(_I64))
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])


def bpe_segment(syms: np.ndarray, keys: np.ndarray, ranks: np.ndarray,
                merged: np.ndarray, mult: int) -> np.ndarray:
    """Greedy BPE merge of one word's extended-symbol ids (lib required)."""
    syms = _as_i64(syms)
    out = np.empty(len(syms), dtype=np.int64)
    n = lib.hmasr_bpe_segment(syms.ctypes.data_as(_I64), len(syms),
                              keys.ctypes.data_as(_I64),
                              ranks.ctypes.data_as(_I64),
                              merged.ctypes.data_as(_I64), len(keys),
                              mult, out.ctypes.data_as(_I64))
    return out[:n]


def ctc_prefix_score(logp: np.ndarray, blank: int, eos: int, last: int,
                     out_len: int, r_prev: np.ndarray, cand: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Native CTC prefix scoring -> (log_psi [C], r_new [C, T, 2]); arithmetic
    matches numpy.logaddexp (lib must be loaded)."""
    T, W = logp.shape
    cand = _as_i64(cand)
    C = len(cand)
    log_psi = np.empty(C, dtype=np.float64)
    r_new = np.empty((C, T, 2), dtype=np.float64)
    lib.hmasr_ctc_prefix_score(
        logp.ctypes.data_as(_F64), T, W, blank, eos, last, out_len,
        np.ascontiguousarray(r_prev, dtype=np.float64).ctypes.data_as(_F64),
        cand.ctypes.data_as(_I64), C,
        log_psi.ctypes.data_as(_F64), r_new.ctypes.data_as(_F64))
    return log_psi, r_new


def bpe_train(syms_flat: np.ndarray, offsets: np.ndarray, freqs: np.ndarray,
              alphabet: list[str], budget: int) -> np.ndarray:
    """Native greedy BPE training -> merge id pairs [n_merges, 2] (ids >=
    len(alphabet) are earlier merge results, in rank order)."""
    syms_flat = _as_i64(syms_flat)
    offsets = _as_i64(offsets)
    freqs = _as_i64(freqs)
    enc = [a.encode("utf-8") for a in alphabet]
    alpha_buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    alpha_off = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in enc], out=alpha_off[1:])
    out = np.empty((max(budget, 1), 2), dtype=np.int64)
    n = lib.hmasr_bpe_train(
        syms_flat.ctypes.data_as(_I64), offsets.ctypes.data_as(_I64),
        freqs.ctypes.data_as(_I64), len(freqs),
        alpha_buf.ctypes.data_as(_U8), alpha_off.ctypes.data_as(_I64),
        len(enc), budget, out.ctypes.data_as(_I64))
    return out[:n]


def flac_decode(data: bytes) -> tuple[np.ndarray, int, int] | None:
    """Native FLAC decode -> (samples int32 [n, ch], sample_rate, bps), or
    None if the stream needs the Python oracle (unsupported layout/capacity
    unknown) — callers fall back to data/flac.py."""
    buf = np.frombuffer(data, dtype=np.uint8)
    info = np.zeros(4, dtype=np.int64)
    # probe STREAMINFO for capacity; total==0 (unknown) -> Python fallback
    probe = lib.hmasr_flac_decode(buf.ctypes.data_as(_U8), len(buf),
                                  None, 0, info.ctypes.data_as(_I64))
    channels, total = int(info[0]), int(info[3])
    if total <= 0 or channels not in (1, 2):
        return None
    del probe                                   # capacity-0 call: -4 expected
    out = np.empty(total * channels, dtype=np.int32)
    n = lib.hmasr_flac_decode(buf.ctypes.data_as(_U8), len(buf),
                              out.ctypes.data_as(_I32), out.size,
                              info.ctypes.data_as(_I64))
    if n < 0:
        return None
    return (out[:n * channels].reshape(-1, channels), int(info[1]),
            int(info[2]))


def resample_poly(x: np.ndarray, kern: np.ndarray, up: int, down: int,
                  n_out: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float64)
    kern = np.ascontiguousarray(kern, dtype=np.float64)
    out = np.empty(n_out, dtype=np.float64)
    lib.hmasr_resample_poly(x.ctypes.data_as(_F64), len(x),
                            kern.ctypes.data_as(_F64), len(kern),
                            up, down, out.ctypes.data_as(_F64), n_out)
    return out
