"""ctypes bindings to the native C++ batch WAV decoder (native/wavio.cpp).

Builds lazily with make/g++ on first use; callers fall back to the NumPy
decoder (lsm_tpu.io.wav) when the toolchain or library is unavailable, so
the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwavio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # Always run make: it is a dependency-checked no-op when the .so is
        # current, and it prevents loading a binary stale vs wavio.cpp.
        if not _build() and not _LIB_PATH.exists():
            _build_failed = True
            return None
        try:
            # AttributeError: a stale/foreign prebuilt .so missing a
            # REQUIRED symbol must mark the build failed and fall back to
            # the NumPy decoder, not escape available() as a crash.
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.wavio_decode_batch.restype = ctypes.c_int
            lib.wavio_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            if lib.wavio_abi_version() != 1:
                raise OSError("wavio ABI mismatch")
            # int16-wire entry: optional (absent in a stale prebuilt .so;
            # callers fall back to f32 decode + host conversion).
            try:
                lib.wavio_decode_batch_i16.restype = ctypes.c_int
                lib.wavio_decode_batch_i16.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_double,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int,
                ]
            except AttributeError:
                pass
            # uint8 mu-law wire entry: optional, same fallback story.
            try:
                lib.wavio_decode_batch_ulaw.restype = ctypes.c_int
                lib.wavio_decode_batch_ulaw.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_double,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int,
                ]
            except AttributeError:
                pass
            _lib = lib
            return _lib
        except (OSError, AttributeError):
            _build_failed = True
            return None


def available() -> bool:
    return _load() is not None


def supports_i16() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "wavio_decode_batch_i16")


def supports_ulaw() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "wavio_decode_batch_ulaw")


def load_audio_batch(
    paths: Sequence[Path],
    sample_rate: int = 16000,
    duration: float = 1.0,
    n_threads: int = 0,
    dtype: str = "float32",
) -> Tuple[np.ndarray, List[int], List[Tuple[Path, str]]]:
    """Same contract as lsm_tpu.io.wav.load_audio_batch, native backend.

    dtype="int16" decodes straight into the PCM16 device wire: for the
    corpus's native format (mono PCM16 at the target rate) each row is a
    raw sample memcpy — no float round-trip at all — and other formats
    quantize with the to_pcm16_wire convention. featurize_batch converts
    on device (exact /32768), so the wire is bit-transparent while the
    H2D transfer moves half the bytes.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    if dtype == "int16" and not hasattr(lib, "wavio_decode_batch_i16"):
        raise RuntimeError("native wavio build lacks the int16 entry")
    if dtype == "ulaw" and not hasattr(lib, "wavio_decode_batch_ulaw"):
        raise RuntimeError("native wavio build lacks the ulaw entry")
    n = len(paths)
    target = int(sample_rate * duration)
    ok = np.zeros(n, dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(str(p)) for p in paths]
    )
    if dtype == "ulaw":
        # uint8 G.711 mu-law wire: quarter of the f32 H2D bytes (lossy,
        # measured accuracy-neutral — ops/ulaw.py). Rows are byte-identical
        # to encode_ulaw(<the int16 wire>) including the 0xFF (silence)
        # padding, so the NumPy fallback in io/wav.py matches bit-for-bit.
        out = np.full((n, target), 0xFF, dtype=np.uint8)
        lib.wavio_decode_batch_ulaw(
            c_paths, n, sample_rate, duration, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
    elif dtype == "int16":
        out = np.zeros((n, target), dtype=np.int16)
        lib.wavio_decode_batch_i16(
            c_paths, n, sample_rate, duration, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
    else:
        out = np.zeros((n, target), dtype=np.float32)
        lib.wavio_decode_batch(
            c_paths, n, sample_rate, duration, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
    kept = [i for i in range(n) if ok[i]]
    errors = [
        (Path(paths[i]), _describe_failure(paths[i]))
        for i in range(n) if not ok[i]
    ]
    return out[kept], kept, errors


def _describe_failure(path) -> str:
    """Classify a native decode failure host-side (failed files only):
    a recognizable FLAC/OGG/MP3/... head gets the loud unsupported-
    container message instead of a bare 'decode failed'."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError as e:
        return str(e)
    from lsm_tpu.io.wav import unsupported_container_error

    msg = unsupported_container_error(head)
    return msg if msg is not None else "decode failed"
