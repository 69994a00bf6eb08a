"""ctypes binding for the native C++ decode runtime (native/decoder.cc).

Auto-builds ``libsia_decoder.so`` with the repo Makefile on first use
(single-file g++ compile); callers fall back to the OpenCV/PIL path when
the toolchain or libjpeg is unavailable. The batch call releases the GIL
for its entire duration — decode threads run truly parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

# repo checkout: ../../native relative to this file; installed package:
# point SIA_NATIVE_DIR at a checkout/build of native/ (callers fall back
# to the OpenCV/PIL decode path when neither resolves)
_NATIVE_DIR = os.environ.get("SIA_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsia_decoder.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise RuntimeError("native decoder build previously failed")
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:
                _build_failed = True
                raise RuntimeError(f"native decoder build failed: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sia_decode_batch.restype = ctypes.c_int
        lib.sia_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def decode_batch_into(
    paths: list[str], out: np.ndarray, n_threads: int | None = None,
    on_error: str = "raise",
) -> int | list[int]:
    """Decode ``paths`` into the preallocated uint8 arena — HWC
    ``out[N, S, S, 3]`` or planar ``out[N, 3, S, S]`` (layout inferred
    from the shape).

    ``on_error="raise"`` raises IOError when any image fails and returns
    the decoded count; ``on_error="report"`` returns the list of failed
    indices instead (possibly empty) so the caller can retry just those
    slots — one corrupt file then costs one Python-path retry, not a
    whole-cohort native bail-out."""
    lib = _load()
    n = len(paths)
    if out.shape[0] != n or out.dtype != np.uint8 or not out.flags["C_CONTIGUOUS"]:
        raise ValueError(f"bad arena: shape={out.shape} dtype={out.dtype}")
    if out.ndim == 4 and out.shape[3] == 3 and out.shape[1] == out.shape[2]:
        planar, size = 0, out.shape[1]
    elif out.ndim == 4 and out.shape[1] == 3 and out.shape[2] == out.shape[3]:
        planar, size = 1, out.shape[2]
    else:
        raise ValueError(f"arena must be [N,S,S,3] or [N,3,S,S], got {out.shape}")
    if n_threads is None:
        n_threads = min(16, (os.cpu_count() or 1) * 2)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed_idx = (ctypes.c_int * n)()
    n_failed = ctypes.c_int(0)
    ok = lib.sia_decode_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        n_threads,
        failed_idx,
        ctypes.byref(n_failed),
        planar,
    )
    if on_error == "report":
        return [failed_idx[i] for i in range(n_failed.value)]
    if n_failed.value:
        bad = [paths[failed_idx[i]] for i in range(min(n_failed.value, 5))]
        raise IOError(
            f"native decoder failed on {n_failed.value}/{n} images, "
            f"e.g. {bad}"
        )
    return ok
