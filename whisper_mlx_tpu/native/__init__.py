"""Native (C++) runtime components, loaded via ctypes.

The reference's native surface is the MLX C++/Metal tensor library (SURVEY.md
§2.3). In this framework the device compute path is JAX/XLA/Pallas; the
native C++ layer covers the *host* runtime around it: audio decode/resample
and the pinned staging buffer that feeds PCM windows to the device
(``native/audio.cc``). Build with ``python -m whisper_mlx_tpu.native.build``.

``lib`` is ``None`` when the shared object has not been built — all callers
fall back to NumPy implementations with identical behavior.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_SO = Path(__file__).parent / "libwhisper_tpu_native.so"


class _NativeLib:
    def __init__(self, so_path: Path):
        self._dll = ctypes.CDLL(str(so_path))
        self._dll.wtpu_read_wav.restype = ctypes.c_int
        self._dll.wtpu_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        self._dll.wtpu_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        self._dll.wtpu_resample.restype = ctypes.c_longlong
        self._dll.wtpu_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        self._dll.wtpu_dtw.restype = ctypes.c_longlong
        self._dll.wtpu_dtw.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]

    def dtw(self, cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Monotone min-cost alignment path (same contract as
        inference.word_timestamps.dtw)."""
        cost = np.ascontiguousarray(cost, np.float32)
        n, m = cost.shape
        out_text = (ctypes.c_int * (n + m))()
        out_time = (ctypes.c_int * (n + m))()
        length = self._dll.wtpu_dtw(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, m, out_text, out_time,
        )
        if length < 0:
            raise ValueError("wtpu_dtw failed")
        return (np.ctypeslib.as_array(out_text)[:length].copy(),
                np.ctypeslib.as_array(out_time)[:length].copy())

    def read_wav(self, path) -> tuple[np.ndarray, int]:
        buf = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_longlong()
        rate = ctypes.c_int()
        rc = self._dll.wtpu_read_wav(str(path).encode(), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(rate))
        if rc != 0:
            raise ValueError(f"native WAV decode failed for {path} (code {rc})")
        try:
            out = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
        finally:
            self._dll.wtpu_free(buf)
        return out, rate.value


def _load():
    if _SO.exists():
        try:
            return _NativeLib(_SO)
        except OSError:
            return None
    return None


lib = _load()
