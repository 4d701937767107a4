"""ctypes bindings for the native (C++) audio feature frontend.

``NativeFramer`` wraps ``native/framer.cpp``: a sample ring buffer +
pre-emphasis + Hann window + radix-2 FFT + log-mel filterbank, compiled
to a small shared library with zero external dependencies. It feeds
``StreamingHMMProcessor`` with feature frames without Python-interpreter
overhead on the per-sample hot path.

The library is built on first use (``g++ -O3 -shared``) and cached next
to the source; set ``PYTORCH_HMM_TPU_NO_NATIVE=1`` to force the pure
NumPy fallback (same math, used automatically when no compiler exists).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["NativeFramer", "native_available"]

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libhmmframer.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("PYTORCH_HMM_TPU_NO_NATIVE") == "1":
        return None
    src = os.path.join(_SRC_DIR, "framer.cpp")
    if not os.path.exists(src):
        return None
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["make", "-C", _SRC_DIR, "libhmmframer.so"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None

    lib.framer_create.restype = ctypes.c_void_p
    lib.framer_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    lib.framer_destroy.argtypes = [ctypes.c_void_p]
    lib.framer_push.restype = ctypes.c_int64
    lib.framer_push.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.framer_pop.restype = ctypes.c_int64
    lib.framer_pop.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.framer_available_samples.restype = ctypes.c_int64
    lib.framer_available_samples.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    """True when the C++ frontend compiled and loaded."""
    return _load_lib() is not None


class NativeFramer:
    """Streaming raw-PCM → log-mel frontend.

    Args mirror common speech configs: 16 kHz, 25 ms window (400 samples,
    padded into a 512-point FFT), 10 ms hop, 80 mels.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 512,
        frame_len: int = 400,
        hop: int = 160,
        n_mels: int = 80,
        preemphasis: float = 0.97,
        capacity_samples: int = 1 << 18,
    ):
        if n_fft & (n_fft - 1):
            raise ValueError(f"n_fft must be a power of two, got {n_fft}")
        if frame_len > n_fft:
            raise ValueError("frame_len must be <= n_fft")
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.frame_len = frame_len
        self.hop = hop
        self.n_mels = n_mels
        self.preemphasis = preemphasis

        self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.framer_create(
                sample_rate, n_fft, frame_len, hop, n_mels,
                ctypes.c_float(preemphasis), capacity_samples,
            )
            if not self._h:
                raise RuntimeError("framer_create failed")
        else:
            # NumPy fallback state (same math as the C++ path).
            self._h = None
            self._buf = np.zeros((0,), np.float32)
            self._prev = 0.0
            self._window = (
                0.5 - 0.5 * np.cos(
                    2 * np.pi * np.arange(frame_len) / (frame_len - 1)
                )
            ).astype(np.float32)
            self._mel = self._numpy_mel_weights()

    def _numpy_mel_weights(self) -> np.ndarray:
        def hz2mel(h):
            return 2595.0 * np.log10(1.0 + h / 700.0)

        def mel2hz(m):
            return 700.0 * (10 ** (m / 2595.0) - 1.0)

        n_bins = self.n_fft // 2 + 1
        mmin, mmax = hz2mel(0.0), hz2mel(self.sample_rate / 2)
        centers = mel2hz(
            mmin + (mmax - mmin) * np.arange(self.n_mels + 2)
            / (self.n_mels + 1)
        )
        freqs = np.arange(n_bins) * self.sample_rate / self.n_fft
        W = np.zeros((self.n_mels, n_bins), np.float32)
        for m in range(self.n_mels):
            lo, mid, hi = centers[m], centers[m + 1], centers[m + 2]
            up = (freqs - lo) / (mid - lo)
            down = (hi - freqs) / (hi - mid)
            W[m] = np.maximum(0.0, np.minimum(up, down))
        # The C++ path uses strict lo < f < hi with the same triangles.
        return W

    # -- streaming interface ---------------------------------------------------
    def push(self, samples: np.ndarray) -> int:
        """Feed raw float32 PCM. Returns samples accepted."""
        samples = np.ascontiguousarray(samples, np.float32).ravel()
        if self._h is not None:
            return int(self._lib.framer_push(
                self._h,
                samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(samples),
            ))
        self._buf = np.concatenate([self._buf, samples])
        return len(samples)

    def pop(self, max_frames: int = 1 << 14) -> np.ndarray:
        """Drain ready frames → ``(n_frames, n_mels)`` float32 log-mels."""
        if self._h is not None:
            out = np.empty((max_frames, self.n_mels), np.float32)
            n = int(self._lib.framer_pop(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                max_frames,
            ))
            return out[:n]
        frames = []
        while len(self._buf) >= self.frame_len and len(frames) < max_frames:
            seg = self._buf[: self.frame_len]
            emph = seg - self.preemphasis * np.concatenate(
                [[self._prev], seg[:-1]]
            )
            spec = np.fft.rfft(emph * self._window, self.n_fft)
            power = (spec.real**2 + spec.imag**2).astype(np.float32)
            frames.append(np.log(self._mel @ power + 1e-10))
            self._prev = float(self._buf[self.hop - 1])
            self._buf = self._buf[self.hop:]
        if not frames:
            return np.zeros((0, self.n_mels), np.float32)
        return np.stack(frames).astype(np.float32)

    @property
    def available_samples(self) -> int:
        if self._h is not None:
            return int(self._lib.framer_available_samples(self._h))
        return len(self._buf)

    @property
    def is_native(self) -> bool:
        return self._h is not None

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and self._lib is not None:
            self._lib.framer_destroy(h)
            self._h = None
