"""ctypes bindings for the native runtime (libpmpx_rt.so).

Graceful degradation: if the shared library is absent and cannot be built,
every facility falls back to a NumPy implementation, so the Python package
works everywhere; the native path is the production one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpmpx_rt.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile libpmpx_rt.so with make; returns True on success."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"],
            check=True,
            capture_output=True,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not build():
            return None
    lib = ctypes.CDLL(_SO)
    lib.rt_read_floats.restype = ctypes.c_longlong
    lib.rt_read_floats.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
    ]
    lib.rt_trace_open.restype = ctypes.c_void_p
    lib.rt_trace_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.rt_trace_append.restype = None
    lib.rt_trace_append.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rt_trace_flush.restype = ctypes.c_longlong
    lib.rt_trace_flush.argtypes = [ctypes.c_void_p]
    lib.rt_trace_close.restype = ctypes.c_longlong
    lib.rt_trace_close.argtypes = [ctypes.c_void_p]
    lib.rt_trace_read.restype = ctypes.c_longlong
    lib.rt_trace_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.rt_discrete_sample.restype = None
    lib.rt_discrete_sample.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.rt_autocov.restype = None
    lib.rt_autocov.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.rt_mean_std.restype = None
    lib.rt_mean_std.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------


def read_floats(path: str) -> np.ndarray:
    """Fast whitespace/comma-separated float file reader (the reference's
    ``get_data`` txt format, ``conv_mp.cu:62-79``)."""
    lib = _load()
    if lib is None:
        # match the native parser's tolerance of comma separators
        with open(path) as f:
            toks = f.read().replace(",", " ").split()
        return np.asarray(toks, dtype=np.float32)
    n = lib.rt_read_floats(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty(n, np.float32)
    got = lib.rt_read_floats(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    return out[:got]


class TraceWriter:
    """Crash-resilient per-iteration trace streaming (the reference streams
    beta0/beta1/sigma/time per iteration to txt from the host loop,
    ``conv_mp.cu:283-289``; this is the binary, background-thread version).
    Falls back to buffered NumPy writes when the native library is absent.
    """

    def __init__(self, path: str, width: int):
        self.path = path
        self.width = int(width)
        self._lib = _load()
        self._rows = 0
        if self._lib is not None:
            self._h = self._lib.rt_trace_open(path.encode(), self.width)
            if not self._h:
                raise IOError(f"cannot open {path}")
        else:
            self._buf = []

    def append(self, row) -> None:
        row = np.ascontiguousarray(row, np.float32)
        assert row.size == self.width
        self._rows += 1
        if self._lib is not None:
            self._lib.rt_trace_append(
                self._h, row.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        else:
            self._buf.append(row.copy())

    def flush(self) -> int:
        if self._lib is not None:
            return int(self._lib.rt_trace_flush(self._h))
        self._np_write()
        return self._rows

    def close(self) -> int:
        if self._lib is not None:
            return int(self._lib.rt_trace_close(self._h))
        self._np_write()
        return self._rows

    def _np_write(self):
        arr = (
            np.stack(self._buf)
            if self._buf
            else np.zeros((0, self.width), np.float32)
        )
        with open(self.path, "wb") as f:
            f.write(b"PMPX")
            f.write(np.uint32(self.width).tobytes())
            f.write(np.uint64(0).tobytes())
            f.write(arr.astype(np.float32).tobytes())


def read_trace(path: str) -> np.ndarray:
    """Read a TraceWriter file -> (rows, width) float32."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"PMPX":
            raise IOError(f"{path}: not a pmpx trace")
        width = int(np.frombuffer(f.read(4), np.uint32)[0])
        f.read(8)
        data = np.frombuffer(f.read(), np.float32)
    rows = data.size // width
    return data[: rows * width].reshape(rows, width)


def discrete_sample(
    weights: np.ndarray, n_draws: int, seed: int
) -> np.ndarray:
    """mt19937 + std::discrete_distribution draws (reference host
    resampler, ``conv_mp.cu:253-259``); numpy fallback uses the same
    distribution but a different generator."""
    weights = np.ascontiguousarray(weights, np.float64)
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        p = weights / weights.sum()
        return rng.choice(len(weights), size=n_draws, p=p).astype(np.int32)
    out = np.empty(n_draws, np.int32)
    lib.rt_discrete_sample(
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(weights),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_draws,
        seed,
    )
    return out


def autocov(x: np.ndarray, maxlag: int) -> np.ndarray:
    """Direct-sum autocovariance oracle (native double accumulation)."""
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        xc = x.astype(np.float64) - x.mean()
        n = len(x)
        return np.array(
            [np.dot(xc[: n - k], xc[k:]) / n for k in range(maxlag + 1)]
        )
    out = np.empty(maxlag + 1, np.float64)
    lib.rt_autocov(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        maxlag,
    )
    return out


def mean_std(x: np.ndarray):
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return float(x.mean()), float(x.std())
    m = ctypes.c_double()
    s = ctypes.c_double()
    lib.rt_mean_std(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        ctypes.byref(m),
        ctypes.byref(s),
    )
    return m.value, s.value
