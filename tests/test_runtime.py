"""Native runtime: build, IO roundtrips, resampler and metric oracles."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from pmpx import runtime


@pytest.fixture(scope="module", autouse=True)
def built():
    assert runtime.build(), "libpmpx_rt.so failed to build"


def test_native_available():
    assert runtime.native_available()


def test_read_floats_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=10000).astype(np.float32)
    p = tmp_path / "data_x.txt"
    # reference format: space-separated floats on one line (data_x.txt)
    with open(p, "w") as f:
        f.write(" ".join(f"{v:.6g}" for v in data))
    got = runtime.read_floats(str(p))
    assert got.shape == data.shape
    np.testing.assert_allclose(got, data, rtol=1e-4, atol=1e-6)


def test_trace_writer_roundtrip(tmp_path):
    p = str(tmp_path / "trace.pmpx")
    w = runtime.TraceWriter(p, width=3)
    rows = np.arange(30, dtype=np.float32).reshape(10, 3)
    for r in rows:
        w.append(r)
    n = w.close()
    assert n == 10
    back = runtime.read_trace(p)
    np.testing.assert_array_equal(back, rows)


def test_trace_writer_crash_resilience(tmp_path):
    """Rows flushed before a hard kill survive (the property the reference
    gets from per-iteration txt streams, ess_per_s_MP.cu:265-278)."""
    p = str(tmp_path / "crash.pmpx")
    code = f"""
import numpy as np, os, signal
from pmpx import runtime
w = runtime.TraceWriter({p!r}, width=2)
for i in range(5):
    w.append(np.array([i, i+0.5], np.float32))
w.flush()
os.kill(os.getpid(), signal.SIGKILL)  # die without close()
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
    )
    assert r.returncode != 0  # killed
    back = runtime.read_trace(p)
    assert back.shape == (5, 2)
    np.testing.assert_allclose(back[:, 0], np.arange(5))


def test_discrete_sample_distribution():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    draws = runtime.discrete_sample(w, 40000, seed=7)
    counts = np.bincount(draws, minlength=4) / 40000
    np.testing.assert_allclose(counts, w / w.sum(), atol=0.01)
    # determinism for fixed seed
    again = runtime.discrete_sample(w, 100, seed=7)
    np.testing.assert_array_equal(draws[:100], again)


def test_autocov_oracle_matches_fft():
    """Native direct-sum autocovariance == jnp FFT implementation."""
    import jax.numpy as jnp

    from pmpx.metrics import autocov as fft_autocov

    rng = np.random.default_rng(3)
    x = rng.normal(size=4000).astype(np.float32)
    nat = runtime.autocov(x, maxlag=50)
    fft = np.asarray(fft_autocov(jnp.asarray(x)))[:51]
    np.testing.assert_allclose(nat, fft, atol=1e-3)


def test_mean_std():
    x = np.random.default_rng(4).normal(2.0, 3.0, size=50000)
    m, s = runtime.mean_std(x)
    assert abs(m - x.mean()) < 1e-3
    assert abs(s - x.std()) < 1e-3
