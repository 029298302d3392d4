"""$PMPX_DATA_DIR .npz ingestion path (the real-data seam).

The environment is egress-free so the loaders fall back to synthetic
blobs, but the npz branch is the one a production user hits with real
MNIST/CIFAR bytes — exercise it against locally generated fixtures.
"""

import numpy as np
import pytest

from pmpx.data import load_cifar10, load_mnist


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PMPX_DATA_DIR", str(tmp_path))
    return tmp_path


def _write_npz(path, shape, n_tr=64, n_te=16):
    rng = np.random.default_rng(0)
    np.savez(
        path,
        x_train=rng.integers(0, 256, (n_tr,) + shape, dtype=np.uint8),
        y_train=rng.integers(0, 10, (n_tr,), dtype=np.int64),
        x_test=rng.integers(0, 256, (n_te,) + shape, dtype=np.uint8),
        y_test=rng.integers(0, 10, (n_te,), dtype=np.int64),
    )


def test_mnist_npz_ingestion(data_dir):
    _write_npz(data_dir / "mnist.npz", (28, 28))
    x_tr, y_tr, x_te, y_te = load_mnist(n_train=32, n_test=8)
    assert x_tr.shape == (32, 28, 28) and x_te.shape == (8, 28, 28)
    assert y_tr.dtype == np.int32 and y_te.shape == (8,)
    # reference normalization ((x/255 - 0.1307) / 0.3081, PMP_FC.py:50-52)
    raw = np.load(data_dir / "mnist.npz")["x_train"][:32]
    want = (raw.astype(np.float32) / 255.0 - 0.1307) / 0.3081
    np.testing.assert_allclose(np.asarray(x_tr), want, rtol=1e-6)


def test_cifar_npz_ingestion(data_dir):
    _write_npz(data_dir / "cifar10.npz", (32, 32, 3))
    x_tr, y_tr, x_te, y_te = load_cifar10(n_train=48, n_test=8)
    assert x_tr.shape == (48, 32, 32, 3)
    assert float(x_tr.max()) <= 1.0 and float(x_tr.min()) >= 0.0
    assert y_tr.dtype == np.int32


def test_synthetic_fallback_without_npz(data_dir):
    # empty data dir -> deterministic synthetic stand-in
    x1, y1, *_ = load_mnist(n_train=16, n_test=4, seed=3)
    x2, y2, *_ = load_mnist(n_train=16, n_test=4, seed=3)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert x1.shape == (16, 28, 28)
