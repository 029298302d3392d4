"""$PMPX_DATA_DIR real-data ingestion paths (npz / IDX / CIFAR batches).

The environment is egress-free so the loaders fall back to synthetic
blobs, but the on-disk branches are what a production user hits with
real MNIST/CIFAR bytes — exercise all three accepted formats (pmpx npz,
torchvision's MNIST/raw IDX files, torchvision's cifar-10-batches-py
pickles) against locally generated fixtures.
"""

import gzip
import pickle
import struct

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


def _idx_bytes(arr: np.ndarray) -> bytes:
    header = struct.pack(
        f">HBB{arr.ndim}I", 0, 0x08, arr.ndim, *arr.shape
    )
    return header + arr.astype(np.uint8).tobytes()


def _write_mnist_idx(root, n_tr=40, n_te=12, gz=False, raw_subdir=False):
    rng = np.random.default_rng(1)
    base = root / "MNIST" / "raw" if raw_subdir else root
    base.mkdir(parents=True, exist_ok=True)
    files = {
        "train-images-idx3-ubyte": rng.integers(
            0, 256, (n_tr, 28, 28), dtype=np.uint8
        ),
        "train-labels-idx1-ubyte": rng.integers(
            0, 10, (n_tr,), dtype=np.uint8
        ),
        "t10k-images-idx3-ubyte": rng.integers(
            0, 256, (n_te, 28, 28), dtype=np.uint8
        ),
        "t10k-labels-idx1-ubyte": rng.integers(
            0, 10, (n_te,), dtype=np.uint8
        ),
    }
    for name, arr in files.items():
        payload = _idx_bytes(arr)
        if gz:
            (base / (name + ".gz")).write_bytes(gzip.compress(payload))
        else:
            (base / name).write_bytes(payload)
    return files


def test_mnist_idx_ingestion(data_dir):
    files = _write_mnist_idx(data_dir, raw_subdir=True)
    x_tr, y_tr, x_te, y_te = load_mnist(n_train=32, n_test=8)
    assert x_tr.shape == (32, 28, 28) and y_tr.dtype == np.int32
    want = (
        files["train-images-idx3-ubyte"][:32].astype(np.float32) / 255.0
        - 0.1307
    ) / 0.3081
    np.testing.assert_allclose(np.asarray(x_tr), want, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(y_te), files["t10k-labels-idx1-ubyte"][:8]
    )


def test_mnist_idx_gz_in_plain_dir(data_dir):
    _write_mnist_idx(data_dir, gz=True, raw_subdir=False)
    x_tr, *_ = load_mnist(n_train=16, n_test=4)
    assert x_tr.shape == (16, 28, 28)


def test_idx_rejects_wrong_dtype(data_dir, tmp_path):
    bad = struct.pack(">HBB1I", 0, 0x0D, 1, 4) + b"\0" * 16  # f32 magic
    p = tmp_path / "bad-idx"
    p.write_bytes(bad)
    from pmpx.data import _read_idx

    with pytest.raises(ValueError, match="not a u8 IDX"):
        _read_idx(str(p))


def test_cifar_batches_ingestion(data_dir):
    root = data_dir / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(2)
    per = 10
    train_rows, train_labels = [], []
    for i in range(1, 6):
        rows = rng.integers(0, 256, (per, 3072), dtype=np.uint8)
        labels = rng.integers(0, 10, (per,)).tolist()
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rows, b"labels": labels}, f)
        train_rows.append(rows)
        train_labels += labels
    te_rows = rng.integers(0, 256, (per, 3072), dtype=np.uint8)
    with open(root / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": te_rows, b"labels": rng.integers(0, 10, (per,)).tolist()},
            f,
        )
    x_tr, y_tr, x_te, y_te = load_cifar10(n_train=50, n_test=10)
    assert x_tr.shape == (50, 32, 32, 3) and x_te.shape == (10, 32, 32, 3)
    # CHW pickle rows -> NHWC float in [0, 1]
    want = (
        np.concatenate(train_rows)
        .reshape(-1, 3, 32, 32)
        .transpose(0, 2, 3, 1)
        .astype(np.float32)
        / 255.0
    )
    np.testing.assert_allclose(np.asarray(x_tr), want, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y_tr), np.array(train_labels))


class TestMalformedInputs:
    """Present-but-broken files must fail LOUDLY with actionable
    messages, never silently fall back to synthetic data (the loader is
    a real user's first contact with pmpx on real bytes; VERDICT r4)."""

    def test_npz_missing_keys(self, data_dir):
        np.savez(
            data_dir / "mnist.npz",
            x_train=np.zeros((4, 28, 28), np.uint8),
            y_train=np.zeros((4,), np.int64),
        )
        with pytest.raises(ValueError, match="missing arrays.*x_test"):
            load_mnist(n_train=4, n_test=2)

    def test_npz_count_mismatch(self, data_dir):
        np.savez(
            data_dir / "mnist.npz",
            x_train=np.zeros((4, 28, 28), np.uint8),
            y_train=np.zeros((3,), np.int64),
            x_test=np.zeros((2, 28, 28), np.uint8),
            y_test=np.zeros((2,), np.int64),
        )
        with pytest.raises(ValueError, match="4 images but y_train has 3"):
            load_mnist(n_train=4, n_test=2)

    def test_npz_unreadable(self, data_dir):
        (data_dir / "cifar10.npz").write_bytes(b"not a zip archive")
        with pytest.raises(ValueError, match="not a readable npz"):
            load_cifar10(n_train=4, n_test=2)

    def test_idx_truncated_header(self, data_dir):
        _write_mnist_idx(data_dir)
        (data_dir / "train-images-idx3-ubyte").write_bytes(b"\0\0")
        with pytest.raises(ValueError, match="truncated IDX magic"):
            load_mnist(n_train=4, n_test=2)

    def test_idx_truncated_dims(self, data_dir):
        _write_mnist_idx(data_dir)
        (data_dir / "train-images-idx3-ubyte").write_bytes(
            struct.pack(">HBB", 0, 0x08, 3) + b"\0\0\0\x04"
        )
        with pytest.raises(ValueError, match="truncated IDX dimension"):
            load_mnist(n_train=4, n_test=2)

    def test_idx_truncated_payload(self, data_dir):
        _write_mnist_idx(data_dir)
        good = _idx_bytes(np.zeros((4, 28, 28), np.uint8))
        (data_dir / "train-images-idx3-ubyte").write_bytes(good[:-100])
        with pytest.raises(ValueError, match="truncated or corrupt"):
            load_mnist(n_train=4, n_test=2)

    def test_idx_truncated_gz_stream(self, data_dir):
        _write_mnist_idx(data_dir, gz=True)
        good = gzip.compress(_idx_bytes(np.zeros((4, 28, 28), np.uint8)))
        (data_dir / "train-images-idx3-ubyte.gz").write_bytes(good[:-20])
        with pytest.raises(ValueError):
            load_mnist(n_train=4, n_test=2)

    def test_idx_wrong_rank_images(self, data_dir):
        _write_mnist_idx(data_dir)
        # a labels-shaped (1-D) file sitting at the images path
        (data_dir / "train-images-idx3-ubyte").write_bytes(
            _idx_bytes(np.zeros((40,), np.uint8))
        )
        with pytest.raises(ValueError, match="3-D image tensor"):
            load_mnist(n_train=4, n_test=2)

    def test_idx_image_label_count_mismatch(self, data_dir):
        _write_mnist_idx(data_dir, n_tr=40)
        (data_dir / "train-labels-idx1-ubyte").write_bytes(
            _idx_bytes(np.zeros((39,), np.uint8))
        )
        with pytest.raises(ValueError, match="40 images.*39 labels"):
            load_mnist(n_train=4, n_test=2)

    @staticmethod
    def _write_cifar_batches(root, rows=None, labels=None, per=4):
        root.mkdir(exist_ok=True)
        rng = np.random.default_rng(0)
        for n in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            d = {
                b"data": (
                    rows if rows is not None
                    else rng.integers(0, 256, (per, 3072), dtype=np.uint8)
                ),
                b"labels": (
                    labels if labels is not None
                    else rng.integers(0, 10, (per,)).tolist()
                ),
            }
            with open(root / n, "wb") as f:
                pickle.dump(d, f)

    def test_cifar_unpicklable_batch(self, data_dir):
        root = data_dir / "cifar-10-batches-py"
        self._write_cifar_batches(root)
        (root / "data_batch_3").write_bytes(b"garbage not pickle")
        with pytest.raises(ValueError, match="data_batch_3.*not a readable"):
            load_cifar10(n_train=4, n_test=2)

    def test_cifar_wrong_keys(self, data_dir):
        root = data_dir / "cifar-10-batches-py"
        self._write_cifar_batches(root)
        with open(root / "test_batch", "wb") as f:
            pickle.dump({b"images": np.zeros((4, 3072), np.uint8)}, f)
        with pytest.raises(ValueError, match="b'data' and b'labels'"):
            load_cifar10(n_train=4, n_test=2)

    def test_cifar_wrong_row_size(self, data_dir):
        root = data_dir / "cifar-10-batches-py"
        self._write_cifar_batches(
            root, rows=np.zeros((4, 3000), np.uint8),
            labels=[0, 1, 2, 3],
        )
        with pytest.raises(ValueError, match="3072-byte CHW"):
            load_cifar10(n_train=4, n_test=2)

    def test_cifar_label_count_mismatch(self, data_dir):
        root = data_dir / "cifar-10-batches-py"
        self._write_cifar_batches(
            root, rows=np.zeros((4, 3072), np.uint8), labels=[0, 1, 2],
        )
        with pytest.raises(ValueError, match="4 image rows but 3 labels"):
            load_cifar10(n_train=4, n_test=2)


def test_synthetic_fallback_without_npz(data_dir):
    # empty data dir -> deterministic synthetic stand-in
    x1, y1, *_ = load_mnist(n_train=16, n_test=4, seed=3)
    x2, y2, *_ = load_mnist(n_train=16, n_test=4, seed=3)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert x1.shape == (16, 28, 28)


def test_dataset_presence_mirrors_loader_completeness(data_dir):
    """`cli doctor` must not promise a dataset the loader would reject:
    presence uses the loaders' own all-files rules, so a partial
    torchvision download reads false."""
    from pmpx.data import dataset_presence

    assert dataset_presence()["mnist_idx"] is False
    # images alone (the old single-file probe) must NOT flip it
    base = data_dir / "MNIST" / "raw"
    base.mkdir(parents=True)
    (base / "train-images-idx3-ubyte").write_bytes(
        _idx_bytes(np.zeros((1, 28, 28), np.uint8))
    )
    assert dataset_presence()["mnist_idx"] is False
    _write_mnist_idx(data_dir, raw_subdir=True)
    assert dataset_presence()["mnist_idx"] is True

    # CIFAR: data_batch_1 alone is not a dataset
    root = data_dir / "cifar-10-batches-py"
    root.mkdir()
    (root / "data_batch_1").write_bytes(b"x")
    assert dataset_presence()["cifar10_batches"] is False
    for n in [f"data_batch_{i}" for i in range(2, 6)] + ["test_batch"]:
        (root / n).write_bytes(b"x")
    assert dataset_presence()["cifar10_batches"] is True
