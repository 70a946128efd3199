"""Native C++ npz decoder tests (skipped when the toolchain can't build it)."""

import time

import numpy as np
import pytest

from maunet_tpu.data import native
from maunet_tpu.data.synthetic import generate_dataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native npz loader unavailable")


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_native")
    return generate_dataset(str(root), {"train": 8, "val": 1, "test": 1},
                            hw=32, temporal_len=64)


def _files(root):
    import os

    d = f"{root}/train"
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".npz"))


def test_native_matches_numpy(synthetic_root):
    for path in _files(synthetic_root)[:3]:
        ours = native.load_npz(path)
        with np.load(path) as ref:
            assert set(ours) == set(ref.files)
            for k in ref.files:
                np.testing.assert_array_equal(ours[k], ref[k])
                assert ours[k].dtype == ref[k].dtype


def test_native_batch_decode(synthetic_root):
    files = _files(synthetic_root)
    batch = native.load_batch(files, "input", (23, 32, 32), np.float32)
    assert batch.shape == (len(files), 23, 32, 32)
    for i, path in enumerate(files):
        with np.load(path) as ref:
            np.testing.assert_array_equal(batch[i], ref["input"])


def test_native_error_paths(tmp_path, synthetic_root):
    bad = tmp_path / "not_a_zip.npz"
    bad.write_bytes(b"garbage" * 10)
    with pytest.raises(IOError):
        native.load_npz(str(bad))
    good = _files(synthetic_root)[0]
    with pytest.raises(IOError):
        native.load_npz(good, ["missing_entry"])


def test_dataset_native_backend_matches(synthetic_root):
    from maunet_tpu.data.dataset import NpzDataset

    ds_np = NpzDataset(f"{synthetic_root}/train", temporal_length=64,
                       backend="numpy")
    ds_nat = NpzDataset(f"{synthetic_root}/train", temporal_length=64,
                        backend="native")
    a, b = ds_np[0], ds_nat[0]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_native_faster_or_comparable(synthetic_root):
    """Sanity: batch decode on threads shouldn't be slower than 3× numpy."""
    files = _files(synthetic_root)

    t0 = time.time()
    for _ in range(3):
        native.load_batch(files, "input", (23, 32, 32), np.float32)
    t_native = time.time() - t0

    t0 = time.time()
    for _ in range(3):
        for f in files:
            with np.load(f) as z:
                _ = z["input"]
    t_numpy = time.time() - t0
    assert t_native < t_numpy * 3, (t_native, t_numpy)
