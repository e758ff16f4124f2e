"""Native (C++) feature store: .npy parsing, parallel gather, fallbacks."""

import numpy as np
import pytest

from prego_tpu.native import NativeFeatureStore, build_native_library, native_available

pytestmark = pytest.mark.skipif(
    not (native_available() or build_native_library()),
    reason="native library unavailable and toolchain failed",
)


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    arrays = []
    paths = []
    for i, (t, d) in enumerate([(50, 32), (70, 32), (20, 32)]):
        a = rng.normal(0, 1, (t, d)).astype(np.float32)
        p = root / f"v{i}.npy"
        np.save(p, a)
        arrays.append(a)
        paths.append(str(p))
    # one float64 file (should be converted)
    a64 = rng.normal(0, 1, (15, 32))
    p64 = root / "v64.npy"
    np.save(p64, a64)
    arrays.append(a64.astype(np.float32))
    paths.append(str(p64))
    return paths, arrays


def test_open_dims_readall(npy_files):
    paths, arrays = npy_files
    fs = NativeFeatureStore(paths)
    assert fs.ok.all()
    for i, a in enumerate(arrays):
        assert fs.dims(i) == a.shape
        np.testing.assert_allclose(fs.read_all(i), a, rtol=1e-6)
    fs.close()


def test_gather_windows_matches_numpy(npy_files):
    paths, arrays = npy_files
    fs = NativeFeatureStore(paths, n_threads=3)
    rng = np.random.default_rng(1)
    W = 8
    vid_idx, starts = [], []
    for _ in range(25):
        v = int(rng.integers(0, len(arrays)))
        s = int(rng.integers(0, arrays[v].shape[0] - W))
        vid_idx.append(v)
        starts.append(s)
    out = fs.gather_windows(np.array(vid_idx), np.array(starts), W, 32)
    for j, (v, s) in enumerate(zip(vid_idx, starts)):
        np.testing.assert_allclose(out[j], arrays[v][s : s + W], rtol=1e-6)
    fs.close()


def test_gather_windows_async_matches_sync(npy_files):
    paths, arrays = npy_files
    fs = NativeFeatureStore(paths, n_threads=2)
    rng = np.random.default_rng(2)
    W = 8
    vid_idx = rng.integers(0, len(arrays), 40).astype(np.int32)
    starts = np.array(
        [int(rng.integers(-3, arrays[v].shape[0] - 2)) for v in vid_idx], np.int64
    )
    # several overlapping in-flight gathers (double-buffer usage pattern)
    pendings = [
        fs.gather_windows_async(vid_idx[i::4], starts[i::4], W, 32) for i in range(4)
    ]
    sync = [fs.gather_windows(vid_idx[i::4], starts[i::4], W, 32) for i in range(4)]
    for p, s in zip(pendings, sync):
        np.testing.assert_array_equal(p.wait(), s)
    # wait() is idempotent and returns the same buffer
    assert pendings[0].wait() is pendings[0].out
    fs.close()


def test_out_of_range_window_partially_zero_filled(npy_files):
    paths, arrays = npy_files
    fs = NativeFeatureStore(paths)
    # negative start: leading rows zero (the training zero-prefix semantics)
    out = fs.gather_windows(np.array([0]), np.array([-5]), 8, 32)[0]
    assert np.all(out[:5] == 0)
    np.testing.assert_allclose(out[5:], arrays[0][:3], rtol=1e-6)
    # fully before the file
    out_f = fs.gather_windows(np.array([0]), np.array([-20]), 8, 32)[0]
    assert np.all(out_f == 0)
    # past the end: trailing rows zero
    out2 = fs.gather_windows(np.array([2]), np.array([18]), 8, 32)[0]
    np.testing.assert_allclose(out2[:2], arrays[2][18:20], rtol=1e-6)
    assert np.all(out2[2:] == 0)
    fs.close()


def test_missing_file_flagged(npy_files, tmp_path):
    paths, _ = npy_files
    fs = NativeFeatureStore([paths[0], str(tmp_path / "nope.npy")])
    assert fs.ok.tolist() == [True, False]
    fs.close()
