"""Native C++ feature loader vs numpy, over npy / npz(stored) /
npz(compressed), f4/f8, rank 1/2, truncation and fused l2 normalization."""

import numpy as np
import pytest

from flashvtg_tpu.runtime import load_features, native_available
from flashvtg_tpu.utils.io import l2_normalize


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_available():
        pytest.skip("native featload library unavailable (no g++?)")


def test_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((57, 130), dtype=np.float32)
    p = tmp_path / "a.npy"
    np.save(p, arr)
    got = load_features(str(p))
    np.testing.assert_array_equal(got, arr)


def test_npy_f8_and_rank1(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((13, 7))  # float64
    p = tmp_path / "b.npy"
    np.save(p, arr)
    got = load_features(str(p))
    np.testing.assert_allclose(got, arr.astype(np.float32), atol=1e-7)

    vec = rng.standard_normal(33).astype(np.float32)
    p2 = tmp_path / "c.npy"
    np.save(p2, vec)
    got = load_features(str(p2))
    assert got.shape == (1, 33)
    np.testing.assert_array_equal(got[0], vec)


@pytest.mark.parametrize("compressed", [False, True])
def test_npz(tmp_path, compressed):
    rng = np.random.default_rng(2)
    arr = rng.standard_normal((75, 512), dtype=np.float32)
    p = tmp_path / "d.npz"
    if compressed:
        np.savez_compressed(p, features=arr, other=np.zeros(3))
    else:
        np.savez(p, features=arr, other=np.zeros(3))
    got = load_features(str(p), "features")
    np.testing.assert_array_equal(got, arr)


def test_truncation_and_l2norm(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((100, 64), dtype=np.float32)
    p = tmp_path / "e.npy"
    np.save(p, arr)
    got = load_features(str(p), max_rows=40, l2norm=True)
    assert got.shape == (40, 64)
    np.testing.assert_allclose(got, l2_normalize(arr[:40]), atol=1e-6)


def test_unsupported_falls_back(tmp_path):
    p = tmp_path / "f.npy"
    np.save(p, np.zeros((3, 3), dtype=np.int32))  # unsupported dtype
    assert load_features(str(p)) is None
