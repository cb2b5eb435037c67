"""`.pt` feature files (reference start_end_dataset.py:462-531 loads torch
tensors for some feature sets): the native C++ loader declines them, and the
numpy fallback path must apply the same truncation + row l2-norm."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flashvtg_tpu.data.dataset import _try_paths
from flashvtg_tpu.utils.io import l2_normalize


def test_pt_features_truncate_and_l2norm(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((30, 16)).astype(np.float32)
    p = tmp_path / "vid_a.pt"
    torch.save(torch.from_numpy(arr), str(p))

    got = _try_paths([(str(p), None)], max_rows=12, l2norm=True)
    assert got.shape == (12, 16)
    np.testing.assert_allclose(got, l2_normalize(arr[:12]), atol=1e-6)

    # half-precision tensors promote to f32 like the reference's .float()
    torch.save(torch.from_numpy(arr).half(), str(p))
    got = _try_paths([(str(p), None)], max_rows=0, l2norm=False)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, arr, atol=1e-3)


def test_pt_preferred_only_when_earlier_candidates_missing(tmp_path):
    """_try_paths takes the FIRST existing candidate: an .npz next to a .pt
    wins when listed first (mirrors the reference's per-dataset suffix
    preference order)."""
    rng = np.random.default_rng(1)
    a_npz = rng.standard_normal((5, 8)).astype(np.float32)
    a_pt = rng.standard_normal((5, 8)).astype(np.float32)
    np.savez(tmp_path / "v.npz", features=a_npz)
    torch.save(torch.from_numpy(a_pt), str(tmp_path / "v.pt"))
    got = _try_paths(
        [(str(tmp_path / "v.npz"), "features"), (str(tmp_path / "v.pt"), None)]
    )
    np.testing.assert_allclose(got, a_npz, atol=1e-6)
    got = _try_paths(
        [(str(tmp_path / "missing.npz"), "features"),
         (str(tmp_path / "v.pt"), None)]
    )
    np.testing.assert_allclose(got, a_pt, atol=1e-6)
