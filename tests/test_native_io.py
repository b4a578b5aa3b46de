"""Tests for the native C++ dataset runtime vs the Python loader."""

import numpy as np
import pytest

from orbslam_mapsave_tpu.io import dataset, native_loader


@pytest.mark.skipif(not native_loader.available(),
                    reason="liborbtpu_io.so not built (make -C native)")
def test_native_matches_python(synthetic_tum):
    root = synthetic_tum["root"]
    py = dataset.TUMDataset(root)
    nat = native_loader.NativeTUMDataset(root)
    assert len(nat) == len(py)
    assert (nat.height, nat.width) == (480, 640)
    for i in (0, 5, len(py) - 1):
        t_py, g_py, d_py = py[i]
        t_nat, g_nat, d_nat = nat[i]
        assert abs(t_py - t_nat) < 1e-9
        np.testing.assert_allclose(g_nat, g_py, atol=1.0)  # uint8 gray exact
        np.testing.assert_allclose(d_nat, d_py, atol=1e-4)


@pytest.mark.skipif(not native_loader.available(),
                    reason="liborbtpu_io.so not built")
def test_native_prefetch_sequential(synthetic_tum):
    nat = native_loader.NativeTUMDataset(synthetic_tum["root"], n_workers=2,
                                         prefetch=6)
    seen = 0
    for t, gray, depth in nat:
        assert gray.shape == (480, 640)
        assert depth is not None
        seen += 1
    assert seen == len(nat)
