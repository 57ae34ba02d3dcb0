import numpy as np
import pytest

from beat_tpu.utility import (
    Ordering,
    ensure_cov_psd,
    find_elbow,
    is_pos_def,
    near_psd,
    running_window_rms,
)


class TestOrdering:
    def test_round_trip(self):
        ordering = Ordering([("a", ()), ("b", (3,)), ("c", (2,))])
        assert ordering.size == 6
        point = {"a": 1.5, "b": np.array([1.0, 2.0, 3.0]), "c": np.array([4.0, 5.0])}
        arr = ordering.to_array(point)
        np.testing.assert_allclose(arr, [1.5, 1, 2, 3, 4, 5])
        back = ordering.to_point(arr)
        assert back["a"] == 1.5
        np.testing.assert_allclose(back["b"], point["b"])
        np.testing.assert_allclose(back["c"], point["c"])

    def test_batched_to_point(self):
        ordering = Ordering([("x", (2,)), ("y", ())])
        batch = np.arange(12.0).reshape(4, 3)
        point = ordering.to_point(batch)
        assert point["x"].shape == (4, 2)
        assert point["y"].shape == (4,)
        np.testing.assert_allclose(point["y"], batch[:, 2])

    def test_slices(self):
        ordering = Ordering([("x", (2,)), ("y", ())])
        assert ordering.slice_of("y") == slice(2, 3)
        assert "x" in ordering and "z" not in ordering


class TestPSD:
    def test_ensure_psd_noop_on_psd(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(5, 5))
        C = A @ A.T + 5 * np.eye(5)
        out = ensure_cov_psd(C)
        np.testing.assert_allclose(out, C)

    def test_repair_indefinite(self):
        C = np.array([[1.0, 2.0], [2.0, 1.0]])  # eigenvalues 3, -1
        out = ensure_cov_psd(C)
        assert is_pos_def(out)

    def test_near_psd(self):
        C = np.array([[1.0, 0.9, 0.7], [0.9, 1.0, 0.3], [0.7, 0.3, 1.0]])
        C[0, 2] = C[2, 0] = 0.99  # breaks PSD
        out = near_psd(C)
        assert np.all(np.linalg.eigvalsh(out) > -1e-10)


def test_running_window_rms():
    x = np.ones(100)
    rms = running_window_rms(x, 10, mode="valid")
    np.testing.assert_allclose(rms, 1.0)


def test_find_elbow():
    x = np.linspace(0, 10, 50)
    y = np.where(x < 3, 10 - 3 * x, 1 - 0.1 * (x - 3))
    idx = find_elbow(np.column_stack([x, y]))
    assert abs(x[idx] - 3.0) < 0.5
