"""Stage storage: save/load round trip, corruption detection, resume
(ports the intent of reference ``test/test_backend.py``)."""

import numpy as np

from beat_tpu.backend import (
    SampleStage,
    StageTrace,
    effective_sample_size,
    extract_bounds_from_summary,
    hdi,
    rhat,
    summarize_trace,
)
from beat_tpu.utility import Ordering


def make_handler(tmp_path):
    ordering = Ordering([("x", (2,)), ("y", ())])
    return SampleStage(str(tmp_path), ordering=ordering), ordering


def test_save_load_round_trip(tmp_path):
    handler, ordering = make_handler(tmp_path)
    q = np.random.default_rng(0).normal(size=(5, 10, 3)).astype(np.float32)
    llk = np.random.default_rng(1).normal(size=(5, 10)).astype(np.float32)
    handler.save_stage(0, {"q": q, "llk": llk},
                       {"beta": 0.25, "cov": np.eye(3), "population": q[-1]})
    trace = handler.load_trace(0)
    np.testing.assert_allclose(trace.q_trace, q)
    state = handler.load_state(0)
    assert state["beta"] == 0.25
    np.testing.assert_allclose(state["cov"], np.eye(3))


def test_get_values_and_endpoints(tmp_path):
    handler, ordering = make_handler(tmp_path)
    q = np.arange(5 * 10 * 3, dtype=np.float32).reshape(5, 10, 3)
    llk = np.zeros((5, 10), dtype=np.float32)
    handler.save_stage(1, {"q": q, "llk": llk}, {"beta": 0.5})
    trace = handler.load_trace(1)
    x = trace.get_values("x", combine=False)
    assert x.shape == (5, 10, 2)
    y = trace.get_values("y", combine=True)
    assert y.shape == (50,)
    pop, llks = trace.end_points()
    np.testing.assert_allclose(pop, q[-1])


def test_corruption_detection(tmp_path):
    handler, _ = make_handler(tmp_path)
    q = np.zeros((2, 4, 3), dtype=np.float32)
    handler.save_stage(0, {"q": q, "llk": np.zeros((2, 4))}, {"beta": 0.1})
    handler.save_stage(1, {"q": q, "llk": np.zeros((2, 4))}, {"beta": 0.2})
    assert handler.highest_sampled_stage() == 1
    # corrupt stage 1's trace file
    with open(handler._trace_file(1), "wb") as f:
        f.write(b"garbage")
    assert not handler.check_stage(1)
    assert handler.highest_sampled_stage() == 0


def test_final_stage_priority(tmp_path):
    handler, _ = make_handler(tmp_path)
    q = np.zeros((2, 4, 3), dtype=np.float32)
    handler.save_stage(0, {"q": q, "llk": np.zeros((2, 4))}, {"beta": 0.1})
    handler.save_stage(-1, {"q": q, "llk": np.zeros((2, 4))}, {"beta": 1.0})
    assert handler.highest_sampled_stage() == -1


def test_concatenate(tmp_path):
    handler, _ = make_handler(tmp_path)
    q = np.zeros((2, 4, 3), dtype=np.float32)
    for s in range(3):
        handler.save_stage(s, {"q": q + s, "llk": np.zeros((2, 4))}, {"beta": 0.1 * s})
    cat = handler.concatenate_traces([0, 1, 2])
    assert cat.q_trace.shape == (6, 4, 3)


class TestSummary:
    def test_hdi_of_normal(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=20000)
        lo, hi = hdi(x, prob=0.94)
        assert -2.1 < lo < -1.7 and 1.7 < hi < 2.1

    def test_ess_iid(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 4))
        ess = effective_sample_size(x)
        assert ess > 800  # iid -> ess close to 2000

    def test_rhat_converged(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 4))
        assert abs(rhat(x) - 1.0) < 0.05

    def test_summarize_and_extract_bounds(self):
        rng = np.random.default_rng(0)
        ordering = Ordering([("x", (2,)), ("y", ())])
        q = rng.normal(size=(100, 8, 3)).astype(np.float32)
        q[..., 2] += 5.0
        trace = StageTrace(q, np.zeros((100, 8), dtype=np.float32), ordering=ordering)
        summary = summarize_trace(trace)
        assert abs(summary["y"]["mean"] - 5.0) < 0.1
        lo, hi = extract_bounds_from_summary(summary, "x", shape=(2,))
        assert lo.shape == (2,) and np.all(lo < hi)
