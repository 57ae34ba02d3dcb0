"""
THE real-data acceptance test (round-3 verdict missing #1 / next-round
#1): ingest the reference's bundled FullMT project — the actual
``seismic_data.pkl`` waveforms of the 1995 Gulf of Aqaba event example —
build a native layered GF table for its custom velocity model, and
invert.  The posterior moment tensor must land near the GCMT solution
embedded in the config (whose normalized components are also the
config's testvalues — the example data are synthetic from that exact
mechanism, ``docs/examples/FullMT_regional.rst:12``).

Reference integration analogue: ``test/test_composites.py:32-36`` +
the documented example workflow ``apps/beat.py:366-770``.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

EXAMPLES = "/root/reference/data/examples"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(EXAMPLES, "FullMT")),
        reason="reference example data not present"),
]

#: GCMT solution from the config's event block (normalized MT) — equal
#: to the prior testvalues, i.e. the truth of the synthetic data.
GCMT_M6 = dict(mnn=-0.43283071, mee=0.65741974, mdd=-0.22458903,
               mne=0.63839719, mnd=0.50698292, med=0.02063122)
M6_NAMES = tuple(GCMT_M6)


@pytest.fixture(scope="module")
def fullmt_problem(tmp_path_factory):
    """Import + build at reduced table resolution (CPU test budget);
    the bench runs the full-size version on the real chip."""
    from beat_tpu import interop
    from beat_tpu.models.problem import load_model

    dest = str(tmp_path_factory.mktemp("fullmt_real"))
    interop.import_beat_project(
        os.path.join(EXAMPLES, "FullMT"), dest, build=True,
        gf_overrides={
            # the bundled synthetic data match the plain custom model,
            # not the joined-ak135 continuation (see interop docstring).
            # fmax stays at the import default 2x the filter corner —
            # capping it tighter leaves filter-rolloff energy in the
            # data that the synthetics lack and biases magnitude/depth.
            "join_base_model": False,
            "n_distances": 64, "n_depths": 8, "nt": 1024,
            "n_variations": 0,
        })
    return load_model(dest, "geometry")


class TestRealDataForward:
    def test_truth_beats_prior_draws(self, fullmt_problem):
        """The GCMT/testvalue point must dominate random prior draws —
        the native physics explains the real example waveforms."""
        prob = fullmt_problem
        logp, data = prob.make_logp_fn()
        jl = jax.jit(logp)
        tp = prob.priors.test_point()
        lp_truth = float(jl(jnp.asarray(prob.point_to_array(tp)), data))
        lo, hi = prob.priors.bounds_arrays()
        rng = np.random.default_rng(0)
        lps = [float(jl(jnp.asarray(rng.uniform(lo, hi)), data))
               for _ in range(16)]
        assert np.isfinite(lp_truth)
        assert lp_truth > max(lps) + 50.0, (lp_truth, max(lps))

    def test_waveform_correlation_at_truth(self, fullmt_problem):
        """Synthetics at the truth correlate with every observed trace
        near zero lag (no moveout bias across 170–920 km)."""
        prob = fullmt_problem
        comp = prob.composites["seismic"]
        wmap = comp.wavemaps[0]
        synths = comp.get_synthetics(prob.priors.test_point())[wmap.mapid]
        obs = wmap.data_windows
        ccs = []
        for s, o in zip(np.asarray(synths), np.asarray(obs)):
            s = s - s.mean()
            o = o - o.mean()
            xc = np.correlate(s, o, "full")
            lag = int(np.argmax(xc)) - (len(o) - 1)
            cc = xc.max() / (np.linalg.norm(s) * np.linalg.norm(o) + 1e-30)
            ccs.append(cc)
            assert abs(lag) * wmap.table.dt < 12.0, \
                f"moveout bias: best-correlation lag {lag} samples"
        assert np.median(ccs) > 0.55, f"median cc {np.median(ccs):.2f}"


class TestRealDataInversion:
    def test_smc_recovers_gcmt(self, fullmt_problem):
        """Short SMC on the real example data: posterior mean MT must
        align with the GCMT mechanism (normalized direction cosine),
        magnitude/time near the documented truth."""
        from beat_tpu.samplers import SMCParams

        prob = fullmt_problem
        prob.sampler_params = SMCParams(n_chains=96, n_steps=60,
                                        tune_interval=20, seed=5)
        q_tr, llk_tr = prob.sample()
        final = np.asarray(q_tr[-1])
        mean_pt = prob.ordering.to_point(final.mean(axis=0))

        m6_est = np.array([float(np.asarray(mean_pt[k])) for k in M6_NAMES])
        m6_true = np.array([GCMT_M6[k] for k in M6_NAMES])
        cosine = (m6_est @ m6_true
                  / (np.linalg.norm(m6_est) * np.linalg.norm(m6_true)))
        assert cosine > 0.95, f"MT direction cosine {cosine:.3f}: {m6_est}"

        mag = float(np.asarray(mean_pt["magnitude"]))
        assert 5.7 < mag < 6.0, f"magnitude {mag}"
        t0 = float(np.asarray(mean_pt["time"]))
        assert -16.0 < t0 < -8.0, f"time {t0}"
        depth = float(np.asarray(mean_pt["depth"]))
        assert 2e3 < depth < 14e3, f"depth {depth}"
