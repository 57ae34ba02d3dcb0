"""
Joint seismic + geodetic inversion (BASELINE configs[2]): one Problem
summing both composites' likelihoods, sampled with SMC and PT.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.covariance import Covariance
from beat_tpu.heart.geodesy import GeodeticDataset
from beat_tpu.heart.gftable import build_homogeneous_table
from beat_tpu.models.geodetic import GeodeticGeometryComposite
from beat_tpu.models.problem import Problem
from beat_tpu.models.seismic import SeismicGeometryComposite
from beat_tpu.parameter import Parameter, PriorSet
from beat_tpu.samplers import PTParams, SMCParams
from beat_tpu.sources import DCSource, RectangularSource

from tests.test_seismic import TRUE_DEPTH, TRUE_MAG, TRUE_SDR, make_wavemap

TRUE_SLIP = 1.2


@pytest.fixture(scope="module")
def joint_problem_factory(tmp_path_factory):
    table = build_homogeneous_table(
        distances=np.linspace(20e3, 120e3, 11),
        depths=np.linspace(2e3, 20e3, 5), nt=256, dt=0.25)
    wavemap = make_wavemap(table, seed=1)

    # geodetic scene from a rectangular source with the same mechanism
    rng = np.random.default_rng(2)
    e = np.linspace(-15e3, 15e3, 10)
    coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
    rect = RectangularSource(depth=TRUE_DEPTH, strike=TRUE_SDR["strike"],
                             dip=TRUE_SDR["dip"], rake=TRUE_SDR["rake"],
                             length=8e3, width=4e3, slip=TRUE_SLIP)
    disp = np.asarray(rect.surface_displacement(jnp.asarray(coords)))
    los = np.tile([-0.6, 0.1, 0.79], (coords.shape[0], 1))
    los /= np.linalg.norm(los, axis=1, keepdims=True)
    obs = (disp * los).sum(1)
    sd = 0.01 * max(np.abs(obs).max(), 1e-9)
    scene = GeodeticDataset(
        name="ifg", typ="SAR", coords=coords,
        displacement=obs + rng.normal(0, sd, obs.shape), los_vector=los,
        covariance=Covariance(data=np.eye(obs.size) * sd**2))

    def build(outdir, sampler_params):
        seis = SeismicGeometryComposite(
            [wavemap], [DCSource(depth=TRUE_DEPTH, **TRUE_SDR,
                                 magnitude=TRUE_MAG, duration=1.5)])
        geo = GeodeticGeometryComposite(
            [scene], [RectangularSource(depth=TRUE_DEPTH, strike=TRUE_SDR["strike"],
                                        dip=TRUE_SDR["dip"], rake=TRUE_SDR["rake"],
                                        length=8e3, width=4e3, slip=TRUE_SLIP)])
        priors = PriorSet()
        priors.add(Parameter("strike", [10.0], [70.0], testvalue=[TRUE_SDR["strike"]]))
        priors.add(Parameter("slip", [0.2], [3.0], testvalue=[TRUE_SLIP]))
        return Problem(priors, {"seismic": seis, "geodetic": geo},
                       outfolder=str(outdir), sampler_params=sampler_params)

    return build


class TestJoint:
    def test_both_datatypes_contribute(self, joint_problem_factory, tmp_path):
        problem = joint_problem_factory(tmp_path / "j", SMCParams())
        logp_fn, data = problem.make_logp_fn()
        logp = lambda q: logp_fn(q, data)
        q_true = problem.point_to_array({"strike": TRUE_SDR["strike"],
                                         "slip": TRUE_SLIP})
        l_full = float(logp(jnp.asarray(q_true)))
        # perturbing strike hurts seismic; perturbing slip hurts geodetic
        q_s = problem.point_to_array({"strike": TRUE_SDR["strike"] + 25.0,
                                      "slip": TRUE_SLIP})
        q_g = problem.point_to_array({"strike": TRUE_SDR["strike"],
                                      "slip": TRUE_SLIP * 2})
        assert l_full > float(logp(jnp.asarray(q_s)))
        assert l_full > float(logp(jnp.asarray(q_g)))
        assert {"h_any_P_0", "h_SAR"} <= set(problem.priors.names)

    def test_smc_joint_recovery(self, joint_problem_factory, tmp_path):
        problem = joint_problem_factory(
            tmp_path / "smc", SMCParams(n_chains=64, n_steps=40, seed=9))
        q_tr, _ = problem.sample()
        est = problem.ordering.to_point(q_tr[-1].mean(axis=0))
        assert abs(est["strike"] - TRUE_SDR["strike"]) < 6.0
        assert abs(est["slip"] - TRUE_SLIP) < 0.15

    @pytest.mark.slow
    def test_pt_joint_recovery(self, joint_problem_factory, tmp_path):
        problem = joint_problem_factory(
            tmp_path / "pt", PTParams(n_chains=8, n_chains_posterior=2,
                                      n_samples=6000, swap_interval=(12, 12),
                                      beta_tune_interval=1500, seed=13))
        q_tr, llk_tr, history = problem.sample()
        n_burn = q_tr.shape[0] // 2
        est = problem.ordering.to_point(q_tr[n_burn:].reshape(-1, q_tr.shape[-1]).mean(axis=0))
        assert abs(est["strike"] - TRUE_SDR["strike"]) < 8.0
        assert abs(est["slip"] - TRUE_SLIP) < 0.2
        assert np.all(np.asarray(history["betas"][:2]) == 1.0)
