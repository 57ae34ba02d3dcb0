"""
Trans-dimensional Voronoi slip inversion: recover a piecewise slip
distribution on a discretized fault from InSAR with reversible-jump
MCMC — the model complexity (number of slip patches' Voronoi nodes) is
itself sampled.

Run:  python examples/transd_slip.py   (~1 min)
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from beat_tpu.covariance import Covariance
from beat_tpu.ffi import TransDParams, discretize_sources, geo_construct_gf_linear
from beat_tpu.heart.geodesy import GeodeticDataset
from beat_tpu.models.distributer import (GeodeticDistributerComposite,
                                         transd_sample_ffi)
from beat_tpu.sources import RectangularSource


def main(outdir="transd_run"):
    rng = np.random.default_rng(0)
    ref = RectangularSource(depth=1e3, dip=60.0, length=8e3, width=4e3)
    fault = discretize_sources([ref], patch_length=1e3, patch_width=1e3)
    coords = rng.uniform(-10e3, 10e3, (80, 2))
    los = np.tile([0.0, 0.0, 1.0], (80, 1))
    lib = geo_construct_gf_linear(fault, coords, los, components=("uparr",))

    sf = fault.get_subfault(0)
    centers = sf.patch_centers_local()
    true = np.where(centers[:, 0] < 4e3, 0.4, 1.8)     # two-asperity slip
    synth = np.asarray(lib.stack_all(uparr=jnp.asarray(true)))
    sd = 0.03 * np.abs(synth).max()
    ds = GeodeticDataset(name="ifg", typ="SAR", coords=coords,
                         displacement=synth + rng.normal(0, sd, synth.shape),
                         los_vector=los,
                         covariance=Covariance(data=np.eye(80) * sd**2))
    comp = GeodeticDistributerComposite([ds], lib, fault)

    out = transd_sample_ffi(
        comp, TransDParams(k_max=15, n_chains=256, n_steps=5000,
                           record_every=20, seed=1),
        value_bounds=(0.0, 3.0), homepath=outdir)

    mean_slip = out["slip_trace"].reshape(-1, fault.npatches).mean(axis=0)
    corr = np.corrcoef(mean_slip, true)[0, 1]
    print(f"slip correlation {corr:.3f}, posterior k "
          f"{out['k_trace'].mean():.2f} (true structure: 2 regions), "
          f"accept {out['accept_rate']:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
