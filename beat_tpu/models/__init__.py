"""
Problem / composite layer: assembles the pure-JAX log-posterior from
datasets + sources + noise models, and drives the samplers.

Re-design of ``beat/models/``: instead of building a pytensor graph that
is compiled once per worker process, composites contribute pure functions
``point -> log-likelihood`` which the Problem sums and the samplers
``vmap`` over chains.
"""

from beat_tpu.models.base import Composite  # noqa: F401
from beat_tpu.models.geodetic import GeodeticGeometryComposite  # noqa: F401
from beat_tpu.models.problem import Problem, load_model  # noqa: F401
