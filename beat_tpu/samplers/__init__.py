"""
Samplers: vmapped adaptive Metropolis, SMC (transitional MCMC) and
parallel tempering — all chains advance in lockstep on device
(replaces ``beat/sampler/``'s fork pools and MPI).
"""

from beat_tpu.samplers.base import choose_proposal  # noqa: F401
from beat_tpu.samplers.metropolis import (  # noqa: F401
    MetropolisParams,
    MetropolisState,
    init_metropolis_state,
    metropolis_sample,
    run_metropolis_stage,
)
from beat_tpu.samplers.smc import SMCParams, calc_beta, smc_sample, systematic_resample  # noqa: F401
from beat_tpu.samplers.pt import PTParams, pt_sample  # noqa: F401
