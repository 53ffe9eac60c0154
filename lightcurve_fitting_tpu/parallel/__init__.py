"""Parallel execution: jitted ensemble sampler, walker/transient sharding,
batched epoch fits."""

from .sampler import EnsembleSampler, make_stretch_kernel  # noqa: F401
from .mesh import ShardedEnsembleSampler, walker_mesh, make_sharded_stretch_step  # noqa: F401
from .batched import pack_epochs, batched_blackbody_mcmc  # noqa: F401
from .population import (pack_population, fit_population,  # noqa: F401
                         population_goodness_of_fit,
                         population_information_criteria,
                         population_compare_elpd)
from .hmc import HMCSampler, BoundsTransform, WhitenedPosterior  # noqa: F401
from .nuts import NUTSSampler  # noqa: F401
from . import distributed  # noqa: F401
from .host_sampler import HostEnsembleSampler  # noqa: F401
from .diagnostics import (split_rhat, rank_normalized_split_rhat,  # noqa: F401
                          effective_sample_size, summarize_chain)
