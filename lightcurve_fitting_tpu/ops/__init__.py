"""Device building blocks: filter quadrature, band tables, extinction, splines."""

from .filterbank import FilterBank  # noqa: F401
from .bandtable import ChebyshevBandTable, chebyshev_bandflux  # noqa: F401
from .extinction import fitzpatrick99, extinction_law, f99_curve, f99_k_jax  # noqa: F401
from .mathx import power, safe_reciprocal, planck_denom_inv  # noqa: F401
