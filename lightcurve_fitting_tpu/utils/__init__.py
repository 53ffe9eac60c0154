"""Host-side substrate: table, units, cosmology, time, FITS, corner plots,
native kernels, profiling."""

from .table import Table, Column, MaskedColumn, vstack  # noqa: F401
from .timeutil import Time  # noqa: F401
from .cosmology import Planck18, FlatLambdaCDM  # noqa: F401
