"""Model zoo: analytical supernova light-curve models as pure jax functions.

Public surface mirrors the reference's ``lightcurve_fitting.models`` module.
"""

from ..core.constants import k_B, c1, c2, c3, c4  # noqa: F401
from ..ops.mathx import power  # noqa: F401
from .base import Model, format_unit  # noqa: F401
from .blackbody import (planck_fast, planck, blackbody_to_filters,  # noqa: F401
                        planck_lnu, bandflux_pointwise, bandflux_outer)
from .priors import (Prior, UniformPrior, LogUniformPrior, GaussianPrior,  # noqa: F401
                     KDEPrior)
from .shock_cooling import (BaseShockCooling, ShockCooling, ShockCooling2,  # noqa: F401
                            ShockCooling3, ShockCooling4)
from .companion_shocking import (BaseCompanionShocking, CompanionShocking,  # noqa: F401
                                 CompanionShocking2, CompanionShocking3,
                                 sifto, M_chandra)
