"""NaN-guard CI mode (SURVEY.md §4/§5): the flagship fit's full device path —
model kernels, band tables, likelihood, stretch move — runs under
``jax_debug_nans``, which raises on the first NaN produced by any primitive.
This proves the double-where formulations (ops/mathx.py) keep the whole graph
NaN-free, not merely NaN-masked at the end."""

import os

import numpy as np
import jax
import pytest

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
from lightcurve_fitting_tpu.fitting import lightcurve_mcmc, make_log_posterior

EXAMPLE = os.path.join(os.path.dirname(__file__), "..",
                       "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def _early_lc():
    lc = LC.read(EXAMPLE)
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    return lc.where(MJD_min=57468.0, MJD_max=57485.0)


def test_flagship_fit_is_nan_free_under_debug_nans(debug_nans):
    lc_early = _early_lc()
    model = ShockCooling2(lc_early)
    priors = [UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0),
              UniformPrior(0.0, 100.0), UniformPrior(57468.0, 57468.7)]
    sampler = lightcurve_mcmc(lc_early, model, priors=priors,
                              p_lo=[20.0, 2.0, 20.0, 57468.5],
                              p_up=[50.0, 5.0, 50.0, 57468.7],
                              nwalkers=16, nsteps=30, nsteps_burnin=30,
                              seed=1, quiet=True, shard=False)
    assert np.isfinite(sampler.flatchain).all()


def test_gradients_are_nan_free_under_debug_nans(debug_nans):
    """jax.grad through the full posterior, including at a pre-explosion time
    region (negative phase -> zero flux branch of the double-where)."""
    lc_early = _early_lc()
    model = ShockCooling2(lc_early)
    priors = [UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0),
              UniformPrior(0.0, 100.0), UniformPrior(57468.0, 57468.7)]
    logpost = make_log_posterior(model, lc_early, priors)
    grad = jax.grad(logpost)(np.array([30.0, 4.0, 30.0, 57468.6]))
    assert np.isfinite(np.asarray(grad)).all()


def test_map_fit_is_nan_free_under_debug_nans(debug_nans):
    """The optimizer path — bounds bijection, batched Adam value-and-grad,
    and the Hessian at the mode — raises on no NaN primitive anywhere."""
    from lightcurve_fitting_tpu.fitting import lightcurve_map
    from lightcurve_fitting_tpu.models import GaussianPrior

    lc_early = _early_lc()
    model = ShockCooling2(lc_early)
    priors = [GaussianPrior(0.0, 100.0, 30.0, 15.0),
              GaussianPrior(0.0, 100.0, 4.0, 3.0),
              GaussianPrior(0.0, 100.0, 30.0, 15.0),
              GaussianPrior(57468.0, 57468.7, 57468.5, 0.2)]
    result = lightcurve_map(lc_early, model, priors, n_starts=8, n_iter=150,
                            seed=0, quiet=True)
    assert np.isfinite(result.parameters).all()
    assert np.isfinite(result.covariance).all()
