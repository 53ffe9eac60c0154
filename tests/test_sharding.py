"""Multi-device walker sharding on the 8-device virtual CPU mesh (SURVEY.md §4:
compare sharded vs single-device chains)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightcurve_fitting_tpu.parallel.sampler import EnsembleSampler
from lightcurve_fitting_tpu.parallel.mesh import ShardedEnsembleSampler, walker_mesh


def _logp_gauss(p):
    mu = jnp.array([1.0, -1.0, 0.5])
    return -0.5 * jnp.sum((p - mu) ** 2)


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


def test_sharded_sampler_matches_single_device_statistics():
    nwalkers = 64
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(nwalkers, 3))

    mesh = walker_mesh(8)
    s_sh = ShardedEnsembleSampler(nwalkers, 3, _logp_gauss, mesh=mesh, seed=10)
    pos, _, _ = s_sh.run_mcmc(p0, 300)
    s_sh.reset()
    s_sh.run_mcmc(pos, 1500, skip_initial_state_check=True)

    s_1 = EnsembleSampler(nwalkers, 3, _logp_gauss, seed=11)
    pos1, _, _ = s_1.run_mcmc(p0, 300)
    s_1.reset()
    s_1.run_mcmc(pos1, 1500, skip_initial_state_check=True)

    a, b = s_sh.flatchain, s_1.flatchain
    assert a.shape == b.shape == (1500 * nwalkers, 3)
    # same target: agree in mean and covariance within MC error
    np.testing.assert_allclose(a.mean(0), [1.0, -1.0, 0.5], atol=0.08)
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.1)
    np.testing.assert_allclose(a.std(0), b.std(0), rtol=0.1)
    assert 0.2 < s_sh.acceptance_fraction.mean() < 0.9


def test_sharded_rejects_indivisible_walkers():
    mesh = walker_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        ShardedEnsembleSampler(12, 3, _logp_gauss, mesh=mesh)


def test_sharded_model_fit_smoke():
    """Sharded fit of the actual flagship model on the 8-device mesh."""
    import os
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import make_log_posterior

    example = os.path.join(os.path.dirname(__file__), "..",
                           "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")
    lc = LC.read(example)
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    lc_early = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    model = ShockCooling2(lc_early)
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    logpost = make_log_posterior(model, lc_early, priors)

    nwalkers = 32
    rng = np.random.default_rng(1)
    p0 = rng.uniform([20, 2, 20, 57468.5], [50, 5, 50, 57468.7], size=(nwalkers, 4))
    s = ShardedEnsembleSampler(nwalkers, 4, logpost, mesh=walker_mesh(8), seed=2)
    s.run_mcmc(p0, 50)
    assert np.isfinite(s.flatchain).all()
    assert s.flatchain[:, 3].min() >= 57468.0
