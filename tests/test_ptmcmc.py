"""Parallel tempering: replica-exchange mode hopping on multimodal targets
(where the plain stretch move stays trapped) and the one-call light-curve
driver with free evidence."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightcurve_fitting_tpu.parallel.evidence import stepping_stone_evidence


def _bimodal_setup():
    """Equal-weight Gaussian mixture at +/-3 with sigma 0.25 in 2-D: the
    inter-mode valley is ~e^-70 deep, uncrossable by local moves."""
    aa = 8.0

    def log_prior(p):
        inside = jnp.all((p > -aa) & (p < aa))
        return jnp.where(inside, -2 * jnp.log(2 * aa), -jnp.inf)

    mu = jnp.asarray([3.0, 3.0])

    def log_like(p):
        a = -0.5 * jnp.sum((p - mu) ** 2) / 0.25 ** 2
        b = -0.5 * jnp.sum((p + mu) ** 2) / 0.25 ** 2
        return jnp.logaddexp(a, b)

    return log_prior, log_like, aa


def test_replica_exchange_recovers_both_modes_from_one():
    log_prior, log_like, aa = _bimodal_setup()
    rng = np.random.default_rng(0)
    p0 = rng.normal([3.0, 3.0], 0.25, (32, 2))   # ALL walkers in one mode
    log_z, err, info = stepping_stone_evidence(log_prior, log_like, p0,
                                               n_rungs=12, nsteps=600,
                                               nsteps_burnin=600, seed=1,
                                               return_cold_chain=True)
    cold = info["cold_chain"][300:].reshape(-1, 2)   # second half
    frac_pos = float(np.mean(cold[:, 0] > 0))
    # hot rungs roam the prior, swaps repopulate the missing mode
    assert 0.25 < frac_pos < 0.75, frac_pos
    # samples sit IN the modes, not the valley
    d = np.minimum(np.abs(cold[:, 0] - 3.0), np.abs(cold[:, 0] + 3.0))
    assert np.percentile(d, 95) < 1.0
    # evidence of the mixture: 2 * (2 pi sigma^2) / (2a)^2 ... the mixture
    # logaddexp (unnormalized, peak 1 per mode) integrates to
    # 2 * 2 pi sigma^2; prior volume (2a)^2
    true_log_z = np.log(2 * 2 * np.pi * 0.25 ** 2) - 2 * np.log(2 * aa)
    assert abs(log_z - true_log_z) < max(5 * err, 0.2), (log_z, true_log_z, err)
    # swap diagnostics present and healthy somewhere on the ladder
    assert info["swap_rate"].max() > 0.2


def test_lightcurve_ptmcmc_flagship_screening():
    """One-call PT fit of SN 2016bkv: cold chain on the posterior ridge and
    a finite evidence, in one kernel."""
    from lightcurve_fitting_tpu.fitting import lightcurve_ptmcmc
    from tests.test_hmc import _flagship_lc_and_model, _flagship_priors

    lc_early, model = _flagship_lc_and_model()
    result = lightcurve_ptmcmc(lc_early, model, _flagship_priors(),
                               p_lo=[20, 2, 20, 57468.4],
                               p_up=[50, 5, 50, 57468.69],
                               nwalkers=32, n_rungs=6, nsteps=250,
                               nsteps_burnin=350, seed=2, quiet=True)
    assert result.flatchain.shape == (250 * 32, 4)
    med = np.median(result.flatchain, axis=0)
    assert 30.0 < med[0] < 45.0 and 4.5 < med[1] < 6.0, med
    assert np.isfinite(result.log_z) and result.log_z_err < 20.0
    assert result.swap_rate.shape == (7,)


def test_sharded_ladder_matches_single_device():
    """The mesh-sharded tempered ladder (walker axis over 8 virtual devices;
    swaps communication-free, partner pool all-gathered) gives the same
    evidence and cold-chain statistics as the single-device run."""
    from lightcurve_fitting_tpu.parallel.mesh import walker_mesh

    log_prior, log_like, aa = _bimodal_setup()
    rng = np.random.default_rng(2)
    p0 = rng.uniform(-aa, aa, (64, 2))
    kw = dict(n_rungs=12, nsteps=400, nsteps_burnin=400, seed=3,
              return_cold_chain=True)
    z1, e1, info1 = stepping_stone_evidence(log_prior, log_like, p0, **kw)
    mesh = walker_mesh(8)
    z8, e8, info8 = stepping_stone_evidence(log_prior, log_like, p0,
                                            mesh=mesh, **kw)
    # different RNG layout -> statistical, not bitwise, agreement
    assert abs(z1 - z8) < 5 * np.hypot(e1, e8) + 0.1, (z1, z8, e1, e8)
    c1 = info1["cold_chain"][200:].reshape(-1, 2)
    c8 = info8["cold_chain"][200:].reshape(-1, 2)
    # both cold chains are bimodal with equal weights
    for c in (c1, c8):
        frac = float(np.mean(c[:, 0] > 0))
        assert 0.25 < frac < 0.75, frac
    assert abs(np.abs(c1).mean() - np.abs(c8).mean()) < 0.15
