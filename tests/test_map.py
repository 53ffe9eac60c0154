"""MAP + Laplace fitting (``lightcurve_map``): exact recovery on a Gaussian
posterior, and agreement with the converged ensemble posterior on the
flagship ShockCooling2 fit — a beyond-reference capability (the reference's
only optimizer path is the per-epoch blackbody curve_fit,
reference bolometric.py:483-534)."""

import numpy as np
import jax.numpy as jnp

from lightcurve_fitting_tpu.parallel.optimize import multistart_maximize, laplace_covariance


def test_multistart_recovers_gaussian_mode_and_curvature():
    mean = np.array([1.0, -2.0, 0.5])
    cov = np.array([[1.0, 0.6, 0.0], [0.6, 1.0, 0.2], [0.0, 0.2, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(mean)

    def logp(p):
        d = p - mu
        return -0.5 * d @ prec @ d

    rng = np.random.default_rng(0)
    u0 = rng.normal(size=(16, 3)) * 4.0
    u_fin, logp_fin = multistart_maximize(logp, u0, n_iter=600, learning_rate=0.2)
    best = np.asarray(u_fin)[np.argmax(logp_fin)]
    np.testing.assert_allclose(best, mean, atol=2e-3)
    lap, ok = laplace_covariance(logp, best)
    assert ok
    np.testing.assert_allclose(lap, cov, atol=1e-6)


def test_multistart_nonfinite_starts_do_not_poison_batch():
    def logp(p):
        # -inf half-plane: gradients there are NaN-free zero after masking
        return jnp.where(p[0] > 0, -0.5 * jnp.sum((p - 3.0) ** 2), -jnp.inf)

    u0 = np.array([[-5.0, 0.0], [4.0, 0.0], [2.0, 9.0]])
    u_fin, logp_fin = multistart_maximize(logp, u0, n_iter=400, learning_rate=0.3)
    logp_fin = np.asarray(logp_fin)
    # the two feasible starts reach the mode regardless of the dead one
    assert np.isfinite(logp_fin[1]) and np.isfinite(logp_fin[2])
    np.testing.assert_allclose(np.asarray(u_fin)[1], [3.0, 3.0], atol=1e-2)


def test_laplace_covariance_conditional_on_pinned():
    prec = jnp.asarray(np.array([[2.0, 0.5], [0.5, 1.0]]))

    def logp(p):
        return -0.5 * p @ prec @ p

    free = np.array([True, False])
    cov, ok = laplace_covariance(logp, np.zeros(2), free=free)
    assert ok
    assert cov[1, 1] == 0.0 and cov[0, 1] == 0.0
    np.testing.assert_allclose(cov[0, 0], 0.5)  # 1/prec[0,0], conditional


def test_lightcurve_mcmc_init_map_short_burnin():
    """``init="map"`` seeds walkers from the Laplace draws: the flagship fit
    reaches the converged posterior with a 100-step burn-in, where wide-start
    ensembles are still contracting after thousands of steps (VALIDATION.md).
    Pinned t_0 walkers are jittered into the band inside the bound, so the
    stretch move keeps exploring that dimension."""
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc
    from tests.test_hmc import _flagship_lc_and_model, _flagship_priors

    lc_early, model = _flagship_lc_and_model()
    s = lightcurve_mcmc(lc_early, model, priors=_flagship_priors(),
                        p_lo=[20, 2, 20, 57468.4], p_up=[50, 5, 50, 57468.69],
                        nwalkers=48, nsteps=100, nsteps_burnin=80,
                        init="map", seed=1, quiet=True)
    med = np.median(s.flatchain, axis=0)
    std = s.flatchain.std(axis=0)
    truth_med = [37.58, 5.326, 16.25, 57468.6999]
    truth_std = [0.145, 0.053, 0.110, 0.00018]
    for d in range(4):
        assert abs(med[d] - truth_med[d]) < 4 * truth_std[d], (d, med[d])
        assert truth_std[d] / 2 < std[d] < truth_std[d] * 2, (d, std[d])


def test_lightcurve_map_flagship():
    """MAP of the SN 2016bkv ShockCooling2 fit reproduces the converged
    ensemble posterior (truth recorded in test_hmc.py): mode at the medians,
    Laplace stderr at the stds, t_0 detected pinned at its prior bound."""
    from lightcurve_fitting_tpu.fitting import lightcurve_map
    from tests.test_hmc import _flagship_lc_and_model, _flagship_priors

    lc_early, model = _flagship_lc_and_model()
    result = lightcurve_map(lc_early, model, _flagship_priors(), seed=0, quiet=True)

    truth_med = [37.58, 5.326, 16.25, 57468.6999]
    truth_std = [0.145, 0.053, 0.110, 0.00018]
    for d in range(4):
        assert abs(result.parameters[d] - truth_med[d]) < truth_std[d], d
    assert result.covariance_ok
    assert list(result.at_bound) == [False, False, False, True]
    for d in range(3):
        assert truth_std[d] / 1.3 < result.stderr[d] < truth_std[d] * 1.3, d
    assert result.stderr[3] == 0.0
    # Laplace draws feed the corner plot machinery: flatchain-compatible
    assert result.flatchain.shape == (1000, 4)
    assert np.ptp(result.flatchain[:, 3]) == 0.0  # pinned column held fixed
    assert np.isfinite(result.log_posterior)
