"""Statistical parity with the reference pipeline (BASELINE.json north star:
posterior means within ~1 sigma/sqrt(N_eff) of reference emcee on SN 2016bkv).

emcee/astropy are unavailable here, so the 'reference' is reconstructed
faithfully: the log-posterior evaluated exactly the reference way — per-point
Python loop over ``Filter.synthesize`` native-grid trapezoids
(models.py:93-136 + filters.py:288-310, pure numpy float64) — sampled with a
pure-numpy Goodman-Weare stretch move (the same algorithm emcee implements).
The device pipeline must agree in distribution.
"""

import os

import numpy as np
import pytest

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior, planck_fast
from lightcurve_fitting_tpu.fitting import lightcurve_mcmc
from lightcurve_fitting_tpu.parallel.host_sampler import HostEnsembleSampler

EXAMPLE = os.path.join(os.path.dirname(__file__), "..",
                       "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")

PRIORS = [UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0),
          UniformPrior(57468.0, 57468.7)]
P_LO = np.array([20.0, 2.0, 20.0, 57468.5])
P_UP = np.array([50.0, 5.0, 50.0, 57468.7])


@pytest.fixture(scope="module")
def lc_early():
    lc = LC.read(EXAMPLE)
    lc.meta["dm"] = 30.79
    lc.meta["extinction"] = {
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020,
    }
    lc.meta["redshift"] = 0.002
    lc.calcAbsMag()
    lc.calcLum()
    sub = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    # thin to every 3rd point so the pure-python reference run stays fast
    return sub[np.arange(len(sub)) % 3 == 0]


def reference_log_posterior(lc):
    """The reference's log-posterior, reconstructed in pure numpy float64:
    per-point Filter.synthesize over the native transmission grids."""
    t = np.asarray(lc["MJD"], float)
    f = list(lc["filter"])
    y = np.asarray(lc["lum"], float)
    dy = np.asarray(lc["dlum"], float)
    z = lc.meta["redshift"]
    m = ShockCooling2()  # only for coefficient constants

    def logpost(p):
        for prior, lo_hi in zip(p, [(0, 100), (0, 100), (0, 100), (57468.0, 57468.7)]):
            if not (lo_hi[0] < prior < lo_hi[1]):
                return -np.inf
        T_1, L_1, t_tr, t_exp = p
        tt = t - t_exp
        with np.errstate(over="ignore", invalid="ignore"):
            T_K = np.where(tt > 0, T_1 * np.where(tt > 0, tt, 1.0) ** m.epsilon_T, 0.0)
            L = np.where(tt > 0,
                         L_1 * np.exp(-np.where(tt > 0, m.a * tt / t_tr, 0.0) ** m.alpha)
                         * np.where(tt > 0, tt, 1.0) ** m.epsilon_L, 0.0) * 1e42
            from lightcurve_fitting_tpu.core.constants import c3
            R_bb = np.where(T_K > 0, c3 * L ** 0.5 * np.where(T_K > 0, T_K, 1.0) ** -2.0, 0.0)
        y_fit = np.array([fi.synthesize(planck_fast, Ti, Ri, z=z)
                          for fi, Ti, Ri in zip(f, T_K, R_bb)])
        return -0.5 * np.sum(np.log(2 * np.pi * dy ** 2) + ((y - y_fit) / dy) ** 2)

    return logpost


# stationary posterior of the THINNED lc_early, measured with a 64-walker
# device ensemble run to 4000 burn-in + 3000 production steps (split halves
# agree: med [38.088, 5.253, 17.095, 57468.6997],
# std [0.237, 0.083, 0.174, 0.00047]).  Both pipelines start inside this
# typical set so that short chains are stationary — the SC2 posterior is a
# thin curved ridge and wide-start ensembles contract for thousands of steps
# (VALIDATION.md), so wide-start snapshot comparisons re-roll with every RNG
# schedule change.
TIGHT_LO = np.array([37.85, 5.17, 16.92, 57468.698])
TIGHT_UP = np.array([38.33, 5.34, 17.27, 57468.7])


@pytest.mark.slow
def test_device_pipeline_matches_reference_pipeline(lc_early):
    # --- reference-style run (pure numpy, native grids, host stretch move)
    logpost_ref = reference_log_posterior(lc_early)
    nwalkers_ref = 20
    rng = np.random.default_rng(7)
    p0 = rng.uniform(TIGHT_LO, TIGHT_UP, size=(nwalkers_ref, 4))
    ref = HostEnsembleSampler(nwalkers_ref, 4, logpost_ref, seed=7)
    pos, _, _ = ref.run_mcmc(p0, 150)
    ref.reset()
    ref.run_mcmc(pos, 500, skip_initial_state_check=True)
    ref_flat = ref.flatchain

    # --- device pipeline (jitted ensemble, Chebyshev band tables)
    model = ShockCooling2(lc_early)
    sampler = lightcurve_mcmc(lc_early, model, priors=PRIORS,
                              p_lo=list(TIGHT_LO), p_up=list(TIGHT_UP),
                              nwalkers=40, nsteps=500,
                              nsteps_burnin=300, seed=19)
    dev_flat = sampler.flatchain

    # agreement in distribution: means within a fraction of the pooled width,
    # widths within 35% (N_eff is O(100) for these chain lengths)
    for d, name in enumerate(["T_1", "L_1", "t_tr", "t_0"]):
        mu_r, sd_r = ref_flat[:, d].mean(), ref_flat[:, d].std()
        mu_d, sd_d = dev_flat[:, d].mean(), dev_flat[:, d].std()
        assert abs(mu_d - mu_r) < 0.5 * max(sd_r, sd_d), (name, mu_r, mu_d, sd_r, sd_d)
        assert 0.65 < sd_d / sd_r < 1.55, (name, sd_r, sd_d)


def test_likelihood_values_match_reference_formula(lc_early):
    """Pointwise: the device log-likelihood equals the reference formula
    evaluated with native-grid synthesize. This is the fast default-screen
    for reference parity; the distribution-level chain comparison above is
    marked slow (19 evals/s pure-Python path) and runs with --runslow.

    Tolerance: the band table guarantees per-point |d ln g| < 1e-5
    (ChebyshevBandTable tol, verified at build); in the Gaussian
    log-likelihood that error is amplified by sum(|r_i| y_i/dy_i), which for
    the badly-fitting random window draws here is of order |log L| itself —
    so the budget is 1e-5 * |log L| (plus a 1e-3 floor for near-perfect
    fits, the regime the docstring's "<1e-3 absolute" refers to)."""
    logpost_ref = reference_log_posterior(lc_early)
    model = ShockCooling2(lc_early)
    from lightcurve_fitting_tpu.fitting import make_log_posterior
    logpost_dev = make_log_posterior(model, lc_early, PRIORS)
    rng = np.random.default_rng(1)
    for _ in range(5):
        p = rng.uniform(P_LO, P_UP)
        ref_val = logpost_ref(p)
        dev_val = float(logpost_dev(np.asarray(p)))
        assert dev_val == pytest.approx(ref_val, abs=max(1e-3, 1e-5 * abs(ref_val))), p
