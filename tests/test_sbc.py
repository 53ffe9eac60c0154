"""Simulation-based calibration (``parallel/sbc.py``) and prior sampling:
the rank machinery against known-calibrated / known-biased synthetic
posteriors, prior ``sample()`` distributions against their own ``logp``,
and the end-to-end harness on a small ShockCooling2 population."""

import numpy as np
import pytest

from lightcurve_fitting_tpu.models import (UniformPrior, LogUniformPrior,
                                           GaussianPrior, KDEPrior)
from lightcurve_fitting_tpu.parallel.sbc import (rank_statistic,
                                                 uniformity_pvalues,
                                                 simulation_based_calibration,
                                                 plot_sbc)


def test_prior_sampling_matches_logp():
    """KS-test each prior's draws against its own (normalized) density."""
    from scipy.stats import kstest

    rng = np.random.default_rng(0)
    n = 4000

    x = UniformPrior(2.0, 7.0).sample(rng, n)
    assert kstest(x, "uniform", args=(2.0, 5.0)).pvalue > 1e-3
    assert x.min() > 2.0 and x.max() < 7.0

    x = LogUniformPrior(0.1, 10.0).sample(rng, n)
    assert kstest(np.log(x), "uniform",
                  args=(np.log(0.1), np.log(100.0))).pvalue > 1e-3

    x = GaussianPrior(-1.0, 1.0, mean=0.0, stddev=1.0).sample(rng, n)
    assert x.min() > -1.0 and x.max() < 1.0
    from scipy.stats import truncnorm
    assert kstest(x, truncnorm(-1.0, 1.0).cdf).pvalue > 1e-3

    comp = rng.normal(5.0, 2.0, size=300)
    kde = KDEPrior(comp)
    x = kde.sample(rng, n)
    assert abs(np.mean(x) - np.mean(comp)) < 0.3

    with pytest.raises(ValueError):
        UniformPrior(0.0, np.inf).sample(rng, 3)
    with pytest.raises(NotImplementedError):
        class Odd(UniformPrior):
            sample = __import__("lightcurve_fitting_tpu.models.priors",
                                fromlist=["Prior"]).Prior.sample
        Odd(0, 1).sample(rng)


def test_clone_for_preserves_physics_options():
    """The SBC harness re-instantiates the template model per simulated LC;
    subclass constructor options (ShockCooling n/RW) must survive."""
    from lightcurve_fitting_tpu.models import ShockCooling, ShockCooling4

    m = ShockCooling(n=3.0, RW=True, redshift=0.01)
    c = m.clone_for(None)
    assert (c.n, c.RW, c.z) == (3.0, True, 0.01)
    assert c.epsilon_1 == m.epsilon_1
    c4 = ShockCooling4(redshift=0.02).clone_for(None)
    assert c4.z == 0.02


def test_rank_statistic_calibrated_vs_biased():
    """Exact synthetic check: when posterior draws and truths come from the
    same joint distribution the ranks are uniform; a biased posterior is
    flagged."""
    rng = np.random.default_rng(1)
    S, M, D, L = 256, 400, 2, 63
    # truth ~ N(0,1); posterior for each sim: N(truth + noise, 1) drawn
    # exactly (calibrated: draws | data and truth | data are exchangeable)
    truths = rng.normal(size=(S, D))
    obs = truths + rng.normal(size=(S, D))          # one observation, sigma=1
    # exact posterior given obs with N(0,1) prior: N(obs/2, 1/2)
    post = obs[:, None, :] / 2 + np.sqrt(0.5) * rng.normal(size=(S, M, D))
    truths_post = truths                              # same joint model
    ranks = rank_statistic(post, truths_post, n_ranks=L, seed=0)
    assert ranks.shape == (S, D)
    assert ranks.min() >= 0 and ranks.max() <= L
    p = uniformity_pvalues(ranks, L)
    assert np.all(p > 1e-3)

    # biased posterior (shifted by 0.7 sigma): decisively non-uniform
    ranks_b = rank_statistic(post + 0.7, truths_post, n_ranks=L, seed=0)
    p_b = uniformity_pvalues(ranks_b, L)
    assert np.all(p_b < 1e-4)

    # overdispersed posterior (x2 width): n-shaped histogram, also flagged
    ranks_o = rank_statistic(obs[:, None, :] / 2 + 2.0 * rng.normal(
        size=(S, M, D)), truths_post, n_ranks=L, seed=0)
    p_o = uniformity_pvalues(ranks_o, L)
    assert np.all(p_o < 1e-2)


def test_uniformity_binning_validation():
    ranks = np.random.default_rng(0).integers(0, 64, size=(100, 1))
    with pytest.raises(ValueError):
        uniformity_pvalues(ranks, 63, n_bins=5)   # 64 % 5 != 0
    # auto bin count shrinks for small S
    p = uniformity_pvalues(ranks[:20], 63)
    assert 0.0 <= p[0] <= 1.0


def test_sbc_validates_before_fitting_and_separates_streams():
    """The n_ranks/n_bins incompatibility must be caught BEFORE the
    expensive fits, and the fit RNG stream must differ from the truth
    stream (a shared stream makes walker initialization a deterministic
    function of the truths)."""
    from lightcurve_fitting_tpu.models import ShockCooling2

    model = ShockCooling2()
    priors = [UniformPrior(8.0, 20.0), UniformPrior(1.0, 4.0),
              UniformPrior(25.0, 50.0)]
    # nsteps*nwalkers = 96 caps n_ranks at 96; 97 is prime -> no valid bins
    with pytest.raises(ValueError, match="n_ranks"):
        simulation_based_calibration(model, priors,
                                     times=np.linspace(1.0, 8.0, 4),
                                     filters=["g", "r"], n_sims=20,
                                     n_ranks=127, nwalkers=32, nsteps=3,
                                     nsteps_burnin=2, seed=0, quiet=True)


def test_rank_statistic_rejects_oversized_n_ranks():
    """A silent cap would desynchronize the ranks' support from the n_ranks
    handed to uniformity_pvalues (top bins structurally empty -> calibrated
    pipelines flagged NON-UNIFORM); the helper must refuse instead."""
    rng = np.random.default_rng(0)
    post = rng.normal(size=(8, 100, 2))
    truths = rng.normal(size=(8, 2))
    with pytest.raises(ValueError, match="exceeds the 100"):
        rank_statistic(post, truths, n_ranks=127)


def test_sbc_rejects_summaries_fast_path():
    """fit_population's summaries/return_chains options cannot feed the rank
    statistic; they must fail fast with a clear message, not crash on tuple
    unpacking after the fits."""
    from lightcurve_fitting_tpu.models import ShockCooling2

    model = ShockCooling2()
    priors = [UniformPrior(8.0, 20.0), UniformPrior(1.0, 4.0),
              UniformPrior(25.0, 50.0)]
    for kw in ({"summaries": True}, {"return_chains": False}):
        with pytest.raises(TypeError, match="full chains"):
            simulation_based_calibration(model, priors,
                                         times=np.linspace(1.0, 8.0, 4),
                                         filters=["g", "r"], n_sims=4,
                                         n_ranks=63, nwalkers=16, nsteps=4,
                                         nsteps_burnin=2, seed=0, quiet=True,
                                         **kw)


def test_sbc_use_sigma_generative_model():
    """With use_sigma=True the last prior is the intrinsic-scatter
    parameter: the simulation noise includes it and the fit samples it.
    A pure-likelihood check on a tiny run (full calibration of the sigma
    path is statistical and covered by the main harness design)."""
    from lightcurve_fitting_tpu.models import ShockCooling2

    model = ShockCooling2()
    priors = [UniformPrior(8.0, 20.0), UniformPrior(1.0, 4.0),
              UniformPrior(25.0, 50.0), UniformPrior(0.5, 2.0)]
    res = simulation_based_calibration(
        model, priors, times=np.linspace(1.0, 8.0, 4),
        filters=["g", "r", "i"], n_sims=8, n_ranks=31, nwalkers=16,
        nsteps=20, nsteps_burnin=20, use_sigma=True, seed=0, quiet=True,
        init="window")
    assert res["ranks"].shape == (8, 4)          # sigma is ranked too
    assert res["truths"].shape == (8, 4)
    assert np.all(res["truths"][:, -1] > 0.5) and np.all(
        res["truths"][:, -1] < 2.0)


def test_sbc_end_to_end_shockcooling2(tmp_path):
    """The full harness on a 3-parameter ShockCooling2 population: ranks in
    range, calibrated p-values, and the plot writes. Statistical: seeds and
    budgets chosen so calibrated inference passes comfortably (see
    VALIDATION.md for the larger record)."""
    import matplotlib
    matplotlib.use("Agg")
    from lightcurve_fitting_tpu.models import ShockCooling2

    model = ShockCooling2()
    priors = [UniformPrior(8.0, 20.0), UniformPrior(1.0, 4.0),
              UniformPrior(25.0, 50.0)]
    res = simulation_based_calibration(
        model, priors, times=np.linspace(1.0, 8.0, 5),
        filters=["g", "r", "i", "B"], n_sims=64, n_ranks=63,
        nwalkers=32, nsteps=600, nsteps_burnin=400, seed=1, quiet=True)
    assert res["ranks"].shape == (64, 3)
    assert res["ranks"].min() >= 0 and res["ranks"].max() <= 63
    assert np.all(res["acceptance"] > 0.2)
    assert np.all(res["p_values"] > 1e-3)
    fig = plot_sbc(res, model, save_plot_as=str(tmp_path / "sbc.png"))
    assert (tmp_path / "sbc.png").exists()


def test_plot_sbc_use_sigma_pads_labels(tmp_path):
    """Round-4 review fix: a use_sigma SBC run ranks n_model+1 parameters;
    plot_sbc(model=...) must pad the model's axis labels with sigma instead
    of raising IndexError on the last subplot."""
    import types
    rng = np.random.default_rng(3)
    res = {"ranks": rng.integers(0, 64, size=(40, 3)), "n_ranks": 63}
    model = types.SimpleNamespace(axis_labels=["$T$", "$R$"])
    fig = plot_sbc(res, model, save_plot_as=str(tmp_path / "s.png"))
    xlabels = [ax.get_xlabel() for ax in fig.axes]
    assert xlabels[:2] == ["$T$", "$R$"] and "sigma" in xlabels[2]
