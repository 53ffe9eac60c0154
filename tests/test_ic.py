"""WAIC / PSIS-LOO information criteria (``parallel/ic.py`` +
``fitting.information_criteria``): numpy-core parity against analytic
results, and the device pointwise-likelihood path on a well-specified
synthetic fit. Beyond-reference capability (the reference has no model
selection at all, reference fitting.py:16-168)."""

import os

import numpy as np
import pytest

from lightcurve_fitting_tpu.parallel.ic import (waic, psis_loo, gpd_fit,
                                                _gpd_quantiles, psis_smooth,
                                                compare_elpd)


def test_gpd_fit_recovers_known_shapes():
    rng = np.random.default_rng(0)
    for k_true, sig_true in [(0.3, 1.0), (-0.2, 2.0)]:
        ks = []
        for _ in range(20):
            x = _gpd_quantiles(rng.uniform(size=500), k_true, sig_true)
            k, sig = gpd_fit(x)
            ks.append(k)
        assert np.mean(ks) == pytest.approx(k_true, abs=0.08)

    # scale equivariance down to denormal exceedance scales (the overflow
    # path: raw importance weights can be ~1e-300)
    x = _gpd_quantiles(rng.uniform(size=500), 0.3, 1e-250)
    k, sig = gpd_fit(x)
    assert k == pytest.approx(0.3, abs=0.15)
    assert sig == pytest.approx(1e-250, rel=0.5)

    # degenerate inputs refuse rather than crash
    k, sig = gpd_fit(np.array([1.0, 2.0]))
    assert np.isinf(k)


def test_waic_matches_hand_computation():
    rng = np.random.default_rng(3)
    ll = rng.normal(-1.0, 0.3, size=(200, 7))
    out = waic(ll)
    S = ll.shape[0]
    lppd = np.sum(np.log(np.mean(np.exp(ll), axis=0)))
    p = np.sum(np.var(ll, axis=0, ddof=1))
    assert out["elpd_waic"] == pytest.approx(lppd - p, rel=1e-10)
    assert out["p_waic"] == pytest.approx(p, rel=1e-10)
    assert out["waic"] == pytest.approx(-2 * (lppd - p), rel=1e-10)
    assert len(out["pointwise"]) == 7
    assert np.sum(out["pointwise"]) == pytest.approx(out["elpd_waic"])


def test_psis_loo_matches_analytic_conjugate_normal():
    """Known-mean-variance normal model with conjugate N(0, tau^2) prior on
    the mean: the exact leave-one-out predictive density is analytic
    (N(y_i; mu_{-i}, sigma^2 + s_{-i}^2)); PSIS-LOO on posterior draws must
    reproduce it far inside its own standard error."""
    rng = np.random.default_rng(1)
    N, sigma, tau = 40, 1.0, 10.0
    y = rng.normal(0.7, sigma, size=N)
    prec = 1 / tau ** 2 + N / sigma ** 2
    mu_n = (y.sum() / sigma ** 2) / prec
    mu_draws = rng.normal(mu_n, np.sqrt(1 / prec), size=4000)
    ll = (-0.5 * np.log(2 * np.pi * sigma ** 2)
          - 0.5 * ((y[None, :] - mu_draws[:, None]) / sigma) ** 2)

    exact = 0.0
    for i in range(N):
        prec_i = 1 / tau ** 2 + (N - 1) / sigma ** 2
        mu_i = ((y.sum() - y[i]) / sigma ** 2) / prec_i
        var_pred = sigma ** 2 + 1 / prec_i
        exact += (-0.5 * np.log(2 * np.pi * var_pred)
                  - 0.5 * (y[i] - mu_i) ** 2 / var_pred)

    out = psis_loo(ll)
    assert out["elpd_loo"] == pytest.approx(exact, abs=0.1)
    # one scalar parameter: both effective-parameter counts ~1
    assert 0.5 < out["p_loo"] < 1.5
    assert np.all(out["pareto_k"] < 0.7)
    # well-specified, large S: WAIC and LOO agree closely
    assert waic(ll)["elpd_waic"] == pytest.approx(out["elpd_loo"], abs=0.1)


def test_psis_smooth_normalizes_and_flags_heavy_tails():
    rng = np.random.default_rng(7)
    lw, k = psis_smooth(rng.normal(size=2000))
    assert np.exp(lw).sum() == pytest.approx(1.0, rel=1e-10)
    assert k < 0.7  # lognormal weights: finite-variance tail

    # raw weights from a shape-0.5 Pareto tail must be flagged
    heavy = np.log(_gpd_quantiles(rng.uniform(size=2000), 0.9, 1.0) + 0.1)
    lw, k = psis_smooth(heavy)
    assert np.exp(lw).sum() == pytest.approx(1.0, rel=1e-10)
    assert k > 0.6


def test_psis_extreme_tails_warning_free():
    """Extreme-contrast tails (denormal quartile exceedances, huge fitted k)
    must neither emit RuntimeWarnings nor produce non-finite smoothed
    weights — the ZS09 grid's -inf points drop out with zero mass and the
    overflowing top quantile is truncated at the raw max (regression: these
    leaked overflow/invalid warnings to users on badly misspecified fits)."""
    import warnings
    from lightcurve_fitting_tpu.parallel.ic import gpd_fit

    rng = np.random.default_rng(0)
    with warnings.catch_warnings():
        # scope the escalation to the class under test: unrelated future
        # DeprecationWarnings from numpy internals must not fail this
        warnings.simplefilter("error", RuntimeWarning)
        lw = np.concatenate([rng.normal(size=95),
                             [500.0, 499.0, 498.0, 497.0, 496.0]])
        out, k = psis_smooth(lw)
        assert np.isfinite(out).all()
        assert np.exp(out).sum() == pytest.approx(1.0, rel=1e-10)
        x = np.concatenate([np.full(20, 1e-310), [1e-3, 1e-2, 0.1, 1.0]])
        k2, sigma2 = gpd_fit(rng.permutation(x))
        assert np.isfinite(k2) and np.isfinite(sigma2)


def test_compare_elpd_paired_se():
    rng = np.random.default_rng(5)
    base = rng.normal(-2.0, 1.0, size=100)
    pw_a = base + rng.normal(0.0, 0.01, size=100)       # same predictions
    pw_b = base - 0.5 + rng.normal(0.0, 0.01, size=100)  # uniformly worse
    ranked = compare_elpd([pw_a, pw_b], ["A", "B"])
    assert ranked[0]["label"] == "A" and ranked[0]["d_elpd"] == 0.0
    assert ranked[1]["d_elpd"] == pytest.approx(-50.0, abs=1.0)
    # the PAIRED se reflects only the 0.01-scale jitter, not the shared
    # per-point difficulty (spread ~1): that's the whole point
    assert ranked[1]["se_d_elpd"] < 0.5

    with pytest.raises(ValueError):
        compare_elpd([pw_a, pw_b[:50]], ["A", "B"])


def test_compare_elpd_single_point_se_is_nan():
    """N=1 has no defined paired variance: se_d_elpd must be NaN (matching
    waic/psis_loo), never 0.0 (which would claim perfect certainty)."""
    from lightcurve_fitting_tpu.parallel.ic import compare_elpd
    out = compare_elpd([np.array([-1.0]), np.array([-2.0])], ["a", "b"])
    assert out[0]["label"] == "a" and out[0]["se_d_elpd"] == 0.0
    assert np.isnan(out[1]["se_d_elpd"])


def test_information_criteria_device_path_well_specified():
    """End-to-end on a well-specified synthetic ShockCooling2 fit: data
    generated from the model itself, so LOO and WAIC must agree, the
    effective parameter count must be near the true dimension, and the
    tails must be well-behaved."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import (lightcurve_mcmc,
                                                information_criteria,
                                                compare_information_criteria)

    rng = np.random.default_rng(2)
    filters = [filtdict[n] for n in ["U", "B", "V", "g", "r", "i"]]
    t0 = 57000.0
    t = np.repeat(t0 + np.linspace(1.0, 8.0, 6), len(filters))
    f = np.array(filters * 6)
    y_true = ShockCooling2()(t, f, 12.0, 2.0, 35.0, t0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    model = ShockCooling2(lc)
    priors = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
              UniformPrior(5.0, 100.0), UniformPrior(t0 - 2.0, t0 + 0.99)]
    s = lightcurve_mcmc(lc, model, priors=priors,
                        p_lo=[10.0, 1.5, 30.0, t0 - 0.5],
                        p_up=[14.0, 2.5, 40.0, t0 + 0.5],
                        nwalkers=32, nsteps=500, nsteps_burnin=500,
                        seed=4, quiet=True)
    ic = information_criteria(lc, model, s.flatchain, seed=0, quiet=True)

    assert ic["n_points"] == len(lc)
    assert np.isfinite(ic["elpd_loo"]) and np.isfinite(ic["elpd_waic"])
    # well-specified: LOO and WAIC estimate the same elpd
    assert ic["elpd_loo"] == pytest.approx(ic["elpd_waic"],
                                           abs=3.0 + 0.1 * ic["se_elpd_loo"])
    # 4 parameters: the effective count must be the right order
    assert 1.0 < ic["p_loo"] < 12.0
    # heavy tails should be rare for a well-specified model
    assert np.mean(ic["pareto_k"] > 0.7) < 0.15

    # a deliberately broken "posterior" (prior-scale jitter far off truth)
    # scores decisively worse, with the paired comparison flagging it
    bad = np.array([30.0, 8.0, 80.0, t0 - 1.5]) + 0.01 * rng.normal(
        size=(len(s.flatchain), 4))
    ic_bad = information_criteria(lc, model, bad, seed=0, quiet=True)
    tab = compare_information_criteria([ic, ic_bad], labels=["fit", "bad"],
                                       quiet=True)
    assert tab["model"][0] == "fit"
    # decisively worse (per-point elpd differences are huge and so is their
    # paired SE — the magnitude is what matters here)
    assert tab["d_elpd"][1] < -1000


def test_compare_models_loo_one_call():
    """One-call chain-based comparison on a well-specified synthetic fit:
    the truth-compatible configuration beats one whose prior forces a
    wrong transparency time, with the paired SE resolving the gap."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import compare_models_loo

    rng = np.random.default_rng(4)
    filters = [filtdict[n] for n in ["g", "r", "i", "B"]]
    t0 = 0.0
    t = np.repeat(np.linspace(1.0, 12.0, 7), len(filters))
    f = np.array(filters * 7)
    y_true = ShockCooling2()(t, f, 12.0, 2.0, 15.0, t0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])

    good = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
            UniformPrior(5.0, 100.0), UniformPrior(-1.0, 1.0)]
    # t_tr pinned far too low: the posterior cannot reach the truth
    bad = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
           UniformPrior(1.0, 3.0), UniformPrior(-1.0, 1.0)]
    tab = compare_models_loo(
        lc, [ShockCooling2(lc), ShockCooling2(lc)], [good, bad],
        p_lo=[[10.0, 1.5, 10.0, -0.3], [10.0, 1.5, 1.2, -0.3]],
        p_up=[[14.0, 2.5, 25.0, 0.3], [14.0, 2.5, 2.8, 0.3]],
        labels=["free", "pinned"], nwalkers=32, nsteps=300,
        nsteps_burnin=300, seed=6, quiet=True)
    assert list(tab.colnames) == ["model", "elpd_loo", "d_elpd", "se_d_elpd",
                                  "stacking_weight"]
    assert tab["model"][0] == "free"
    assert tab["d_elpd"][1] < -3.0 * max(tab["se_d_elpd"][1], 1.0)
    assert set(tab.meta["ics"]) == {"free", "pinned"}
    assert tab.meta["samplers"]["free"].flatchain.shape[1] == 4

    # model-averaged overlay: draws are allocated by stacking weight (the
    # decisively-winning 'free' model must get essentially all of them)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lightcurve_fitting_tpu.fitting import stacked_model_plot
    counts = stacked_model_plot(lc, tab, num_models_to_plot=40, seed=0)
    assert sum(counts.values()) == 40 and counts["free"] >= 38, counts
    assert len(plt.gca().lines) > 0
    plt.close("all")

    with pytest.raises(ValueError):
        compare_models_loo(lc, [ShockCooling2(lc)], [good], quiet=True)


def test_compare_models_loo_per_model_checkpoints(tmp_path):
    """checkpoint_file/resume_from are per-model-ized (regression: a shared
    file made model 2 overwrite — and on resume, inherit — model 1's walker
    state; same contract as compare_models)."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import compare_models_loo

    rng = np.random.default_rng(7)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 8.0, 5), len(filters))
    f = np.array(filters * 5)
    y = ShockCooling2()(t, f, 12.0, 2.0, 35.0, 0.0)
    dy = 0.05 * y
    lc = LC([t, f, y + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    pri = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
           UniformPrior(5.0, 100.0), UniformPrior(-1.0, 1.0)]
    ck = str(tmp_path / "ck.npz")
    tab = compare_models_loo(
        lc, [ShockCooling2(lc), ShockCooling2(lc)], [pri, pri],
        p_lo=[[10.0, 1.5, 25.0, -0.3]] * 2, p_up=[[14.0, 2.5, 45.0, 0.3]] * 2,
        labels=["a", "b"], nwalkers=16, nsteps=40, nsteps_burnin=40,
        seed=1, quiet=True, checkpoint_every=40, checkpoint_file=ck)
    assert os.path.exists(str(tmp_path / "ck.a.npz"))
    assert os.path.exists(str(tmp_path / "ck.b.npz"))
    assert not os.path.exists(ck)  # never written unlabeled
    # identical configs + per-model files: resume reproduces each fit
    tab2 = compare_models_loo(
        lc, [ShockCooling2(lc), ShockCooling2(lc)], [pri, pri],
        p_lo=[[10.0, 1.5, 25.0, -0.3]] * 2, p_up=[[14.0, 2.5, 45.0, 0.3]] * 2,
        labels=["a", "b"], nwalkers=16, nsteps=40, nsteps_burnin=40,
        seed=1, quiet=True, resume_from=ck)
    np.testing.assert_allclose(np.asarray(tab["elpd_loo"], float),
                               np.asarray(tab2["elpd_loo"], float))


def test_stacking_weights():
    """Yao+18 stacking: identical models split weight evenly, a dominated
    model gets ~0, and two COMPLEMENTARY misspecified models both carry
    weight with the stacked score beating either alone."""
    from lightcurve_fitting_tpu.parallel.ic import stacking_weights

    # identical predictive distributions -> symmetric weights
    pw = np.full(20, -1.3)
    w = stacking_weights([pw, pw.copy()])
    assert w == pytest.approx([0.5, 0.5], abs=1e-6)

    # uniformly dominated model -> essentially zero weight
    w = stacking_weights([np.full(20, -1.0), np.full(20, -6.0)])
    assert w[0] > 0.999 and w.sum() == pytest.approx(1.0)

    # complementary: A predicts the first half well, B the second half
    a = np.array([-1.0] * 10 + [-8.0] * 10)
    b = np.array([-8.0] * 10 + [-1.0] * 10)
    w = stacking_weights([a, b])
    assert w == pytest.approx([0.5, 0.5], abs=1e-3)

    def score(weights):
        P = np.exp(np.stack([a, b]))
        return np.sum(np.log(weights @ P))

    assert score(w) > score(np.array([1.0, 0.0])) + 10.0  # mixture >> best single

    with pytest.raises(ValueError):
        stacking_weights([a, b[:5]])


def test_compare_information_criteria_stacking_column():
    """The ranking table carries the stacking weights aligned by label."""
    from lightcurve_fitting_tpu.fitting import compare_information_criteria

    rng = np.random.default_rng(0)
    base = rng.normal(-2.0, 0.5, size=50)
    ics = [{"pointwise": base}, {"pointwise": base - 3.0}]
    tab = compare_information_criteria(ics, labels=["good", "bad"], quiet=True)
    assert list(tab["model"]) == ["good", "bad"]
    w = np.asarray(tab["stacking_weight"], float)
    assert w[0] > 0.99 and w.sum() == pytest.approx(1.0, abs=1e-6)


def test_psis_logo_singletons_match_loo():
    """With singleton groups, leave-one-group-out IS leave-one-out."""
    from lightcurve_fitting_tpu.parallel.ic import psis_loo, psis_logo

    rng = np.random.default_rng(3)
    ll = -0.5 * (rng.normal(size=(800, 1)) - rng.normal(size=(1, 12))) ** 2
    loo = psis_loo(ll)
    logo = psis_logo(ll, np.arange(12))
    assert logo["pointwise"] == pytest.approx(loo["pointwise"])
    assert logo["elpd_logo"] == pytest.approx(loo["elpd_loo"])
    assert logo["pareto_k"] == pytest.approx(loo["pareto_k"])

    with pytest.raises(ValueError):
        psis_logo(ll, np.arange(5))


def test_information_criteria_group_by_filter():
    """group_by='filter' scores whole held-out bands; groups come back in
    first-appearance order and the joint-group elpd is below the sum of its
    pointwise terms (predicting a whole band is harder)."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc, information_criteria

    rng = np.random.default_rng(7)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 10.0, 8), len(filters))
    f = np.array(filters * 8)
    y = ShockCooling2()(t, f, 12.0, 2.0, 15.0, 0.0)
    dy = 0.05 * y
    lc = LC([t, f, y + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    priors = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
              UniformPrior(5.0, 100.0), UniformPrior(-1.0, 1.0)]
    s = lightcurve_mcmc(lc, ShockCooling2(lc), priors=priors,
                        p_lo=[8, 1, 8, -0.5], p_up=[16, 4, 30, 0.5],
                        nwalkers=32, nsteps=400, nsteps_burnin=400,
                        seed=2, quiet=True, shard=False)
    ic = information_criteria(lc, ShockCooling2(lc), s.flatchain,
                              group_by="filter", seed=0, quiet=True)
    lg = ic["logo"]
    assert [fl.name for fl in lg["groups"]] == ["g", "r", "i"]
    assert np.all(np.isfinite(lg["pointwise"]))
    # per group: joint elpd <= sum of that group's pointwise LOO terms
    labels = np.asarray(lc["filter"])
    for g, elpd_g in zip(lg["groups"], lg["pointwise"]):
        pointwise_sum = ic["pointwise"][labels == g].sum()
        assert elpd_g <= pointwise_sum + 1e-6


def _synthetic_fit(seed=2):
    """Small well-specified ShockCooling2 fit shared by the refit tests."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc

    rng = np.random.default_rng(seed)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 10.0, 8), len(filters))
    f = np.array(filters * 8)
    y = ShockCooling2()(t, f, 12.0, 2.0, 15.0, 0.0)
    dy = 0.05 * y
    lc = LC([t, f, y + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    model = ShockCooling2(lc)
    priors = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
              UniformPrior(5.0, 100.0), UniformPrior(-1.0, 1.0)]
    s = lightcurve_mcmc(lc, model, priors=priors,
                        p_lo=[8, 1, 8, -0.5], p_up=[16, 4, 30, 0.5],
                        nwalkers=32, nsteps=400, nsteps_burnin=400,
                        seed=seed, quiet=True, shard=False)
    return lc, model, priors, s


def test_information_criteria_exact_refit_cv():
    """VERDICT r4 #2: flagged PSIS terms are repaired by exact refit CV, not
    just flagged. Forcing refit of EVERY term (threshold -inf) exercises the
    batched leave-one-point-out and leave-one-group-out refits end-to-end;
    where PSIS was reliable (k < 0.7) the exact value must agree with the
    PSIS estimate, and the patched result carries full provenance."""
    from lightcurve_fitting_tpu.fitting import information_criteria

    lc, model, priors, s = _synthetic_fit()
    ic_psis = information_criteria(lc, model, s.flatchain, group_by="filter",
                                   seed=0, quiet=True)
    ic = information_criteria(lc, model, s.flatchain, group_by="filter",
                              refit=-np.inf, priors=priors,
                              refit_options=dict(nwalkers=32, nsteps=300,
                                                 nsteps_burnin=300),
                              seed=0, quiet=True)
    # every point and every group was refit, with provenance
    assert len(ic["refit"]["labels"]) == len(lc)
    assert ic["refit"]["n_failed"] == 0
    lg = ic["logo"]
    assert len(lg["refit"]["labels"]) == 3
    assert lg["refit"]["n_failed"] == 0
    assert np.all(np.isfinite(lg["pointwise"]))
    assert np.all(np.isfinite(ic["pointwise"]))
    assert ic["elpd_loo"] == pytest.approx(float(np.sum(ic["pointwise"])))
    assert lg["elpd_logo"] == pytest.approx(float(np.sum(lg["pointwise"])))
    # exact CV agrees with PSIS where PSIS was self-reportedly reliable
    for j in range(3):
        if ic_psis["logo"]["pareto_k"][j] < 0.7:
            psis_val = ic_psis["logo"]["pointwise"][j]
            assert lg["pointwise"][j] == pytest.approx(
                psis_val, abs=max(2.0, 0.3 * abs(psis_val)))
    k_pt = ic_psis["pareto_k"]
    agree = [ic["pointwise"][i] == pytest.approx(
                 ic_psis["pointwise"][i], abs=max(1.0, 0.3 * abs(ic_psis["pointwise"][i])))
             for i in range(len(lc)) if k_pt[i] < 0.7]
    assert np.mean(agree) > 0.9  # MC noise can nick an individual point
    # pareto_k diagnostics are preserved, not overwritten
    assert ic["pareto_k"] == pytest.approx(ic_psis["pareto_k"])


def test_information_criteria_refit_requires_priors():
    from lightcurve_fitting_tpu.fitting import information_criteria

    lc, model, priors, s = _synthetic_fit(seed=5)
    # validated at ENTRY (before any scoring), not data-dependently when
    # something happens to be flagged
    with pytest.raises(ValueError, match="priors"):
        information_criteria(lc, model, s.flatchain, refit=np.inf,
                             seed=0, quiet=True)
    # at threshold +inf only NaN k-hat ("tail too small to estimate", which
    # is unreliable at ANY threshold) may engage the refit machinery
    ic = information_criteria(lc, model, s.flatchain, refit=np.inf,
                              priors=priors, seed=0, quiet=True)
    if "refit" in ic:
        flagged = list(ic["refit"]["labels"]) + list(ic["refit"]["failed_labels"])
        assert all(np.isnan(ic["pareto_k"][int(i)]) for i in flagged)
    else:
        assert np.all(ic["pareto_k"] <= np.inf)  # no NaNs on this seed


def test_psis_smooth_short_chain_khat_is_nan():
    """Round-5 review fix: a tail too small to fit reports khat = NaN
    ("not estimated", arviz semantics), never -inf (which would read as
    confidently reliable in k > 0.7 checks)."""
    lw, k = psis_smooth(np.random.default_rng(0).normal(size=12))
    assert np.isnan(k)
    assert np.isclose(np.exp(lw).sum(), 1.0)
