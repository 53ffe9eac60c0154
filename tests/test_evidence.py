"""Bayesian evidence via stepping-stone sampling: analytic validation, prior
normalization, and the Occam-factor behavior on a real model fit — model
comparison the reference cannot do."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightcurve_fitting_tpu.parallel.evidence import (stepping_stone_evidence,
                                                      make_beta_ladder)


def test_beta_ladder():
    b = make_beta_ladder(32)
    assert b[0] == 0.0 and b[-1] == 1.0
    assert np.all(np.diff(b) > 0)
    # Beta(0.3,1) quantiles concentrate near zero
    assert np.sum(b < 0.1) > 16


def test_stepping_stone_matches_analytic_gaussian():
    """L = exp(-|p|^2 / 2 sigma^2) under a uniform prior on [-a, a]^2:
    Z = (2 pi sigma^2)^(d/2) / (2a)^d for a >> sigma."""
    sigma, aa, d = 0.3, 5.0, 2

    def log_prior(p):
        inside = jnp.all((p > -aa) & (p < aa))
        return jnp.where(inside, -d * jnp.log(2 * aa), -jnp.inf)

    def log_like(p):
        return -0.5 * jnp.sum(p ** 2) / sigma ** 2

    true_log_z = 0.5 * d * np.log(2 * np.pi * sigma ** 2) - d * np.log(2 * aa)
    rng = np.random.default_rng(0)
    p0 = rng.uniform(-aa, aa, (64, d))
    log_z, err, info = stepping_stone_evidence(log_prior, log_like, p0,
                                               n_rungs=24, nsteps=400,
                                               nsteps_burnin=400, seed=1)
    assert err < 0.1
    assert abs(log_z - true_log_z) < max(4 * err, 0.05)
    assert np.all(info["acceptance"] > 0.2)


def test_prior_log_norm():
    from lightcurve_fitting_tpu.fitting import _prior_log_norm
    from lightcurve_fitting_tpu.models import (UniformPrior, GaussianPrior,
                                               LogUniformPrior)
    from math import erf

    assert _prior_log_norm(UniformPrior(2.0, 7.0)) == pytest.approx(np.log(5.0))
    # wide-bounded Gaussian: integral = sigma sqrt(2 pi)
    g = GaussianPrior(-100.0, 100.0, 1.0, 2.0)
    assert _prior_log_norm(g) == pytest.approx(np.log(2.0 * np.sqrt(2 * np.pi)), abs=1e-6)
    # truncated Gaussian: sigma sqrt(2 pi) * (Phi(b) - Phi(a))
    gt = GaussianPrior(1.0, 5.0, 1.0, 2.0)
    frac = 0.5 * (erf((5.0 - 1.0) / (2.0 * np.sqrt(2))) - erf(0.0))
    assert _prior_log_norm(gt) == pytest.approx(np.log(2.0 * np.sqrt(2 * np.pi) * frac),
                                                abs=1e-5)
    # log-uniform on [a, b]: integral of 1/p = log(b/a)
    lu = LogUniformPrior(1.0, 100.0)
    assert _prior_log_norm(lu) == pytest.approx(np.log(np.log(100.0)), abs=1e-4)
    with pytest.raises(ValueError):
        _prior_log_norm(UniformPrior(0.0, np.inf))
    # pure-tail truncation: support disjoint from the 15-sigma core must
    # integrate the support directly, not produce NaN from a reversed window
    tail = GaussianPrior(0.0, 10.0, -100.0, 1.0)
    v = _prior_log_norm(tail)
    assert np.isfinite(v) and v < -4000.0, v
    # unbounded KDE priors are proper (normalized Gaussian mixtures)
    from lightcurve_fitting_tpu.models import KDEPrior
    kde = KDEPrior(np.random.default_rng(0).normal(2.0, 0.5, 400))
    assert _prior_log_norm(kde) == pytest.approx(0.0, abs=2e-3)


def test_lightcurve_evidence_occam_factor():
    """Evidence of the true model under snug priors beats the same model
    under 10x wider priors (the Occam penalty ~ -ndim log 10), on synthetic
    ShockCooling2 photometry."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_evidence

    rng = np.random.default_rng(3)
    T1, L1, ttr = 12.0, 2.0, 35.0
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 8.0, 5), len(filters))
    f = np.array(filters * 5)
    m = ShockCooling2()
    y_true = m(t, f, T1, L1, ttr, 0.0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])

    snug = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
            UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    wide = [UniformPrior(1.0, 81.0), UniformPrior(0.1, 20.1),
            UniformPrior(5.0, 205.0), UniformPrior(-5.0, 5.0)]
    kwargs = dict(nwalkers=32, n_rungs=16, nsteps=250, nsteps_burnin=250,
                  seed=4, quiet=True)
    z_snug, e_snug, _ = lightcurve_evidence(lc, ShockCooling2(lc), snug, **kwargs)
    z_wide, e_wide, _ = lightcurve_evidence(lc, ShockCooling2(lc), wide, **kwargs)
    assert np.isfinite(z_snug) and np.isfinite(z_wide)
    # Occam: ~ log of the prior-volume ratio ~ 4 log 10 ~ 9.2 nats
    assert z_snug - z_wide > 3.0, (z_snug, z_wide, e_snug, e_wide)
    assert z_snug - z_wide < 20.0, (z_snug, z_wide)


@pytest.mark.slow
def test_flagship_model_comparison_sw17_vs_msw23():
    """Real-data Bayes factor: SW17 vs MSW23 on the SN 2016bkv early light
    curve under shared physical priors (both models use (v_s*, M_env,
    f_rho M, R, t_0)). Values recorded in VALIDATION.md."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_hmc import _flagship_lc_and_model
    from lightcurve_fitting_tpu.models import (ShockCooling, ShockCooling4,
                                               UniformPrior, LogUniformPrior)
    from lightcurve_fitting_tpu.fitting import lightcurve_evidence

    lc_early, _ = _flagship_lc_and_model()
    priors = [UniformPrior(0.1, 20.0), UniformPrior(0.1, 30.0),
              LogUniformPrior(0.01, 100.0), UniformPrior(0.01, 50.0),
              UniformPrior(57468.0, 57468.7)]
    kw = dict(p_lo=[0.5, 0.5, 0.1, 0.1, 57468.3],
              p_up=[10.0, 20.0, 10.0, 20.0, 57468.7],
              nwalkers=64, n_rungs=24, nsteps=400, nsteps_burnin=600,
              seed=7, quiet=True)
    z_sw17, e1, _ = lightcurve_evidence(lc_early, ShockCooling(lc_early), priors, **kw)
    z_msw23, e2, _ = lightcurve_evidence(lc_early, ShockCooling4(lc_early), priors, **kw)
    assert np.isfinite(z_sw17) and np.isfinite(z_msw23)
    assert e1 < 20 and e2 < 20
    # recorded: -12980 +/- 1.4 and -18730 +/- 6.1 (generous reproducibility bands)
    assert -13100 < z_sw17 < -12900, z_sw17
    assert -19000 < z_msw23 < -18400, z_msw23


def test_evidence_matches_laplace_approximation():
    """Two independent evidence estimates agree on an interior-mode synthetic
    fit: stepping-stone (sampling) vs Laplace (optimizer curvature),
    log Z_lap = log pi(x*) L(x*) + (d/2) log 2 pi + 0.5 log det cov."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import (lightcurve_evidence,
                                                lightcurve_map, _prior_log_norm)

    rng = np.random.default_rng(5)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 8.0, 5), 3)
    f = np.array(filters * 5)
    m = ShockCooling2()
    y_true = m(t, f, 12.0, 2.0, 35.0, 0.0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    priors = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]

    z_ss, err, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors,
                                       nwalkers=32, n_rungs=20, nsteps=300,
                                       nsteps_burnin=300, seed=6, quiet=True)

    res = lightcurve_map(lc, ShockCooling2(lc), priors, seed=6, quiet=True)
    assert not res.at_bound.any()  # interior mode: Laplace Z is valid
    log_norm = sum(_prior_log_norm(p) for p in priors)
    sign, logdet = np.linalg.slogdet(res.covariance)
    assert sign > 0
    z_lap = (res.log_posterior - log_norm
             + 2.0 * np.log(2 * np.pi) + 0.5 * logdet)
    # Laplace is exact only for a Gaussian posterior; allow a few nats
    assert abs(z_ss - z_lap) < max(6 * err, 3.0), (z_ss, z_lap, err)


def test_short_chain_error_estimate_degrades_gracefully():
    """nsteps < 4 cannot form the 4-block error estimate: log_z stays finite,
    err reports inf instead of crashing (the multichip dryrun runs 2 steps)."""
    def log_prior(p):
        return jnp.where(jnp.all(jnp.abs(p) < 5.0), -2 * jnp.log(10.0), -jnp.inf)

    def log_like(p):
        return -0.5 * jnp.sum(p ** 2)

    p0 = np.random.default_rng(0).uniform(-5, 5, (16, 2))
    log_z, err, _ = stepping_stone_evidence(log_prior, log_like, p0,
                                            n_rungs=4, nsteps=1,
                                            nsteps_burnin=2, seed=0)
    assert np.isfinite(log_z)
    assert err == np.inf


def test_ladder_survives_nonfinite_start_walker():
    """A walker starting at a NaN-likelihood point (logl=-inf) must never be
    swapped into another rung (log_acc = (negative)*(-inf) = +inf would accept
    it with probability 1, briefly planting a zero-density state in a beta>0
    rung). The run must still converge: the poisoned walker heals via stretch
    moves and the evidence matches the analytic value."""
    sigma, aa, d = 0.3, 5.0, 2

    def log_prior(p):
        inside = jnp.all((p > -aa) & (p < aa))
        return jnp.where(inside, -d * jnp.log(2 * aa), -jnp.inf)

    def log_like(p):
        ll = -0.5 * jnp.sum(p ** 2) / sigma ** 2
        # poison pill: NaN likelihood in a corner of the prior box
        return jnp.where(jnp.all(p > 4.5), jnp.nan, ll)

    rng = np.random.default_rng(3)
    p0 = rng.uniform(-aa, aa, (64, d))
    p0[0] = [4.9, 4.9]  # start one walker in the NaN region
    true_log_z = 0.5 * d * np.log(2 * np.pi * sigma ** 2) - d * np.log(2 * aa)
    log_z, err, info = stepping_stone_evidence(log_prior, log_like, p0,
                                               n_rungs=16, nsteps=300,
                                               nsteps_burnin=300, seed=4)
    assert np.isfinite(log_z)
    assert abs(log_z - true_log_z) < max(4 * err, 0.1)


def test_f32_rescaled_ladder_state_preserves_evidence():
    """state_dtype=np.float32 on the evidence/PT drivers runs the ladder's
    walker state over the affine-rescaled init window in f32 (the TPU
    production mode). The evidence is invariant — the affine Jacobian is a
    constant that cancels in the stepping-stone ratio — and the PT cold
    chain maps back to correct absolute parameters even for a narrow
    posterior far from zero."""
    import os
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_evidence, lightcurve_ptmcmc

    rng = np.random.default_rng(0)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t0_true = 57000.0
    t = np.repeat(t0_true + np.linspace(1.0, 8.0, 5), 3)
    f = np.array(filters * 5)
    y = ShockCooling2()(t, f, 12.0, 2.0, 35.0, t0_true)
    dy = 0.05 * y
    lc = LC([t, f, y + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    model = ShockCooling2(lc)
    priors = [UniformPrior(1.0, 50.0), UniformPrior(0.1, 20.0),
              UniformPrior(5.0, 100.0), UniformPrior(56999.5, 57000.5)]
    kw = dict(p_lo=[5.0, 0.5, 20.0, 56999.7], p_up=[25.0, 5.0, 60.0, 57000.3],
              nwalkers=32, n_rungs=8, nsteps=150, nsteps_burnin=150, seed=2,
              quiet=True)

    z64, e64, _ = lightcurve_evidence(lc, model, priors, state_dtype=np.float64, **kw)
    z32, e32, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors,
                                      state_dtype=np.float32, **kw)
    assert abs(z32 - z64) < 4.0 * np.hypot(e32, e64) + 0.5, (z32, z64, e32, e64)

    pt = lightcurve_ptmcmc(lc, ShockCooling2(lc), priors,
                           state_dtype=np.float32, **kw)
    med = np.median(pt.flatchain, axis=0)
    assert med[0] == pytest.approx(12.0, rel=0.3)
    assert med[3] == pytest.approx(t0_true, abs=0.2)
    # absolute values reconstructed in f64: t_0 resolution far below the
    # absolute-f32 quantization (~0.004 d at MJD 5.7e4)
    assert 1e-8 < pt.flatchain[:, 3].std() < 0.2


def test_ladder_kernel_cache_keys_on_semantics():
    """The compiled-ladder cache must key on everything the closures bake in:
    a repeated identical call reuses the kernel (identical log_z), while a
    call with different priors or different data must NOT reuse the first
    call's physics (guards the under-keyed-cache hazard the round-2 advisor
    flagged on the population caches)."""
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_evidence
    from lightcurve_fitting_tpu.parallel import evidence as ev

    rng = np.random.default_rng(8)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 8.0, 5), 3)
    f = np.array(filters * 5)
    m = ShockCooling2()
    y_true = m(t, f, 12.0, 2.0, 35.0, 0.0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    priors = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    kw = dict(nwalkers=16, n_rungs=6, nsteps=40, nsteps_burnin=40, seed=3,
              quiet=True)

    ev._LADDER_CACHE.clear()     # the cache is LRU-bounded; count from empty
    n_before = len(ev._LADDER_CACHE)
    z1, _, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors, **kw)
    n_after_first = len(ev._LADDER_CACHE)
    assert n_after_first == n_before + 1          # kernels cached
    z2, _, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors, **kw)
    assert len(ev._LADDER_CACHE) == n_after_first  # cache HIT, no new entry
    assert z2 == z1                                # identical through the cache

    # wider T1 prior: different semantics -> new cache entry, different Z
    priors_wide = [UniformPrior(4.0, 24.0)] + priors[1:]
    z3, _, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors_wide, **kw)
    assert len(ev._LADDER_CACHE) == n_after_first + 1
    assert z3 != z1

    # different photometry: the data digest must miss the cache too
    lc2 = LC([t, f, np.asarray(lc["lum"]) * 1.3, dy],
             names=["MJD", "filter", "lum", "dlum"])
    z4, _, _ = lightcurve_evidence(lc2, ShockCooling2(lc2), priors, **kw)
    assert len(ev._LADDER_CACHE) == n_after_first + 2
    assert z4 != z1


def _sc2_toy():
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.filters import filtdict
    from lightcurve_fitting_tpu.models import ShockCooling2

    rng = np.random.default_rng(11)
    filters = [filtdict[n] for n in ["g", "r", "i"]]
    t = np.repeat(np.linspace(1.0, 8.0, 5), 3)
    f = np.array(filters * 5)
    m = ShockCooling2()
    y_true = m(t, f, 12.0, 2.0, 35.0, 0.0)
    dy = 0.05 * y_true
    lc = LC([t, f, y_true + rng.normal(scale=dy), dy],
            names=["MJD", "filter", "lum", "dlum"])
    return lc


def test_compare_models_ranks_by_occam_factor():
    """compare_models prefers the truth-containing narrow prior volume over
    a vastly wider one (classic Occam penalty: same max-likelihood, ~log of
    the prior-volume ratio difference in log Z), and returns a ranked table
    with the documented columns."""
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import compare_models

    lc = _sc2_toy()
    narrow = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    wide = [UniformPrior(1.0, 400.0), UniformPrior(0.1, 100.0),
            UniformPrior(1.0, 1000.0), UniformPrior(-3.0, 3.0)]
    table = compare_models(
        lc, [ShockCooling2(lc), ShockCooling2(lc)], [wide, narrow],
        p_lo=[8.0, 1.0, 25.0, -0.5], p_up=[16.0, 3.0, 45.0, 0.5],
        labels=["wide", "narrow"], nwalkers=16, n_rungs=8, nsteps=60,
        nsteps_burnin=60, seed=5, quiet=True)

    assert list(table["model"]) == ["narrow", "wide"]   # ranked best-first
    assert table["delta_log_z"][0] == 0.0
    assert table["ddelta_log_z"][0] == 0.0
    # prior-volume ratio is e^~12; even with stepping-stone noise the wide
    # prior must lose by several nats
    assert table["delta_log_z"][1] < -3.0
    assert table["ddelta_log_z"][1] > 0.0
    assert set(table.meta["info"]) == {"narrow", "wide"}
    assert np.all(np.asarray(table["dlog_z"]) > 0.0)


def test_compare_models_labels_and_validation():
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import compare_models

    lc = _sc2_toy()
    priors = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    kw = dict(p_lo=[8.0, 1.0, 25.0, -0.5], p_up=[16.0, 3.0, 45.0, 0.5],
              nwalkers=16, n_rungs=4, nsteps=20, nsteps_burnin=20, seed=2,
              quiet=True)

    # a single shared flat prior list + default labels (deduplicated)
    table = compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                           priors, **kw)
    assert sorted(table["model"]) == ["ShockCooling2", "ShockCooling2#2"]

    with pytest.raises(ValueError, match="at least two"):
        compare_models(lc, [ShockCooling2(lc)], priors, **kw)
    with pytest.raises(ValueError, match="per model"):
        compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                       [priors, priors, priors], **kw)


def test_ladder_checkpoint_rejects_wrong_model_resume(tmp_path):
    """Same-shaped ladders for DIFFERENT targets must not cross-resume: the
    fns fingerprint in the checkpoint catches what the structural checks
    (shape/seed/ladder) cannot."""
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_evidence

    lc = _sc2_toy()
    priors = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    wide = [UniformPrior(1.0, 400.0)] + priors[1:]
    ck = str(tmp_path / "ladder.npz")
    kw = dict(nwalkers=16, n_rungs=4, nsteps=20, nsteps_burnin=20, seed=9,
              quiet=True)
    lightcurve_evidence(lc, ShockCooling2(lc), priors,
                        checkpoint_every=10, checkpoint_file=ck, **kw)
    # different priors, identical ladder shape/seed: must refuse to resume
    with pytest.raises(ValueError, match="fingerprint"):
        lightcurve_evidence(lc, ShockCooling2(lc), wide,
                            resume_from=ck, **kw)
    # the rightful owner resumes fine (completed run replays instantly)
    z, _, _ = lightcurve_evidence(lc, ShockCooling2(lc), priors,
                                  resume_from=ck, **kw)
    assert np.isfinite(z)


def test_compare_models_isolates_checkpoints(tmp_path):
    """compare_models gives every model its own checkpoint file (the label
    goes before the extension), so compared models never clobber or
    cross-resume each other's ladder state."""
    import os
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import compare_models

    lc = _sc2_toy()
    narrow = [UniformPrior(8.0, 16.0), UniformPrior(1.0, 3.0),
              UniformPrior(25.0, 45.0), UniformPrior(-0.5, 0.5)]
    wide = [UniformPrior(1.0, 400.0)] + narrow[1:]
    ck = str(tmp_path / "cmp.npz")
    kw = dict(p_lo=[8.0, 1.0, 25.0, -0.5], p_up=[16.0, 3.0, 45.0, 0.5],
              nwalkers=16, n_rungs=4, nsteps=20, nsteps_burnin=20, seed=2,
              quiet=True, labels=["wide", "narrow"])
    t1 = compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                        [wide, narrow], checkpoint_every=10,
                        checkpoint_file=ck, **kw)
    assert os.path.exists(str(tmp_path / "cmp.wide.npz"))
    assert os.path.exists(str(tmp_path / "cmp.narrow.npz"))
    assert not os.path.exists(ck)
    # resume from the per-model files reproduces the comparison exactly
    t2 = compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                        [wide, narrow], resume_from=ck, **kw)
    assert list(t2["log_z"]) == list(t1["log_z"])

    with pytest.raises(ValueError, match="one per model"):
        compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                       [wide, narrow], labels=["only-one"],
                       p_lo=kw["p_lo"], p_up=kw["p_up"], nwalkers=16,
                       n_rungs=4, nsteps=20, nsteps_burnin=20, quiet=True)
    with pytest.raises(ValueError, match="unique"):
        compare_models(lc, [ShockCooling2(lc), ShockCooling2(lc)],
                       [wide, narrow], labels=["same", "same"],
                       p_lo=kw["p_lo"], p_up=kw["p_up"], nwalkers=16,
                       n_rungs=4, nsteps=20, nsteps_burnin=20, quiet=True)


def test_ladder_cache_is_bounded():
    from lightcurve_fitting_tpu.parallel.evidence import (_LADDER_CACHE,
                                                          _LRUCache)
    c = _LRUCache(3)
    for k in "abc":
        c[k] = k
    c.get("a")          # refresh 'a'
    c["d"] = "d"        # evicts 'b' (least recently used)
    assert sorted(c) == ["a", "c", "d"]
    assert _LADDER_CACHE.maxsize == 8
