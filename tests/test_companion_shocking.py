"""CompanionShocking family: SiFTO template handling, per-band special cases,
and an end-to-end fit on synthetic SN 2017cbv-style data (BASELINE config 2)."""

import numpy as np
import pytest

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.filters import filtdict
from lightcurve_fitting_tpu.models import (CompanionShocking, CompanionShocking2,
                                           CompanionShocking3, UniformPrior, sifto)


def make_ia_lc(seed=0, t_exp=57820.0, a13=0.5, Mc_v9_7=1.0, t_peak=57840.0,
               stretch=1.0, with_noise=True):
    """Synthetic early Ia light curve: Kasen shock + SiFTO, UBVgri."""
    rng = np.random.default_rng(seed)
    filters = [filtdict[n] for n in ["U", "B", "V", "g", "r", "i"]]
    epochs = np.linspace(t_exp + 0.5, t_peak + 15.0, 18)
    t = np.repeat(epochs, len(filters))
    f = np.array(filters * len(epochs))
    # seed the template scaling with a plain blackbody-ish LC first
    peak_lum = {n: 2e15 for n in "UBVgri"}
    rows_lum = np.array([peak_lum[filt.char] for filt in f])
    lc0 = LC([t, f, rows_lum, 0.05 * rows_lum], names=["MJD", "filter", "lum", "dlum"])
    m = CompanionShocking2(lc0)
    y_true = m(t, f, t_exp, a13, Mc_v9_7, t_peak, stretch, 0.0, 0.0)
    dy = 0.04 * np.maximum(y_true, 0.05 * np.median(y_true))
    y = y_true + (rng.normal(scale=dy) if with_noise else 0.0)
    lc = LC([t, f, y, dy], names=["MJD", "filter", "lum", "dlum"])
    # return the generating model too: fits must use the same SiFTO scaling
    # as the truth (the template normalization is data-derived, reference
    # models.py:716)
    return lc, y_true, m


def test_sifto_template_loaded():
    assert set(["Epoch", "U", "B", "V", "g", "r", "i"]) <= set(sifto.colnames)
    assert len(sifto) > 100
    ep = np.asarray(sifto["Epoch"], float)
    assert ep.min() < -10 and ep.max() > 30


def test_stretched_sifto_modes():
    lc, _, _ = make_ia_lc()
    m = CompanionShocking2(lc)
    filters = np.array([filtdict[n] for n in ["U", "B", "r"]], dtype=object)
    # pointwise
    y_pt = m.stretched_sifto(np.array([57835.0, 57840.0, 57845.0]), filters, 57840.0, 1.0)
    assert y_pt.shape == (3,)
    # grid over filters
    tgrid = np.linspace(57800.0, 57900.0, 50)
    y_grid = m.stretched_sifto(tgrid, filters, 57840.0, 1.0)
    assert y_grid.shape == (3, 50)
    assert np.all(y_grid[:, 0] == 0.0)  # outside template -> zero extrapolation
    # vector params (posterior draws)
    W = 5
    y_vec = m.stretched_sifto(tgrid, filters, np.full(W, 57840.0), np.full(W, 1.0),
                              np.full(W, 1.0), np.full(W, -0.5))
    assert y_vec.shape == (3, 50, W)
    # U time offset moves the U curve, not r
    y_dt = m.stretched_sifto(tgrid, filters, 57840.0, 1.0, dtU=3.0)
    assert not np.allclose(y_dt[0], y_grid[0])
    np.testing.assert_allclose(y_dt[2], y_grid[2])


def test_validity_window():
    lc, _, _ = make_ia_lc()
    m = CompanionShocking2(lc)
    p = [57820.0, 0.5, 1.0, 57840.0, 1.1, 0.0, 0.0]
    ep = np.asarray(sifto["Epoch"], float)
    assert m.t_min(p) == pytest.approx(57840.0 + 1.1 * ep.min())
    assert m.t_max(p) == pytest.approx(57840.0 + 1.1 * ep.max())


def test_kasen_factors_per_band():
    """CompanionShocking: rU scales only the U shock; rr/ri scale r/i SiFTO."""
    lc, _, _ = make_ia_lc()
    m = CompanionShocking(lc)
    t = np.array([57822.0, 57822.0, 57822.0])
    f = np.array([filtdict["U"], filtdict["r"], filtdict["V"]], dtype=object)
    base = m(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 1.0, 1.0, 1.0)
    up = m(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 1.0, 1.0, 2.0)  # rU = 2
    kasen = m.companion_shocking(t, f, 57820.0, 0.5, 1.0)
    np.testing.assert_allclose(up[0] - base[0], kasen[0], rtol=1e-6)
    np.testing.assert_allclose(up[1], base[1], rtol=1e-12)  # r unaffected by rU
    rr = m(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 2.0, 1.0, 1.0)  # rr = 2
    sif = m.stretched_sifto(t, f, 57840.0, 1.0)
    np.testing.assert_allclose(rr[1] - base[1], sif[1], rtol=1e-6)


def test_viewing_angle_factor():
    lc, _, _ = make_ia_lc()
    m3 = CompanionShocking3(lc)
    t = np.array([57822.0])
    f = np.array([filtdict["V"]], dtype=object)
    y0 = m3(t, f, 57820.0, 0.5, 0.0, 57840.0, 1.0, 0.0, 0.0)    # theta = 0
    y90 = m3(t, f, 57820.0, 0.5, 90.0, 57840.0, 1.0, 0.0, 0.0)  # edge-on
    sif = m3.stretched_sifto(t, f, 57840.0, 1.0)
    shock0 = y0 - sif
    shock90 = y90 - sif
    th = np.deg2rad(90.0)
    expected = (0.5 * np.cos(th) + 0.5) * (0.14 * th ** 2 - 0.4 * th + 1.0)
    assert shock90[0] / shock0[0] == pytest.approx(expected, rel=1e-6)


def test_companion_shocking2_fit_recovers_truth():
    """End-to-end MCMC fit of CompanionShocking2 on synthetic data."""
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc
    truth = dict(t_exp=57820.0, a13=0.5, Mc_v9_7=1.0, t_peak=57840.0, stretch=1.0)
    lc, _, model = make_ia_lc(seed=3, **truth)
    lc.meta["redshift"] = 0.0
    priors = [UniformPrior(57815.0, 57825.0), UniformPrior(0.01, 5.0),
              UniformPrior(0.1, 10.0), UniformPrior(57835.0, 57845.0),
              UniformPrior(0.6, 1.6), UniformPrior(-5.0, 5.0), UniformPrior(-5.0, 5.0)]
    sampler = lightcurve_mcmc(lc, model, priors=priors,
                              p_lo=[57818.0, 0.2, 0.5, 57838.0, 0.8, -1.0, -1.0],
                              p_up=[57822.0, 1.0, 2.0, 57842.0, 1.2, 1.0, 1.0],
                              nwalkers=32, nsteps=250, nsteps_burnin=300, seed=12)
    med = np.median(sampler.flatchain, axis=0)
    assert med[0] == pytest.approx(truth["t_exp"], abs=1.0)
    assert med[3] == pytest.approx(truth["t_peak"], abs=1.0)
    assert med[4] == pytest.approx(truth["stretch"], abs=0.15)
    assert 0.1 < sampler.acceptance_fraction.mean() < 0.9


def test_evaluate_keyword_args_and_kappa():
    """Reference signatures accept dtU/dti/rr/ri/rU/kappa as keywords
    (models.py:875,946,1009)."""
    lc, _, m2 = make_ia_lc()
    t = np.array([57822.0, 57822.0])
    f = np.array([filtdict["U"], filtdict["r"]], dtype=object)
    y_kw = m2(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, dtU=1.0, dti=0.0)
    y_pos = m2(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 1.0, 0.0)
    np.testing.assert_allclose(y_kw, y_pos, rtol=1e-12)
    # kappa host fallback matches device path at kappa=1
    y_k1 = m2(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 0.0, 0.0, kappa=1.0)
    np.testing.assert_allclose(y_k1, m2(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0), rtol=1e-12)
    y_k7 = m2(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, 0.0, 0.0, kappa=0.7)
    assert not np.allclose(y_k7, y_k1)
    # CompanionShocking with kappa + factors
    m1 = CompanionShocking(lc)
    y1 = m1(t, f, 57820.0, 0.5, 1.0, 57840.0, 1.0, rr=1.5, rU=2.0, kappa=0.7)
    assert y1.shape == (2,) and np.all(np.isfinite(y1))
    m3 = CompanionShocking3(lc)
    y3 = m3(t, f, 57820.0, 0.5, 30.0, 57840.0, 1.0, dtU=0.5, dti=-0.5, kappa=0.7)
    assert y3.shape == (2,) and np.all(np.isfinite(y3))


def test_stretched_sifto_pointwise_vector_stretch():
    """Reference mode 1 (models.py:817-819) broadcasts a vector stretch over
    each point's epoch: len(t) == len(f) with scalar t_peak and stretch of
    length W returns (N, W). A round-4 review found an extra scalar-stretch
    condition had diverted this case to the outer mode (broadcast error)."""
    lc, _, m = make_ia_lc()
    filters = np.array([filtdict[n] for n in ["U", "B", "r"]], dtype=object)
    t = np.array([57835.0, 57840.0, 57845.0])
    stretch = np.array([0.9, 1.0])
    out = m.stretched_sifto(t, filters, 57840.0, stretch)
    assert out.shape == (3, 2)
    # each column equals the scalar-stretch pointwise evaluation
    for j, s in enumerate(stretch):
        col = m.stretched_sifto(t, filters, 57840.0, float(s))
        np.testing.assert_allclose(out[:, j], col, rtol=1e-12)


def test_sifto_scaling_respects_lum_mask():
    """Round-4 review fix: the per-filter template scale must take the
    mask-respecting max of lum (reference models.py:706) — np.asarray
    exposed fill values under masked rows."""
    lc, _, _ = make_ia_lc(with_noise=False)
    m_clean = CompanionShocking2(lc)
    lc2, _, _ = make_ia_lc(with_noise=False)
    lum = np.ma.MaskedArray(np.asarray(lc2["lum"], float))
    lum.mask = np.zeros(len(lum), bool)
    lum[0] = float(lum.max()) * 1e6   # garbage...
    lum.mask[0] = True                # ...hidden under the mask
    lc2["lum"] = lum
    m_masked = CompanionShocking2(lc2)
    for filt, coeffs in m_clean._sifto_coeffs.items():
        np.testing.assert_allclose(m_masked._sifto_coeffs[filt], coeffs,
                                   rtol=1e-12)
