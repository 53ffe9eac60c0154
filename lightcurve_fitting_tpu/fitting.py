"""Model-fit driver and posterior visualization.

API-parity module for the reference ``lightcurve_fitting/fitting.py``:
``lightcurve_mcmc`` (fitting.py:16-168), ``lightcurve_corner`` (:171-277),
``lightcurve_model_plot`` (:280-429), and ``format_credible_interval``
(:432-494).

TPU redesign: the log-posterior is a pure jax function (priors + model
likelihood over static photometry arrays); the emcee loop becomes a single
jit-compiled ``lax.scan`` of the stretch move with all walkers batched by
``vmap`` (see ``parallel/sampler.py``). Where the reference performs
2e5 serial Python posterior calls, this runs ~10^7+ batched evaluations/s/chip.
"""

import os
import warnings

import numpy as np
import jax.numpy as jnp
import matplotlib.pyplot as plt

from .models import UniformPrior, CompanionShocking, BaseCompanionShocking
from .lightcurve import filter_legend, flux2mag
from .filters import filtdict
from .parallel.sampler import EnsembleSampler
from .utils import units as u
from .utils.corner import corner as _corner

__all__ = ["lightcurve_mcmc", "lightcurve_corner", "lightcurve_model_plot",
           "format_credible_interval", "make_log_posterior"]

PRIOR_WARNING = "The p_max/p_min keywords are deprecated. Use the priors keyword instead."
MODEL_KWARGS_WARNING = "The model_kwargs keyword is deprecated. These are now included in the model intialization."

_STYLE = os.path.join(os.path.dirname(__file__), "serif.mplstyle")


def make_log_posterior(model, lc, priors, use_sigma=False, sigma_type="relative"):
    """Build the pure jax log-posterior ``fn(p[ndim]) -> float``: sum of prior
    log-densities (-inf outside bounds) plus the Gaussian log-likelihood
    (reference fitting.py:121-128, without the Python early-exit — models are
    NaN-safe so the likelihood is always evaluated in-graph)."""
    ll = model.make_log_likelihood(lc, use_sigma=use_sigma, sigma_type=sigma_type)

    def log_posterior(p):
        log_prior = 0.0
        for i, prior in enumerate(priors):
            log_prior = log_prior + prior(p[i])
        ll_val = ll(p)
        ll_val = jnp.where(jnp.isfinite(ll_val), ll_val, -jnp.inf)
        return jnp.where(jnp.isfinite(log_prior), log_prior + ll_val, -jnp.inf)

    return log_posterior


def lightcurve_mcmc(lc, model, priors=None, p_min=None, p_max=None, p_lo=None, p_up=None,
                    nwalkers=100, nsteps=1000, nsteps_burnin=1000, model_kwargs=None,
                    show=False, save_plot_as="", save_sampler_as="", use_sigma=False,
                    sigma_type="relative", seed=None):
    """Fit an analytical model to observed photometry with ensemble MCMC.

    Same signature and behavior as the reference (fitting.py:16-168) plus a
    ``seed`` for reproducible chains. Returns an
    :class:`~lightcurve_fitting_tpu.parallel.sampler.EnsembleSampler` exposing
    the emcee attributes the reference workflow uses (``flatchain``, ``chain``).
    """
    if model_kwargs is not None:
        raise Exception(MODEL_KWARGS_WARNING)

    # (re)derive the fit quantity from magnitudes as the reference does
    # (fitting.py:68-72); tables that already carry the quantity directly
    # (e.g. synthetic data without magnitudes) are used as-is
    if model.output_quantity == "flux":
        if "mag" in lc.colnames or "flux" not in lc.colnames:
            lc.calcFlux()
    elif model.output_quantity == "lum":
        if "mag" in lc.colnames or "lum" not in lc.colnames:
            lc.calcAbsMag()
            lc.calcLum()

    if use_sigma and model.input_names[-1] != "\\sigma":
        model.input_names = model.input_names + ["\\sigma"]
        model.units = model.units + [u.dimensionless_unscaled]

    ndim = model.nparams

    # deprecated bounds -> priors
    if p_min is None:
        p_min = np.tile(-np.inf, ndim)
    elif len(p_min) == ndim:
        p_min = np.array(p_min, float)
        warnings.warn(PRIOR_WARNING)
    else:
        raise Exception(PRIOR_WARNING)

    if p_max is None:
        p_max = np.tile(np.inf, ndim)
    elif len(p_max) == ndim:
        p_max = np.array(p_max, float)
        warnings.warn(PRIOR_WARNING)
    else:
        raise Exception(PRIOR_WARNING)

    if p_lo is None:
        p_lo = p_min
    elif len(p_lo) == ndim:
        p_lo = np.array(p_lo, float)
    else:
        raise Exception("p_lo must have length {:d}".format(ndim))

    if len(p_up) == ndim:
        p_up = np.array(p_up, float)
    else:
        raise Exception("p_up must have length {:d}".format(ndim))

    if priors is None:
        priors = [UniformPrior(p0, p1) for p0, p1 in zip(p_min, p_max)]
    elif len(priors) != ndim:
        raise Exception("priors must have length {:d}".format(ndim))

    for param, prior, p0, p1 in zip(model.input_names, priors, p_lo, p_up):
        p_min_i = getattr(prior, "p_min", -np.inf)
        p_max_i = getattr(prior, "p_max", np.inf)
        if p0 < p_min_i:
            raise Exception(f"starting guess for {param} (p_lo = {p0}) is outside prior "
                            f"(p_min = {p_min_i})")
        if p1 > p_max_i:
            raise Exception(f"starting guess for {param} (p_up = {p1}) is outside prior "
                            f"(p_max = {p_max_i})")

    log_posterior = make_log_posterior(model, lc, priors, use_sigma, sigma_type)
    sampler = EnsembleSampler(nwalkers, ndim, log_posterior, seed=seed)

    rng = np.random.RandomState(seed) if seed is not None else np.random
    starting_guesses = rng.rand(nwalkers, ndim) * (p_up - p_lo) + p_lo
    pos, _, _ = sampler.run_mcmc(starting_guesses, nsteps_burnin, progress=True,
                                 progress_kwargs={"desc": " Burn-in"})

    if show or save_plot_as:
        fig, ax = plt.subplots(ndim, 2, figsize=(12.0, 2.0 * ndim), squeeze=False)
        ax1 = ax[:, 0]
        for i in range(ndim):
            ax1[i].plot(sampler.chain[:, :, i].T, "k", alpha=0.2)
            ax1[i].set_ylabel(model.axis_labels[i])
        ax1[0].set_title("During Burn In")
        ax1[-1].set_xlabel("Step Number")

    sampler.reset()
    sampler.run_mcmc(pos, nsteps, progress=True, progress_kwargs={"desc": "Sampling"},
                     skip_initial_state_check=True)
    if save_sampler_as:
        np.save(save_sampler_as, sampler.flatchain)
        print("saving sampler.flatchain as " + save_sampler_as)

    if show or save_plot_as:
        ax2 = ax[:, 1]
        for i in range(ndim):
            ax2[i].plot(sampler.chain[:, :, i].T, "k", alpha=0.2)
            ax2[i].set_ylabel(model.axis_labels[i])
            ax2[i].yaxis.set_label_position("right")
            ax2[i].yaxis.tick_right()
        ax2[0].set_title("After Burn In")
        ax2[-1].set_xlabel("Step Number")
        fig.tight_layout()
        if save_plot_as:
            print("saving chain plot as " + save_plot_as)
            fig.savefig(save_plot_as)
        if show:
            plt.show()

    return sampler


def lightcurve_corner(lc, model, sampler_flatchain, model_kwargs=None,
                      num_models_to_plot=100, lcaxis_posn=(0.7, 0.55, 0.2, 0.4),
                      filter_spacing=1.0, tmin=None, tmax=None, t0_offset=None,
                      save_plot_as="", ycol=None, textsize="medium", param_textsize="large",
                      use_sigma=False, xscale="linear", filters_to_model=None,
                      label_filters=True, lc_plot_kwargs=None, model_plot_kwargs=None):
    """Corner plot of the posterior with a light-curve inset showing posterior-
    draw model curves (reference fitting.py:171-277)."""
    if model_kwargs is not None:
        raise Exception(MODEL_KWARGS_WARNING)
    if ycol is None:
        ycol = model.output_quantity
    plt.style.use(_STYLE)
    if use_sigma and model.input_names[-1] != "\\sigma":
        model.input_names = model.input_names + ["\\sigma"]
        model.units = model.units + [u.dimensionless_unscaled]

    sampler_flatchain = np.asarray(sampler_flatchain)
    sampler_flatchain_corner = sampler_flatchain.copy()
    axis_labels_corner = model.axis_labels
    for var in ["t_0", "t_\\mathrm{max}"]:
        if var in model.input_names:
            i_t0 = model.input_names.index(var)
            if t0_offset is None:
                t0_offset = np.floor(sampler_flatchain_corner[:, i_t0].min())
            if t0_offset != 0.0:
                sampler_flatchain_corner[:, i_t0] -= t0_offset
                t0_offset_formatted = "{:f}".format(t0_offset).rstrip("0").rstrip(".")
                axis_labels_corner[i_t0] = f"${var} - {t0_offset_formatted}$ (d)"

    fig = _corner(sampler_flatchain_corner, labels=axis_labels_corner,
                  label_kwargs={"size": textsize})
    ndim = sampler_flatchain.shape[-1]
    corner_axes = np.array(fig.get_axes()).reshape(ndim, ndim)
    for i in range(ndim):
        corner_axes[i, 0].tick_params(labelsize=textsize)
        corner_axes[-1, i].tick_params(labelsize=textsize)

    for ax in np.diag(corner_axes):
        ax.spines["top"].set_visible(False)
        ax.spines["left"].set_visible(False)
        ax.spines["right"].set_visible(False)
        ax.xaxis.set_ticks_position("bottom")
        ax.yaxis.set_ticks_position("none")

    ax = fig.add_axes(lcaxis_posn)
    lightcurve_model_plot(lc, model, sampler_flatchain, model_kwargs, num_models_to_plot,
                          filter_spacing, tmin, tmax, ycol, textsize, ax, t0_offset,
                          use_sigma, xscale, filters_to_model, label_filters,
                          lc_plot_kwargs, model_plot_kwargs)

    paramtexts = format_credible_interval(sampler_flatchain, varnames=model.input_names,
                                          units=model.units)
    fig.text(0.45, 0.95, "\n".join(paramtexts), va="top", ha="center",
             fontdict={"size": param_textsize})
    if save_plot_as:
        fig.savefig(save_plot_as)
        print("saving figure as " + save_plot_as)

    return fig, corner_axes, ax


def lightcurve_model_plot(lc, model, sampler_flatchain, model_kwargs=None,
                          num_models_to_plot=100, filter_spacing=1.0, tmin=None, tmax=None,
                          ycol=None, textsize="medium", ax=None, mjd_offset=None,
                          use_sigma=False, xscale="linear", filters_to_model=None,
                          label_filters=True, lc_plot_kwargs=None, model_plot_kwargs=None):
    """Observed photometry with posterior-draw model light curves overplotted
    (reference fitting.py:280-429)."""
    if model_kwargs is not None:
        raise Exception(MODEL_KWARGS_WARNING)
    if ycol is None:
        ycol = model.output_quantity
    if ax is None:
        ax = plt.axes()
    if use_sigma and model.input_names[-1] != "\\sigma":
        model.input_names = model.input_names + ["\\sigma"]
        model.units = model.units + [u.dimensionless_unscaled]

    sampler_flatchain = np.asarray(sampler_flatchain)
    choices = np.random.choice(sampler_flatchain.shape[0], num_models_to_plot)
    ps = sampler_flatchain[choices].T

    if tmin is None:
        tmin = float(np.min(np.asarray(lc["MJD"])))
    if tmax is None:
        tmax = float(np.max(np.asarray(lc["MJD"])))
    xfit = np.geomspace(tmin, tmax, 1000) if xscale == "log" else np.linspace(tmin, tmax, 1000)
    if filters_to_model is None:
        ufilts = np.array(sorted(set(lc["filter"])), dtype=object)
    else:
        ufilts = np.array([filtdict[f] for f in filters_to_model], dtype=object)
    if use_sigma:
        y_fit = model(xfit, ufilts, *ps[:-1])
    else:
        y_fit = model(xfit, ufilts, *ps)

    # CompanionShocking models: overlay the SiFTO component as dashed lines
    if isinstance(model, CompanionShocking):
        y_fit1 = model.stretched_sifto(xfit, ufilts, *ps[3:5])
        y_fit1[ufilts == filtdict["r"]] *= ps[5]
        y_fit1[ufilts == filtdict["i"]] *= ps[6]
    elif isinstance(model, BaseCompanionShocking):
        y_fit1 = model.stretched_sifto(xfit, ufilts, *ps[3:7])
    else:
        y_fit1 = [None] * len(ufilts)

    if mjd_offset is None:
        mjd_offset = np.floor(tmin)
    if ycol == "lum":
        dycol = "dlum"
        yscale = 10.0 ** np.round(np.log10(y_fit.max()))
        ylabel = "Luminosity $L_\\nu$ (10$^{{{:.0f}}}$ erg s$^{{-1}}$ Hz$^{{-1}}$) + Offset".format(
            np.log10(yscale) + 7)
    elif ycol == "absmag":
        dycol = "dmag"
        yscale = 1.0
        ylabel = "Absolute Magnitude + Offset"
        y_fit, _ = flux2mag(y_fit, zp=np.array([[[filt.M0]] for filt in ufilts]))
        if y_fit1[0] is not None:
            y_fit1, _ = flux2mag(y_fit1, zp=np.array([[[filt.M0]] for filt in ufilts]))
        ax.invert_yaxis()
    elif ycol == "flux":
        dycol = "dflux"
        yscale = 10.0 ** np.round(np.log10(y_fit.max()))
        ylabel = "Flux $F_\\nu$ (10$^{{{:.0f}}}$ erg s$^{{-1}}$ m$^{{-2}}$ Hz$^{{-1}}$) + Offset".format(
            np.log10(yscale) + 7)
    else:
        raise ValueError(f'ycol="{ycol}" is not recognized. Use "lum", "absmag", "flux".')

    if lc_plot_kwargs is None:
        lc_plot_kwargs = {}
    if model_plot_kwargs is None:
        model_plot_kwargs = {}
    elif "color" in model_plot_kwargs:
        del model_plot_kwargs["color"]
    model_plot_kwargs1 = model_plot_kwargs.copy()
    if "alpha" not in model_plot_kwargs:
        model_plot_kwargs["alpha"] = 0.05
    if "linestyle" in model_plot_kwargs1:
        del model_plot_kwargs1["linestyle"]
    model_plot_kwargs1["ls"] = "--"

    if xscale == "log":
        ax.set_xscale("log")
        ax.xaxis.set_major_formatter(plt.FormatStrFormatter("%g"))
        lc = lc.where(MJD_min=mjd_offset)
    else:
        lc = lc.copy()
    lc["MJD"] = lc["MJD"] - mjd_offset
    lc[ycol] = lc[ycol] / yscale
    lc[dycol] = lc[dycol] / yscale
    plt.sca(ax)
    lc.plot(xcol="MJD", ycol=ycol, offset_factor=filter_spacing, appmag_axis=False,
            tight_layout=False, **lc_plot_kwargs)
    plt.autoscale(False)
    _, labels, _ = filter_legend(np.array(ufilts, dtype=object), filter_spacing)
    for yfit, yfit1, filt, txt in zip(y_fit, y_fit1, ufilts, labels):
        offset = -filt.offset * filter_spacing
        ax.plot(xfit - mjd_offset, yfit / yscale + offset, color=filt.linecolor,
                **model_plot_kwargs)
        if yfit1 is not None:
            ax.plot(xfit - mjd_offset, np.median(yfit1, axis=1) / yscale + offset,
                    color=filt.linecolor, **model_plot_kwargs1)
        if label_filters:
            ax.text(1.03, yfit[-1, 0] / yscale + offset, txt, color=filt.textcolor,
                    fontdict={"size": textsize}, ha="left", va="center",
                    transform=ax.get_yaxis_transform())
    ax.set_xlabel("MJD $-$ {:f}".format(mjd_offset).rstrip("0").rstrip("."), size=textsize)
    ax.set_ylabel(ylabel, size=textsize)
    ax.tick_params(labelsize=textsize)


def format_credible_interval(x, sigfigs=1, percentiles=(15.87, 50.0, 84.14), axis=0,
                             varnames=None, units=None):
    """LaTeX equal-tailed credible intervals with sig-fig rounding of the
    uncertainty (reference fitting.py:432-494)."""
    quantiles = np.percentile(x, percentiles, axis=axis).T
    uncertainties = np.diff(quantiles)
    smaller_unc = np.amin(uncertainties, axis=-1)
    log_unc = np.log10(smaller_unc)
    roundto = sigfigs - np.floor(log_unc).astype(int) - 1

    smaller_unc_round = [np.round(unc, dec) for unc, dec in
                         zip(np.atleast_1d(smaller_unc), np.atleast_1d(roundto))]
    log_unc_round = np.log10(smaller_unc_round)
    roundto = sigfigs - np.floor(log_unc_round).astype(int) - 1

    quantiles = np.atleast_2d(quantiles)
    uncertainties = np.atleast_2d(uncertainties)
    roundto = np.atleast_1d(roundto)
    texstrings = []
    for quant, unc, dec in zip(quantiles, uncertainties, roundto):
        center = np.round(quant[1], dec)
        lower, upper = np.round(unc, dec)
        if dec < 0:
            dec = 0
        if upper == lower:
            texstring = "{{:.{0:d}f}} \\pm {{:.{0:d}f}}".format(dec).format(center, upper)
        else:
            texstring = "{{:.{0:d}f}}^{{{{+{{:.{0:d}f}}}}}}_{{{{-{{:.{0:d}f}}}}}}".format(dec).format(
                center, upper, lower)
        texstrings.append(texstring)

    if varnames is None or units is None:
        paramtexts = texstrings
    else:
        paramtexts = []
        for var, value, unit in zip(varnames, texstrings, units):
            if isinstance(unit, u.Quantity):
                value = "({}) \\times 10^{{{:.1f}}}".format(value, np.log10(unit.value)).replace(
                    ".0}", "}")
                unit = unit.unit
            paramtexts.append("${} = {}$ {:latex_inline}".format(var, value, unit))

    return paramtexts
