"""Bolometric light curves from per-epoch blackbody SED fits.

API-parity module for the reference ``lightcurve_fitting/bolometric.py``:
``calculate_bolometric`` (bolometric.py:648-832) with its three estimators —
bounded least squares (:483), per-epoch blackbody MCMC (:87), and direct SED
integration (:537) — plus epoch grouping (:383), colors (:560), and the result
plots (:290, :608).

TPU redesign: the per-epoch MCMC log-posterior is a pure jax function over
FilterBank quadrature; each epoch's chain is one jitted scan (compile cache
keyed by the epoch's band multiset), and an optional fully-batched path fits
all epochs at once with vmap + padding masks (see ``parallel.batched``).
KDE prior chaining for single-filter epochs (reference :753-759) is preserved
as a sequential pass by construction. Unlike the reference, single-filter
epochs do not crash the least-squares stage: our KDE prior keeps its bounds
attributes.
"""

import os
import warnings

import numpy as np
import jax.numpy as jnp
import matplotlib.pyplot as plt
from scipy.optimize import curve_fit, OptimizeWarning

from .filters import filtdict, extinction_law
from .models import planck_fast, UniformPrior, LogUniformPrior, GaussianPrior, KDEPrior
from .models.blackbody import planck_lnu
from .lightcurve import LC
from .parallel.sampler import EnsembleSampler
from .ops.filterbank import FilterBank
from .utils.table import vstack
from .utils import units as u
from .core.constants import sigma_sb

__all__ = ["calculate_bolometric", "spectrum_mcmc", "spectrum_corner", "plot_chain",
           "blackbody_lstsq", "integrate_sed", "pseudo", "stefan_boltzmann",
           "group_by_epoch", "median_and_unc", "calc_colors",
           "plot_bolometric_results", "plot_color_curves"]

_STYLE = os.path.join(os.path.dirname(__file__), "serif.mplstyle")
plt.style.use(_STYLE)

DEPRECATED_BOLOMETRIC_COLNAMES = [  # (old, new)
    ("L_opt", "L"),
    ("lum", "L_bol"),
    ("dlum", "dL_bol"),
    ("dtemp0", "dtemp_mcmc0"),
    ("dtemp1", "dtemp_mcmc1"),
    ("dradius0", "dradius_mcmc0"),
    ("dradius1", "dradius_mcmc1"),
]


def pseudo(temp, radius, z, filter0=filtdict["I"], filter1=filtdict["U"], cutoff_freq=np.inf):
    """Pseudobolometric luminosity: blackbody integrated between two filters on
    a 1-THz grid (reference bolometric.py:32-59). Default U to I."""
    freq0 = filter0.freq_eff.value - filter0.dfreq.value / 2.0
    freq1 = filter1.freq_eff.value + filter1.dfreq.value / 2.0
    x_optical = np.arange(freq0, freq1)
    y_optical = planck_fast(x_optical * (1.0 + z), temp, radius, cutoff_freq)
    L_opt = np.trapezoid(y_optical) * 1e12  # dx = 1 THz
    return L_opt


def plot_chain(chain, labels=None):
    """Chain-history plots (reference bolometric.py:62-84)."""
    ndim = chain.shape[-1]
    fig, ax = plt.subplots(ndim, figsize=(6.0, 2.0 * ndim), squeeze=False)
    ax = ax.ravel()
    for i in range(ndim):
        ax[i].plot(chain[:, :, i].T, "k", alpha=0.2)
        if labels:
            ax[i].set_ylabel(labels[i])
    return fig


def _make_sed_log_posterior(spectrum, epoch1, priors, z, ebv, spectrum_kwargs,
                            use_sigma, sigma_type):
    """Pure jax log-posterior for an SED fit. ``spectrum(nu, *params)`` is
    evaluated at the FilterBank's emitted-frame nodes; for the default
    ``planck_fast`` the jax kernel is substituted directly."""
    y_np = np.asarray(epoch1["lum"], float)
    dy_np = np.asarray(epoch1["dlum"], float)
    # O(1) data scale for TPU float32-range safety (see models/base.py)
    yscale = float(np.median(np.abs(y_np[y_np != 0]))) if np.any(y_np != 0) else 1.0
    offset = -len(y_np) * np.log(yscale)
    inv_yscale = 1.0 / yscale
    y = jnp.asarray(y_np / yscale)
    dy = jnp.asarray(dy_np / yscale)
    filters = list(epoch1["filter"])
    bank = FilterBank(sorted(set(filters)))
    ids = bank.band_ids(filters)
    nodes, weights, k_ext = bank.gather(ids, z=z)
    ext = jnp.asarray(extinction_law(np.asarray(bank.emitted_nodes(z)[ids]).ravel(), ebv)
                      .reshape(nodes.shape)) if np.any(ebv) else None

    table = None
    if spectrum is planck_fast and not np.any(ebv):
        # blackbody: band integral factorizes -> per-band Chebyshev of ln g(ln T)
        from .ops.bandtable import ChebyshevBandTable
        table = ChebyshevBandTable(bank, z=z,
                                   cutoff_freq=spectrum_kwargs.get("cutoff_freq", np.inf))
        table_coeffs = table.gather(ids)

    if spectrum is planck_fast:
        def spec_fn(nu, *p):
            return planck_lnu(nu, p[0], p[1], **spectrum_kwargs)
    else:
        def spec_fn(nu, *p):
            return spectrum(nu, *[pp[..., None] for pp in p], **spectrum_kwargs)

    if sigma_type == "relative":
        sigma_units = dy
    elif sigma_type == "absolute":
        sigma_units = jnp.asarray(float(np.median(dy_np)) / yscale)
    else:
        raise Exception('sigma_type must either be "relative" or "absolute"')

    def log_posterior(p):
        log_prior = 0.0
        for i, prior in enumerate(priors):
            log_prior = log_prior + prior(p[i])
        n_model = p.shape[0] - (1 if use_sigma else 0)
        if table is not None:
            from .ops.bandtable import chebyshev_bandflux
            y_fit = chebyshev_bandflux(table_coeffs, jnp.broadcast_to(p[0], y.shape),
                                       jnp.broadcast_to(p[1], y.shape),
                                       table.log_T_lo, table.log_T_hi) * inv_yscale
        else:
            lnu = spec_fn(nodes, *[p[i] for i in range(n_model)])
            if ext is not None:
                lnu = lnu * ext
            y_fit = jnp.sum(weights * lnu, axis=-1) * inv_yscale
        if use_sigma:
            sigma2 = dy ** 2.0 + (p[-1] * sigma_units) ** 2.0
        else:
            sigma2 = dy ** 2.0
        ll = -0.5 * jnp.sum(jnp.log(2 * jnp.pi * sigma2)
                            + (y - y_fit) ** 2.0 / sigma2) + offset
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        return jnp.where(jnp.isfinite(log_prior), log_prior + ll, -jnp.inf)

    return log_posterior


def spectrum_mcmc(spectrum, epoch1, priors, starting_guesses, z=0.0, ebv=0.0,
                  spectrum_kwargs=None, show=False, outpath=".", nwalkers=10,
                  burnin_steps=200, steps=100, save_chains=False, use_sigma=False,
                  sigma_type="relative", labels=None, freq_min=100.0, freq_max=1000.0,
                  seed=None, make_corner=True):
    """Fit an SED function to one epoch of photometry with ensemble MCMC
    (reference bolometric.py:87-190)."""
    mjdavg = float(np.median(np.asarray(epoch1["MJD"], float)))
    if spectrum_kwargs is None:
        spectrum_kwargs = {}
    # drop non-finite kwargs that are jit-safe defaults
    sk = {k: v for k, v in spectrum_kwargs.items() if not (k == "cutoff_freq" and np.isinf(v))}

    ndim = len(priors)
    if nwalkers % 2:
        nwalkers += 1
        starting_guesses = np.vstack([starting_guesses, starting_guesses[-1:]])
    try:
        log_posterior = _make_sed_log_posterior(spectrum, epoch1, priors, z, ebv, sk,
                                                use_sigma, sigma_type)
        # verify the spectrum function traces (arbitrary Python callables may
        # not): eval_shape forces abstract tracing through the vmapped path
        import jax
        jax.eval_shape(jax.vmap(log_posterior),
                       jnp.zeros((2, ndim), dtype=jnp.asarray(0.0).dtype))
        sampler = EnsembleSampler(nwalkers, ndim, log_posterior, seed=seed)
    except Exception:
        # host fallback: numpy stretch move over Filter.synthesize, exactly the
        # reference's generic path (bolometric.py:154-164)
        from .parallel.host_sampler import HostEnsembleSampler
        filters = list(epoch1["filter"])
        y_np = np.asarray(epoch1["lum"], float)
        dy_np = np.asarray(epoch1["dlum"], float)
        sigma_units = dy_np if sigma_type == "relative" else np.median(dy_np)

        def log_posterior_host(p):
            log_prior = 0.0
            for prior, p_i in zip(priors, p):
                log_prior += float(prior(p_i))
            if np.isinf(log_prior):
                return log_prior
            y_fit = np.array([f.synthesize(spectrum, *p[: -1 if use_sigma else None],
                                           z=z, ebv=ebv, **sk) for f in filters])
            sigma = np.sqrt(dy_np ** 2 + (p[-1] * sigma_units) ** 2) if use_sigma else dy_np
            ll = -0.5 * np.sum(np.log(2 * np.pi * sigma ** 2) + ((y_np - y_fit) / sigma) ** 2)
            return log_prior + ll

        sampler = HostEnsembleSampler(nwalkers, ndim, log_posterior_host, seed=seed)
    pos, _, _ = sampler.run_mcmc(starting_guesses, burnin_steps, skip_initial_state_check=True)

    if show:
        plot_chain(sampler.chain, labels)
    sampler.reset()
    sampler.run_mcmc(pos, steps, skip_initial_state_check=True)
    if show:
        plot_chain(sampler.chain, labels)

    os.makedirs(outpath, exist_ok=True)
    if save_chains:
        chain_filename = os.path.join(outpath, f"{mjdavg:.3f}.npy")
        np.save(chain_filename, sampler.flatchain)

    if make_corner:
        f4 = spectrum_corner(spectrum, epoch1, sampler.flatchain, z, ebv, spectrum_kwargs,
                             use_sigma, labels, freq_min=freq_min, freq_max=freq_max,
                             save_plot_as=os.path.join(outpath, f"{mjdavg:.3f}.pdf"))
        if show:
            plt.show()
        else:
            plt.close(f4)

    return sampler


def spectrum_corner(spectrum, epoch1, sampler_flatchain, z=0.0, ebv=0.0,
                    spectrum_kwargs=None, use_sigma=False, labels=None, freq_min=100.0,
                    freq_max=1000.0, save_plot_as=""):
    """Corner plot with an SED inset (reference bolometric.py:193-287)."""
    from .utils.corner import corner as _corner

    ndim = sampler_flatchain.shape[-1]
    if spectrum_kwargs is None:
        spectrum_kwargs = {}

    f4 = _corner(sampler_flatchain, labels=labels)

    ps = sampler_flatchain[np.random.choice(sampler_flatchain.shape[0], 100)].T
    filters = list(epoch1["filter"])
    xmin = min(freq_min, max(filters).freq_eff.value)
    xmax = max(freq_max, min(filters).freq_eff.value)
    xfit = np.arange(xmin, xmax)
    freq = xfit * (1.0 + z)
    yfit = spectrum(freq, *ps[: -1 if use_sigma else None], **spectrum_kwargs) \
        * extinction_law(freq, ebv)
    yscale = 10.0 ** np.floor(np.log10(yfit.max()))

    all_axes = np.reshape(f4.get_axes(), (ndim, ndim))
    top_right = all_axes[0, -1]
    top_right.set_frame_on(True)
    top_right.xaxis.set_major_locator(plt.AutoLocator())
    top_right.xaxis.tick_top()
    top_right.set_xlabel("Frequency (THz)")
    top_right.xaxis.set_label_position("top")
    top_right.yaxis.set_major_locator(plt.AutoLocator())
    top_right.yaxis.tick_right()
    top_right.set_ylabel(f"Luminosity $L_\\nu$ (10$^{{{np.log10(yscale):.0f}}}$ W Hz$^{{-1}}$)")
    top_right.yaxis.set_label_position("right")
    f4.tight_layout(h_pad=0.05, w_pad=0.05)

    bottom_left = all_axes[ndim // 2 - 1, (ndim + 1) // 2] if ndim > 1 else top_right
    if bottom_left is top_right:
        ax = top_right
    else:
        bbox0 = bottom_left.bbox.transformed(f4.transFigure.inverted())
        bbox1 = top_right.bbox.transformed(f4.transFigure.inverted())
        ax = f4.add_axes([bbox0.xmin, bbox0.ymin, bbox1.xmax - bbox0.xmin,
                          bbox1.ymax - bbox0.ymin])
        ax.xaxis.tick_top()
        ax.set_xlabel("Frequency (THz)")
        ax.xaxis.set_label_position("top")
        ax.yaxis.tick_right()
        ax.set_ylabel(f"Luminosity $L_\\nu$ (10$^{{{np.log10(yscale):.0f}}}$ W Hz$^{{-1}}$)")
        ax.yaxis.set_label_position("right")
        top_right.set_frame_on(False)
        top_right.xaxis.set_major_locator(plt.NullLocator())
        top_right.set_xlabel("")
        top_right.yaxis.set_major_locator(plt.NullLocator())
        top_right.set_ylabel("")

    for row in epoch1:
        ax.errorbar(row["freq"], row["lum"] / yscale, row["dlum"] / yscale, marker="o",
                    **row["filter"].plotstyle)
    ax.plot(xfit, yfit.T / yscale, color="k", alpha=0.05)

    if save_plot_as:
        f4.savefig(save_plot_as)
        print("saving figure as " + save_plot_as)

    return f4


def group_by_epoch(lc, res=1.0, also_group_by=()):
    """Group photometry into epochs at resolution ``res`` days; a manual 'epoch'
    column overrides (reference bolometric.py:383-416)."""
    epochs = lc.get("epoch").astype(float)
    mask = np.ma.getmaskarray(epochs)
    if mask.any():
        x = np.asarray(lc["MJD"], float)[mask] / res
        frac = np.median(x - np.trunc(x))
        epochs[mask] = np.round(x - frac + np.round(frac)) * res
    lc["epoch"] = np.ma.filled(epochs)
    group_by = ["epoch"] + list(also_group_by)
    for col in also_group_by:
        if np.ma.is_masked(lc[col]):
            lc[col] = lc[col].filled()
    grouped = lc.group_by(group_by)
    mjdavg = [np.median(np.asarray(g["MJD"], float)) for g in grouped.groups]
    groups = [grouped.groups[i] for i in np.argsort(mjdavg)]
    return groups


def stefan_boltzmann(temp, radius, dtemp=None, drad=None, covTR=None):
    """L = 4 pi R^2 sigma T^4 (W; T in kK, R in kRsun) with optional linear
    error propagation (reference bolometric.py:422-453)."""
    lum = 4 * np.pi * np.asarray(radius) ** 2 * sigma_sb * np.asarray(temp) ** 4
    if dtemp is None or drad is None or covTR is None:
        return lum
    dlum = 8 * np.pi * sigma_sb * (radius ** 2 * temp ** 8 * drad ** 2
                                   + 4 * radius ** 4 * temp ** 6 * dtemp ** 2
                                   + 4 * radius ** 3 * temp ** 7 * covTR) ** 0.5
    return lum, dlum


def median_and_unc(x, perc_contained=68.0):
    """Median and equal-tailed interval half-widths (reference
    bolometric.py:456-480)."""
    q = 50.0 + np.array([-perc_contained / 2.0, 0.0, perc_contained / 2.0])
    percentiles = np.percentile(np.asarray(x, float), q, axis=0)
    median = percentiles[1]
    lower, upper = np.diff(percentiles, axis=0)
    return median, lower, upper


def blackbody_lstsq(epoch1, z, p0=None, T_range=(1.0, 100.0), R_range=(0.01, 1000.0),
                    cutoff_freq=np.inf):
    """chi^2 blackbody fit of one epoch via bounded least squares (reference
    bolometric.py:483-534)."""
    if p0 is None:
        p0 = [10.0, 10.0]

    def planck_cutoff(nu, T, R):
        return planck_fast(nu, T, R, cutoff_freq)

    lo = [T_range[0] if np.isfinite(T_range[0]) else 0.0,
          R_range[0] if np.isfinite(R_range[0]) else 0.0]
    hi = [T_range[1] if np.isfinite(T_range[1]) else np.inf,
          R_range[1] if np.isfinite(R_range[1]) else np.inf]
    with warnings.catch_warnings():
        if len(epoch1) <= 2:
            warnings.simplefilter("ignore", OptimizeWarning)
        p0, cov = curve_fit(planck_cutoff, np.asarray(epoch1["freq"], float) * (1.0 + z),
                            np.asarray(epoch1["lum"], float), p0=p0, bounds=(lo, hi))
    temp, radius = p0
    dtemp, drad = np.sqrt(np.diag(cov))
    lum, dlum = stefan_boltzmann(temp, radius, dtemp, drad, cov[0, 1])
    L_opt = pseudo(temp, radius, z, cutoff_freq=cutoff_freq)
    return temp, radius, dtemp, drad, lum, dlum, L_opt


def integrate_sed(epoch1):
    """Trapezoidal integral of the observed SED, zero-padded by one effective
    bandwidth at each end (reference bolometric.py:537-557). Returns watts."""
    epoch1.sort("freq")
    freq = np.asarray(epoch1["freq"], float)
    dfreq = np.asarray(epoch1["dfreq"], float)
    lum = np.asarray(epoch1["lum"], float)
    freqs = np.concatenate([[freq[0] - dfreq[0]], freq, [freq[-1] + dfreq[-1]]])
    lums = np.concatenate([[0.0], lum, [0.0]])
    return np.trapezoid(lums, freqs) * 1e12  # W/Hz * THz -> W


def calc_colors(epoch1, colors):
    """Colors from one epoch's SED (reference bolometric.py:560-605)."""
    mags = []
    dmags = []
    lolims = []
    uplims = []
    for color in colors:
        f0, f1 = [filtdict[f] for f in color.split("-")]
        filters = list(epoch1["filter"])
        if f0 in filters and f1 in filters:
            m0, dm0, n0 = epoch1.where(filter=f0)[["absmag", "dmag", "nondet"]][0]
            m1, dm1, n1 = epoch1.where(filter=f1)[["absmag", "dmag", "nondet"]][0]
            if n0 and n1:
                m0_m1 = np.nan
            else:
                m0_m1 = m0 - m1
            dm0_m1 = (dm0 ** 2.0 + dm1 ** 2.0) ** 0.5
            mags.append(m0_m1)
            dmags.append(dm0_m1)
            lolims.append(bool(n0))
            uplims.append(bool(n1))
        else:
            mags.append(np.nan)
            dmags.append(np.nan)
            lolims.append(True)
            uplims.append(True)
    return mags, dmags, lolims, uplims


def plot_color_curves(t, colors=None, fmt="o", limit_length=0.1, xcol="MJD"):
    """Color curves from the ``calculate_bolometric`` output table (reference
    bolometric.py:608-645)."""
    if colors is None:
        colors = []
        for col in t.colnames:
            # require the paired d(...) column: plain luminosity columns like 'L'
            # would otherwise match the 'L' filter (latent bug in the reference)
            if (col.split("-")[0] in filtdict and f"d({col})" in t.colnames
                    and not (t.has_masked_values and np.asarray(t.mask[col]).all())):
                colors.append(col)
    fig = plt.figure()
    for c in colors:
        dcolor_colname = f"d({c})"
        if t.has_masked_values and np.asarray(t.mask[dcolor_colname]).any():
            dcolor = np.ma.filled(np.ma.MaskedArray(t[dcolor_colname]), limit_length)
        else:
            dcolor = np.asarray(t[dcolor_colname])
        plt.errorbar(np.asarray(t[xcol]), np.ma.filled(np.ma.MaskedArray(t[c]), np.nan),
                     dcolor, (np.asarray(t[f"d{xcol}0"]), np.asarray(t[f"d{xcol}1"])),
                     fmt=fmt, lolims=np.asarray(t[f"lolims({c})"], bool),
                     uplims=np.asarray(t[f"uplims({c})"], bool), label=f"${c}$")
    plt.xlabel(xcol)
    plt.ylabel("Color (mag)")
    plt.legend()
    return fig


def plot_bolometric_results(t0, save_plot_as=None, xcol=None, log=False):
    """3-panel L/R/T plot of the bolometric results using synthetic
    method-label 'filters' (reference bolometric.py:290-380)."""
    if xcol is None:
        xcol = "phase" if "redshift" in t0.meta else "MJD"
    elif xcol == "phase" and "redshift" not in t0.meta:
        raise ValueError("must set t0.meta['redshift'] and t0.meta['refmjd'] to calculate the phase")

    for old, new in DEPRECATED_BOLOMETRIC_COLNAMES:
        if new not in t0.colnames:
            t0.rename_column(old, new)
            warnings.warn(f"Updating deprecated column name from {old} to {new}")

    fig, axarr = plt.subplots(3, figsize=(6, 12), sharex=True)

    datasets = [
        ("", "pseudobolometric, curve_fit"),
        ("_mcmc", "pseudobolometric, MCMC"),
        ("_int", "pseudobolometric, integration"),
        ("_bol", "bolometric, curve_fit"),
        ("_bol_mcmc", "bolometric, MCMC"),
    ]

    subtabs = []
    for suffix, label in datasets:
        lc = LC(t0[["MJD", "source"]] if "source" in t0.colnames else t0[["MJD"]])
        lc["filter"] = filtdict[label]
        for base_ycol in ["L", "radius", "temp"]:
            ycol = base_ycol + suffix
            if ycol in t0.colnames:
                lc[base_ycol] = t0[ycol]
            dycol = f"d{ycol}"
            dycol0 = f"d{ycol}0"
            dycol1 = f"d{ycol}1"
            if dycol0 in t0.colnames and dycol1 in t0.colnames:
                lc[f"d{base_ycol}"] = np.column_stack([np.ma.filled(np.ma.MaskedArray(t0[dycol0]), np.nan),
                                                       np.ma.filled(np.ma.MaskedArray(t0[dycol1]), np.nan)])
            elif dycol in t0.colnames:
                lc[f"d{base_ycol}"] = np.column_stack([np.ma.filled(np.ma.MaskedArray(t0[dycol]), np.nan)] * 2)
        subtabs.append(lc)
    t = vstack(subtabs)
    t = LC(t)
    if xcol == "phase":
        t.meta = dict(t0.meta)
        t.calcPhase()
    else:
        log = False

    plt.sca(axarr[0])
    t.plot(xcol=xcol, ycol="L", loc_filt="lower right", mjd_axis=False)
    axarr[0].set_xlabel("")
    axarr[0].set_yscale("log")
    axarr[0].set_ylabel("Luminosity (W)")

    plt.sca(axarr[1])
    t.plot(xcol=xcol, ycol="radius", loc_mark="lower right", mjd_axis=False)
    axarr[1].set_xlabel("")
    axarr[1].set_ylabel("Radius ($1000 R_\\odot$)")

    plt.sca(axarr[2])
    t.plot(xcol=xcol, ycol="temp", mjd_axis=False)
    axarr[2].set_ylabel("Temperature (kK)")
    if log:
        axarr[2].set_xscale("log")
        axarr[2].xaxis.set_major_formatter(plt.FormatStrFormatter("%g"))

    fig.tight_layout()
    if save_plot_as is not None:
        fig.savefig(save_plot_as)
    return fig


class _FlatchainSampler:
    """Minimal sampler shim so batched results feed the same downstream code
    (KDE prior chaining, chain saving) as the sequential path."""

    def __init__(self, flatchain):
        self.flatchain = flatchain


def calculate_bolometric(lc, z=0.0, outpath=".", res=1.0, nwalkers=10, burnin_steps=200,
                         steps=100, priors=None, save_table_as=None, min_nfilt=3,
                         cutoff_freq=np.inf, show=False, colors=None, do_mcmc=True,
                         save_chains=False, use_sigma=False, sigma_type="relative",
                         also_group_by=(), seed=None, save_corners=True,
                         batch_mode=False):
    """Full bolometric light curve from broadband photometry (reference
    bolometric.py:648-832). Adds ``seed`` for reproducibility, ``save_corners``
    to skip per-epoch corner PDFs, and ``batch_mode`` to run every multi-filter
    epoch's MCMC concurrently in one jitted vmap on device (identical
    statistics; starting guesses centered on the default p0 rather than the
    previous epoch's curve_fit solution). Single-filter epochs always run
    sequentially so the KDE temperature-prior chaining (reference :753-759)
    is preserved."""
    if z:
        warnings.warn('The z keyword is deprecated. Include the redshift in `lc.meta["redshift"]` instead.')
    z = lc.meta.get("redshift", z)

    if colors is None:
        colors = []

    use_src = "source" in lc.colnames
    t0 = LC(names=["MJD", "dMJD0", "dMJD1",
                   "temp", "radius", "dtemp", "dradius",
                   "L_bol", "dL_bol",
                   "L",
                   "temp_mcmc", "radius_mcmc", "dtemp_mcmc0", "dtemp_mcmc1",
                   "dradius_mcmc0", "dradius_mcmc1",
                   "L_bol_mcmc", "dL_bol_mcmc0", "dL_bol_mcmc1",
                   "L_mcmc", "dL_mcmc0", "dL_mcmc1",
                   "L_int",
                   "npoints"]
            + colors + ["d({})".format(c) for c in colors]
            + ["lolims({})".format(c) for c in colors]
            + ["uplims({})".format(c) for c in colors] + ["filts"]
            + (["source"] if use_src else []),
            dtype=[float] * 23 + [int]
            + [float] * 2 * len(colors) + [bool] * 2 * len(colors) + ["S6"]
            + ([object] if use_src else []),
            masked=True)

    if priors is None:
        priors = [UniformPrior(1.0, 100.0), LogUniformPrior(0.01, 1000.0)]
        if use_sigma:
            priors.append(GaussianPrior(0.0, 10.0))

    sampler = None
    finite = np.isfinite(np.ma.filled(np.ma.MaskedArray(lc["dmag"]).astype(float), np.nan))
    lc = lc[finite & np.ma.filled(np.ma.MaskedArray(lc["dmag"]) > 0.0, False)]
    rng = np.random.default_rng(seed)

    groups = []
    for epoch1 in group_by_epoch(lc, res, also_group_by):
        epoch1.calcFlux()
        epoch1 = epoch1.bin(delta=np.inf)
        epoch1.calcMag()
        epoch1.calcAbsMag()
        epoch1.calcLum()
        epoch1["freq"] = np.array([f.freq_eff.value for f in epoch1["filter"]])
        epoch1["dfreq"] = np.array([f.dfreq.value for f in epoch1["filter"]])
        epoch1["freq"].unit = u.THz
        epoch1["lum"].unit = u.W / u.Hz
        epoch1["dlum"].unit = u.W / u.Hz
        groups.append(epoch1)

    # batch mode: fit all multi-filter epochs concurrently in one device call
    batched_chains = {}
    if batch_mode and do_mcmc:
        from .parallel.batched import pack_epochs, batched_blackbody_mcmc
        eligible = []
        for i, ep in enumerate(groups):
            nfilt_i = len(set(ep.where(nondet=False)["filter"]))
            if nfilt_i >= min_nfilt and nfilt_i > 1:
                eligible.append(i)
        if eligible:
            all_filts = sorted({f for i in eligible for f in groups[i]["filter"]})
            bank = FilterBank(all_filts)
            packed = pack_epochs([groups[i] for i in eligible], bank, z)
            ndim = len(priors)
            # center each epoch's walkers on its least-squares solution (the
            # sequential path gets this for free via p0 chaining)
            centers = np.empty((len(eligible), ndim))
            T_range = (priors[0].p_min, priors[0].p_max)
            R_range = (priors[1].p_min, priors[1].p_max)
            for j, i in enumerate(eligible):
                try:
                    fit = blackbody_lstsq(groups[i], z, [10.0, 10.0], T_range, R_range,
                                          cutoff_freq)
                    centers[j, :2] = fit[0], fit[1]
                except RuntimeError:
                    centers[j, :2] = 10.0, 10.0
                if use_sigma:
                    centers[j, 2] = 1.0
            guesses = rng.normal(size=(len(eligible), nwalkers, ndim)) + centers[:, None, :]
            guesses[guesses <= 0.0] = 1.0
            flat, _acc = batched_blackbody_mcmc(packed, priors, guesses, nwalkers,
                                                burnin_steps, steps, cutoff_freq,
                                                use_sigma, sigma_type,
                                                seed=seed if seed is not None else 0)
            batched_chains = {i: flat[j] for j, i in enumerate(eligible)}

    for i_epoch, epoch1 in enumerate(groups):
        filts = set(epoch1.where(nondet=False)["filter"])
        nfilt = len(filts)
        if nfilt < min_nfilt:
            continue

        if nfilt > 1:
            p0 = np.array([10.0, 10.0])
        elif sampler is not None:
            priors[0] = KDEPrior(sampler.flatchain[:, 0])
            p0 = np.median(sampler.flatchain, axis=0)
        else:
            continue

        mjdavg, dmjd0, dmjd1 = median_and_unc(np.asarray(epoch1["MJD"], float), 100.0)
        filtstr = "".join([f.char for f in sorted(filts)])

        # blackbody - least squares
        T_range = (priors[0].p_min, priors[0].p_max)
        R_range = (priors[1].p_min, priors[1].p_max)
        try:
            temp, radius, dtemp, drad, L_bol, dL_bol, L = blackbody_lstsq(
                epoch1, z, p0, T_range, R_range, cutoff_freq)
            p0 = np.array([temp, radius])
        except RuntimeError:  # optimization failed
            temp = radius = dtemp = drad = L_bol = dL_bol = L = np.nan

        starting_guesses = rng.normal(size=(nwalkers, 2)) + p0
        starting_guesses[starting_guesses <= 0.0] = 1.0
        labels = ["T (kK)", "R (1000 R$_\\odot$)"]
        if use_sigma:
            starting_guesses = np.append(starting_guesses,
                                         np.abs(rng.normal(size=(nwalkers, 1))), axis=1)
            labels.append("$\\sigma$")

        # blackbody - MCMC
        try:
            if not do_mcmc:
                raise ValueError("do_mcmc=False")
            spectrum_kwargs = {"cutoff_freq": cutoff_freq}
            if i_epoch in batched_chains:
                sampler = _FlatchainSampler(batched_chains[i_epoch])
                os.makedirs(outpath, exist_ok=True)
                if save_chains:
                    np.save(os.path.join(outpath, f"{mjdavg:.3f}.npy"), sampler.flatchain)
                if save_corners:
                    f4 = spectrum_corner(planck_fast, epoch1, sampler.flatchain, z,
                                         spectrum_kwargs=spectrum_kwargs,
                                         use_sigma=use_sigma, labels=labels,
                                         save_plot_as=os.path.join(outpath, f"{mjdavg:.3f}.pdf"))
                    plt.close(f4)
            else:
                sampler = spectrum_mcmc(planck_fast, epoch1, priors, starting_guesses, z=z,
                                        spectrum_kwargs=spectrum_kwargs, outpath=outpath,
                                        nwalkers=nwalkers, burnin_steps=burnin_steps,
                                        steps=steps, show=show, save_chains=save_chains,
                                        use_sigma=use_sigma, sigma_type=sigma_type,
                                        labels=labels, seed=seed, make_corner=save_corners)

            L_bol_mcmc_samples = stefan_boltzmann(sampler.flatchain[:, 0], sampler.flatchain[:, 1])
            L_mcmc_samples = pseudo(sampler.flatchain[:, 0], sampler.flatchain[:, 1], z,
                                    cutoff_freq=cutoff_freq)

            (T_mcmc, R_mcmc), (dT0_mcmc, dR0_mcmc), (dT1_mcmc, dR1_mcmc) = \
                median_and_unc(sampler.flatchain[:, :2])
            L_mcmc_bol, dL_mcmc0_bol, dL_mcmc1_bol = median_and_unc(L_bol_mcmc_samples)
            L_mcmc, dL_mcmc0, dL_mcmc1 = median_and_unc(L_mcmc_samples)

        except ValueError as e:
            print(e)
            T_mcmc = R_mcmc = dT0_mcmc = dR0_mcmc = dT1_mcmc = dR1_mcmc = np.nan
            L_mcmc = dL_mcmc0 = dL_mcmc1 = L_mcmc_bol = dL_mcmc0_bol = dL_mcmc1_bol = np.nan

        # direct integration
        L_int = integrate_sed(epoch1)

        # colors
        color_mags, color_dmags, color_lolims, color_uplims = calc_colors(epoch1, colors)

        row = [mjdavg, dmjd0, dmjd1,
               temp, radius, dtemp, drad, L_bol, dL_bol, L,
               T_mcmc, R_mcmc, dT0_mcmc, dT1_mcmc, dR0_mcmc, dR1_mcmc,
               L_mcmc_bol, dL_mcmc0_bol, dL_mcmc1_bol, L_mcmc, dL_mcmc0, dL_mcmc1,
               L_int, nfilt] + color_mags + color_dmags
        row_bool = color_lolims + color_uplims
        row_string = [filtstr] + ([epoch1["source"][0]] if use_src else [])
        mask = np.concatenate([np.isnan(np.asarray(row, float)),
                               np.zeros_like(row_bool, dtype=bool),
                               ~np.array([bool(rs) for rs in row_string])])
        t0.add_row(row + row_bool + row_string, mask=mask)

    # keep deprecated column names for now (reference bolometric.py:824-827)
    for old, new in DEPRECATED_BOLOMETRIC_COLNAMES:
        t0[old] = t0[new]
    warnings.warn("Some column names in the output table have changed (see documentation). "
                  "Please update your code!")

    if save_table_as is not None and t0:
        t0.write(save_table_as, format="ascii.fixed_width_two_line", overwrite=True)

    return t0
