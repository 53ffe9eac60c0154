"""Broadband filters: host-side registry and transmission curves.

API-parity module for the reference ``lightcurve_fitting/filters.py``: the same
65 filters with the same aliases, plot styles, photometric systems, and zero
points (Vega zero points from Bessell et al. 1998 Table A2 and the Swift UVOT
CalDB; AB elsewhere), the same lazily-computed effective wavelengths/frequencies
and half-maximum ranges (reference filters.py:170-230), and the same
``synthesize``/``spectrum``/``extinction`` methods (reference filters.py:267-340).

Transmission curves are loaded from the packed ``data/filter_curves.npz``
(uniform-wavelength resamplings of the public SVO/instrument-team tables; see
``tools/build_data.py``). Device-side synthetic photometry does not use these
objects — see :class:`lightcurve_fitting_tpu.ops.filterbank.FilterBank`.
"""

import os
from functools import total_ordering

import numpy as np

from .core.constants import C_AA_THZ, M0_OFFSET
from .ops.extinction import fitzpatrick99, extinction_law  # noqa: F401 (re-export)
from .utils import units as u
from .utils.table import Table

__all__ = ["Filter", "filtdict", "all_filters", "extinction_law"]


def _resample_filter_curve(filename, outfile):
    """Resample a raw transmission table onto a 1-nm grid, 1225..275 nm
    descending (developer utility; reference filters.py:358-363)."""
    orig = np.loadtxt(filename)
    wl = np.arange(1225.0, 274.0, -1.0)
    resampled = np.interp(wl, orig[:, 0], orig[:, 1], left=0, right=0)
    np.savetxt(outfile, np.array([wl, resampled]).T, fmt=["%.0f", "%.16f"])

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
_CURVES_FILE = os.path.join(_DATA_DIR, "filter_curves.npz")
_curves_npz = None

c = C_AA_THZ  # speed of light in angstrom*THz (reference filters.py:11)
C_NM_THZ = C_AA_THZ / 10.0


def _load_curve(name):
    global _curves_npz
    if _curves_npz is None:
        _curves_npz = np.load(_CURVES_FILE)
    try:
        return _curves_npz[name + "__wl"], _curves_npz[name + "__T"]
    except KeyError:
        return None


@total_ordering
class Filter:
    """A broadband photometric filter. See the reference class docstring
    (filters.py:37-112) for attribute semantics; behavior is identical."""

    order = None  # filled in after the registry is built

    def __init__(self, names, color="k", offset=0, system=None, fnu=3.631e-23,
                 curve=None, linecolor=None, textcolor=None, mec=None, italics=True):
        if isinstance(names, list):
            self.name = names[0]
            self.names = names
        else:
            self.name = names
            self.names = [names]
        if len(self.name) == 1:
            self.char = self.name
        else:
            shortest = sorted(self.names, key=len)[0]
            self.char = shortest if len(shortest) == 1 else "x"
        self.color = color
        self.linecolor = linecolor if linecolor else self.color
        self.textcolor = textcolor if textcolor else self.linecolor
        self.mec = mec if mec else self.linecolor
        self.italics = italics
        self.offset = offset
        self.system = system
        self.plotstyle = {"color": self.linecolor, "mfc": self.color, "mec": self.mec}
        self.fnu = fnu  # W m^-2 Hz^-1
        if self.fnu is None:
            self.m0 = np.nan
            self.M0 = np.nan
        else:
            self.m0 = 2.5 * np.log10(self.fnu)
            self.M0 = self.m0 + M0_OFFSET
        self._curve_key = curve
        self._trans = None
        self._props = None

    # --------------------------------------------------------------- curve
    def read_curve(self, show=False, force=False):
        """Load the transmission curve and derive effective wavelength/frequency
        and half-maximum ranges with the reference's formulas (filters.py:170-230).
        With ``show=True``, plot the transmission in wavelength and frequency."""
        if self._props is not None and not force:
            if show:
                self._show_curve()
            return
        if self._curve_key is None:
            return
        loaded = _load_curve(self._curve_key)
        if loaded is None:
            return
        wl, T = loaded  # nm ascending, T normalized to max 1
        freq = C_NM_THZ / wl  # THz, descending

        dwl = np.trapezoid(T, wl)
        wl_eff = np.trapezoid(T * wl, wl) / dwl
        above = wl[T > 0.5]
        wl0_guess, wl1_guess = above.min(), above.max()
        lsel = (wl <= wl0_guess) & (T >= 0.1)
        wl0 = np.interp(0.5, T[lsel], wl[lsel])
        rsel = (wl >= wl1_guess) & (T >= 0.1)
        wl1 = np.interp(0.5, T[rsel][::-1], wl[rsel][::-1])

        dfreq = np.trapezoid(T, freq)  # negative: freq is descending
        freq_eff = np.trapezoid(T * freq, freq) / dfreq
        freq0 = np.interp(0.5, T[rsel][::-1], freq[rsel][::-1])
        freq1 = np.interp(0.5, T[lsel], freq[lsel])

        T_per_freq = T / freq
        T_norm_per_freq = T_per_freq / np.trapezoid(T_per_freq, freq)  # negative, as in reference

        trans = Table([wl, T, freq, T_norm_per_freq], names=["wl", "T", "freq", "T_norm_per_freq"])
        trans["wl"].unit = u.nm
        trans["freq"].unit = u.THz
        self._trans = trans
        self._props = dict(
            wl_eff=u.Quantity(wl_eff, u.nm), dwl=u.Quantity(dwl, u.nm),
            wl_range=(wl_eff - wl0, wl1 - wl_eff),
            freq_eff=u.Quantity(freq_eff, u.THz), dfreq=u.Quantity(-dfreq, u.THz),
            freq_range=(freq_eff - freq0, freq1 - freq_eff),
        )

        if show:
            self._show_curve()

    def _show_curve(self):
        """Plot the transmission function vs wavelength (figure 1) and
        frequency (figure 2), with effective-value error bars, matching the
        reference's read_curve(show=True) (filters.py:199-222)."""
        import matplotlib.pyplot as plt
        if self._trans is None:
            return
        i = Filter.order.index(self.name) / float(len(Filter.order))
        trans = self._trans
        p = self._props
        plt.figure(1)
        ax1 = plt.gca()
        ax1.plot(np.asarray(trans["wl"]), np.asarray(trans["T"]), label=self.name)
        ax1.errorbar(p["wl_eff"].value, i, xerr=[[p["wl_range"][0]], [p["wl_range"][1]]],
                     marker="o", **self.plotstyle)
        ax1.set_xlabel("Wavelength (nm)")
        ax1.set_ylabel("Transmission")
        plt.figure(2)
        ax2 = plt.gca()
        ax2.plot(np.asarray(trans["freq"]), np.asarray(trans["T"]), label=self.name)
        ax2.errorbar(p["freq_eff"].value, i,
                     xerr=[[p["freq_range"][0]], [p["freq_range"][1]]],
                     marker="o", **self.plotstyle)
        ax2.set_xlabel("Frequency (THz)")
        ax2.set_ylabel("Transmission")

    def _prop(self, key):
        self.read_curve()
        return self._props[key] if self._props else None

    @property
    def trans(self):
        self.read_curve()
        return self._trans

    @property
    def wl_eff(self):
        return self._prop("wl_eff")

    @property
    def dwl(self):
        return self._prop("dwl")

    @property
    def wl_range(self):
        return self._prop("wl_range")

    @property
    def freq_eff(self):
        return self._prop("freq_eff")

    @property
    def dfreq(self):
        return self._prop("dfreq")

    @property
    def freq_range(self):
        return self._prop("freq_range")

    # ------------------------------------------------------------- physics
    def extinction(self, ebv, rv=3.1, z=0.0):
        """F99 extinction A_lambda (mag) at this filter's effective wavelength,
        optionally in a dust frame redshifted by ``z`` (reference filters.py:267-286)."""
        if self.wl_eff is not None:
            wl_aa = self.wl_eff.to(u.angstrom).value / (1.0 + z)
            return fitzpatrick99(np.array([wl_aa]), ebv * rv, rv)[0]

    def synthesize(self, spectrum, *args, z=0.0, ebv=0.0, **kwargs):
        """Band-averaged L_nu of a functional spectrum (reference filters.py:288-310).

        The spectrum function is evaluated at the emitted-frame frequencies
        ``nu_obs * (1+z)`` (THz) and must return L_nu in W/Hz."""
        trans = self.trans
        freq_obs = np.asarray(trans["freq"], float)
        freq = freq_obs * (1.0 + z)
        integrand = (np.asarray(spectrum(freq, *args, **kwargs))
                     * extinction_law(freq, ebv)
                     * np.asarray(trans["T_norm_per_freq"], float))
        return np.trapezoid(integrand, freq_obs)

    def spectrum(self, freq, lum, z=0.0, ebv=0.0):
        """Band average of a tabulated spectrum over the overlap region
        (reference filters.py:312-340)."""
        freq = np.asarray(freq, float) * (1.0 + z)
        trans = self.trans
        T_per_freq = np.asarray(trans["T"], float) / np.asarray(trans["freq"], float)
        T_interp = np.interp(freq, np.asarray(trans["freq"], float)[::-1], T_per_freq[::-1],
                             left=0.0, right=0.0)
        T_norm_per_freq = T_interp / np.trapezoid(T_interp, freq)
        return np.trapezoid(lum * extinction_law(freq, ebv) * T_norm_per_freq, freq)

    # ----------------------------------------------------------- identity
    def __str__(self):
        return self.name

    def __repr__(self):
        return "<filter " + self.name + ">"

    def __eq__(self, other):
        return isinstance(other, Filter) and self.name == other.name

    def __lt__(self, other):
        return isinstance(other, Filter) and Filter.order.index(self.name) < Filter.order.index(other.name)

    def __hash__(self):
        return self.name.__hash__()


# ---------------------------------------------------------------------------
# Registry. Records: (names, color, offset, system, fnu, has_curve, extra)
# fnu: 'AB' for the AB zero point 3.631e-23 W m^-2 Hz^-1; a float for Vega zero
# points (Bessell et al. 1998 Table A2 for UBVRIJHK; Swift UVOT CalDB for Swift);
# None when magnitudes in this filter cannot be converted to flux.
_AB = 3.631e-23
_REGISTRY = [
    ("FUV", "b", 8, "GALEX", _AB, True, {}),
    ("NUV", "r", 8, "GALEX", _AB, True, {}),
    (["UVW2", "uvw2", "W2", "2", "uw2"], "#FF007F", 8, "Swift", 7.379e-24, True, {}),
    (["UVM2", "uvm2", "M2", "M", "um2"], "m", 8, "Swift", 7.656e-24, True, {}),
    (["UVW1", "uvw1", "W1", "1", "uw1"], "#7F00FF", 4, "Swift", 9.036e-24, True, {}),
    (["u", "u'", "up", "uprime"], "#4700CC", 3, "Gunn", _AB, True, {}),
    (["U_S", "s", "us"], "#230047", 3, "Swift", 1.419e-23, True, {}),
    ("U", "#3C0072", 3, "Johnson", 1.790e-23, True, {"mec": "k"}),
    ("B", "#0057FF", 2, "Johnson", 4.063e-23, True, {"mec": "k"}),
    (["B_S", "b", "bs"], "#4B00FF", 2, "Swift", 4.093e-23, True, {}),
    (["g", "g'", "gp", "gprime", "F475W"], "#00CCFF", 1, "Gunn", _AB, True, {}),
    ("g-DECam", "#00CCFF", 1, "DECam", _AB, True, {}),
    (["c", "cyan"], "c", 1, "ATLAS", _AB, True, {}),
    ("V", "#79FF00", 1, "Johnson", 3.636e-23, True, {"mec": "k", "textcolor": "#46CC00"}),
    (["V_S", "v", "vs"], "#00FF30", 1, "Swift", 3.664e-23, True, {}),
    ("Itagaki", "w", 0, "Itagaki", _AB, True, {"linecolor": "k", "italics": False}),
    ("white", "w", 0, "MOSFiT", _AB, True, {"linecolor": "k", "italics": False}),
    (["unfilt.", "0", "C", "clear", "pseudobolometric", "griz", "RGB", "LRGB"], "w", 0,
     "MOSFiT", _AB, True, {"linecolor": "k", "italics": False}),
    ("G", "w", 0, "Gaia", _AB, True, {"linecolor": "k"}),
    ("Kepler", "r", 0, "Kepler", _AB, True, {"italics": False}),
    ("TESS", "r", 0, "TESS", _AB, True, {"italics": False}),
    (["DLT40", "Open", "Clear"], "w", 0, "DLT40", _AB, True, {"linecolor": "k", "italics": False}),
    ("w", "w", 0, "Gunn", _AB, True, {"linecolor": "k"}),
    (["o", "orange"], "orange", 0, "ATLAS", _AB, True, {}),
    (["r", "r'", "rp", "rprime", "F625W"], "#FF7D00", 0, "Gunn", _AB, True, {}),
    ("r-DECam", "#FF7D00", 0, "DECam", _AB, True, {}),
    (["R", "Rc", "R_s"], "#FF7000", 0, "Johnson", 3.064e-23, True, {"mec": "k"}),
    (["i", "i'", "ip", "iprime", "F775W"], "#90002C", -1, "Gunn", _AB, True, {}),
    ("i-DECam", "#90002C", -1, "DECam", _AB, True, {}),
    (["I", "Ic"], "#66000B", -1, "Johnson", 2.416e-23, True, {"mec": "k"}),
    (["z_s", "zs"], "#000000", -2, "Gunn", _AB, True, {}),
    (["z", "z'", "zp", "zprime"], "#000000", -2, "Gunn", _AB, True, {}),
    ("z-DECam", "#000000", -2, "DECam", _AB, True, {}),
    ("y", "y", -3, "Gunn", _AB, True, {}),
    ("y-DECam", "y", -3, "DECam", _AB, True, {}),
    ("J", "#444444", -2, "UKIRT", 1.589e-23, True, {}),
    ("H", "#888888", -3, "UKIRT", 1.021e-23, True, {}),
    (["K", "Ks"], "#CCCCCC", -4, "UKIRT", 0.640e-23, True, {}),
    ("L", "r", -4, "UKIRT", 0.285e-23, False, {}),
    # JWST NIRCam + MIRI
    ("F070W", "C7", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F090W", "C0", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F115W", "C8", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F150W", "C1", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F182M", "tomato", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F200W", "C2", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F250M", "chocolate", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F277W", "C3", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F300M", "maroon", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F335M", "salmon", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F356W", "C4", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F360M", "crimson", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F444W", "C5", 0, "JWST NIRCam", _AB, True, {"italics": False}),
    ("F560W", "C9", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F770W", "C6", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F1000W", "C7", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F1130W", "C0", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F1280W", "C8", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F1500W", "C1", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F1800W", "C9", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F2100W", "C2", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    ("F2550W", "C3", 0, "JWST MIRI", _AB, True, {"mec": "k", "italics": False}),
    # synthetic "filters" used to label bolometric-light-curve methods
    ("pseudobolometric, curve_fit", "C0", 0, None, _AB, False, {"italics": False}),
    ("pseudobolometric, MCMC", "C1", 0, None, _AB, False, {"italics": False}),
    ("pseudobolometric, integration", "C2", 0, None, _AB, False, {"italics": False}),
    ("bolometric, curve_fit", "k", 0, None, _AB, False, {"italics": False}),
    ("bolometric, MCMC", "C3", 0, None, _AB, False, {"italics": False}),
    # catch-all
    (["unknown", "?"], "w", 0, "unknown", _AB, False, {"linecolor": "k", "italics": False}),
]

all_filters = []
for _names, _color, _offset, _system, _fnu, _has_curve, _extra in _REGISTRY:
    _primary = _names[0] if isinstance(_names, list) else _names
    all_filters.append(Filter(_names, _color, _offset, _system, _fnu,
                              curve=_primary if _has_curve else None, **_extra))

Filter.order = [f.name for f in all_filters]
filtdict = {}
for _filt in all_filters:
    for _n in _filt.names:
        filtdict[_n] = _filt
