"""Light-curve container and photometric conversions.

Host-side API-parity module for the reference ``lightcurve_fitting/lightcurve.py``:
the :class:`LC` table with ~60 recognized column aliases, the ``where`` query
DSL, mag/flux/absmag/luminosity conversions with 3-sigma nondetection handling,
inverse-variance time binning, peak/phase utilities, and the multiband
matplotlib plot with nondetection arrows and stacked legends. Built on the
framework's own table layer (astropy is not a dependency).

Device code never touches these objects: fitting extracts plain arrays
(MJD, flux/lum, errors, integer band ids) once per fit.
"""

import itertools
from functools import partial

import numpy as np
import matplotlib.pyplot as plt
from matplotlib.path import Path
from matplotlib.markers import MarkerStyle
from matplotlib.patches import Patch
from matplotlib.colors import is_color_like

from .filters import filtdict
from .utils.table import Table, MaskedColumn, vstack
from .utils.cosmology import Planck18

try:
    from config import markers  # optional user configuration module
except ModuleNotFoundError:
    markers = {}

__all__ = ["LC", "Arrow", "flux2mag", "mag2flux", "binflux", "aux_axes",
           "custom_legend", "filter_legend", "filtsetup", "column_names"]


class Arrow(Path):
    """A downward-pointing arrow-shaped Path with head half-width ``hx`` and
    head height ``hy`` (reference lightcurve.py:18-31); marks nondetections."""

    def __init__(self, hx, hy):
        verts = [(0, 0), (0, -1), (-hx, -1 + hy), (0, -1), (hx, -1 + hy), (0, -1), (0, 0)]
        codes = [Path.MOVETO] + [Path.LINETO] * 5 + [Path.CLOSEPOLY]
        Path.__init__(self, verts, codes)


arrow = Arrow(0.2, 0.3)
othermarkers = ("o", *MarkerStyle.filled_markers[2:])
itermarkers = itertools.cycle(othermarkers)
itercolors = itertools.cycle(plt.rcParams["axes.prop_cycle"].by_key()["color"])

# recognized column aliases (reference lightcurve.py:40-59)
column_names = {
    "Filter": ["filter", "filt", "Filter", "band", "FLT", "Band"],
    "Telescope": ["telescope", "Telescope", "Tel", "tel+inst"],
    "Source": ["source", "Source"],
    "Apparent Magnitude": ["mag", "Magnitude", "Mag", "ab_mag", "PSFmag", "MAG", "omag",
                           "magnitude", "apparent_mag"],
    "Apparent Magnitude Uncertainty": [
        "dmag", "Magnitude_Error", "magerr", "MagErr", "mag_err", "e_mag", "Error", "err",
        "PSFerr", "MAGERR", "e_omag", "e_magnitude", "apparent_mag_err", "Mag_Err", "emag",
        "error",
    ],
    "MJD": ["MJD", "mjd"],
    "JD": ["JD", "jd"],
    "Phase (rest days)": ["phase", "Phase", "PHASE"],
    "Flux $F_ν$ (W m$^{-2}$ Hz$^{-1}$)": ["flux", "FLUXCAL"],
    "Flux Uncertainty": ["dflux", "FLUXCALERR"],
    "Nondetection": ["nondet", "Is_Limit", "UL", "l_omag", "upper_limit", "upperlimit"],
    "Absolute Magnitude": ["absmag"],
    "Luminosity $L_ν$ (W Hz$^{-1}$)": ["lum"],
    "Luminosity Uncertainty": ["dlum"],
    "Effective Wavelength (nm)": ["wl_eff"],
}


class LC(Table):
    """A broadband light curve (reference lightcurve.py:62-688)."""

    def __init__(self, *args, **kwargs):
        Table.__init__(self, *args, **kwargs)
        self.normalize_column_names()
        if "filter" in self.colnames and self["filter"].dtype.kind != "O":
            self.filters_to_objects()
        oldlc = args[0] if args else None
        self.nondetSigmas = getattr(oldlc, "nondetSigmas", 3.0)
        self.groupby = getattr(oldlc, "groupby", {"filter", "source"}).copy()
        self.markers = getattr(oldlc, "markers", markers).copy()
        self.colors = getattr(oldlc, "colors", {}).copy()

    def _copy_attrs(self, new):
        new.nondetSigmas = getattr(self, "nondetSigmas", 3.0)
        new.groupby = getattr(self, "groupby", {"filter", "source"}).copy()
        new.markers = getattr(self, "markers", {}).copy()
        new.colors = getattr(self, "colors", {}).copy()

    # ------------------------------------------------------------- selection
    def where(self, **kwargs):
        """Row selection DSL: ``col=value``, ``col_not=``, ``col_min=``,
        ``col_max=``; values may be lists (reference lightcurve.py:87-134)."""
        use = np.tile(True, len(self))
        for col, val in kwargs.items():
            if col.startswith("filter"):
                if isinstance(val, str):
                    val = filtdict[val]
                elif isinstance(val, list):
                    val = [filtdict[v] if isinstance(v, str) else v for v in val]
            if isinstance(val, list):
                if "_not" in col:
                    use1 = np.tile(True, len(self))
                    for v in val:
                        use1 &= np.asarray(self[col.replace("_not", "")] != v)
                else:
                    use1 = np.tile(False, len(self))
                    for v in val:
                        use1 |= np.asarray(self[col] == v)
            elif "_min" in col:
                use1 = np.asarray(self[col.replace("_min", "")] >= val)
            elif "_max" in col:
                use1 = np.asarray(self[col.replace("_max", "")] <= val)
            elif "_not" in col:
                if val is None:
                    use1 = np.array([v is not None for v in self[col.replace("_not", "")]])
                else:
                    use1 = np.asarray(self[col.replace("_not", "")] != val)
            else:
                if val is None:
                    use1 = np.array([v is None for v in self[col]])
                else:
                    use1 = np.asarray(self[col] == val)
            use &= np.ma.filled(use1, False)
        selected = self[use]
        selected.markers = self.markers
        return selected

    def get(self, key, default=np.ma.masked):
        if key in self.colnames:
            return MaskedColumn(self[key])
        if default is np.ma.masked:
            return MaskedColumn(np.ma.MaskedArray(np.zeros(len(self)), mask=True), name=key)
        return MaskedColumn(np.ma.MaskedArray(np.tile(default, len(self))), name=key)

    # --------------------------------------------------------- normalization
    def normalize_column_names(self):
        """Rename recognized aliases to standard names (reference
        lightcurve.py:144-161); JD -> MJD; parse nondetection strings."""
        for good_key, *bad_keys in column_names.values():
            if good_key not in self.colnames:
                for bad_key in bad_keys:
                    if bad_key in self.colnames:
                        self.rename_column(bad_key, good_key)
                        break
        if "MJD" not in self.colnames and "JD" in self.colnames:
            self["MJD"] = self["JD"] - 2400000.5
            self.remove_column("JD")
        if "nondet" in self.colnames and self["nondet"].dtype.kind != "b":
            col = self["nondet"]
            if isinstance(col, np.ma.MaskedArray):
                col = col.filled("False" if col.dtype.kind in "UO" else 0)
            col = np.asarray(col).astype(str)
            nondet = (col == "True") | (col == "T") | (col == ">")
            self.replace_column("nondet", nondet)

    def filters_to_objects(self):
        """Parse the 'filter' column into Filter objects, including the Swift
        U/B/V disambiguation (reference lightcurve.py:163-180)."""
        filters = np.array([filtdict["0"] if np.ma.is_masked(f) or f is None
                            else filtdict.get(str(f), filtdict["?"])
                            for f in self["filter"]], dtype=object)
        is_swift = np.zeros(len(self), bool)
        if "telescope" in self.colnames:
            tel = np.asarray(self["telescope"]).astype(str)
            for name in ("Swift", "UVOT", "Swift/UVOT", "Swift+UVOT"):
                is_swift |= tel == name
        if "source" in self.colnames:
            is_swift |= np.asarray(self["source"]).astype(str) == "SOUSA"
        if is_swift.any():
            raw = np.asarray(self["filter"]).astype(str)
            for filt, swiftfilt in zip("UBV", "sbv"):
                filters[is_swift & (raw == filt)] = filtdict[swiftfilt]
        self.replace_column("filter", filters)

    # ------------------------------------------------------------ conversions
    @property
    def zp(self):
        return np.array([f.m0 for f in self["filter"]])

    def calcFlux(self, nondetSigmas=None, zp=None):
        if nondetSigmas is not None:
            self.nondetSigmas = nondetSigmas
        if zp is None:
            zp = self.zp
        self["flux"], self["dflux"] = mag2flux(self["mag"], self["dmag"], zp,
                                               self.get("nondet", False), self.nondetSigmas)

    def findNondet(self, nondetSigmas=None):
        if nondetSigmas is not None:
            self.nondetSigmas = nondetSigmas
        self["nondet"] = np.asarray(self["flux"] < self.nondetSigmas * self["dflux"])

    def calcMag(self, nondetSigmas=None, zp=None):
        if nondetSigmas is not None:
            self.nondetSigmas = nondetSigmas
        self.findNondet()
        if zp is None:
            zp = self.zp
        self["mag"], self["dmag"] = flux2mag(self["flux"], self["dflux"], zp,
                                             self.get("nondet", False), self.nondetSigmas)

    def calcAbsMag(self, dm=None, extinction=None, hostext=None, ebv=None, rv=None,
                   host_ebv=None, host_rv=None, redshift=None):
        """Distance and extinction corrections (reference lightcurve.py:271-345):
        distance modulus from Planck18 if only a redshift is known; MW and host
        F99 A_lambda per filter at its effective wavelength."""
        if redshift is not None:
            self.meta["redshift"] = redshift
        elif "redshift" not in self.meta:
            self.meta["redshift"] = 0.0

        if dm is not None:
            self.meta["dm"] = dm
        elif "dm" not in self.meta and self.meta.get("redshift"):
            self.meta["dm"] = Planck18.distmod(self.meta["redshift"]).value
            print("using a redshift-dependent distance modulus")
        elif "dm" not in self.meta:
            self.meta["dm"] = 0.0

        if ebv is None:
            ebv = self.meta.get("ebv")
        if host_ebv is None:
            host_ebv = self.meta.get("host_ebv")
        if rv is None:
            rv = self.meta.get("rv", 3.1)
        if host_rv is None:
            host_rv = self.meta.get("host_rv", 3.1)

        if extinction is not None:
            self.meta["extinction"] = extinction
        elif "extinction" not in self.meta:
            self.meta["extinction"] = {f.name: f.extinction(ebv, rv)
                                       for f in set(self["filter"])
                                       if f.wl_eff is not None and ebv is not None}
        if hostext is not None:
            self.meta["hostext"] = hostext
        elif "hostext" not in self.meta:
            self.meta["hostext"] = {f.name: f.extinction(host_ebv, host_rv, self.meta.get("z", 0.0))
                                    for f in set(self["filter"])
                                    if f.wl_eff is not None and host_ebv is not None}

        self["absmag"] = np.ma.getdata(np.asarray(self["mag"])) - self.meta["dm"]
        for filtobj in set(self["filter"]):
            sel = np.asarray(self["filter"] == filtobj)
            for filt in filtobj.names:
                if filt in self.meta["extinction"]:
                    self["absmag"][sel] -= self.meta["extinction"][filt]
                    break
            else:
                print("MW extinction not applied to filter", filtobj)
            for filt in filtobj.names:
                if filt in self.meta["hostext"]:
                    self["absmag"][sel] -= self.meta["hostext"][filt]
                    break
            else:
                print("host extinction not applied to filter", filtobj)

    def calcLum(self, nondetSigmas=None):
        if nondetSigmas is not None:
            self.nondetSigmas = nondetSigmas
        self["lum"], self["dlum"] = mag2flux(self["absmag"], self["dmag"], self.zp + 90.19,
                                             self.get("nondet", False), self.nondetSigmas)

    # -------------------------------------------------------------- binning
    def bin(self, delta=0.3, groupby=None):
        """Average points within ``delta`` days, grouped by {filter, source}
        (reference lightcurve.py:206-238)."""
        if groupby is not None:
            self.groupby = groupby
        subtabs = []
        self.groupby = list(set(self.groupby) & set(self.colnames))
        if self.groupby:
            grouped = self.group_by(self.groupby)
            pairs = zip(grouped.groups, grouped.groups.keys)
        else:
            pairs = [(self, None)]
        for g, k in pairs:
            mjd, flux, dflux = binflux(g["MJD"], g["flux"], g["dflux"], delta)
            binned = LC([mjd, flux, dflux], names=["MJD", "flux", "dflux"])
            if k is not None:
                for key in self.groupby:
                    binned[key] = k[key]
            subtabs.append(binned)
        lc = vstack(subtabs)
        out = LC(lc) if not isinstance(lc, LC) else lc
        out.meta = self.meta
        return out

    # ------------------------------------------------------------ peak/phase
    def findPeak(self, **criteria):
        if "nondet" in self.colnames:
            criteria["nondet"] = False
        peaktable = self.where(**criteria)
        if len(peaktable):
            imin = np.argmin(peaktable["mag"])
            self.meta["peakdate"] = float(peaktable["MJD"][imin])
            self.meta["peakcriteria"] = criteria
        else:
            print(f"no data match these criteria: {criteria}")

    def calcPhase(self, rdsp=False, hours=False):
        if "refmjd" not in self.meta:
            if rdsp and self.meta.get("peakdate") is None:
                raise Exception("must run lc.findPeak() first")
            elif rdsp:
                self.meta["refmjd"] = self.meta["peakdate"]
            elif self.meta.get("explosion") is not None:
                self.meta["refmjd"] = self.meta["explosion"]
            else:
                detections = self.where(nondet=False) if "nondet" in self.colnames else self
                self.meta["refmjd"] = float(np.min(np.asarray(detections["MJD"])))
        self["phase"] = (np.asarray(self["MJD"], float) - self.meta["refmjd"]) \
            / (1 + self.meta["redshift"])
        for dcol in ["dMJD", "dMJD0", "dMJD1"]:
            if dcol in self.colnames:
                self[dcol.replace("MJD", "phase")] = self[dcol] / (1.0 + self.meta["redshift"])
        if hours:
            self["phase"] = self["phase"] * 24.0
            for dcol in ["dphase0", "dphase1"]:
                if dcol in self.colnames:
                    self[dcol] = self[dcol] * 24.0

    # -------------------------------------------------------------- plotting
    def plot(self, xcol="phase", ycol="absmag", offset_factor=1.0, color="filter",
             marker=None, use_lines=False, normalize=False, fillmark=True, mjd_axis=True,
             appmag_axis=True, loc_mark=None, loc_filt=None, ncol_mark=1, lgd_filters=None,
             tight_layout=True, phase_hours=False, return_axes=False, frameon=True, **kwargs):
        """Multiband light-curve plot with nondetection arrows, per-filter
        colors/offsets, twin MJD/apparent-mag axes, and 'above' legends
        (reference lightcurve.py:419-668)."""
        if xcol.startswith("filter"):
            unit = xcol.split(":")[-1] if ":" in xcol else None
            xcol = "wl_eff"
            self[xcol] = [f.wl_eff.to(unit).value if unit else f.wl_eff.value
                          for f in self["filter"]]
        xchoices = ["phase", "MJD"]
        while xcol not in self.keys():
            xchoices.remove(xcol)
            if xchoices:
                xcol = xchoices[0]
            else:
                raise Exception("no columns found for x-axis")
        ychoices = ["absmag", "mag"]
        while ycol not in self.keys():
            ychoices.remove(ycol)
            if ychoices:
                ycol = ychoices[0]
            else:
                raise Exception("no columns found for y-axis")
        if marker is None:
            if "source" in self.colnames:
                marker = "source"
            elif "telescope" in self.colnames:
                marker = "telescope"
            else:
                marker = "o"
        criteria = {key: val for key, val in kwargs.items() if key in self.colnames}
        plot_kwargs = {key: val for key, val in kwargs.items() if key not in self.colnames}
        plottable = self.where(**criteria)
        if len(plottable) == 0:
            return
        groupby = set()
        if color in plottable.keys():
            groupby.add(color)
        if marker in plottable.keys():
            groupby.add(marker)
        if groupby:
            plottable = plottable.group_by(list(groupby))
            keys = plottable.groups.keys
        else:
            keys = [Table()]
        linestyle = plot_kwargs.pop("linestyle", plot_kwargs.pop(
            "ls", self.meta.get("linestyle", self.meta.get("ls"))))
        linewidth = plot_kwargs.pop("linewidth", plot_kwargs.pop(
            "lw", self.meta.get("linewidth", self.meta.get("lw"))))
        ms = plot_kwargs.pop("markersize", plot_kwargs.pop("ms", plt.rcParams["lines.markersize"]))
        if marker in plottable.keys():
            usedmarkers = [self.markers[g[marker][0]] for g in plottable.groups
                           if g[marker][0] in self.markers]
        else:
            usedmarkers = []
        groups_iter = plottable.groups if groupby else [plottable]
        for g, k in zip(groups_iter, keys):
            filt = g["filter"][0]
            if color == "filter":
                col = filt.color
                mec = filt.mec
            elif color == "name" and "plotcolor" in self.meta:
                col = self.meta["plotcolor"]
                mec = col if col not in ["w", "#FFFFFF"] else "k"
            elif color in self.colnames and g[color][0] in self.colors:
                col = self.colors[g[color][0]]
                mec = col if col not in ["w", "#FFFFFF"] else "k"
            elif is_color_like(color):
                col = color
                mec = col if col not in ["w", "#FFFFFF"] else "k"
            else:
                col = mec = next(itercolors)
            if color in self.colnames:
                self.colors[g[color][0]] = col
            mfc = col if fillmark else "none"
            if marker == "name" and "marker" in self.meta:
                mark = self.meta["marker"]
            elif marker in plottable.keys():
                if g[marker][0] not in self.markers:
                    for nextmarker in othermarkers:
                        if nextmarker not in usedmarkers:
                            self.markers[g[marker][0]] = nextmarker
                            break
                    else:
                        self.markers[g[marker][0]] = next(itermarkers)
                mark = self.markers[g[marker][0]]
            elif marker in MarkerStyle.markers:
                mark = marker
            elif marker == "none":
                mark = None
            else:
                mark = next(itermarkers)
            usedmarkers.append(mark)
            yerr = None
            if use_lines:
                g.sort(xcol)
            elif "mag" in ycol:
                yerr = g["dmag"]
            else:
                yerr = g["d" + ycol]
                if yerr.ndim == 2:
                    yerr = yerr.T
            x = np.ma.filled(np.ma.MaskedArray(g[xcol]), np.nan).astype(float)
            if "d" + xcol in g.colnames:
                xerr = g["d" + xcol]
                if xerr.ndim == 2:
                    xerr = xerr.T
            else:
                xerr = None
            y = np.ma.filled(np.ma.MaskedArray(g[ycol]), np.nan).astype(float) \
                - filt.offset * offset_factor
            if normalize and ycol == "mag":
                if "peakmag" in self.meta:
                    y -= self.meta["peakmag"]
                else:
                    print("must set .meta['peakmag'] to use normalize")
            elif normalize and ycol == "absmag":
                if "peakabsmag" in self.meta:
                    y -= self.meta["peakabsmag"]
                else:
                    print("must set .meta['peakabsmag'] to use normalize")
            nondet = np.asarray(g["nondet"], bool) if "nondet" in g.keys() else None
            if "mag" in ycol and nondet is not None and marker:
                plt.plot(x[nondet], y[nondet], marker=arrow, linestyle="none",
                         ms=ms / 6.0 * 25.0, mec=mec, **plot_kwargs)
            if hasattr(k, "colnames") and "filter" in k.colnames:
                if len(filt.name) >= 4 and not filt.offset:
                    k["filter"] = filt.name
                elif offset_factor:
                    k["filter"] = "${}{:+.0f}$".format(filt.name, -filt.offset * offset_factor)
                else:
                    k["filter"] = "${}$".format(filt.name)
            label = " ".join([str(kv) for kv in (k.values() if hasattr(k, "values") else [])])
            if not use_lines:
                if yerr is not None:
                    yerr = np.ma.filled(np.ma.MaskedArray(yerr), np.nan)
                plt.errorbar(x, y, yerr, xerr=xerr, color=mec, mfc=mfc, mec=mec, ms=ms,
                             marker=mark, linestyle="none", label=label, **plot_kwargs)
            elif "mag" in ycol and nondet is not None:
                plt.plot(x[~nondet], y[~nondet], color=col, mfc=mfc, mec=mec, ms=ms, marker=mark,
                         label=label, linestyle=linestyle, linewidth=linewidth, **plot_kwargs)
                plt.plot(x[nondet], y[nondet], color=mec, mfc=mfc, mec=mec, ms=ms, marker=mark,
                         linestyle="none", **plot_kwargs)
            else:
                plt.plot(x, y, color=col, mfc=mfc, mec=mec, ms=ms, marker=mark, label=label,
                         linestyle=linestyle, linewidth=linewidth, **plot_kwargs)

        ymin, ymax = plt.ylim()
        if "mag" in ycol and ymax > ymin:
            plt.ylim(ymax, ymin)
        lgd_title = None
        for axlabel, keys_ in column_names.items():
            if xcol in keys_:
                if xcol == "phase" and phase_hours:
                    axlabel = axlabel.replace("days", "hours")
                plt.xlabel(axlabel)
            elif ycol in keys_:
                plt.ylabel(axlabel)
            elif marker in keys_:
                lgd_title = axlabel

        mjd_axis = mjd_axis and xcol == "phase" and "redshift" in self.meta and "refmjd" in self.meta
        appmag_axis = appmag_axis and ycol == "absmag" and "dm" in self.meta
        axes = [plt.gca()]
        top = right = None
        if mjd_axis or appmag_axis:
            xfunc = partial(self._phase2mjd, hours=phase_hours)
            top, right = aux_axes(xfunc if mjd_axis else None,
                                  self._abs2app if appmag_axis else None)
            if mjd_axis:
                top.xaxis.get_major_formatter().set_useOffset(False)
                top.set_xlabel("MJD")
                axes.append(top)
            if appmag_axis:
                right.set_ylabel("Apparent Magnitude")
                axes.append(right)

        if loc_mark and axes and marker in self.colnames:
            labels = sorted(set(np.asarray(self[marker]).astype(str)), key=lambda s: s.lower())
            lines = []
            for label in labels:
                if marker == color:
                    mec = mfc = self.colors[label]
                else:
                    mec = "k"
                    mfc = "none"
                line = plt.Line2D([], [], mec=mec, mfc=mfc, ms=ms,
                                  marker=self.markers.get(label, "o"), linestyle="none")
                lines.append(line)
            custom_legend(axes.pop(), lines, labels, ncol=ncol_mark, loc=loc_mark,
                          title=lgd_title, frameon=frameon)
        elif loc_mark and not axes:
            print("cannot create marker legend: not enough axes")
        elif loc_mark and marker not in self.colnames:
            print(f'cannot create marker legend: column "{marker}" does not exist')

        if loc_filt and axes and color == "filter":
            if lgd_filters is None:
                lgd_filters = set(self["filter"])
            lines, labels, ncol = filter_legend(lgd_filters, offset_factor)
            custom_legend(axes.pop(), lines, labels, loc=loc_filt, ncol=ncol,
                          title="Filter", frameon=frameon)
        elif loc_filt and not axes:
            print("cannot create filter legend: not enough axes")

        if tight_layout:
            plt.tight_layout()
        if return_axes and (mjd_axis or appmag_axis):
            return top, right

    def _phase2mjd(self, phase, hours=False):
        return phase * (1.0 + self.meta["redshift"]) / (24.0 if hours else 1.0) + self.meta["refmjd"]

    def _abs2app(self, absmag):
        return absmag + self.meta["dm"]

    # --------------------------------------------------------------------- IO
    @classmethod
    def read(cls, filepath, format="ascii", fill_values=None, **kwargs):
        if fill_values is None:
            fill_values = [("--", "0"), ("", "0")]
        return super(LC, cls).read(filepath, format=format, fill_values=fill_values, **kwargs)

    def write(self, *args, **kwargs):
        out = Table(self)
        if "filter" in out.colnames:
            out.replace_column("filter", np.array([str(f) for f in self["filter"]]))
        out.write(*args, **kwargs)


def aux_axes(xfunc=None, yfunc=None, ax0=None, xfunc_args=None, yfunc_args=None):
    """Twin axes that are transformations of the existing axes (reference
    lightcurve.py:691-735)."""
    if xfunc_args is None:
        xfunc_args = {}
    if yfunc_args is None:
        yfunc_args = {}
    if not ax0:
        ax0 = plt.gca()
    lims = np.array(ax0.axis())
    if xfunc is not None:
        ax0.xaxis.tick_bottom()
        lims[:2] = xfunc(lims[:2], **xfunc_args)
        top = ax0.twiny()
        top.axis(lims)
    else:
        top = ax0
    if yfunc is not None:
        ax0.yaxis.tick_left()
        lims[2:] = yfunc(lims[2:], **yfunc_args)
        right = top.twinx()
        right.axis(lims)
    else:
        right = None
    plt.sca(ax0)
    return top, right


def custom_legend(ax, handles, labels, top_axis=True, **kwargs):
    """Legend supporting loc='above'/'above left'/'above right'
    (reference lightcurve.py:738-783)."""
    loc = kwargs.pop("loc", None)
    bbox_to_anchor = kwargs.pop("bbox_to_anchor", None)
    top_of_axis = 1.15 if top_axis else 1.0
    if loc is None or loc.lower() == "none":
        return
    elif loc == "above":
        loc = "lower center"
        bbox_to_anchor = (0.5, top_of_axis)
    elif loc == "above left":
        loc = "lower left"
        bbox_to_anchor = (0.0, top_of_axis)
    elif loc == "above right":
        loc = "lower right"
        bbox_to_anchor = (1.0, top_of_axis)
    if "ncol" in kwargs and len(handles) % kwargs["ncol"]:
        i = len(handles) // kwargs["ncol"]
        handles.insert(i, plt.Line2D([], [], ls="none"))
        labels.insert(i, "")
    lgd = ax.legend(handles, labels, loc=loc, bbox_to_anchor=bbox_to_anchor, **kwargs)
    plt.tight_layout()
    return lgd


def filter_legend(filts, offset_factor=1.0):
    """Dummy artists + labels for the filter legend (reference
    lightcurve.py:786-828)."""
    lines = []
    labels = []
    if isinstance(filts, set):
        filts = filtsetup(filts)
    elif isinstance(filts[0], str) or (isinstance(filts[0], list) and isinstance(filts[0][0], str)):
        filts = np.vectorize(filtdict.get)(filts)
    filts = np.asarray(filts, dtype=object)
    for filt in filts.flatten():
        if filt is None:
            labels.append("")
            lines.append(Patch(color="none", ec="none"))
        else:
            col = filt.color
            ec = filt.mec
            off = filt.offset * offset_factor
            if not filt.italics:
                labels.append(filt.name)
            elif offset_factor:
                labels.append("${}{:+g}$".format(filt.name, -off))
            else:
                labels.append("${}$".format(filt.name))
            lines.append(Patch(fc=col, ec=ec))
    return lines, labels, filts.shape[0]


def filtsetup(filts):
    """Arrange filters in a legend grid by system (columns) and offset (rows)
    (reference lightcurve.py:831-875)."""
    sysrows = dict()
    for filt in filts:
        if filt.system in sysrows:
            sysrows[filt.system].add(filt.offset)
        else:
            sysrows[filt.system] = {filt.offset}
    syscols = dict()
    rowcols = []
    for sys in list(sysrows.keys()):
        for i, rows in enumerate(rowcols):
            if not rows & sysrows[sys]:
                syscols[sys] = i
                rows |= sysrows[sys]
                break
        else:
            syscols[sys] = len(rowcols)
            rowcols.append(sysrows[sys])
    offs = sorted({filt.offset for filt in filts}, reverse=True)
    lgnd = np.tile(None, (len(rowcols), len(offs)))
    for filt in filts:
        if lgnd[syscols[filt.system], offs.index(filt.offset)] is None:
            lgnd[syscols[filt.system], offs.index(filt.offset)] = filt
        else:
            offind = offs.index(filt.offset) + 1
            offs.insert(offind, filt.offset)
            newrow = np.tile(None, lgnd.shape[0])
            newrow[syscols[filt.system]] = filt
            lgnd = np.insert(lgnd, offind, newrow, 1)
    while lgnd[0, 0] is None:
        lgnd = np.roll(lgnd, 1, axis=0)
    return lgnd


def flux2mag(flux, dflux=np.array(np.nan), zp=0.0, nondet=None, nondetSigmas=3.0):
    """Flux -> magnitude; nondetections become limiting magnitudes
    (reference lightcurve.py:878-909)."""
    flux = np.ma.MaskedArray(flux).astype(float).copy() if np.ndim(flux) else np.float64(flux)
    dflux = np.ma.MaskedArray(dflux).astype(float).copy() if np.ndim(dflux) else np.float64(dflux)
    if nondet is not None and np.ndim(flux):
        nd = np.ma.filled(np.ma.MaskedArray(nondet), False).astype(bool)
        flux[nd] = nondetSigmas * dflux[nd]
        dflux[nd] = np.nan
    fdata = np.ma.filled(np.ma.MaskedArray(flux), np.nan)
    with np.errstate(divide="ignore", invalid="ignore"):
        mag = np.where(fdata > 0.0, -2.5 * np.log10(np.where(fdata > 0, fdata, 1.0)), -np.inf) + zp
        dmag = 2.5 * np.asarray(dflux) / (fdata * np.log(10))
    return mag, dmag


def mag2flux(mag, dmag=np.nan, zp=0.0, nondet=None, nondetSigmas=3.0):
    """Magnitude -> flux; nondetections imply zero flux with dflux = flux/Nsigma
    (reference lightcurve.py:912-941)."""
    mag_arr = np.ma.filled(np.ma.MaskedArray(mag).astype(float), np.nan)
    dmag_arr = np.ma.filled(np.ma.MaskedArray(dmag).astype(float), np.nan)
    flux = 10 ** ((np.asarray(zp) - mag_arr) / 2.5)
    dflux = np.log(10) / 2.5 * flux * dmag_arr
    if nondet is not None:
        nd = np.ma.filled(np.ma.MaskedArray(nondet), False).astype(bool)
        if np.ndim(flux):
            dflux[nd] = flux[nd] / nondetSigmas
            flux[nd] = 0
    return flux, dflux


def binflux(time, flux, dflux, delta=0.2, include_zero=True):
    """Greedy inverse-variance binning (reference lightcurve.py:944-1000),
    including the zero/masked error-bar handling at lines 972-988.

    Dispatches to the native C++ kernel (utils/native) when available; the
    numpy loop below is the reference fallback and the semantic spec."""
    time = np.ma.MaskedArray(time).astype(float)
    flux = np.ma.MaskedArray(flux).astype(float)
    dflux = np.ma.MaskedArray(dflux).astype(float)

    if not (np.ma.getmaskarray(time).any() or np.ma.getmaskarray(flux).any()):
        from .utils import native
        d = np.ma.filled(dflux, np.nan)
        bad = ((d == 0) | (d == 999) | (d == 9999) | (d == -1) | np.isnan(d)
               | np.ma.getmaskarray(dflux))
        result = native.binflux_native(np.ma.getdata(time), np.ma.getdata(flux),
                                       np.where(bad, 1.0, d), bad, delta, include_zero)
        if result is not None:
            return result
    bin_time = []
    bin_flux = []
    bin_dflux = []
    while len(flux) > 0:
        grp = np.asarray(abs(time - time[0]) <= delta)
        time_grp = time[grp]
        flux_grp = flux[grp]
        dflux_grp = dflux[grp]

        zeros = ((dflux_grp == 0) | (dflux_grp == 999) | (dflux_grp == 9999)
                 | (dflux_grp == -1) | np.isnan(np.ma.filled(dflux_grp, np.nan)))
        zeros = np.ma.filled(zeros, True) | np.ma.getmaskarray(dflux_grp)

        if zeros.any() and include_zero:
            x = np.mean(time_grp)
            y = np.mean(flux_grp)
            z = 0.0
        else:
            time_grp = time_grp[~zeros]
            flux_grp = flux_grp[~zeros]
            dflux_grp = dflux_grp[~zeros]
            x = np.mean(time_grp)
            y = np.sum(flux_grp * dflux_grp ** -2) / np.sum(dflux_grp ** -2)
            z = np.sum(dflux_grp ** -2) ** -0.5
        bin_time.append(x)
        bin_flux.append(y)
        bin_dflux.append(z)
        time = time[~grp]
        flux = flux[~grp]
        dflux = dflux[~grp]
    return np.array(bin_time), np.array(bin_flux), np.array(bin_dflux)
