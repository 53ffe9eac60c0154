#!/usr/bin/env python
"""Spectral calibration: read spectra (FITS/ASCII/OSC-JSON), identify their
observation dates/instruments heuristically, and calibrate them to broadband
photometry. Host-only I/O module; API parity with the reference
``lightcurve_fitting/speccal.py`` using the framework's own FITS/Time utilities
(astropy is not a dependency).
"""

import argparse
import json
import os
import re
import shutil

import numpy as np
import matplotlib.pyplot as plt

from .lightcurve import LC
from .utils import fits as ufits
from .utils.timeutil import Time
from .utils.table import Table
from .core.constants import C_AA_THZ

__all__ = ["readfitsspec", "convert_spectrum_units", "readOSCspec", "readspec",
           "calibrate_spectra", "create_wiserep_tsv"]

C_M_S = 2.99792458e8


def removebadcards(hdr):
    """Compatibility shim (reference speccal.py:19-32): our FITS reader is
    lenient by construction, so malformed cards are already skipped."""
    return hdr


def remove_duplicate_wcs(hdr, keep_number=0):
    """Compatibility shim (reference speccal.py:35-43): our header is a dict,
    so duplicate keywords collapse to the last occurrence on read."""
    return hdr


def readfitsspec(filename, header=False, ext=None):
    """Read a 1-D spectrum from a FITS file (reference speccal.py:46-102):
    prefer a SCI extension, else the first HDU with data; binary tables use
    their 'wavelength'/'flux' columns; images use the linear wavelength WCS."""
    hdulist = ufits.open(filename)
    hdu = None
    if ext is None:
        for h in hdulist:  # try to find SCI extension
            if str(h.header.get("EXTNAME", "")).strip() == "SCI":
                hdu = h
                break
        else:
            for h in hdulist:
                if h.data is not None:
                    hdu = h
                    break
            else:
                raise Exception("no extensions have any data")
    else:
        if isinstance(ext, str):
            hdu = next(h for h in hdulist
                       if str(h.header.get("EXTNAME", "")).strip() == ext)
        else:
            hdu = hdulist[ext]
    data = hdu.data
    hdr = hdu.header
    if hdu.is_table:
        wl = data["wavelength"]
        flux = data["flux"]
    else:
        arr = np.asarray(data)
        arr = np.moveaxis(arr, np.arange(arr.ndim), np.argsort(arr.shape))
        flux = arr.flatten()[: max(arr.shape)]
        wl = ufits.linear_wavelength(hdr, len(flux))
    if header:
        return wl, flux, hdr
    return wl, flux


_FLAM = "erg / (Angstrom cm2 s)"


def _parse_flux_unit(bunit):
    """Scale factor and kind ('flam'|'fnu') for a flux-unit string."""
    s = str(bunit).strip()
    m = re.match(r"^\s*(10[*^]?\(?-?\d+\)?|1e-?\d+|\d+(\.\d+)?[eE]-?\d+)\s*(.*)$", s)
    scale = 1.0
    if m and m.group(3):
        token = m.group(1).replace("10**", "1e").replace("10^", "1e").replace(
            "10*", "1e").replace("(", "").replace(")", "")
        try:
            scale = float(token)
            s = m.group(3)
        except ValueError:
            pass
    low = s.lower().replace("**", "").replace("^", "").replace(" ", "")
    if "jy" in low:
        factor = 1e-26 if low.startswith("jy") else 1e-29  # Jy or mJy in W/m2/Hz
        return scale * factor * 1e3 * 1e-10 * 0 + scale * factor, "fnu"
    if "hz" in low:
        # W m-2 Hz-1 (or erg s-1 cm-2 Hz-1)
        factor = 1e-3 if "erg" in low else 1.0  # erg/s/cm2/Hz = 1e-3 W/m2/Hz
        return scale * factor, "fnu"
    # default: erg s-1 cm-2 A-1 family
    return scale, "flam"


def convert_spectrum_units(wl, flux, hdr, default_bunit="erg / (Angstrom cm2 s)",
                           default_cunit="Angstrom"):
    """Convert a spectrum to angstroms and erg/(s cm2 angstrom) using BUNIT and
    CUNIT1/XUNITS when present (reference speccal.py:105-143)."""
    bunit = hdr.get("BUNIT", default_bunit) if hasattr(hdr, "get") else default_bunit
    if bunit in (None, "", "adu", "ADU", "counts", "Counts", "DN"):
        bunit = default_bunit
    cunit = hdr.get("CUNIT1", hdr.get("XUNITS", default_cunit)) if hasattr(hdr, "get") \
        else default_cunit
    if cunit is None:
        cunit = default_cunit
    cunit = str(cunit).strip().rstrip("s").lower() or "angstrom"
    wl = np.asarray(wl, float)
    wl_aa = {"angstrom": 1.0, "a": 1.0, "aa": 1.0, "nm": 10.0, "um": 1e4,
             "micron": 1e4, "micrometer": 1e4, "m": 1e10, "pixel": 1.0,
             "deg": 1.0}.get(cunit, 1.0) * wl

    scale, kind = _parse_flux_unit(bunit)
    flux = np.asarray(flux, float) * scale
    if kind == "fnu":
        # F_lambda = F_nu * c / lambda^2 ; c in angstrom/s = 2.998e18
        flux = flux * (C_M_S * 1e10) / wl_aa ** 2  # W/m2/Hz -> W/m2/A
        flux = flux * 1e7 / 1e4                     # W/m2/A -> erg/s/cm2/A
    return wl_aa, flux


def readOSCspec(filepath):
    """Read spectra from an Open-Astronomy-Catalog JSON file (reference
    speccal.py:146-194)."""
    with open(filepath) as f:
        json_dict = json.load(f)
    rows = json_dict[os.path.splitext(os.path.basename(filepath))[0]]
    if "spectra" in rows:
        rows = rows["spectra"]
    else:
        return [], [], [], [], [], [], []
    keys = set()
    for d in rows:
        keys.update(d.keys())
    superdict = {key: [d.get(key, "0") for d in rows] for key in keys}
    times = [Time(float(t), format=un.lower())
             for t, un in zip(superdict["time"], superdict["u_time"])]
    wl = [0.1 * np.array(d, dtype=float)[:, 0] for d in superdict["data"]]
    fx = [np.array(d, dtype=float)[:, 1] for d in superdict["data"]]
    tel = superdict.get("telescope", [""] * len(rows))
    inst = superdict.get("instrument", [""] * len(rows))
    return superdict["filename"], times, tel, inst, wl, fx, np.ones(len(rows))


_DATE_KEYWORDS = ["MJD-OBS", "MJD_OBS", "MJD", "JD", "DATE-AVG", "UTMIDDLE", "DATE-OBS",
                  "DATE_BEG", "UTSHUT", "OBS_DATE", "AVE_MJD"]


def readspec(f, verbose=False, return_header=False):
    """Read a spectrum and identify when/where it was observed (reference
    speccal.py:197-327): header keywords first, then filename patterns."""
    ext = os.path.splitext(f)[1]
    if ext == ".fits":
        x, y, hdr = readfitsspec(f, header=True)
    elif ext == ".json":
        x, y, hdr = readOSCspec(f)
    else:  # assume ASCII
        t = Table.read(f, format="ascii")
        x = np.asarray(t[t.colnames[0]], float)
        y = np.asarray(t[t.colnames[1]], float)
        hdr = {}
        comments = t.meta.get("comments", [])
        for line in comments:
            match = re.search("([^ ]*) *[=:] *([^/]*)", line)
            if match is None:
                continue
            kwd, val = match.groups()
            hdr[kwd.strip(" #")] = val.strip(" \"'")

    date = None
    for kwd in _DATE_KEYWORDS:
        if kwd in hdr and hdr[kwd]:
            val = hdr[kwd]
            try:
                if "MJD" in kwd:
                    date = Time(float(val), format="mjd")
                elif "JD" in kwd and float(hdr["JD"]) > 2400000:
                    date = Time(float(val), format="jd")
                elif "JD" in kwd:
                    date = Time(float(val) + 2400000, format="jd")
                elif "T" in str(val):
                    date = Time(val)
                elif kwd == "OBS_DATE":
                    date = Time(str(val).split("+")[0])
                elif "-" in str(val):
                    for kwd2 in ["UTMIDDLE", "EXPSTART", "UT"]:
                        v2 = hdr.get(kwd2) if hasattr(hdr, "get") else None
                        if isinstance(v2, str) and ":" in v2:
                            date = Time(str(val) + "T" + v2)
                            break
                        elif v2 is not None:
                            h = int(np.floor(float(v2)))
                            m = int(np.floor((float(v2) * 60) % 60))
                            s = int(np.floor((float(v2) * 3600) % 60))
                            date = Time(str(val) + "T{:02d}:{:02d}:{:02d}".format(h, m, s))
                            break
                    else:
                        date = Time(str(val))
                else:
                    continue
                break
            except (ValueError, TypeError):
                continue
    if date is None:  # hope it's in the filename (reference speccal.py:272-299)
        m1 = re.search(r"24[0-9][0-9][0-9][0-9][0-9]\.[0-9]+", f)
        m_tns = re.search(
            r"(19|20)[0-9][0-9]-(0[0-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])_([01][0-9]|2[0-4])-[0-5][0-9]-[0-5][0-9]",
            f)
        m2 = re.search(r"([12][90][0-9][0-9])-?(0[0-9]|1[0-2])-?(0[1-9]|[12][0-9]|3[01])(\.[0-9]+)?", f)
        m3 = re.search(r"[0-9][0-9][0-9]d", f)
        m4 = re.search(r"[0-9][0-9][0-9][0-9][0-9](\.[0-9]+)?", f)
        if m1 is not None:
            date = Time(float(m1.group()), format="jd")
        elif m_tns is not None:
            d, t_ = m_tns.group().split("_")
            date = Time(d + "T" + t_.replace("-", ":"))
        elif m2 is not None:
            groups = m2.groups()
            date = Time("-".join(groups[:3]))
            if groups[3] is not None:
                date = date + float(groups[-1])
        elif m3 is not None:
            date = Time(float(m3.group()[:-1]), format="mjd")
        elif m4 is not None:
            date = Time(float(m4.group()), format="mjd")

    def _hdr_str(*keys):
        for k in keys:
            v = hdr.get(k) if hasattr(hdr, "get") else None
            if v:
                return str(v).strip()
        return ""

    telescope = _hdr_str("TELESCOP", "TELESCOPE", "OBSERVAT")
    instrument = _hdr_str("INSTRUME", "INSTRUMENT", "INSTR", "INSTRUMENT_ID")

    x, y = convert_spectrum_units(x, y, hdr)

    if verbose:
        print(date.isot if date else "????", f)
    if return_header:
        return x, y, date, telescope, instrument, hdr
    return x, y, date, telescope, instrument


def calibrate_spectra(spectra, lc, filters=None, order=0, subtract_percentile=None,
                      max_extrapolate=1.0, show=False):
    """Calibrate spectra to an observed light curve; write ``photcal_*.txt``
    files (reference speccal.py:330-439)."""
    if filters is not None:
        lc = lc.where(filter=filters)
    lc.calcFlux()
    lc.sort("MJD")
    filts = set(lc["filter"])

    trans_sorted = {}
    for filt in filts:
        trans = filt.trans
        freq = np.asarray(trans["freq"], float)
        tnorm = np.asarray(trans["T_norm_per_freq"], float)
        order_idx = np.argsort(freq)
        trans_sorted[filt] = (freq[order_idx], tnorm[order_idx])

    if show:
        plt.ion()
    fig = plt.figure(figsize=(8.0, 6.0))

    for spec in spectra:
        wl, flux, time, _, _ = readspec(spec)
        mjd = time.mjd
        if show:
            fig.clf()
            ax1 = plt.subplot(211)
            lc.plot(xcol="MJD", ycol="flux", offset_factor=0)
            ax1.axvline(mjd)
            ax1.set_xlabel("MJD")
            ax1.set_ylabel("$F_\\nu$ (W Hz$^{-1}$)")
            ax2 = plt.subplot(212)
        good = ~np.isnan(flux)
        lam = wl[good]                       # angstrom
        Flam = flux[good]                    # erg / (s cm2 angstrom)
        nu = C_AA_THZ / lam                  # THz
        # F_nu = F_lambda * lambda^2 / c, converted to W / (Hz m2)
        Fnu = (Flam * 1e-7 * 1e4) * lam / (nu * 1e12)  # W/m2/A * A / Hz
        Fnu = Fnu[::-1]
        nu = nu[::-1]
        if subtract_percentile is not None:
            Fnu = Fnu - np.nanpercentile(Fnu, subtract_percentile)
        freqs = []
        ratios = []
        for filt in filts:
            freq0 = filt.freq_eff.value - filt.freq_range[0]
            freq1 = filt.freq_range[1] + filt.freq_eff.value
            if freq1 < np.min(nu) or freq0 > np.max(nu):
                print(filt, "and spectrum don't overlap")
                continue
            criteria = {"nondet": False} if "nondet" in lc.colnames else {}
            lc_filt = lc.where(filter=filt, **criteria)
            if (len(lc_filt) == 0
                    or mjd - np.max(np.asarray(lc_filt["MJD"], float)) > max_extrapolate
                    or mjd < np.min(np.asarray(lc_filt["MJD"], float))):
                print(filt, "not observed before and after spectrum")
                continue
            flux_lc = np.interp(mjd, np.asarray(lc_filt["MJD"], float),
                                np.asarray(lc_filt["flux"], float))
            tf, tn = trans_sorted[filt]
            trans_interp = np.interp(nu, tf, tn)
            flux_spec = np.trapezoid(Fnu * trans_interp, nu) / np.trapezoid(trans_interp, nu)
            ratio = flux_lc / flux_spec
            if show:
                ax2.axvspan(freq0, freq1, color=filt.color, alpha=0.2)
                ax2.plot(filt.freq_eff.value, flux_lc, marker="o", zorder=5, **filt.plotstyle)
            ratios.append(ratio)
            freqs.append(filt.freq_eff.value)
        if not ratios:
            print("no filters for", spec)
            if show:
                plt.close(fig)
            continue
        scale = np.mean(ratios)
        if order:
            p = np.polyfit(freqs, np.array(ratios) / scale, order)
            corr = np.polyval(p, nu) * scale
            print(spec, scale, p[:-1])
        else:
            corr = np.array([scale])
            print(spec, scale)
        if show:
            ax2.plot(nu, Fnu * scale, label="rescaled")
            ax2.set_xlabel("Frequency (THz)")
            ax2.set_ylabel("$F_\\nu$ (W Hz$^{-1}$)")
            if order:
                ax2.plot(nu, Fnu * corr, color="C2", label="rescaled & warped")
                plt.legend(loc="best")
            plt.pause(0.1)
            ans = input("accept this scale? [Y/n] ")
        if not show or ans.lower() != "n":
            data_out = np.array([wl[good], flux[good] * corr[::-1]]).T
            path_in, filename_in = os.path.split(spec)
            filename_out = os.path.join(path_in, "photcal_" + filename_in).replace(".fits", ".txt")
            np.savetxt(filename_out, data_out, fmt="%.1f %.2e")
            print(filename_out)
    if show:
        return fig
    plt.close(fig)


_WISEREP_COLUMNS = [
    "Ascii-filename*", "FITS-filename*", "Obs-date* [YYYY-MM-DD HH:MM:SS] / JD",
    "Instrument-Id*", "Exp-time (sec)", "WL Units-id", "WL Medium-Id",
    "Flux Unit Coeff", "Flux Units-Id", "Flux Calib. By-Id",
    "Extinction-Corrected-Id", "Observer/s      ", "Reducer/s   ",
    "Reduction-date [YYYY-MM-DD HH:MM:SS] / JD", "Aperture (Slit)", "Dichroic",
    "Grism", "Grating", "Blaze", "Airmass", "Hour Angle", "Spec Type-Id",
    "Spec Quality-Id", "Spec. Prop-period value", "Prop-period units",
    "Assoc. Groups", "Spec-Remarks", "Publish (bibcode)", "Contrib",
    "Related-file1", "RF1 Comments", "Related-file2", "RF2 Comments",
]

_WISEREP_DEFAULTS_LINE = ("\t\t\t\tNULL\t[default=11 (Angstrom)]\t[default=1 (Air)]\t[default=1.0]"
                          "\t[default=6]\tNULL\tNULL\t[Unknown]\tNULL\tNULL\tNULL\tNULL\tNULL\tNULL"
                          "\tNULL\tNULL\tNULL\t[default=10=Object]\tNULL\tNULL\t[days/months/years]"
                          "\t[Comma delim.]\tNULL\tNULL\tNULL\tNULL\tNULL\tNULL\tNULL")


def create_wiserep_tsv(specpaths, wiserep_dir, verbose=False, instruments=None, date_fmt="iso"):
    """Prepare a WISeREP upload TSV and collect/convert the spectrum files
    (reference speccal.py:442-590)."""
    if os.path.exists(wiserep_dir):
        ans = input(f"Are you sure you want to delete the directory {wiserep_dir}? [y/N] ")
        if ans.lower() != "y":
            return
        shutil.rmtree(wiserep_dir)
    os.mkdir(wiserep_dir)

    bibcode = input("bibcode: ")
    rows = []
    if instruments is None:
        instruments = {}
    for specpath in specpaths:
        if isinstance(specpath, tuple):
            specpath, quality = specpath
            quality = min(max(round(quality), 1), 3)
        else:
            quality = 2
        specfile = os.path.split(specpath)[-1]
        ascii_file = specfile.replace(".fits", ".txt").replace(".csv", ".txt")
        print()
        wl, flux, date, tel, inst, hdr = readspec(specpath, verbose=True, return_header=True)
        groups = input("https://www.wiserep.org/groups\ngroup IDs (comma sep.): ")
        if inst not in instruments:
            inst_id = input(f"https://www.wiserep.org/aux\nlook up instrument ID for {inst} (required): ")
            if inst and inst_id:
                instruments[inst] = int(inst_id)
        else:
            inst_id = instruments[inst]

        def hget(key, cast=None):
            v = hdr.get(key) if hasattr(hdr, "get") else None
            if v is None or v == "":
                return None
            return cast(v) if cast else v

        if date is not None:
            date_str = date.iso if date_fmt == "iso" else f"{date.jd:.5f}"
        else:
            date_str = None
        row = [ascii_file,
               specfile if specfile.endswith(".fits") else None,
               date_str,
               inst_id,
               hget("exptime") or hget("EXPTIME"),
               {"angstrom": 11, "nm": 12, "um": 13}.get(
                   str(hdr.get("CUNIT1", hdr.get("XUNITS", "angstrom"))
                       if hasattr(hdr, "get") else "angstrom").lower(), 11),
               1, 1.0, 6,
               2 if specfile.startswith("photcal") else 1,
               0,
               hget("OBSERVER") or "Unknown",
               hget("REDUCER"),
               None,
               hget("APERWID", float),
               hget("DICHROIC"),
               hget("GRISM"),
               hget("GRATING"),
               hget("BLAZE", float),
               hget("AIRMASS", float),
               hget("HA") or None,
               10, quality, 0.0, "days", groups, None,
               bibcode or None, None, None, None, None, None]
        rows.append(row)

        if not specfile.endswith(".csv"):
            shutil.copy(specpath, wiserep_dir)
            if verbose:
                print(f"copied {specfile} to {wiserep_dir}")
        if specfile.endswith(".fits") or specfile.endswith(".csv"):
            data_out = np.transpose([wl, flux])
            np.savetxt(os.path.join(wiserep_dir, ascii_file), data_out, fmt=("%f", "%e"),
                       header=repr(hdr))
            if verbose:
                print(f"wrote {wiserep_dir}/{ascii_file}")

    def fmt(v):
        if v is None or v == "" or v == "None" or v == "UNKNOWN":
            return "NULL"
        return str(v)

    lines = ["TSV-type:\tspectra",
             "\t".join(_WISEREP_COLUMNS),
             _WISEREP_DEFAULTS_LINE]
    for row in rows:
        lines.append("\t".join(fmt(v) for v in row))
    with open(wiserep_dir + ".tsv", "w") as f:
        f.write("\n".join(lines) + "\n")
    if verbose:
        print(f"\nwrote {wiserep_dir}.tsv")

    t = Table(rows=rows, names=_WISEREP_COLUMNS) if rows else None
    return t


def main(argv=None):
    parser = argparse.ArgumentParser(description="Calibrate spectra to photometry.")
    parser.add_argument("spectra", nargs="+", help="filenames of spectra")
    parser.add_argument("--lc", help='filename of photometry table (must have columns "MJD", '
                                     '"filter", "mag"/"flux", and "dmag"/"dflux")')
    parser.add_argument("--lc-format", default="ascii",
                        help="format of photometry table")
    parser.add_argument("-f", "--filters", nargs="+", help="filters to use for calibration")
    parser.add_argument("-o", "--order", type=int, default=0,
                        help="polynomial order of correction function")
    parser.add_argument("--subtract-percentile", type=float,
                        help="subtract continuum from spectrum before correcting")
    parser.add_argument("--max-extrapolate", type=float, default=1.0,
                        help="assume constant flux in a filter for this many days after the "
                             "last observed point")
    parser.add_argument("--show", action="store_true")
    args = parser.parse_args(argv)

    lc = LC.read(args.lc, format=args.lc_format)
    calibrate_spectra(args.spectra, lc, args.filters, args.order, args.subtract_percentile,
                      args.max_extrapolate, args.show)


if __name__ == "__main__":
    main()
