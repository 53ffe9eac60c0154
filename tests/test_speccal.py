"""Spectral calibration: FITS/ASCII reading, unit conversion, date heuristics,
and photometric calibration round trip on synthetic data."""

import os

import matplotlib
matplotlib.use("Agg")
import numpy as np
import pytest

from lightcurve_fitting_tpu import speccal
from lightcurve_fitting_tpu.utils.timeutil import Time
from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.filters import filtdict
from lightcurve_fitting_tpu.models import planck_fast
from lightcurve_fitting_tpu.core.constants import C_AA_THZ


def _write_fits_spectrum(path, wl0, dwl, flux, extra_cards=()):
    """Hand-roll a minimal FITS file: primary HDU with a linear wavelength WCS."""
    flux = np.asarray(flux, ">f4")
    cards = [
        ("SIMPLE", "T"), ("BITPIX", "-32"), ("NAXIS", "1"),
        ("NAXIS1", str(len(flux))),
        ("CRVAL1", repr(float(wl0))), ("CRPIX1", "1.0"), ("CDELT1", repr(float(dwl))),
        ("CUNIT1", "'Angstrom'"), ("BUNIT", "'erg/cm2/s/A'"),
        ("TELESCOP", "'FLWO'"), ("INSTRUME", "'FAST'"),
        ("MJD-OBS", "57475.25"),
    ] + list(extra_cards)
    header = b""
    for k, v in cards:
        card = f"{k:<8}= {v:>20} /".ljust(80)
        header += card.encode()
    header += b"END".ljust(80)
    header += b" " * (2880 - len(header) % 2880 if len(header) % 2880 else 0)
    data = flux.tobytes()
    data += b"\0" * (2880 - len(data) % 2880 if len(data) % 2880 else 0)
    with open(path, "wb") as f:
        f.write(header + data)


def test_time_roundtrip():
    t = Time(57475.25, format="mjd")
    assert t.mjd == 57475.25
    assert t.jd == pytest.approx(2457475.75)
    t2 = Time("2016-03-28T06:00:00")
    assert t2.mjd == pytest.approx(57475.25)
    assert Time(t2.jd, format="jd").mjd == pytest.approx(57475.25)
    assert (t2 + 1.5).mjd == pytest.approx(57476.75)


def test_readspec_fits(tmp_path):
    wl = 3500.0 + 2.0 * np.arange(2000)
    flam = 1e-15 * np.exp(-0.5 * ((wl - 5000) / 800.0) ** 2)
    path = str(tmp_path / "spec_fast.fits")
    _write_fits_spectrum(path, 3500.0, 2.0, flam)
    x, y, date, tel, inst = speccal.readspec(path)
    np.testing.assert_allclose(x, wl)
    np.testing.assert_allclose(y, flam, rtol=1e-6)
    assert date.mjd == pytest.approx(57475.25)
    assert tel == "FLWO" and inst == "FAST"


def test_readspec_ascii_date_from_filename(tmp_path):
    wl = np.linspace(4000, 7000, 500)
    flam = np.full(500, 2e-15)
    path = str(tmp_path / "sn2016bkv_57480.txt")
    np.savetxt(path, np.array([wl, flam]).T)
    x, y, date, tel, inst = speccal.readspec(path)
    assert date.mjd == pytest.approx(57480.0)
    np.testing.assert_allclose(y, flam)


def test_readspec_ascii_header_comments(tmp_path):
    wl = np.linspace(4000, 7000, 100)
    path = str(tmp_path / "someusefulspectrum.dat")
    with open(path, "w") as f:
        f.write("# MJD-OBS = 57481.5\n# TELESCOP = Keck\n")
        for w in wl:
            f.write(f"{w} 1.5e-15\n")
    x, y, date, tel, inst = speccal.readspec(path)
    assert date.mjd == pytest.approx(57481.5)
    assert tel == "Keck"


def test_convert_units_fnu():
    wl = np.array([5000.0])
    fnu_si = np.array([1e-26])  # W/m2/Hz = 1e3 erg/s/cm2/Hz
    wl2, flam = speccal.convert_spectrum_units(wl, fnu_si, {"BUNIT": "W / (m2 Hz)"})
    expected = 1e-26 * 2.99792458e18 / 5000.0 ** 2 * 1e3  # erg/s/cm2/A
    assert flam[0] == pytest.approx(expected, rel=1e-6)


def test_calibrate_spectra_roundtrip(tmp_path):
    """A blackbody spectrum deliberately mis-scaled by 2.5x must come back with
    scale ~2.5 and a photcal file matching the photometry."""
    T_true, R_true = 9.0, 10.0
    dm = 30.0
    filters = [filtdict[n] for n in ["B", "V", "r"]]
    # synthetic photometry: apparent flux of the blackbody at distance dm
    d_scale = 10 ** (-dm / 2.5)
    rows = []
    for mjd in [57474.0, 57476.0]:
        for f in filters:
            lum = f.synthesize(planck_fast, T_true, R_true)
            rows.append((mjd, -2.5 * np.log10(lum * d_scale) + f.m0, 0.02, f.name))
    lc = LC([np.array([r[0] for r in rows]),
             np.array([r[1] for r in rows]),
             np.array([r[2] for r in rows]),
             np.array([r[3] for r in rows])],
            names=["MJD", "mag", "dmag", "filter"])
    lc.filters_to_objects()

    # spectrum: the same blackbody, mis-scaled by 1/2.5. Write F_lambda
    # consistent with speccal's internal F_nu conversion (it computes
    # Fnu = Flam*1e-3 * lam / (nu*1e12); invert that)
    wl = np.linspace(3500, 8000, 3000)  # angstrom
    nu = C_AA_THZ / wl  # THz
    lnu = planck_fast(nu, T_true, R_true)  # W/Hz
    fnu = lnu * d_scale  # same units as the photometric flux
    flam_file = fnu * (nu * 1e12) / wl * 1e3
    spec_path = str(tmp_path / "spec_57475.txt")
    np.savetxt(spec_path, np.array([wl, flam_file / 2.5]).T)

    speccal.calibrate_spectra([spec_path], lc, max_extrapolate=2.0)
    out_path = str(tmp_path / "photcal_spec_57475.txt")
    assert os.path.exists(out_path)
    out = np.loadtxt(out_path)
    ratio = np.median(out[:, 1] / (flam_file / 2.5))
    assert ratio == pytest.approx(2.5, rel=0.05)


def test_cli_main(tmp_path, capsys):
    """The speccal command-line interface (reference speccal.py:593-610)."""
    wl = np.linspace(4000, 7000, 500)
    flam = np.full(500, 2e-15)
    spec_path = str(tmp_path / "spec_57475.txt")
    np.savetxt(spec_path, np.array([wl, flam]).T)
    lc_path = str(tmp_path / "lc.txt")
    with open(lc_path, "w") as f:
        f.write("MJD mag dmag filter\n")
        for mjd in [57474.0, 57476.0]:
            for filt in ["B", "V", "r"]:
                f.write(f"{mjd} 17.0 0.05 {filt}\n")
    speccal.main([spec_path, "--lc", lc_path, "--max-extrapolate", "2"])
    out = capsys.readouterr().out
    assert "photcal_" in out
    assert os.path.exists(tmp_path / "photcal_spec_57475.txt")


def test_parse_flux_unit_jansky_and_scaled():
    """Jy/mJy and scaled-prefix BUNIT strings route through the F_nu branch
    with the right factors (reference speccal.py:105-143 behavior)."""
    from lightcurve_fitting_tpu.speccal import _parse_flux_unit

    scale, kind = _parse_flux_unit("Jy")
    assert kind == "fnu" and scale == pytest.approx(1e-26)
    scale, kind = _parse_flux_unit("mJy")
    assert kind == "fnu" and scale == pytest.approx(1e-29)
    scale, kind = _parse_flux_unit("10^-17 erg/s/cm2/Angstrom")
    assert kind == "flam" and scale == pytest.approx(1e-17)
    scale, kind = _parse_flux_unit("erg / (s cm2 Hz)")
    assert kind == "fnu" and scale == pytest.approx(1e-3)


def test_convert_units_jansky():
    wl = np.array([5000.0])
    fnu_jy = np.array([1.0])  # 1 Jy = 1e-26 W/m2/Hz
    _, flam = speccal.convert_spectrum_units(wl, fnu_jy, {"BUNIT": "Jy"})
    expected = 1e-26 * 2.99792458e18 / 5000.0 ** 2 * 1e3
    assert flam[0] == pytest.approx(expected, rel=1e-6)


def test_calibrate_spectra_polynomial_warp(tmp_path):
    """order=1: a spectrum with a linear frequency tilt on top of a scale
    error is flattened back to the photometry by the polynomial warp."""
    T_true, R_true = 9.0, 10.0
    dm = 30.0
    d_scale = 10 ** (-dm / 2.5)
    filters = [filtdict[n] for n in ["B", "V", "r", "i"]]
    rows = []
    for mjd in [57474.0, 57476.0]:
        for f in filters:
            lum = f.synthesize(planck_fast, T_true, R_true)
            rows.append((mjd, -2.5 * np.log10(lum * d_scale) + f.m0, 0.02, f.name))
    lc = LC([np.array([r[0] for r in rows]),
             np.array([r[1] for r in rows]),
             np.array([r[2] for r in rows]),
             np.array([r[3] for r in rows])],
            names=["MJD", "mag", "dmag", "filter"])
    lc.filters_to_objects()

    wl = np.linspace(3500, 8500, 3000)
    nu = C_AA_THZ / wl
    fnu_true = planck_fast(nu, T_true, R_true) * d_scale
    # miscalibration: x0.5 scale plus a tilt across the frequency range
    tilt = 1.0 + 0.4 * (nu - nu.mean()) / (nu.max() - nu.min())
    flam_file = fnu_true * (nu * 1e12) / wl * 1e3
    spec_path = str(tmp_path / "spec_57475.txt")
    np.savetxt(spec_path, np.array([wl, flam_file * 0.5 * tilt]).T)

    speccal.calibrate_spectra([spec_path], lc, order=1, max_extrapolate=2.0)
    out = np.loadtxt(str(tmp_path / "photcal_spec_57475.txt"))
    # warp-corrected output over the true spectrum: flat and ~1 in the
    # band-covered region (B-i: ~3900-8000 A)
    recovered = out[:, 1] / flam_file
    mask = (wl > 4000) & (wl < 7800)
    assert np.median(recovered[mask]) == pytest.approx(1.0, abs=0.1)
    assert np.std(recovered[mask]) < 0.1


def test_flux_unit_scale_prefixes():
    """IRAF-style 10**(-15) / 10**-15 / 10^-15 BUNIT prefixes parse."""
    from lightcurve_fitting_tpu.speccal import _parse_flux_unit
    for b in ["10**(-15) erg/cm2/s/A", "10**-15 erg/cm2/s/A",
              "10^-15 erg/cm2/s/A"]:
        scale, kind = _parse_flux_unit(b)
        assert scale == pytest.approx(1e-15) and kind == "flam", b


def test_cunit_uppercase_plural():
    """CUNIT1='MICRONS' scales to angstroms (lowercase before de-plural)."""
    from lightcurve_fitting_tpu.speccal import convert_spectrum_units
    wl, fx = convert_spectrum_units(np.array([0.5]), np.array([1.0]),
                                    {"CUNIT1": "MICRONS"})
    assert wl[0] == pytest.approx(0.5e4)


def test_readspec_osc_json(tmp_path):
    """readspec on an Open-Astronomy-Catalog JSON takes the first spectrum
    with its own date/telescope metadata (the raw-reader contract used to
    crash on unpacking)."""
    import json as _json
    from lightcurve_fitting_tpu.speccal import readspec
    data = {"SN2020abc": {"spectra": [
        {"time": "57500.0", "u_time": "MJD", "telescope": "ExampleScope",
         "instrument": "Spec1", "filename": "spec1.dat",
         "data": [["4000.0", "1.0e-15"], ["5000.0", "2.0e-15"],
                  ["6000.0", "1.5e-15"]]},
        {"time": "57510.0", "u_time": "MJD", "filename": "spec2.dat",
         "data": [["4000.0", "9.0e-16"], ["6000.0", "8.0e-16"]]}]}}
    p = tmp_path / "SN2020abc.json"
    p.write_text(_json.dumps(data))
    x, y, date, tel, inst = readspec(str(p))
    np.testing.assert_allclose(x, [4000.0, 5000.0, 6000.0])
    np.testing.assert_allclose(y, [1.0e-15, 2.0e-15, 1.5e-15])
    assert date.mjd == pytest.approx(57500.0)
    assert tel == "ExampleScope" and inst == "Spec1"


def test_fits_header_escaped_quotes_and_comment_apostrophes():
    """Round-5 review fix: FITS 4.0 escaped quotes ('') inside string values
    decode to literal quotes, and an apostrophe in a NUMERIC card's comment
    must not trigger string parsing (both previously corrupted the value)."""
    import io
    from lightcurve_fitting_tpu.utils import fits as lcf_fits

    def card(s):
        return s.ljust(80)

    text = (card("SIMPLE  =                    T")
            + card("OBJECT  = 'SN 2023''s spec'    / note")
            + card("EXPTIME =                 30.0 / King's exposure")
            + card("END"))
    hdr = lcf_fits._read_header(io.BytesIO(text.ljust(2880).encode("latin-1")))
    assert hdr["OBJECT"] == "SN 2023's spec"
    assert hdr.comments["OBJECT"] == "note"
    assert hdr["EXPTIME"] == 30.0
    assert hdr.comments["EXPTIME"] == "King's exposure"


def test_create_wiserep_tsv(tmp_path, monkeypatch):
    """WISeREP upload prep (behavioral spec: reference speccal.py:442-590):
    FITS spectra are converted to ascii alongside a copied original, the TSV
    carries one row per spectrum in the fixed column order, and the returned
    Table mirrors it. Interactive prompts (bibcode, group IDs, instrument
    IDs) are scripted."""
    from lightcurve_fitting_tpu.utils.table import Table  # noqa: F401 (return type)

    wl = 3500.0 + 2.0 * np.arange(500)
    flam = 1e-15 * np.exp(-0.5 * ((wl - 5000) / 800.0) ** 2)
    fits_path = str(tmp_path / "spec_fast.fits")
    _write_fits_spectrum(fits_path, 3500.0, 2.0, flam[:500])
    ascii_path = str(tmp_path / "sn2016bkv_57480.txt")
    np.savetxt(ascii_path, np.array([wl, flam]).T)

    answers = iter([
        "2018MNRAS.000.000X",  # bibcode
        "5",                   # group IDs for spectrum 1 (FITS, inst FAST)
        "41",                  # instrument ID for FAST
        "5",                   # group IDs for spectrum 2 (ascii, inst unknown)
        "",                    # unknown instrument id left blank
    ])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))

    wdir = str(tmp_path / "wiserep")
    out = speccal.create_wiserep_tsv([(fits_path, 3), ascii_path], wdir,
                                     verbose=True)

    assert os.path.exists(wdir + ".tsv")
    with open(wdir + ".tsv") as f:
        lines = f.read().splitlines()
    assert lines[0] == "TSV-type:\tspectra"
    assert lines[1].split("\t")[0] == "Ascii-filename*"
    assert len(lines) == 5  # type line + header + defaults + 2 records
    rec1 = lines[3].split("\t")
    assert rec1[0] == "spec_fast.txt" and rec1[1] == "spec_fast.fits"
    assert rec1[3] == "41"
    # converted ascii + copied original for the FITS input
    assert os.path.exists(os.path.join(wdir, "spec_fast.txt"))
    assert os.path.exists(os.path.join(wdir, "spec_fast.fits"))
    conv = np.loadtxt(os.path.join(wdir, "spec_fast.txt"))
    np.testing.assert_allclose(conv[:, 0], wl[:500])
    # returned table mirrors the TSV records
    assert len(out) == 2
    assert list(out["Publish (bibcode)"]) == ["2018MNRAS.000.000X"] * 2
    # quality given as a tuple is clamped into [1, 3]
    assert str(out["Spec Quality-Id"][0]) == "3"
