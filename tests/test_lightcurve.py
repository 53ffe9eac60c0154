"""LC table layer: reading, column normalization, conversions, binning,
phases, and plotting smoke tests on the bundled SN 2016bkv photometry."""

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from lightcurve_fitting_tpu.lightcurve import LC, flux2mag, mag2flux, binflux, filtsetup
from lightcurve_fitting_tpu.filters import filtdict

EXAMPLE = os.path.join(os.path.dirname(__file__), "..",
                       "lightcurve_fitting_tpu", "data", "SN2016bkv.csv")


@pytest.fixture
def lc():
    t = LC.read(EXAMPLE)
    t.meta["dm"] = 30.79
    t.meta["extinction"] = {
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020,
    }
    t.meta["redshift"] = 0.002
    return t


def test_read_and_columns(lc):
    assert len(lc) == 758
    assert set(["MJD", "mag", "dmag", "filter", "source", "nondet"]) <= set(lc.colnames)
    assert lc["nondet"].dtype.kind == "b"
    # filter column parsed to Filter objects; '0' maps to unfilt.
    assert lc["filter"][0] is filtdict["unfilt."]


def test_where_dsl(lc):
    sub = lc.where(MJD_min=57468, MJD_max=57485)
    assert len(sub) > 0
    assert np.asarray(sub["MJD"]).min() >= 57468
    assert np.asarray(sub["MJD"]).max() <= 57485
    rband = lc.where(filter="r")
    assert all(f is filtdict["r"] for f in rband["filter"])
    notr = lc.where(filter_not=["r", "i"])
    assert not any(f is filtdict["r"] or f is filtdict["i"] for f in notr["filter"])
    det = lc.where(nondet=False)
    assert not np.asarray(det["nondet"]).any()


def test_calc_flux_mag_roundtrip(lc):
    lc.calcFlux()
    assert "flux" in lc.colnames and "dflux" in lc.colnames
    det = lc.where(nondet=False)
    # round trip flux -> mag
    mag, dmag = flux2mag(det["flux"], det["dflux"], det.zp)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(det["mag"], float), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dmag), np.asarray(det["dmag"], float), rtol=1e-10)
    # nondetections: flux 0, dflux = 3-sigma limit flux / 3
    nd = lc.where(nondet=True)
    assert np.all(np.asarray(nd["flux"]) == 0)
    assert np.all(np.asarray(nd["dflux"]) > 0)


def test_absmag_lum(lc):
    lc.calcFlux()
    lc.calcAbsMag()
    lc.calcLum()
    det = lc.where(nondet=False, filter="g")
    g_ext = lc.meta["extinction"]["g"]
    expected = np.asarray(det["mag"], float) - 30.79 - g_ext
    np.testing.assert_allclose(np.asarray(det["absmag"], float), expected, rtol=1e-12)
    # luminosity zero point: M0 = m0 + 90.19
    lum, dlum = mag2flux(det["absmag"], det["dmag"], det.zp + 90.19)
    np.testing.assert_allclose(np.asarray(det["lum"], float), lum, rtol=1e-12)


def test_mag2flux_hand_value():
    # AB zero point: m = 0 -> flux = 3.631e-23 with zp = 2.5 log10(3.631e-23)
    zp = 2.5 * np.log10(3.631e-23)
    flux, dflux = mag2flux(np.array([0.0]), np.array([0.1]), zp)
    assert flux[0] == pytest.approx(3.631e-23)
    assert dflux[0] == pytest.approx(np.log(10) / 2.5 * 3.631e-23 * 0.1)


def test_binflux_zero_errors():
    t = np.array([1.0, 1.1, 5.0])
    f = np.array([10.0, 12.0, 20.0])
    df = np.array([1.0, 2.0, 1.0])
    bt, bf, bdf = binflux(t, f, df, delta=0.3)
    assert len(bt) == 2
    w = np.array([1.0, 0.25])
    assert bf[0] == pytest.approx((10 * 1 + 12 * 0.25) / 1.25)
    assert bdf[0] == pytest.approx(1.25 ** -0.5)
    # zero error bar -> plain mean, zero dflux (reference lightcurve.py:976-979)
    bt, bf, bdf = binflux(np.array([1.0, 1.1]), np.array([10.0, 12.0]),
                          np.array([0.0, 2.0]), delta=0.3)
    assert bf[0] == 11.0 and bdf[0] == 0.0


def test_bin_groups_by_filter_source(lc):
    lc.calcFlux()
    binned = lc.bin(delta=1.0)
    assert len(binned) < len(lc)
    assert set(["MJD", "flux", "dflux", "filter", "source"]) <= set(binned.colnames)


def test_phase_and_peak(lc):
    lc.findPeak(filter="r")
    assert "peakdate" in lc.meta
    lc.calcPhase(rdsp=True)
    assert "phase" in lc.colnames
    phase = np.asarray(lc["phase"])
    mjd = np.asarray(lc["MJD"], float)
    np.testing.assert_allclose(phase, (mjd - lc.meta["peakdate"]) / 1.002, rtol=1e-12)


def test_jd_to_mjd_and_aliases():
    t = LC([[2457500.5, 2457501.5], [18.0, 18.5], [0.1, 0.1], ["g", "r"]],
           names=["jd", "Magnitude", "magerr", "band"])
    assert "MJD" in t.colnames and "mag" in t.colnames and "dmag" in t.colnames
    np.testing.assert_allclose(np.asarray(t["MJD"]), [57500.0, 57501.0])
    assert t["filter"][0] is filtdict["g"]


def test_swift_disambiguation():
    t = LC([[57500.0, 57500.0], [18.0, 18.0], [0.1, 0.1], ["U", "U"],
            ["Swift", "LCO"]],
           names=["MJD", "mag", "dmag", "filter", "telescope"])
    assert t["filter"][0] is filtdict["U_S"]
    assert t["filter"][1] is filtdict["U"]


def test_plot_smoke(lc, tmp_path):
    lc.calcFlux()
    lc.calcAbsMag()
    lc.calcLum()
    lc.calcPhase()
    plt.figure()
    lc.plot(xcol="MJD", ycol="mag", loc_filt="above", loc_mark="above left")
    plt.savefig(tmp_path / "lc.png")
    plt.close("all")
    # filtsetup arranges a grid
    grid = filtsetup({filtdict[n] for n in ["U", "B", "V", "g", "r", "i"]})
    assert grid.ndim == 2


def test_write_roundtrip(lc, tmp_path):
    out = tmp_path / "out.txt"
    lc.write(str(out), format="ascii.fixed_width_two_line", overwrite=True)
    back = LC.read(str(out))
    assert len(back) == len(lc)
    assert back["filter"][0] is filtdict["unfilt."]


def test_where_edge_cases(lc):
    """List-valued criteria, _not with lists, None matching, and shared
    marker-dict behavior of the criteria engine."""
    both = lc.where(filter=["g", "r"])
    assert set(f.name for f in both["filter"]) <= {"g", "r"}
    neither = lc.where(filter_not=["g", "r"])
    assert not any(f.name in ("g", "r") for f in neither["filter"])
    # combined range + equality criteria AND together
    sub = lc.where(MJD_min=57470.0, MJD_max=57480.0, nondet=False)
    assert len(sub) and np.asarray(sub["MJD"]).min() >= 57470.0
    assert not np.asarray(sub["nondet"]).any()
    # selections share (not copy) the marker assignments
    sel = lc.where(filter="g")
    assert sel.markers is lc.markers


def test_filtsetup_offset_collision_adds_column():
    """Two systems in one row colliding on an offset duplicate that offset's
    column instead of overwriting (reference lightcurve.py:865-872)."""
    filts = {filtdict[n] for n in ["U", "B", "V", "R", "I", "u", "g", "r", "i", "z"]}
    grid = filtsetup(filts)
    placed = [f for f in grid.flatten() if f is not None]
    assert len(placed) == len(filts)
    assert grid[0, 0] is not None


def test_custom_legend_above_variants(lc, tmp_path):
    import matplotlib.pyplot as plt
    from lightcurve_fitting_tpu.lightcurve import custom_legend
    for loc in ("above", "above left", "above right"):
        fig, ax = plt.subplots()
        lines = [plt.Line2D([], [], marker="o", ls="none")] * 3
        lgd = custom_legend(ax, list(lines), ["a", "b", "c"], loc=loc, ncol=2)
        assert lgd is not None
        plt.close(fig)
    # loc='none' and loc=None draw nothing
    fig, ax = plt.subplots()
    assert custom_legend(ax, [], [], loc="none") is None
    plt.close("all")


def test_marker_legend_nonstring_groups():
    """Marker/color legends resolve non-string group values (e.g. integer
    source IDs): the style dicts are keyed by the RAW column values, and the
    legend must look them up by those keys, str-casting only the labels
    (regression: a str-cast key raised KeyError / silently lost markers)."""
    import matplotlib.pyplot as plt
    lc = LC([np.array([1.0, 2.0, 3.0, 4.0]),
             np.array(["g", "g", "r", "r"]),
             np.array([18.0, 18.5, 18.2, 18.7]),
             np.array([0.1, 0.1, 0.1, 0.1]),
             np.array([1, 1, 2, 2])],
            names=["MJD", "filter", "mag", "dmag", "source"])
    lc.plot(xcol="MJD", ycol="mag", marker="source", color="source",
            loc_mark="above")
    # both integer source IDs got a marker assignment, keyed by raw value
    assert 1 in lc.markers and 2 in lc.markers
    fig = plt.gcf()
    legend_markers = {line.get_marker()
                      for lgd in [c for ax in fig.axes for c in ax.get_children()
                                  if isinstance(c, matplotlib.legend.Legend)]
                      for line in lgd.legend_handles}
    assert legend_markers == {lc.markers[1], lc.markers[2]}
    plt.close("all")


def test_binflux_numpy_fallback_matches_native(monkeypatch):
    """The numpy fallback (seeded-group labeling + bin combiner) must agree
    exactly with the native kernel on the same data."""
    from lightcurve_fitting_tpu.utils import native
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 30, 200))
    f = rng.normal(5.0, 1.0, 200)
    df = rng.uniform(0.1, 0.5, 200)
    df[::17] = 0.0  # exercise the no-error-bar rule in some bins
    ref = binflux(t, f, df, delta=0.7)
    monkeypatch.setattr(native, "binflux_native", lambda *a, **k: None)
    out = binflux(t, f, df, delta=0.7)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), rtol=1e-12)


def test_where_list_with_none_applies_all_entries():
    """A None inside a list value matches alongside the other entries
    (reference lightcurve.py:108-113 applies every list element)."""
    t = LC([[1.0, 2.0, 3.0], [18.0, 18.5, 19.0], [0.1, 0.1, 0.1],
            ["g", "g", "g"]], names=["MJD", "mag", "dmag", "filter"])
    t["source"] = np.array([None, "ATLAS", "ZTF"], dtype=object)
    both = t.where(source=[None, "ATLAS"])
    assert len(both) == 2
    neither = t.where(source_not=[None, "ATLAS"])
    assert len(neither) == 1 and neither["source"][0] == "ZTF"


def test_plot_unknown_column_raises(lc):
    with pytest.raises(Exception, match="no columns found"):
        lc.plot(ycol="bogus_quantity")
    with pytest.raises(Exception, match="no columns found"):
        lc.plot(xcol="bogus_x")


def test_flux2mag_masked_uncertainty_stays_nan():
    """A masked dflux must become NaN dmag, not the 0 fill value (infinite
    weight downstream)."""
    from lightcurve_fitting_tpu.lightcurve import flux2mag
    flux = np.ma.MaskedArray([10.0, 10.0])
    dflux = np.ma.MaskedArray([1.0, 1.0], mask=[True, False])
    mag, dmag = flux2mag(flux, dflux, zp=25.0)
    assert np.isnan(dmag[0]) and np.isfinite(dmag[1]) and dmag[1] > 0


def test_plot_column_fallback_is_bidirectional(tmp_path):
    """plot(xcol='MJD') on a phase-only table falls back to phase (and
    mag -> absmag), like the reference's while/remove loop."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lightcurve_fitting_tpu.filters import filtdict
    lc = LC([[1.0, 2.0], [18.0, 18.5], [0.1, 0.1],
             [filtdict["g"], filtdict["r"]]],
            names=["phase", "absmag", "dmag", "filter"])
    plt.figure()
    lc.plot(xcol="MJD", ycol="mag", appmag_axis=False)  # falls back silently
    plt.close("all")
    with pytest.raises(Exception):
        lc.plot(xcol="bogus")
    plt.close("all")


def test_flux2mag_nonpositive_flux_is_plus_inf():
    """Reference parity (lightcurve.py:908): the log10 out=-inf fallback sits
    INSIDE the -2.5 multiply, so nonpositive flux maps to mag = +inf
    (infinitely faint), never -inf (round-5 review fix; host + device twin)."""
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.ops.photometry import flux2mag_jax

    mag, _ = flux2mag(np.array([0.0, -1.0, 100.0]),
                      np.array([1.0, 1.0, 1.0]), zp=25.0)
    assert np.isposinf(mag[0]) and np.isposinf(mag[1])
    assert mag[2] == pytest.approx(20.0)
    magj, _ = flux2mag_jax(jnp.array([0.0, -1.0, 100.0]),
                           jnp.array([1.0, 1.0, 1.0]), zp=25.0)
    np.testing.assert_allclose(np.asarray(magj), mag)
