"""Host substrate: units, cosmology, table edge cases, F99 extinction."""

import numpy as np
import pytest

from lightcurve_fitting_tpu.utils import units as u
from lightcurve_fitting_tpu.utils.cosmology import Planck18
from lightcurve_fitting_tpu.utils.table import Table, Column, vstack
from lightcurve_fitting_tpu.ops.extinction import fitzpatrick99, f99_curve, extinction_law, f99_k_jax


def test_unit_latex_formatting():
    assert f"{u.kK:latex_inline}" == "$\\mathrm{kK}$"
    comp = u.cm / u.s
    assert "cm" in f"{comp:latex_inline}" and "s^{-1}" in f"{comp:latex_inline}"
    q = 10.0 ** 8.5 * u.cm / u.s
    assert isinstance(q, u.Quantity)
    assert np.isclose(np.log10(q.value), 8.5)


def test_unit_conversions():
    assert u.Unit.parse("nm").to("Angstrom") == pytest.approx(10.0)
    assert (u.d).to(u.s) == pytest.approx(86400.0)
    q = u.Quantity(1.0, u.um).to("Angstrom")
    assert q.value == pytest.approx(1e4)
    with pytest.raises(ValueError):
        u.Unit.parse("nm").to("s")


def test_format_unit_quantities():
    from lightcurve_fitting_tpu.models import format_unit
    assert format_unit(u.kK) == "$\\mathrm{kK}$"
    s = format_unit(1e42 * u.erg / u.s)
    assert "10^{42}" in s and "erg" in s


def test_planck18_distmod():
    # d_L(z->0) ~ cz/H0: 0.002 -> 8.862 Mpc -> mu = 29.74; z=0.1 -> ~476 Mpc
    assert Planck18.luminosity_distance(0.002) == pytest.approx(299792.458 * 0.002 / 67.66,
                                                                rel=2e-3)
    assert Planck18.distmod(0.002).value == pytest.approx(29.74, abs=0.02)
    assert Planck18.distmod(0.01).value == pytest.approx(33.25, abs=0.02)
    assert Planck18.distmod(0.1).value == pytest.approx(38.39, abs=0.02)
    assert Planck18.luminosity_distance(0.0) == 0.0


def test_f99_extinction_values():
    """F99 A_lambda/A_V ratios at standard wavelengths (R_V = 3.1). Golden
    values from the published F99 curve (e.g. Fitzpatrick 1999 Table 3)."""
    # A(V)/A_V = 1 by construction at 5470 angstrom... the anchor gives k(5470)=R_V
    a_v = 3.1 * 0.5  # ebv = 0.5
    # F99 anchor at 5470 A gives A/A_V = 0.9854 for R_V = 3.1 (the law is
    # normalized near 5495 A, not exactly at the V anchor)
    A = fitzpatrick99(np.array([5470.0]), a_v, 3.1)
    assert A[0] / a_v == pytest.approx(0.9854, abs=0.003)
    # B band (4400 A): A_B/A_V ~ 1.32 -> E(B-V) consistency A_B - A_V ~ ebv
    A_B = fitzpatrick99(np.array([4400.0]), a_v, 3.1)[0]
    assert A_B - A[0] == pytest.approx(0.5, abs=0.05)
    # monotonically increasing into the UV over the bump
    wls = np.array([26500.0, 12200.0, 6000.0, 4400.0, 2700.0, 2175.0])
    As = fitzpatrick99(wls, a_v, 3.1)
    assert np.all(np.diff(As) > 0)
    # jax version matches numpy version
    import jax.numpy as jnp
    k_np = f99_curve(wls, 3.1)
    k_jx = np.asarray(f99_k_jax(jnp.asarray(wls), 3.1))
    np.testing.assert_allclose(k_jx, k_np, rtol=1e-12)


def test_extinction_law_factor():
    freq = np.array([500.0, 800.0])  # THz
    fac = extinction_law(freq, 0.0)
    np.testing.assert_allclose(fac, 1.0)
    fac = extinction_law(freq, 0.2)
    assert np.all(fac < 1.0) and np.all(fac > 0.0)
    # vectorized over ebv
    fac2 = extinction_law(freq, np.array([0.1, 0.2]))
    assert fac2.shape == (2, 2)


def test_table_masked_roundtrip(tmp_path):
    t = Table(names=["a", "b", "s"], dtype=[float, int, "S6"], masked=True)
    t.add_row([1.5, 2, "xy"], mask=[False, False, False])
    t.add_row([np.nan, 0, ""], mask=[True, True, True])
    assert t.has_masked_values
    assert np.ma.is_masked(t["a"][1])
    path = str(tmp_path / "t.txt")
    t.write(path, format="ascii.fixed_width_two_line", overwrite=True)
    back = Table.read(path, fill_values=[("--", "0")])
    assert len(back) == 2
    assert np.ma.is_masked(back["a"][1])


def test_table_group_by_and_vstack():
    t = Table([[1, 1, 2, 2, 3], [10.0, 11.0, 20.0, 21.0, 30.0]], names=["k", "v"])
    g = t.group_by("k")
    assert len(g.groups) == 3
    assert list(g.groups.keys["k"]) == [1, 2, 3]
    np.testing.assert_allclose(np.asarray(g.groups[1]["v"]), [20.0, 21.0])
    t2 = Table([[9], [90.0], ["extra"]], names=["k", "v", "w"])
    st = vstack([t, t2])
    assert len(st) == 6
    assert np.ma.is_masked(st["w"][0]) and st["w"][5] == "extra"


def test_table_row_destructure():
    t = Table([[1.0, 2.0], [3.0, 4.0], [True, False]], names=["a", "b", "c"])
    a, b, c = t[["a", "b", "c"]][0]
    assert (a, b, c) == (1.0, 3.0, True)


def test_column_numpy_interop():
    c = Column(np.arange(5.0), name="x")
    assert np.trapezoid(c) == pytest.approx(8.0)
    c2 = np.insert(c, 0, -1.0)
    assert c2[0] == -1.0
    assert (c > 2).sum() == 2


def test_device_photometry_twins_match_host():
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.ops.photometry import mag2flux_jax, flux2mag_jax
    from lightcurve_fitting_tpu.lightcurve import mag2flux, flux2mag
    rng = np.random.default_rng(0)
    mag = rng.uniform(14, 22, 20)
    dmag = rng.uniform(0.01, 0.3, 20)
    zp = rng.uniform(-58, -56, 20)
    nondet = rng.uniform(size=20) < 0.3
    f_h, df_h = mag2flux(mag, dmag, zp, nondet)
    f_d, df_d = mag2flux_jax(jnp.asarray(mag), jnp.asarray(dmag), jnp.asarray(zp),
                             jnp.asarray(nondet))
    np.testing.assert_allclose(np.asarray(f_d), f_h, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(df_d), df_h, rtol=1e-12, equal_nan=True)
    m_h, dm_h = flux2mag(f_h.copy(), df_h.copy(), zp, nondet)
    m_d, dm_d = flux2mag_jax(f_d, df_d, jnp.asarray(zp), jnp.asarray(nondet))
    np.testing.assert_allclose(np.asarray(m_d), m_h, rtol=1e-10, equal_nan=True)


def test_table_explicit_meta_wins_over_source():
    """Table(other, meta=...) must honor the explicit meta (astropy
    semantics), merged over the source table's."""
    from lightcurve_fitting_tpu.utils.table import Table
    t = Table([[1.0]], names=["a"])
    t.meta.update(x=1, y=0)
    t2 = Table(t, meta={"y": 2})
    assert t2.meta == {"x": 1, "y": 2}


def test_table_add_row_length_checked():
    from lightcurve_fitting_tpu.utils.table import Table
    t = Table([[1.0], [2.0]], names=["a", "b"])
    with pytest.raises(ValueError):
        t.add_row([3.0])
    t.add_row([3.0, 4.0])
    assert len(t) == 2 and len(t["a"]) == len(t["b"]) == 2


def test_corner_truths_and_unknown_kwarg_warning():
    """Round-4 review fixes: corner() draws truth lines (corner-package
    semantics) and warns loudly on unimplemented corner-package options
    instead of silently rendering nothing."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lightcurve_fitting_tpu.utils.corner import corner

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(200, 3))
    fig = corner(xs, labels=["a", "b", "c"], truths=[0.0, None, 1.0])
    # diagonal panel 0 gets an axvline at 0; off-diagonal (2,0) gets both
    assert any(ln.get_xdata()[0] == 0.0 for ln in fig.axes[0].lines)
    plt.close(fig)
    with pytest.warns(UserWarning, match="unsupported"):
        fig = corner(xs, show_titles=True)
    plt.close(fig)
    with pytest.raises(ValueError):
        corner(xs, truths=[0.0])


def test_corner_1d_samples_mean_one_parameter():
    """(N,) input is N samples of ONE parameter (corner-package semantics:
    a single histogram), not a 1 x N chain that would try to build an
    N x N subplot grid."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lightcurve_fitting_tpu.utils.corner import corner

    xs = np.random.default_rng(0).normal(size=500)
    fig = corner(xs, labels=["a"])
    assert len(fig.get_axes()) == 1
    plt.close(fig)


def test_time_ordering_and_numeric_guard():
    """Time supports the full comparison set (it replaces astropy.time.Time,
    whose users filter spectra with t <= t_max), and numpy integers hit the
    explicit-format error, not the ISO parser."""
    from lightcurve_fitting_tpu.utils.timeutil import Time

    a, b = Time("2016-01-01"), Time("2016-01-02")
    assert a < b and a <= b and b > a and b >= a and a <= Time("2016-01-01")
    assert not (a >= b) and a != b and a == Time("2016-01-01")
    with pytest.raises(ValueError, match="explicit format"):
        Time(np.int64(57468))
    with pytest.raises(ValueError, match="explicit format"):
        Time(57468.0)


def test_comoving_distance_vectorized_matches_scalar():
    """The one-shot (nz, n+1) Simpson evaluation must agree with per-element
    integration, return 0 at z<=0, and preserve scalar-in/scalar-out."""
    z = np.array([0.0, 0.01, 0.1, 0.5, 1.0, 3.0])
    vec = Planck18.comoving_distance(z)
    scl = np.array([Planck18.comoving_distance(float(zi)) for zi in z])
    np.testing.assert_allclose(vec, scl, rtol=1e-12)
    assert vec[0] == 0.0
    assert np.isscalar(Planck18.comoving_distance(0.5)) or \
        np.ndim(Planck18.comoving_distance(0.5)) == 0


def test_unit_ndarray_arithmetic_yields_array_quantity():
    """Round-5 review fix: ndarray <op> Unit/Quantity must produce ONE
    array-valued Quantity (__array_priority__), never an object ndarray of
    per-element Quantities, and 1/unit stays a Unit (astropy idiom)."""
    from lightcurve_fitting_tpu.utils import units as u

    a = np.array([1.0, 2.0])
    for q in [a * u.s, a / u.s, u.s * a, u.s / a, a / u.Quantity(2.0, u.s),
              a * u.Quantity(2.0, u.s)]:
        assert isinstance(q, u.Quantity), type(q)
        assert isinstance(q.value, np.ndarray) and q.value.dtype != object
    assert isinstance(1 / u.s, u.Unit)
    np.testing.assert_allclose((a / u.s).value, a)
    np.testing.assert_allclose((u.s / a).value, 1.0 / a)
    np.testing.assert_allclose((a * u.m).to(u.cm).value, [100.0, 200.0])



def test_profiling_throughput_and_trace(tmp_path, capsys):
    """utils/profiling.py (SURVEY §5 observability): Throughput reports
    evals/s from the wrapped block, and trace() captures a jax profiler
    trace directory usable with TensorBoard/XProf."""
    import jax
    import jax.numpy as jnp

    from lightcurve_fitting_tpu.utils.profiling import Throughput, trace

    with Throughput(1000, label="unit") as t:
        pass
    assert t.elapsed is not None and t.elapsed >= 0.0
    assert t.evals_per_sec == 1000 / t.elapsed
    assert "unit: 1000 log-likelihood evals" in capsys.readouterr().out

    logdir = tmp_path / "jax_trace"
    with trace(str(logdir)):
        float(jnp.sum(jnp.arange(16.0)))
    # the profiler writes a plugins/profile/<run>/ tree with at least one
    # trace artifact; stop_trace must have flushed it even on CPU
    produced = list(logdir.rglob("*"))
    assert any(p.is_file() for p in produced), produced
    del jax
