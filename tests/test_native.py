"""Native C++ host kernels vs. their numpy reference implementations."""

import numpy as np
import pytest

from lightcurve_fitting_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++?)")


@np.errstate(divide="ignore", invalid="ignore")
def _binflux_numpy(time, flux, dflux, delta, include_zero=True):
    """The reference algorithm (lightcurve.py:944-1000), pure numpy.

    Edge-case inputs (all-zero error bars with include_zero=False)
    deliberately drive 0/0 and 1/0 here, matching the reference's own
    warnings-and-NaN behavior — errstate keeps the suite output quiet."""
    time = np.asarray(time, float).copy()
    flux = np.asarray(flux, float).copy()
    dflux = np.asarray(dflux, float).copy()
    bt, bf, bd = [], [], []
    while len(flux) > 0:
        grp = np.abs(time - time[0]) <= delta
        tg, fg, dg = time[grp], flux[grp], dflux[grp]
        zeros = (dg == 0) | (dg == 999) | (dg == 9999) | (dg == -1) | np.isnan(dg)
        if zeros.any() and include_zero:
            bt.append(tg.mean())
            bf.append(fg.mean())
            bd.append(0.0)
        else:
            tg, fg, dg = tg[~zeros], fg[~zeros], dg[~zeros]
            bt.append(tg.mean())
            bf.append(np.sum(fg * dg ** -2) / np.sum(dg ** -2))
            bd.append(np.sum(dg ** -2) ** -0.5)
        time, flux, dflux = time[~grp], flux[~grp], dflux[~grp]
    return np.array(bt), np.array(bf), np.array(bd)


@pytest.mark.filterwarnings("ignore:Mean of empty slice:RuntimeWarning")
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("include_zero", [True, False])
def test_binflux_native_matches_numpy(seed, include_zero):
    rng = np.random.default_rng(seed)
    n = 500
    time = np.sort(rng.uniform(0, 30, n))
    flux = rng.normal(100, 10, n)
    dflux = rng.uniform(0.5, 3.0, n)
    # sprinkle in bad error bars
    bad_idx = rng.choice(n, 30, replace=False)
    dflux[bad_idx[:10]] = 0.0
    dflux[bad_idx[10:20]] = 999
    dflux[bad_idx[20:]] = np.nan

    bad = (dflux == 0) | (dflux == 999) | (dflux == 9999) | (dflux == -1) | np.isnan(dflux)
    got = native.binflux_native(time, flux, np.where(bad, 1.0, dflux), bad, 0.3, include_zero)
    want = _binflux_numpy(time, flux, dflux, 0.3, include_zero)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-12, equal_nan=True)


def test_binflux_dispatch_in_lightcurve():
    from lightcurve_fitting_tpu.lightcurve import binflux
    time = np.array([1.0, 1.1, 1.2, 5.0, 5.05])
    flux = np.array([10.0, 12.0, 11.0, 20.0, 22.0])
    dflux = np.array([1.0, 2.0, 1.5, 1.0, 1.0])
    bt, bf, bd = binflux(time, flux, dflux, delta=0.3)
    assert len(bt) == 2
    w = dflux[:3] ** -2
    assert bf[0] == pytest.approx(np.sum(flux[:3] * w) / np.sum(w))


def test_parse_numeric_table():
    text = "# comment\n1.0 2.0 3.0\n4.0 bad 6.0\n\n7.0 8.0 9.0\n"
    vals, mask, n = native.parse_numeric_table(text, 3, 10)
    assert n == 3
    np.testing.assert_allclose(vals[0], [1, 2, 3])
    assert mask[1, 1] and not mask[1, 0]
    np.testing.assert_allclose(vals[2], [7, 8, 9])


def test_parse_numeric_table_speed_smoke():
    rng = np.random.default_rng(0)
    rows = 20000
    text = "\n".join(" ".join(f"{v:.6f}" for v in rng.uniform(size=4)) for _ in range(rows))
    vals, mask, n = native.parse_numeric_table(text, 4, rows)
    assert n == rows
    assert not mask.any()
