"""Cubic-spline utilities: host-side coefficient construction (numpy/scipy) and
device-side evaluation (jax), used for the F99 extinction optical/IR spline and
the SiFTO Ia template (reference models.py:717 uses scipy CubicSpline)."""

import numpy as np
import jax.numpy as jnp

__all__ = ["natural_cubic_coeffs", "notaknot_cubic_coeffs", "ppoly_eval", "ppoly_eval_np"]


def natural_cubic_coeffs(x, y):
    """Natural cubic spline (zero second derivative at both ends) through
    ``(x, y)``. Returns piecewise-polynomial coefficients ``c`` of shape
    ``(4, n-1)`` in scipy's PPoly layout (highest power first, local variable
    ``t = xq - x[i]``). Natural boundaries match the GSL cspline used by the
    Cython ``extinction`` package the reference imports (filters.py:9)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = len(x)
    h = np.diff(x)
    # solve tridiagonal system for second derivatives M (natural: M0 = Mn-1 = 0)
    a = np.zeros(n)
    b = np.ones(n)
    c_ = np.zeros(n)
    d = np.zeros(n)
    a[1:-1] = h[:-1] / 6.0
    b[1:-1] = (h[:-1] + h[1:]) / 3.0
    c_[1:-1] = h[1:] / 6.0
    d[1:-1] = (y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1]
    # Thomas algorithm
    for i in range(1, n):
        w = a[i] / b[i - 1]
        b[i] -= w * c_[i - 1]
        d[i] -= w * d[i - 1]
    M = np.zeros(n)
    M[-1] = d[-1] / b[-1]
    for i in range(n - 2, -1, -1):
        M[i] = (d[i] - c_[i] * M[i + 1]) / b[i]
    # convert to local polynomial coefficients on [x_i, x_{i+1}]
    c3 = (M[1:] - M[:-1]) / (6.0 * h)
    c2 = M[:-1] / 2.0
    c1 = (y[1:] - y[:-1]) / h - h * (2.0 * M[:-1] + M[1:]) / 6.0
    c0 = y[:-1]
    return np.stack([c3, c2, c1, c0])


def notaknot_cubic_coeffs(x, y):
    """Not-a-knot cubic spline coefficients (scipy CubicSpline default, used by
    the reference for the SiFTO template, models.py:717)."""
    from scipy.interpolate import CubicSpline
    cs = CubicSpline(np.asarray(x, float), np.asarray(y, float), extrapolate=False)
    return cs.c  # (4, n-1)


def ppoly_eval(x_knots, c, xq, extrapolate="clip"):
    """Evaluate a piecewise cubic polynomial on device.

    Parameters
    ----------
    x_knots : (n,) breakpoints (static numpy or jax array)
    c : (4, n-1) coefficients, highest power first
    xq : query points (traced ok)
    extrapolate : 'clip' evaluates the edge polynomial outside the domain;
        'nan' returns NaN outside (scipy ``extrapolate=False`` behavior).
    """
    x_knots = jnp.asarray(x_knots)
    c = jnp.asarray(c)
    idx = jnp.clip(jnp.searchsorted(x_knots, xq, side="right") - 1, 0, x_knots.shape[0] - 2)
    t = xq - x_knots[idx]
    val = ((c[0, idx] * t + c[1, idx]) * t + c[2, idx]) * t + c[3, idx]
    if extrapolate == "nan":
        outside = (xq < x_knots[0]) | (xq > x_knots[-1])
        val = jnp.where(outside, jnp.nan, val)
    return val


def ppoly_eval_np(x_knots, c, xq, extrapolate="clip"):
    """Numpy twin of :func:`ppoly_eval` for host-side code paths."""
    x_knots = np.asarray(x_knots)
    c = np.asarray(c)
    xq = np.asarray(xq, float)
    idx = np.clip(np.searchsorted(x_knots, xq, side="right") - 1, 0, len(x_knots) - 2)
    t = xq - x_knots[idx]
    val = ((c[0, idx] * t + c[1, idx]) * t + c[2, idx]) * t + c[3, idx]
    if extrapolate == "nan":
        outside = (xq < x_knots[0]) | (xq > x_knots[-1])
        val = np.where(outside, np.nan, val)
    return val
