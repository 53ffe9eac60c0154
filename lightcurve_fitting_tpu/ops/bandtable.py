"""Precomputed band-luminosity tables: the speed-of-light path for blackbody
synthetic photometry.

For a blackbody, the band-averaged spectral luminosity factorizes exactly:

    <L_nu>_b(T, R) = R^2 * g_b(T),   g_b(T) = sum_k W[b,k] c2 nu_k^3 / expm1(c1 nu_k / T)

so the K-node quadrature only ever needs to be evaluated on a 1-D temperature
grid — once, at fit setup, in float64 on the host, using the *exact* native-grid
weights. On device, each (walker, point) evaluation is then a uniform-grid
cubic-spline lookup of ln g_b plus one exp: ~20 flops instead of K~100
transcendental quadrature nodes. Interpolation error of ln g on a 2048-point
log-T grid is ~1e-9, far below the reference's own quadrature error.

Static per fit: redshift, cutoff frequency, and any *fixed* E(B-V) are baked
into the table. Models with a *sampled* E(B-V) (ShockCooling3) keep the full
quadrature path — extinction does not factorize.
"""

import numpy as np
import jax.numpy as jnp

from ..core.constants import c1, c2
from .interpolate import natural_cubic_coeffs

__all__ = ["ChebyshevBandTable", "BandLuminosityTable"]


class ChebyshevBandTable:
    """ln g_b(ln T) as per-band Chebyshev series — the TPU-preferred form.

    Piecewise-table lookups need per-element dynamic gathers, which are
    pathologically slow on TPU (measured 20x slower than the raw quadrature).
    A global degree-``deg`` Chebyshev series per band instead evaluates with
    ``deg`` fused multiply-adds on static per-point coefficients — pure VPU
    work, no gathers. Degree 64 over T in [0.05, 500] kK reaches
    |Delta ln g| < 1e-5 (checked against the exact quadrature in tests), and
    the Wien-edge clamp maps out-of-range temperatures to effectively zero
    flux, matching the reference's power() semantics.
    """

    def __init__(self, bank, z=0.0, cutoff_freq=np.inf, deg=64, T_min=0.05, T_max=500.0):
        self.bank = bank
        self.z = z
        self.cutoff_freq = cutoff_freq
        self.deg = int(deg)
        self.log_T_lo = float(np.log(T_min))
        self.log_T_hi = float(np.log(T_max))
        nodes = bank.emitted_nodes(z)
        weights = bank.weights
        factor = np.minimum(1.0, cutoff_freq / nodes)

        n_fit = max(4 * self.deg, 512)
        k = np.arange(n_fit + 1)
        u = (self.log_T_lo + self.log_T_hi) / 2 \
            + (self.log_T_hi - self.log_T_lo) / 2 * np.cos(np.pi * k / n_fit)
        T = np.exp(u)
        with np.errstate(over="ignore"):
            x = c1 * nodes[None, :, :] / T[:, None, None]
            denom = np.expm1(x)
            integrand = np.where(denom > 0,
                                 c2 * nodes ** 3 * factor / np.where(denom > 0, denom, 1.0),
                                 0.0)
        g = np.einsum("tbk,bk->bt", integrand, weights)
        ln_g = np.log(np.maximum(g, 1e-300))
        s = 2 * (u - self.log_T_lo) / (self.log_T_hi - self.log_T_lo) - 1
        coef = np.stack([np.polynomial.chebyshev.chebfit(s, ln_g[b], self.deg)
                         for b in range(len(bank))])  # (B, deg+1)
        self._coef = coef
        self.coef = jnp.asarray(coef)

    def gather(self, band_ids, device=True):
        """Per-point coefficient rows (N, deg+1) — a static gather at setup."""
        c = self._coef[np.asarray(band_ids)]
        return jnp.asarray(c) if device else c

    def eval_points(self, coef_pt, T, R):
        """Band-averaged L_nu per point: coef_pt (N, deg+1), T/R (..., N)."""
        return chebyshev_bandflux(coef_pt, T, R, self.log_T_lo, self.log_T_hi)


def chebyshev_bandflux(coef_pt, T, R, log_T_lo, log_T_hi):
    """R^2 * exp(Chebyshev(ln T)) with Clenshaw recurrence; no dynamic gathers.

    coef_pt: (N, D+1) per-point Chebyshev coefficients of ln g_b.
    T, R: (..., N). T <= 0 -> 0 (reference power() semantics); T outside the
    fitted range clamps (the Wien edge is already ~exp(-1400) ~ 0).
    """
    from ..core import config
    out_dtype = jnp.result_type(T)
    dt = config.get_compute_dtype()
    if dt is not None:
        # all Clenshaw quantities are O(1)-O(1e3): float32-safe, and the TPU's
        # emulated float64 would be ~10x slower per op
        coef_pt = coef_pt.astype(dt)
        T = T.astype(dt)
        R = R.astype(dt)
    pos = T > 0.0
    logT = jnp.log(jnp.where(pos, T, 1.0))
    s = jnp.clip(2.0 * (logT - log_T_lo) / (log_T_hi - log_T_lo) - 1.0, -1.0, 1.0)
    two_s = 2.0 * s
    D = coef_pt.shape[-1] - 1
    b1 = jnp.zeros_like(s)
    b2 = jnp.zeros_like(s)
    for k in range(D, 0, -1):
        b1, b2 = two_s * b1 - b2 + coef_pt[..., :, k], b1
    ln_g = s * b1 - b2 + coef_pt[..., :, 0]
    return jnp.where(pos, R * R * jnp.exp(ln_g), 0.0).astype(out_dtype)


class BandLuminosityTable:
    """ln g_b(ln T) as per-band piecewise cubics on a uniform log-T grid."""

    def __init__(self, bank, z=0.0, cutoff_freq=np.inf, ebv=0.0, rv=3.1,
                 n_T=2048, T_min=1e-2, T_max=1e4):
        self.bank = bank
        self.z = z
        self.cutoff_freq = cutoff_freq
        nodes = bank.emitted_nodes(z)          # (B, K)
        weights = bank.weights                 # (B, K)
        factor = np.minimum(1.0, cutoff_freq / nodes)
        if np.any(ebv):
            k_ext = bank.ext_curve(z, rv)
            factor = factor * 10.0 ** (np.asarray(ebv) * k_ext / -2.5)

        logT = np.linspace(np.log(T_min), np.log(T_max), n_T)
        T = np.exp(logT)
        # g[b, i] = sum_k w[b,k] * c2 * nu^3 * factor / expm1(c1 nu / T_i)
        with np.errstate(over="ignore"):
            x = c1 * nodes[None, :, :] / T[:, None, None]          # (nT, B, K)
            denom = np.expm1(x)
            integrand = np.where(denom > 0, c2 * nodes ** 3 * factor / np.where(denom > 0, denom, 1.0), 0.0)
        g = np.einsum("tbk,bk->bt", integrand, weights)            # (B, nT)
        g = np.maximum(g, 1e-300)
        ln_g = np.log(g)

        self.log_T_lo = float(logT[0])
        self.dlogT = float(logT[1] - logT[0])
        self.n_T = n_T
        # (B, 4, nT-1) natural-cubic coefficients of ln g vs ln T
        coeffs = np.stack([natural_cubic_coeffs(logT, ln_g[b]) for b in range(len(bank))])
        self._coeffs = coeffs
        self.coeffs = jnp.asarray(coeffs)

    def gather(self, band_ids, device=True):
        """Per-point coefficient stacks (N, 4, nT-1)."""
        c = self._coeffs[np.asarray(band_ids)]
        return jnp.asarray(c) if device else c

