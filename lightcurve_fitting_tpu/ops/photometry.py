"""Device-side (jax) twins of the host photometric conversions
(lightcurve.flux2mag / mag2flux, reference lightcurve.py:878-941), for
pipelines that keep mag-space data on device (e.g. fitting directly in
magnitudes, future survey-scale ingestion)."""

import jax.numpy as jnp

__all__ = ["mag2flux_jax", "flux2mag_jax"]


def mag2flux_jax(mag, dmag=jnp.nan, zp=0.0, nondet=None, nondetSigmas=3.0):
    """Magnitude -> flux; nondetections imply zero flux with dflux = flux/Nsigma."""
    flux = 10.0 ** ((zp - mag) / 2.5)
    dflux = jnp.log(10.0) / 2.5 * flux * dmag
    if nondet is not None:
        dflux = jnp.where(nondet, flux / nondetSigmas, dflux)
        flux = jnp.where(nondet, 0.0, flux)
    return flux, dflux


def flux2mag_jax(flux, dflux=jnp.nan, zp=0.0, nondet=None, nondetSigmas=3.0):
    """Flux -> magnitude; nondetections become N-sigma limiting magnitudes."""
    if nondet is not None:
        flux = jnp.where(nondet, nondetSigmas * dflux, flux)
        dflux = jnp.where(nondet, jnp.nan, dflux)
    pos = flux > 0.0
    # the reference's log10 out=-inf fallback sits INSIDE the -2.5 multiply
    # (lightcurve.py:908), so nonpositive flux maps to mag = +inf
    # (infinitely faint), not -inf
    mag = jnp.where(pos, -2.5 * jnp.log10(jnp.where(pos, flux, 1.0)), jnp.inf) + zp
    dmag = 2.5 * dflux / (flux * jnp.log(10.0))
    return mag, dmag
