"""Runtime configuration.

``compute_dtype`` controls the precision of the band-integration hot path
(the (walkers x points x nodes) Planck cube). ``None`` (default) inherits the
input dtype — float64 under ``jax_enable_x64`` for exact host parity. Set to
``jnp.float32`` (or bfloat16) for TPU production: parameter and time arithmetic
stay in the ambient precision (MJD epochs need float64), while the
transcendental-heavy cube runs at full VPU rate. Relative error of the band
fluxes in float32 is ~1e-7, far below photometric uncertainty.
"""

AUTO = "auto"
compute_dtype = AUTO


def set_compute_dtype(dtype):
    """Set the hot-path compute dtype (None, jnp.float32, jnp.bfloat16, or
    config.AUTO to re-enable backend-based resolution)."""
    global compute_dtype
    compute_dtype = dtype


def get_compute_dtype():
    """Resolve the hot-path dtype: explicit user setting wins; AUTO resolves to
    float32 on accelerators (where emulated float64 is ~10x slower and
    float32-range-limited) and to None (ambient precision) on CPU."""
    global compute_dtype
    if compute_dtype == AUTO:
        import jax
        import jax.numpy as jnp
        compute_dtype = None if jax.default_backend() == "cpu" else jnp.float32
    return compute_dtype
