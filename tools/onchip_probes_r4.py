#!/usr/bin/env python
"""Round-4 on-chip probes (run after bench.py, while the tunnel is up).

1. kappa-device-path smoke: the round-4 change threading ``kappa`` through
   the device quadrature (models/shock_cooling.py, models/companion_shocking.py)
   was validated on CPU; this runs a tiny on-chip fit with kappa != 0.34 and
   checks the posterior log-prob is finite under the TPU's emulated-f64
   numerics (CLAUDE.md: intermediates outside ~[1e-38, 3e38] die on this
   backend even in f64).
2. persistent-compile-cache support: does the axon backend serialize
   executables?  If yes, core.config.enable_compilation_cache also pays off
   on-chip (it is known to work on CPU; tests/.xla_cache).

Prints one line per probe; exits nonzero on a failed smoke.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_kappa_onchip():
    # ADVICE r4 (medium): the original probe used ShockCooling2, whose scaled
    # (T_1, L_1, t_tr) parameterization never uses kappa — it validated
    # nothing. Probe the SW17 ShockCooling model, where kappa enters the
    # temperature/luminosity scalings (models/shock_cooling.py:82-87), and
    # REQUIRE the kappa=0.2 log-posterior to differ from the kappa=1.0 one
    # at the same parameters before the finite-fit smoke.
    import jax
    assert jax.devices()[0].platform.lower() != "cpu", "needs the TPU tunnel"
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.models import ShockCooling, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc, make_log_posterior

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lc = LC.read(os.path.join(here, "lightcurve_fitting_tpu", "data",
                              "SN2016bkv.csv"))
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    early = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    priors = [UniformPrior(0.1, 20.0), UniformPrior(0.1, 30.0),
              UniformPrior(0.01, 100.0), UniformPrior(0.01, 50.0),
              UniformPrior(57468.0, 57468.7)]
    model = ShockCooling(early, kappa=0.2)    # nonstandard opacity, device path
    p = jnp.asarray([5.0, 10.0, 1.0, 5.0, 57468.4])
    lp_02 = float(jax.jit(make_log_posterior(model, early, priors))(p))
    lp_10 = float(jax.jit(make_log_posterior(ShockCooling(early), early,
                                             priors))(p))
    kappa_live = np.isfinite(lp_02) and abs(lp_02 - lp_10) > 1.0
    s = lightcurve_mcmc(early, model, priors=priors,
                        p_lo=[0.5, 0.5, 0.1, 0.1, 57468.3],
                        p_up=[10.0, 20.0, 10.0, 20.0, 57468.7],
                        nwalkers=64, nsteps=20, nsteps_burnin=20,
                        seed=0, quiet=True)
    logp = np.asarray(s.get_log_prob(flat=True))
    ok = np.isfinite(logp).all() and kappa_live
    print(f"[probe] SW17 kappa device path on-chip: logp(kappa=0.2)={lp_02:.1f} "
          f"vs logp(kappa=1.0)={lp_10:.1f} (differ={kappa_live}); fit logp "
          f"range [{logp.min():.1f}, {logp.max():.1f}] finite="
          f"{np.isfinite(logp).all()} device={jax.devices()[0]}")
    return bool(ok)


def probe_nuts_onchip():
    """Round-4 NUTS change (leapfrogs thread the exit gradient into the next
    step) was validated on CPU; run a tiny on-chip NUTS fit and check finite
    samples + nonzero acceptance under the emulated-f64 gradient path."""
    import jax
    from lightcurve_fitting_tpu.lightcurve import LC
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.fitting import lightcurve_hmc

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lc = LC.read(os.path.join(here, "lightcurve_fitting_tpu", "data",
                              "SN2016bkv.csv"))
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    early = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    model = ShockCooling2(early)
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    h = lightcurve_hmc(early, model, priors=priors,
                       p_lo=[20.0, 2.0, 20.0, 57468.5],
                       p_up=[50.0, 5.0, 50.0, 57468.7],
                       nchains=4, nsamples=20, n_warmup=40, max_depth=6,
                       warmup_walkers=32, warmup_steps=50, seed=0, quiet=True)
    flat = np.asarray(h.flatchain)
    ok = np.isfinite(flat).all() and flat.std(0).min() > 0.0
    print(f"[probe] on-chip NUTS (gradient-threaded leapfrog): "
          f"samples {flat.shape} finite={np.isfinite(flat).all()} "
          f"param-std-min={flat.std(0).min():.3g} device={jax.devices()[0]}")
    return bool(ok)


def probe_persistent_cache():
    import jax
    td = tempfile.mkdtemp()
    jax.config.update("jax_compilation_cache_dir", td)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return jnp.sin(x) @ x

    f(jnp.ones((256, 256))).block_until_ready()
    n = len(os.listdir(td))
    print(f"[probe] tunnel persistent-cache support: {n} file(s) persisted "
          f"({'WORKS' if n else 'NOT SUPPORTED by this backend'})")
    return True


if __name__ == "__main__":
    ok = probe_kappa_onchip()
    ok = probe_nuts_onchip() and ok
    probe_persistent_cache()
    sys.exit(0 if ok else 1)
