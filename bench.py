#!/usr/bin/env python
"""Headline benchmark: log-likelihood evaluations/second on one chip.

Workload: the reference's flagship fit — ShockCooling2 on the SN 2016bkv early
light curve (61 photometry points, 7 bands, exact native-grid band quadrature) —
run as the framework's production configuration: jit-compiled stretch-move
ensemble MCMC, 1024 walkers, whole chain in one lax.scan, float32 hot path with
float64 time/parameter arithmetic.

Baseline: the reference performs these evaluations serially in Python
(~2e5 evals for a default fit; no published throughput numbers — BASELINE.md).
The north-star target from BASELINE.json is 1e7 evals/s/chip;
``vs_baseline`` reports value / 1e7.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lightcurve_fitting_tpu.core import config
    config.set_compute_dtype(jnp.float32)

    from __graft_entry__ import _build_logposterior
    from lightcurve_fitting_tpu.parallel.sampler import EnsembleSampler

    import jax.random as jr
    logpost, _ = _build_logposterior()

    def measure(nwalkers, nsteps, repeats=2):
        sampler = EnsembleSampler(nwalkers, 4, logpost, seed=0)
        rng = np.random.default_rng(0)
        p0 = rng.uniform([20.0, 2.0, 20.0, 57468.5], [50.0, 5.0, 50.0, 57468.7],
                         size=(nwalkers, 4))
        x = jnp.asarray(p0.reshape(2, nwalkers // 2, 4))
        logp = sampler.batched_logp(x.reshape(-1, 4)).reshape(2, nwalkers // 2)
        run = sampler._compiled_run(nsteps, 1)
        keys = jr.split(jr.PRNGKey(1), nsteps)
        out = run(x, logp, keys)  # warmup (compile + one full run)
        jax.block_until_ready(out)
        times = []
        for i in range(repeats):
            keys_i = jr.split(jr.PRNGKey(2 + i), nsteps)
            t0 = time.perf_counter()
            out = run(x, logp, keys_i)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        elapsed = min(times)
        return nwalkers * nsteps / elapsed, elapsed, float(np.asarray(out[4]).mean())

    # headline: population-scale ensemble (32 transients' worth of walkers in
    # one chain kernel); secondary: the reference-default-scale single fit
    value, elapsed, accept = measure(32768, 300)
    value_1k, elapsed_1k, _ = measure(1024, 300)

    baseline = 1e7  # north-star target (BASELINE.json)
    result = {
        "metric": "log_likelihood_evals_per_sec_per_chip",
        "value": float(value),
        "unit": "evals/s",
        "vs_baseline": float(value / baseline),
        "detail": {
            "workload": "ShockCooling2 x SN2016bkv early LC (149 pts, 9 bands), "
                        "jitted stretch-move ensemble, Chebyshev band tables, "
                        "f32 hot path + f64 epochs",
            "nwalkers": 32768,
            "nsteps": 300,
            "elapsed_s": elapsed,
            "acceptance_check": accept,
            "evals_per_sec_at_1024_walkers": float(value_1k),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
