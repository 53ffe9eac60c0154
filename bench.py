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

    logpost, _ = _build_logposterior()

    nwalkers = 1024
    nsteps = 1000
    sampler = EnsembleSampler(nwalkers, 4, logpost, seed=0)
    rng = np.random.default_rng(0)
    p0 = rng.uniform([20.0, 2.0, 20.0, 57468.5], [50.0, 5.0, 50.0, 57468.7],
                     size=(nwalkers, 4))

    x = jnp.asarray(p0.reshape(2, nwalkers // 2, 4))
    logp = sampler.batched_logp(x.reshape(-1, 4)).reshape(2, nwalkers // 2)
    run = sampler._compiled_run(nsteps, 1)
    import jax.random as jr
    keys = jr.split(jr.PRNGKey(1), nsteps)

    # warmup (compile + one full run)
    out = run(x, logp, keys)
    jax.block_until_ready(out)

    # timed runs (device-side scan; one dispatch, no host chain transfer)
    times = []
    for i in range(3):
        keys_i = jr.split(jr.PRNGKey(2 + i), nsteps)
        t0 = time.perf_counter()
        out = run(x, logp, keys_i)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    evals = nwalkers * nsteps  # one proposal per walker per step
    value = evals / elapsed
    baseline = 1e7  # north-star target (BASELINE.json)
    result = {
        "metric": "log_likelihood_evals_per_sec_per_chip",
        "value": float(value),
        "unit": "evals/s",
        "vs_baseline": float(value / baseline),
        "detail": {
            "workload": "ShockCooling2 x SN2016bkv early LC (61 pts, 7 bands, native quadrature)",
            "nwalkers": nwalkers,
            "nsteps": nsteps,
            "elapsed_s": elapsed,
            "acceptance_check": float(np.asarray(out[4]).mean()),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
