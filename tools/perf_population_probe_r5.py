"""Round-5 probe: where does survey-scale fit_population time go?

bench.py's population512 section measures 1.1e7 evals/s end-to-end at
S=512 x 64 walkers (32768 total walkers) while the flagship ensemble runs
5.8e7 at the same walker count. This probe splits the end-to-end wall into
(a) host packing, (b) driver overhead around the device calls, and
(c) marginal per-step device cost (interleaved nsteps=1100 vs 2200 runs,
minima compared, per CLAUDE.md's tunnel-drift measurement method), so the
bench detail can document the floor honestly (VERDICT r4 #5).

Run ON CHIP: python tools/perf_population_probe_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from lightcurve_fitting_tpu.core import config
    config.enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.parallel.population import (fit_population,
                                                            pack_population)

    early = bench._flagship_early_lc()
    rng = np.random.default_rng(0)
    S = 512
    lcs, models = [], []
    for s in range(S):
        l = early.copy()
        l["lum"] = np.asarray(l["lum"], float) * rng.uniform(0.9, 1.1)
        lcs.append(l)
        models.append(ShockCooling2(l))
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    base = dict(p_lo=[20.0, 2.0, 20.0, 57468.5], p_up=[50.0, 5.0, 50.0, 57468.7],
                nwalkers=64, nsteps_burnin=100, summaries=True,
                return_chains=False)

    # (a) host packing alone
    t0 = time.perf_counter()
    packed = pack_population(models, lcs)
    jax.block_until_ready(packed["t"])
    t_pack = time.perf_counter() - t0
    print(f"pack_population(S={S}): {t_pack:.3f} s", flush=True)

    def run(nsteps, seed):
        t0 = time.perf_counter()
        _, _, summ = fit_population(models, lcs, priors, seed=seed,
                                    nsteps=nsteps, **base)
        float(np.asarray(summ).mean())
        return time.perf_counter() - t0

    # compile both step counts. 100 vs 2100 production steps: the 20x lever
    # arm keeps the marginal-cost signal above the ~±0.3 s per-call tunnel
    # jitter that made a 1000-vs-2100 comparison go negative.
    run(100, 0)
    run(2100, 0)
    # interleave to ride out tunnel drift; compare minima
    t_1k, t_2k = [], []
    for i in range(3):
        t_1k.append(run(100, 1 + i))
        t_2k.append(run(2100, 1 + i))
    e1, e2 = min(t_1k), min(t_2k)
    steps1, steps2 = 200, 2200
    per_step = (e2 - e1) / (steps2 - steps1)
    fixed = e1 - per_step * steps1
    evals_marginal = S * 64 / per_step
    print(f"end-to-end: {steps1} steps {e1:.3f} s, {steps2} steps {e2:.3f} s",
          flush=True)
    print(f"marginal per-step device cost: {per_step * 1e3:.3f} ms "
          f"({evals_marginal:.3e} evals/s marginal)", flush=True)
    print(f"fixed per-call overhead (host packing + driver + dispatch): "
          f"{fixed:.3f} s ({100 * fixed / e1:.0f}% of the {steps1}-step call)",
          flush=True)
    print(f"[headline comparison] flagship 32768-walker step is ~0.56 ms "
          f"(5.8e7 evals/s); population step is {per_step * 1e3:.2f} ms "
          f"at the same 32768 total walkers", flush=True)


if __name__ == "__main__":
    main()
