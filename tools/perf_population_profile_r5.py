"""Round-5 probe: per-kernel profile of the survey-scale population step.

tools/perf_population_probe_r5.py measured the S=512 x 64-walker population
step at ~1.13 ms marginal vs the flagship's ~0.56 ms at the same 32768 total
walkers. This traces both workloads with jax.profiler (works through the
tunnel per CLAUDE.md) and prints the top device ops by total duration so the
gap can be attributed (fusion splits? RNG? chain stores?) instead of guessed.

Run ON CHIP: python tools/perf_population_profile_r5.py
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def top_ops(trace_dir, n=14):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # keep device-lane complete events; drop host/python lanes by pid name
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    by_name = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = pid_names.get(e.get("pid"), "")
        if "TPU" not in lane and "/device:" not in lane and "XLA" not in lane:
            continue
        nm = e["name"]
        agg = by_name.setdefault(nm, [0.0, 0])
        agg[0] += e["dur"]
        agg[1] += 1
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:n]
    tot = sum(v[0] for v in by_name.values())
    print(f"  total device time {tot / 1e3:.2f} ms over {len(by_name)} op names")
    for nm, (dur, cnt) in rows:
        print(f"  {dur / 1e3:9.3f} ms  x{cnt:5d}  {nm[:95]}")
    return tot


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from lightcurve_fitting_tpu.core import config
    config.enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    import bench
    from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
    from lightcurve_fitting_tpu.parallel.population import fit_population
    from lightcurve_fitting_tpu.fitting import lightcurve_mcmc

    early = bench._flagship_early_lc()
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    NSTEPS = 200

    # --- flagship: one 32768-walker ensemble, same eval count per step
    def run_flagship(seed):
        s = lightcurve_mcmc(early, ShockCooling2(early), priors=priors,
                            p_lo=[20, 2, 20, 57468.5], p_up=[50, 5, 50, 57468.7],
                            nwalkers=32768, nsteps=NSTEPS, nsteps_burnin=0,
                            seed=seed)
        return float(np.asarray(s.flatchain[-1]).sum())

    rng = np.random.default_rng(0)
    S = 512
    lcs, models = [], []
    for _ in range(S):
        l = early.copy()
        l["lum"] = np.asarray(l["lum"], float) * rng.uniform(0.9, 1.1)
        lcs.append(l)
        models.append(ShockCooling2(l))

    def run_population(seed):
        _, _, summ = fit_population(
            models, lcs, priors, seed=seed,
            p_lo=[20.0, 2.0, 20.0, 57468.5], p_up=[50.0, 5.0, 50.0, 57468.7],
            nwalkers=64, nsteps=NSTEPS, nsteps_burnin=0,
            summaries=True, return_chains=False)
        return float(np.asarray(summ).mean())

    # compile outside the trace
    run_flagship(0)
    run_population(0)

    for tag, fn in [("flagship_32768x1", run_flagship),
                    ("population_512x64", run_population)]:
        d = f"/tmp/lcf_prof_{tag}"
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            fn(1)
        wall = time.perf_counter() - t0
        print(f"\n{tag}: {NSTEPS} steps wall {wall:.3f} s "
              f"({wall / NSTEPS * 1e3:.3f} ms/step incl dispatch)", flush=True)
        top_ops(d)


if __name__ == "__main__":
    main()
