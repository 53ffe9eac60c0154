"""Flagship LOGO reliability table: exact-refit-backed leave-one-band-out CV.

Produces the VALIDATION.md round-5 table (VERDICT r4 #2): every band of the
flagship ShockCooling2 x SN2016bkv fit whose PSIS pareto_k exceeds 0.7 is
re-scored by exact refit CV (one batched fit_population call over the
leave-one-band-out curves), so the shipped LOGO numbers carry no
self-reportedly-unreliable terms.

Run on CPU: python tools/validate_logo_refit.py
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
from lightcurve_fitting_tpu.fitting import lightcurve_mcmc, information_criteria


def main():
    lc = LC.read(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lightcurve_fitting_tpu", "data",
        "SN2016bkv.csv"))
    lc.meta.update(dm=30.79, redshift=0.002, extinction={
        "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
        "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
    lc.calcAbsMag()
    lc.calcLum()
    early = lc.where(MJD_min=57468.0, MJD_max=57485.0)
    model = ShockCooling2(early)
    priors = [UniformPrior(0.0, 100.0)] * 3 + [UniformPrior(57468.0, 57468.7)]
    # MAP-seeded: the flagship posterior is a thin curved ridge — wide-start
    # ensembles are still contracting after thousands of steps (VALIDATION.md)
    # and an unconverged chain makes every elpd meaningless
    s = lightcurve_mcmc(early, model, priors=priors,
                        p_lo=[20.0, 2.0, 20.0, 57468.5],
                        p_up=[50.0, 5.0, 50.0, 57468.7],
                        nwalkers=128, nsteps=1000, nsteps_burnin=2000,
                        init="map", seed=0, quiet=True, shard=False)
    ic = information_criteria(early, model, s.flatchain, group_by="filter",
                              refit=True, priors=priors,
                              refit_options=dict(nwalkers=64, nsteps=1000,
                                                 nsteps_burnin=1000),
                              seed=0, quiet=False)
    lg = ic["logo"]
    refit = lg.get("refit", {})
    refit_labels = [str(l) for l in np.atleast_1d(refit.get("labels", []))]
    print()
    print("| band | n_pts | pareto_k | elpd (PSIS) | elpd (shipped) | source |")
    print("|---|---|---|---|---|---|")
    labels = np.asarray(early["filter"])
    for j, g in enumerate(lg["groups"]):
        n = int(np.sum(labels == g))
        k = lg["pareto_k"][j]
        shipped = lg["pointwise"][j]
        if str(g) in refit_labels:
            i = refit_labels.index(str(g))
            psis_val = refit["elpd_psis"][i]
            src = "exact refit CV"
        else:
            psis_val = shipped
            src = "PSIS (k <= 0.7)"
        print(f"| {g} | {n} | {k:.2f} | {psis_val:.1f} | {shipped:.1f} | {src} |")
    print()
    print(f"elpd_logo = {lg['elpd_logo']:.1f} +/- {lg['se_elpd_logo']:.1f}; "
          f"{len(refit_labels)} of {len(lg['groups'])} bands refit-backed; "
          f"refit acceptance "
          f"{np.min(refit['acceptance']):.2f}-{np.max(refit['acceptance']):.2f}"
          if refit_labels else
          f"elpd_logo = {lg['elpd_logo']:.1f} +/- {lg['se_elpd_logo']:.1f}; "
          f"all groups PSIS-reliable")


if __name__ == "__main__":
    main()
