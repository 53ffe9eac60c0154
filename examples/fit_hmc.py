#!/usr/bin/env python
"""Gradient-based HMC on the SN 2016bkv ShockCooling2 posterior — inference the
reference package cannot perform (its numpy models are not differentiable).
Uses soft Gaussian priors so gradients exist everywhere HMC explores; compare
with the stretch-move ensemble result from examples/fit_sn2016bkv.py.

Run: python examples/fit_hmc.py
"""

import os

import numpy as np

from lightcurve_fitting_tpu.lightcurve import LC
from lightcurve_fitting_tpu.models import ShockCooling2, GaussianPrior
from lightcurve_fitting_tpu.fitting import make_log_posterior
from lightcurve_fitting_tpu.parallel import HMCSampler, split_rhat, summarize_chain

lc = LC.read(os.path.join(os.path.dirname(__file__), "..",
                          "lightcurve_fitting_tpu", "data", "SN2016bkv.csv"))
lc.meta.update(dm=30.79, redshift=0.002, extinction={
    "U": 0.069, "B": 0.061, "g": 0.055, "V": 0.045, "0": 0.035,
    "r": 0.038, "R": 0.035, "i": 0.028, "I": 0.020})
lc.calcAbsMag()
lc.calcLum()
lc_early = lc.where(MJD_min=57468.0, MJD_max=57485.0)

model = ShockCooling2(lc_early)
priors = [GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(0.0, 100.0, 4.0, 3.0),
          GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(57468.0, 57468.7, 57468.5, 0.2)]
logpost = make_log_posterior(model, lc_early, priors)

nchains = 16
rng = np.random.default_rng(0)
x0 = np.array([30.0, 4.0, 30.0, 57468.6]) + rng.normal(size=(nchains, 4)) * [2, 0.5, 3, 0.03]
# rough per-parameter scales (from a short ensemble run or the prior widths)
scales = [0.2, 0.07, 0.15, 2e-4]
sampler = HMCSampler(nchains, 4, logpost, n_leapfrog=16, init_scales=scales, seed=1)
sampler.run_mcmc(x0, n_samples=1000, n_warmup=800)

print("adapted step size:", sampler.step_size)
print("mean acceptance:", sampler.acceptance_fraction.mean())
print("R-hat (independent chains -> meaningful here):",
      np.round(split_rhat(sampler._chain), 3))
print(summarize_chain(sampler._chain, names=["T_1", "L_1", "t_tr", "t_0"]))
