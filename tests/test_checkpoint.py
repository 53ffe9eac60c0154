"""Driver-level checkpoint/resume: a killed fit resumed from its checkpoint
reproduces the uninterrupted chain EXACTLY (round-2 verdict item 2; SURVEY.md
§5 names "true resume" as the aux target — the reference can only save final
flatchains, reference fitting.py:146-148).

Exactness is guaranteed by the index-folded RNG schedule: per-step keys are
``fold_in(base_key, global_step_index)``, so chains are identical however a
run is segmented (one scan, progress segments, checkpoint_every restarts,
kill-and-resume)."""

import os

import matplotlib
matplotlib.use("Agg")
import numpy as np
import pytest

from lightcurve_fitting_tpu.models import ShockCooling2, UniformPrior
from lightcurve_fitting_tpu.fitting import (lightcurve_mcmc, lightcurve_evidence,
                                            lightcurve_ptmcmc)
from test_fitting_e2e import load_early_lc, PRIORS, P_LO, P_UP

FIT_KW = dict(priors=PRIORS, p_lo=P_LO, p_up=P_UP, nwalkers=16, nsteps=40,
              nsteps_burnin=30, seed=5, quiet=True)


@pytest.fixture(scope="module")
def lc_early():
    return load_early_lc()


def test_mcmc_kill_and_resume_exact(lc_early, tmp_path, monkeypatch):
    """Kill the fit mid-burn-in (after the 2nd checkpoint save) and resume:
    the final flatchain equals the uninterrupted run's bit-for-bit."""
    from lightcurve_fitting_tpu.parallel.sampler import EnsembleSampler

    model = ShockCooling2(lc_early)
    ref = lightcurve_mcmc(lc_early, model, **FIT_KW)

    ck = str(tmp_path / "fit.npz")
    saves = []
    orig = EnsembleSampler.save_checkpoint

    def killing_save(self, filename, **kw):
        orig(self, filename, **kw)
        saves.append(1)
        if len(saves) == 2:
            raise KeyboardInterrupt  # simulated kill mid-burn-in

    monkeypatch.setattr(EnsembleSampler, "save_checkpoint", killing_save)
    with pytest.raises(KeyboardInterrupt):
        lightcurve_mcmc(lc_early, ShockCooling2(lc_early), checkpoint_every=10,
                        checkpoint_file=ck, **FIT_KW)
    monkeypatch.setattr(EnsembleSampler, "save_checkpoint", orig)

    resumed = lightcurve_mcmc(lc_early, ShockCooling2(lc_early),
                              checkpoint_every=10, checkpoint_file=ck,
                              resume_from=ck, **FIT_KW)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)
    np.testing.assert_array_equal(resumed.flatlnprobability, ref.flatlnprobability)


def test_mcmc_resume_mid_production(lc_early, tmp_path):
    """A checkpoint written mid-production (emulated by a shorter nsteps run)
    resumes into the full-length run and matches it exactly."""
    model = ShockCooling2(lc_early)
    ref = lightcurve_mcmc(lc_early, model, **FIT_KW)

    ck = str(tmp_path / "fit.npz")
    short = dict(FIT_KW, nsteps=15)
    lightcurve_mcmc(lc_early, ShockCooling2(lc_early), checkpoint_every=15,
                    checkpoint_file=ck, **short)
    resumed = lightcurve_mcmc(lc_early, ShockCooling2(lc_early),
                              resume_from=ck, **FIT_KW)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)


def test_mcmc_resume_validates_burnin_and_shapes(lc_early, tmp_path):
    ck = str(tmp_path / "fit.npz")
    lightcurve_mcmc(lc_early, ShockCooling2(lc_early), checkpoint_every=30,
                    checkpoint_file=ck, **dict(FIT_KW, nsteps=5))
    with pytest.raises(ValueError, match="nsteps_burnin"):
        lightcurve_mcmc(lc_early, ShockCooling2(lc_early), resume_from=ck,
                        **dict(FIT_KW, nsteps_burnin=77))
    with pytest.raises(ValueError, match="checkpoint shape mismatch"):
        lightcurve_mcmc(lc_early, ShockCooling2(lc_early), resume_from=ck,
                        **dict(FIT_KW, nwalkers=32))
    with pytest.raises(ValueError, match="requires checkpoint_file"):
        lightcurve_mcmc(lc_early, ShockCooling2(lc_early), checkpoint_every=10,
                        **FIT_KW)


EV_KW = dict(nwalkers=16, n_rungs=6, nsteps=30, nsteps_burnin=20, seed=2,
             quiet=True, p_lo=P_LO, p_up=P_UP)


def test_evidence_kill_and_resume_exact(lc_early, tmp_path):
    """The tempered ladder (evidence + PT share it) checkpoints all rung
    walkers + partial rung sums and resumes to the identical log Z."""
    model = ShockCooling2(lc_early)
    ref_z, ref_err, ref_info = lightcurve_evidence(lc_early, model, PRIORS, **EV_KW)

    ck = str(tmp_path / "ladder.npz")
    # emulate a kill at step 35 of 50: the truncated run's final checkpoint
    # IS the mid-run state of the full run (index-folded keys)
    lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                        checkpoint_every=15, checkpoint_file=ck,
                        **dict(EV_KW, nsteps=15))
    z, err, info = lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                                       resume_from=ck, **EV_KW)
    assert z == ref_z
    assert err == ref_err
    np.testing.assert_array_equal(info["rung_terms"], ref_info["rung_terms"])
    # wrong seed is rejected (the stream would not continue)
    with pytest.raises(ValueError, match="seed"):
        lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                            resume_from=ck, **dict(EV_KW, seed=3))


def test_ptmcmc_checkpoint_roundtrip(lc_early, tmp_path):
    """lightcurve_ptmcmc shares the ladder checkpointing: resumed cold chain
    equals the uninterrupted one."""
    model = ShockCooling2(lc_early)
    ref = lightcurve_ptmcmc(lc_early, model, PRIORS, **EV_KW)
    ck = str(tmp_path / "pt.npz")
    lightcurve_ptmcmc(lc_early, ShockCooling2(lc_early), PRIORS,
                      checkpoint_every=10, checkpoint_file=ck,
                      **dict(EV_KW, nsteps=10))
    resumed = lightcurve_ptmcmc(lc_early, ShockCooling2(lc_early), PRIORS,
                                resume_from=ck, **EV_KW)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)
    assert resumed.log_z == ref.log_z


def test_hmc_kill_and_resume_exact(lc_early, tmp_path):
    """lightcurve_hmc checkpoints after adaptation and resumes production
    bit-identically (the whitening map rides in the checkpoint; per-step
    keys fold the global sample index)."""
    from lightcurve_fitting_tpu.fitting import lightcurve_hmc
    from lightcurve_fitting_tpu.models import GaussianPrior

    gp = [GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(0.0, 100.0, 4.0, 3.0),
          GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(57468.0, 57468.7, 57468.5, 0.2)]
    kw = dict(nchains=4, nsamples=24, n_warmup=50, max_depth=6,
              warmup_walkers=32, warmup_steps=60, seed=3, quiet=True)

    model = ShockCooling2(lc_early)
    ref = lightcurve_hmc(lc_early, model, gp, **kw)

    ck = str(tmp_path / "hmc.npz")
    # 'kill' after 8 of 24 production samples: the truncated run's checkpoint
    # is the mid-run state of the full run
    lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp, checkpoint_every=8,
                   checkpoint_file=ck, **dict(kw, nsamples=8))
    resumed = lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp,
                             resume_from=ck, **kw)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)
    # sampler-type mismatch is rejected
    with pytest.raises(ValueError, match="nuts run"):
        lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp, resume_from=ck,
                       sampler="hmc", **{k: v for k, v in kw.items()})
