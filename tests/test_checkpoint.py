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


def test_checkpoint_file_without_npz_extension(lc_early, tmp_path):
    """np.savez silently appends '.npz' to bare paths, which would break
    resume_from with the exact configured name; the atomic writer uses the
    name verbatim (review finding, round 3)."""
    ck = str(tmp_path / "run.ckpt")
    lightcurve_mcmc(lc_early, ShockCooling2(lc_early), checkpoint_every=20,
                    checkpoint_file=ck, **dict(FIT_KW, nsteps=20))
    assert os.path.exists(ck)
    assert not os.path.exists(ck + ".npz")
    ref = lightcurve_mcmc(lc_early, ShockCooling2(lc_early), **FIT_KW)
    resumed = lightcurve_mcmc(lc_early, ShockCooling2(lc_early),
                              resume_from=ck, **FIT_KW)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)


def test_ladder_checkpoints_off_cadence_burnin(lc_early, tmp_path):
    """checkpoint_every saves after EVERY segment even when nsteps_burnin is
    not a multiple of it (the round-3 review caught a modulo condition that
    silently stopped saving once segment boundaries drifted off-cadence)."""
    ck = str(tmp_path / "ladder.npz")
    kw = dict(EV_KW, nsteps_burnin=20)  # 20 % 15 != 0
    ref_z, _, ref_info = lightcurve_evidence(lc_early, ShockCooling2(lc_early),
                                             PRIORS, **kw)
    # truncated run: segments end at 15 (burn), 20 (burn end), 35, 40 —
    # every boundary must save; mtime advances past the 15-step save
    import time
    lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                        checkpoint_every=15, checkpoint_file=ck,
                        **dict(kw, nsteps=20))
    data = np.load(ck)
    assert int(data["steps_done"]) == 40  # saved at the LAST segment, not 15
    z, _, info = lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                                     resume_from=ck, **kw)
    assert z == ref_z
    # a mismatched ladder is rejected (different n_rungs changes the shape;
    # an equal-length ladder with different betas trips the betas check)
    with pytest.raises(ValueError, match="ladder"):
        lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                            resume_from=ck, **dict(kw, n_rungs=5))
    data2 = dict(np.load(ck))
    data2["betas"] = np.asarray(data2["betas"]) * 0.99
    from lightcurve_fitting_tpu.utils.checkpoint_io import atomic_savez
    atomic_savez(ck, **data2)
    with pytest.raises(ValueError, match="beta ladder"):
        lightcurve_evidence(lc_early, ShockCooling2(lc_early), PRIORS,
                            resume_from=ck, **kw)


def test_auto_store_dtype_sticks_across_resume(tmp_path, monkeypatch):
    """A resumed run adopts the checkpoint's auto-downcast f32 chain storage
    instead of silently emitting f64 blocks (which would both break the
    memory bound and promote the concatenated history)."""
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.parallel import sampler as sampler_mod

    def logp(p):
        return -0.5 * jnp.sum(p ** 2)

    monkeypatch.setattr(sampler_mod, "_AUTO_STORE_BYTES", 10_000)
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(16, 2))

    ref = sampler_mod.EnsembleSampler(16, 2, logp, seed=2)
    ref.run_mcmc(p0, 80)

    s = sampler_mod.EnsembleSampler(16, 2, logp, seed=2)
    s.run_mcmc(p0, 30)
    assert s._chain.dtype == np.float32
    path = str(tmp_path / "auto.npz")
    s.save_checkpoint(path)

    monkeypatch.setattr(sampler_mod, "_AUTO_STORE_BYTES", 1e18)  # resume under the bound
    s2 = sampler_mod.EnsembleSampler(16, 2, logp, seed=2)
    s2.load_checkpoint(path)
    s2.run_mcmc(None, 50)
    assert s2._chain.dtype == np.float32
    np.testing.assert_array_equal(s2.flatchain, ref.flatchain)


def test_state_rescaling_window_edges_stay_inside():
    """The rescaling inflates the scale so f32-rounded window-edge draws
    reconstruct strictly inside (p_lo, p_up) — open-interval priors at the
    window bounds must not see -inf starts."""
    from lightcurve_fitting_tpu.fitting import _state_rescaling

    p_lo = np.array([0.0, 57468.5])
    p_up = np.array([100.0, 57468.7])
    kw = _state_rescaling(np.float32, p_lo, p_up)
    o, s = kw["param_offset"], kw["param_scale"]
    for edge in (p_lo, p_up):
        q32 = np.float32((edge - o) / s)      # what the f32 state would hold
        back = o + s * np.asarray(q32, np.float64)
        assert np.all(back > p_lo - 1e-30)
        assert np.all(back < p_up + 1e-30)
        assert np.all((back > p_lo) | (edge == p_lo))
        assert np.all((back < p_up) | (edge == p_up))
        # strictly inside even for the exact-edge draw
        assert np.all(back[edge == p_up] < p_up[edge == p_up])
        assert np.all(back[edge == p_lo] > p_lo[edge == p_lo])


def test_sharded_sampler_checkpoint_roundtrip(tmp_path):
    """ShardedEnsembleSampler resume re-places the restored walkers through
    _prepare_state (device_put onto the mesh) and continues exactly."""
    import jax.numpy as jnp
    from lightcurve_fitting_tpu.parallel.mesh import (ShardedEnsembleSampler,
                                                      walker_mesh)

    def logp(p):
        return -0.5 * jnp.sum(p ** 2)

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(32, 3))
    mesh = walker_mesh(8)

    ref = ShardedEnsembleSampler(32, 3, logp, mesh=mesh, seed=6)
    ref.run_mcmc(p0, 60)

    s = ShardedEnsembleSampler(32, 3, logp, mesh=mesh, seed=6)
    s.run_mcmc(p0, 25)
    path = str(tmp_path / "sh.npz")
    s.save_checkpoint(path)
    s2 = ShardedEnsembleSampler(32, 3, logp, mesh=mesh, seed=6)
    s2.load_checkpoint(path)
    s2.run_mcmc(None, 35)
    np.testing.assert_array_equal(s2.flatchain, ref.flatchain)


def test_hmc_mesh_plus_resume(lc_early, tmp_path):
    """lightcurve_hmc(mesh=) and checkpoint/resume compose: the resumed
    sharded run continues the original exactly."""
    from lightcurve_fitting_tpu.fitting import lightcurve_hmc
    from lightcurve_fitting_tpu.models import GaussianPrior
    from lightcurve_fitting_tpu.parallel.mesh import walker_mesh

    gp = [GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(0.0, 100.0, 4.0, 3.0),
          GaussianPrior(0.0, 100.0, 30.0, 15.0),
          GaussianPrior(57468.0, 57468.7, 57468.5, 0.2)]
    mesh = walker_mesh(axis_name="chains")
    kw = dict(nchains=8, nsamples=16, n_warmup=40, max_depth=5,
              warmup_walkers=32, warmup_steps=50, seed=4, quiet=True, mesh=mesh)
    ref = lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp, **kw)
    ck = str(tmp_path / "hmcm.npz")
    lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp, checkpoint_every=8,
                   checkpoint_file=ck, **dict(kw, nsamples=8))
    resumed = lightcurve_hmc(lc_early, ShockCooling2(lc_early), gp,
                             resume_from=ck, **kw)
    np.testing.assert_array_equal(resumed.flatchain, ref.flatchain)
