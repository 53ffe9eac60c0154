"""Batched per-epoch blackbody MCMC: every epoch's SED fit runs concurrently.

The reference fits epochs in a sequential Python loop (bolometric.py:735), each
epoch paying its own emcee run. Here the epoch axis becomes a ``vmap`` around
one stretch-move scan: epochs are padded to the widest band count with
zero-weight masks, and E independent ensembles advance in lockstep inside a
single jit-compiled kernel — on TPU the (epochs x walkers x bands x nodes)
Planck cube is one fused batched computation per step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from ..models.blackbody import planck_lnu
from .sampler import make_stretch_kernel

__all__ = ["pack_epochs", "batched_blackbody_mcmc"]


def pack_epochs(epochs, bank, z=0.0):
    """Pad a list of single-epoch LC tables into dense arrays.

    Returns dict with y (E, B), dy (E, B), mask (E, B) [True = real band],
    nodes (E, B, K), weights (E, B, K) — padded bands get zero weights and
    mask False, so they contribute nothing to the likelihood.
    """
    E = len(epochs)
    B = max(len(e) for e in epochs)
    K = bank.n_nodes
    y = np.zeros((E, B))
    dy = np.ones((E, B))
    mask = np.zeros((E, B), bool)
    nodes = np.ones((E, B, K))
    weights = np.zeros((E, B, K))
    emitted = bank.emitted_nodes(z)
    for e, ep in enumerate(epochs):
        ids = bank.band_ids(list(ep["filter"]))
        nb = len(ids)
        y[e, :nb] = np.asarray(ep["lum"], float)
        dy[e, :nb] = np.asarray(ep["dlum"], float)
        mask[e, :nb] = True
        nodes[e, :nb] = emitted[ids]
        weights[e, :nb] = bank.weights[ids]
        nodes[e, nb:] = emitted[ids[0] if nb else 0][-1]
    yscale = np.array([np.median(np.abs(yy[np.abs(yy) > 0])) if np.any(yy != 0) else 1.0
                       for yy in y])
    return {"y": jnp.asarray(y), "dy": jnp.asarray(dy), "mask": jnp.asarray(mask),
            "nodes": jnp.asarray(nodes), "weights": jnp.asarray(weights),
            "yscale": jnp.asarray(yscale)}


def batched_blackbody_mcmc(packed, priors, starting_guesses, nwalkers, burnin_steps,
                           steps, cutoff_freq=np.inf, use_sigma=False,
                           sigma_type="relative", a=2.0, seed=0):
    """Run E independent stretch-move ensembles, one per epoch, in a single
    jitted call.

    Parameters
    ----------
    packed : output of :func:`pack_epochs`
    starting_guesses : (E, nwalkers, ndim)

    Returns
    -------
    flatchains : (E, steps*nwalkers, ndim) production samples
    acceptance : (E,) mean acceptance fraction
    """
    ndim = len(priors)
    half = nwalkers // 2
    E = packed["y"].shape[0]

    from ..core import config
    dt = config.get_compute_dtype()

    def run_one(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e, guesses, key):
        # data normalized to O(1) per epoch (TPU float32-range safety); the
        # dropped constant only shifts the posterior by a constant
        inv_yscale = 1.0 / yscale_e
        y_s = y_e * inv_yscale
        dy_s = dy_e * inv_yscale
        if sigma_type == "relative":
            sigma_units = dy_s if dt is None else dy_s.astype(dt)
        else:
            # median over real bands only
            med = jnp.nanmedian(jnp.where(mask_e, dy_s, jnp.nan))
            sigma_units = med if dt is None else med.astype(dt)
        log_norm = -0.5 * jnp.sum(jnp.where(mask_e, jnp.log(2 * jnp.pi * dy_s ** 2.0), 0.0))
        yn_h = y_s if dt is None else y_s.astype(dt)
        dyn_h = dy_s if dt is None else dy_s.astype(dt)
        inv_dyn = jnp.where(mask_e, 1.0 / dyn_h, 0.0)
        inv_h = inv_yscale if dt is None else inv_yscale.astype(dt)

        def logpost(p):
            log_prior = 0.0
            for i, prior in enumerate(priors):
                log_prior = log_prior + prior(p[i])
            lnu = planck_lnu(nodes_e if dt is None else nodes_e.astype(dt),
                             p[0] if dt is None else p[0].astype(dt),
                             p[1] if dt is None else p[1].astype(dt), cutoff_freq)
            y_fit = jnp.sum((weights_e if dt is None else weights_e.astype(dt)) * lnu,
                            axis=-1) * inv_h
            if use_sigma:
                sig = p[-1] if dt is None else p[-1].astype(dt)
                sigma2 = dyn_h ** 2.0 + (sig * sigma_units) ** 2.0
                terms = jnp.log(2 * jnp.pi * sigma2) + (yn_h - y_fit) ** 2.0 / sigma2
                ll = -0.5 * jnp.sum(jnp.where(mask_e, terms, 0.0))
            else:
                r = (yn_h - y_fit) * inv_dyn
                ll = -0.5 * jnp.sum(r * r) + log_norm
            ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
            return jnp.where(jnp.isfinite(log_prior), log_prior + ll, -jnp.inf)

        step, batched_logp = make_stretch_kernel(logpost, half, ndim, a)
        x = guesses.reshape(2, half, ndim)
        logp = batched_logp(guesses).reshape(2, half)
        keys = jr.split(key, burnin_steps + steps)
        (x, logp), (xs, lps, acc) = jax.lax.scan(step, (x, logp), keys)
        prod = xs[burnin_steps:]  # (steps, 2, half, ndim)
        return prod.reshape(steps * nwalkers, ndim), acc[burnin_steps:].mean()

    keys = jr.split(jr.PRNGKey(seed), E)
    run_all = jax.jit(jax.vmap(run_one))
    flat, acc = run_all(packed["y"], packed["dy"], packed["mask"], packed["nodes"],
                        packed["weights"], packed["yscale"],
                        jnp.asarray(starting_guesses), keys)
    return np.asarray(flat), np.asarray(acc)
