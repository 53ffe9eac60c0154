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
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.blackbody import planck_lnu
from ..models.base import intrinsic_scatter_units
from .sampler import make_stretch_kernel

__all__ = ["pack_epochs", "batched_blackbody_mcmc", "batched_map_centers"]

# compiled-kernel cache across calls (population fitting showed per-call
# rebuilds dominating host time; keys include prior content via
# _prior_fingerprint so different priors never share an executable)
_COMPILED_CACHE = {}


def _cache_key(tag, packed, priors, cutoff_freq, use_sigma, sigma_type, *extra):
    from .population import _prior_fingerprint
    return (tag, tuple(_prior_fingerprint(p) for p in priors),
            packed["y"].shape, packed["nodes"].shape, float(cutoff_freq),
            use_sigma, sigma_type) + extra


def _mesh_sig(mesh, axis_name):
    return None if mesh is None else (tuple(mesh.shape.items()), axis_name)


def _pad_epoch_axis(arrays, n_dev):
    """Pad every array's leading (epoch) axis up to a multiple of ``n_dev``
    by repeating the last epoch; padded results are sliced away by the
    caller. Returns (padded_arrays, original_E)."""
    E = arrays[0].shape[0]
    pad = (-E) % n_dev
    if pad == 0:
        return arrays, E
    return [jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
            for a in arrays], E


def _make_epoch_logpost(priors, cutoff_freq, use_sigma, sigma_type, dt):
    """Build ``logpost_for(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e) ->
    logpost(p)`` — the per-epoch blackbody log-posterior shared by the
    batched MCMC kernel and the batched MAP centering stage. Data are
    normalized to O(1) per epoch (TPU float32-range safety); the dropped
    constant only shifts the posterior by a constant."""

    def logpost_for(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e):
        inv_yscale = 1.0 / yscale_e
        y_s = y_e * inv_yscale
        dy_s = dy_e * inv_yscale
        sigma_units = intrinsic_scatter_units(dy_s, sigma_type, mask=mask_e,
                                              dt=dt)
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

        return logpost

    return logpost_for


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


def _epoch_summary(flat, ambient_dtype, dt, nu_emit, trap_w, cutoff_freq, nwalkers):
    """(16, 50, 84)th percentiles of T, R, R^2T^4, and the c2/1e12-scaled
    pseudobolometric integral for one epoch's (S, ndim) production samples —
    the on-device form of ``bolometric._mcmc_record`` (reference
    bolometric.py:786-798; percentile convention of :456-480).

    The Planck trapezoid (~570 frequency points per sample) is chunked over
    the step axis with a ``lax.scan`` so the (S, F) cube never materializes;
    each chunk reuses :func:`..models.blackbody.planck_lnu`, so the device
    integrand is bit-identical in structure to the host ``pseudo`` path
    (sum of trapezoid weights x L_nu; the 1e12 THz measure is applied
    host-side for float32-exponent-range safety)."""
    T = flat[:, 0].astype(ambient_dtype)
    R = flat[:, 1].astype(ambient_dtype)
    v = R * T * T                      # R T^2 <= ~1e7: u = v^2 <= ~1e14, f32-safe
    u = v * v
    dtc = dt if dt is not None else ambient_dtype
    nu_c = nu_emit.astype(dtc)
    w_c = trap_w.astype(dtc)

    def s_chunk(carry, TR):
        T_c, R_c = TR              # (nwalkers,)
        lnu = planck_lnu(nu_c[None, :], T_c[:, None].astype(dtc),
                         R_c[:, None].astype(dtc), cutoff_freq)
        return carry, jnp.sum(w_c * lnu, axis=-1)

    steps_ax = flat.shape[0] // nwalkers
    _, s_steps = jax.lax.scan(
        s_chunk, 0.0, (flat[:, 0].reshape(steps_ax, nwalkers),
                       flat[:, 1].reshape(steps_ax, nwalkers)))
    s = s_steps.reshape(-1).astype(ambient_dtype)
    samples = jnp.stack([T, R, u, s])
    if dt is not None and jnp.dtype(dt) == jnp.float32:
        # accelerator compute dtype: sort-free counting-bisection percentiles
        # (ops/quantile.py; XLA sort is the slow tool on TPU). T/R are exact
        # f32 values already; u/s round at ~6e-8 relative — well inside the
        # 1e-5 host-record parity budget (test_bolometric.py:432).
        from ..ops.quantile import percentile_f32
        return percentile_f32(samples.astype(jnp.float32),
                              [16.0, 50.0, 84.0], axis=1).T.astype(ambient_dtype)
    q = jnp.asarray([16.0, 50.0, 84.0], ambient_dtype)
    return jnp.percentile(samples, q, axis=1).T  # (4, 3)


def batched_blackbody_mcmc(packed, priors, starting_guesses, nwalkers, burnin_steps,
                           steps, cutoff_freq=np.inf, use_sigma=False,
                           sigma_type="relative", a=2.0, seed=0,
                           state_dtype="auto", mesh=None, axis_name="epochs",
                           summaries=None, return_chains=True):
    """Run E independent stretch-move ensembles, one per epoch, in a single
    jitted call.

    ``state_dtype="auto"``: float32 walker state on accelerators — the
    blackbody parameters (T in kK, R in 1000 R_sun, sigma in dy units) are
    O(1)-O(1e3), so f32's 6e-8 relative resolution needs no affine
    rescaling (unlike MJD-scale epochs; see
    ``EnsembleSampler(param_offset=...)``); the likelihood casts to the
    configured compute dtype internally either way.

    ``mesh``: shard the epoch axis across a device mesh (``shard_map``, zero
    collectives — each chip fits its own epochs, the same scale-out shape as
    :func:`..population.fit_population`). Epoch counts that don't divide the
    mesh are padded by repeating the last epoch and sliced back after.

    ``summaries``: dict ``{"z": z, "pseudo_nu": observed-frame 1-THz grid}``
    — additionally compute the posterior summaries ``calculate_bolometric``
    records (reference bolometric.py:786-798) **on device**: equal-tailed 68%
    percentiles of T, R, the Stefan-Boltzmann product R^2 T^4, and the
    c2/1e12-scaled pseudobolometric integral. Percentiles commute with
    positive constant scaling, so the big unit constants (4 pi sigma_sb, the
    1e12 trapezoid THz factor) are applied host-side — device intermediates
    stay inside the emulated-float64 exponent range (see
    ``core.constants``). With ``return_chains=False`` the (E, S, ndim)
    chains never cross the tunnel: measured at 256 epochs x 3200 samples,
    the 6.6 MB chain readback was ~82% of the whole batched-MCMC stage.

    Parameters
    ----------
    packed : output of :func:`pack_epochs`
    starting_guesses : (E, nwalkers, ndim)

    Returns
    -------
    flatchains : (E, steps*nwalkers, ndim) production samples (float64), or
        None when ``return_chains=False``
    acceptance : (E,) mean acceptance fraction
    summary : (E, 4, 3) float64 — rows (T, R, R^2T^4, pseudo/c2/1e12), columns
        (16th, 50th, 84th percentile). Only present when ``summaries`` is set.
    """
    ndim = len(priors)
    if nwalkers % 2:
        raise ValueError("nwalkers must be even")
    half = nwalkers // 2
    E = packed["y"].shape[0]
    if state_dtype == "auto":
        use_f32_state = jax.default_backend() != "cpu"
    else:
        use_f32_state = np.dtype(state_dtype) == np.float32

    from ..core import config
    dt = config.get_compute_dtype()

    logpost_for = _make_epoch_logpost(priors, cutoff_freq, use_sigma, sigma_type, dt)

    summ_sig = None
    if summaries is not None:
        nu_host = (np.asarray(summaries["pseudo_nu"], float)
                   * (1.0 + float(summaries.get("z", 0.0))))
        nu_emit = jnp.asarray(nu_host)
        trap_w = np.ones(nu_host.shape)
        trap_w[0] = trap_w[-1] = 0.5
        trap_w = jnp.asarray(trap_w)
        summ_sig = hash(nu_host.tobytes())

    def run_one(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e, guesses, key):
        logpost = logpost_for(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e)
        step, batched_logp = make_stretch_kernel(logpost, half, ndim, a)
        x = guesses.reshape(2, half, ndim)
        logp = batched_logp(guesses).reshape(2, half)
        keys = jr.split(key, burnin_steps + steps)
        (x, logp), (xs, lps, acc) = jax.lax.scan(step, (x, logp), keys)
        prod = xs[burnin_steps:]  # (steps, 2, half, ndim)
        flat = prod.reshape(steps * nwalkers, ndim)
        acc_mean = acc[burnin_steps:].mean()
        if summaries is None:
            return flat, acc_mean
        return flat, acc_mean, _epoch_summary(flat, y_e.dtype, dt, nu_emit,
                                              trap_w, cutoff_freq, nwalkers)

    keys = jr.split(jr.PRNGKey(seed), E)
    guesses_dev = jnp.asarray(starting_guesses,
                              dtype=jnp.float32 if use_f32_state else None)
    args = [packed["y"], packed["dy"], packed["mask"], packed["nodes"],
            packed["weights"], packed["yscale"], guesses_dev, keys]
    if mesh is not None:
        args, E = _pad_epoch_axis(args, mesh.shape[axis_name])
    n_out = 2 if summaries is None else 3
    ck = _cache_key("mcmc", packed, priors, cutoff_freq, use_sigma, sigma_type,
                    nwalkers, burnin_steps, steps, a, dt, use_f32_state,
                    _mesh_sig(mesh, axis_name), args[0].shape[0], summ_sig)
    run_all = _COMPILED_CACHE.get(ck)
    if run_all is None:
        run_all = jax.vmap(run_one)
        if mesh is not None:
            spec = P(axis_name)
            run_all = shard_map(run_all, mesh=mesh, in_specs=(spec,) * 8,
                                out_specs=(spec,) * n_out, check_vma=False)
        run_all = jax.jit(run_all)
        _COMPILED_CACHE[ck] = run_all
    out = run_all(*args)
    if summaries is None:
        flat, acc = out
        return np.asarray(flat[:E], np.float64), np.asarray(acc[:E])
    flat, acc, summ = out
    chains = np.asarray(flat[:E], np.float64) if return_chains else None
    return chains, np.asarray(acc[:E]), np.asarray(summ[:E], np.float64)


def batched_map_centers(packed, priors, cutoff_freq=np.inf, use_sigma=False,
                        sigma_type="relative", n_starts=8, n_iter=300, seed=0,
                        fallback=None, n_cloud=512, mesh=None,
                        axis_name="epochs"):
    """MAP centers for every epoch at once, replacing the serial per-epoch
    scipy ``curve_fit`` centering loop of round 2 (bolometric.py batch mode;
    reference bolometric.py:483-534 is the sequential analog).

    One fused device kernel per epoch (vmapped over epochs):

    1. **Scored cloud**: draw ``n_cloud`` log-uniform candidates with the
       on-device PRNG, evaluate the posterior at each, and ``lax.top_k`` the
       best ``n_starts``. Pure gradient ascent from random starts is
       unreliable here — the blackbody (T, R) posterior has a curved
       Rayleigh-Jeans valley (low-T/huge-R fits optical SEDs deceptively
       well) that traps Adam.
    2. **Adam polish**: ``n_starts`` ascents of the bounds-bijected
       posterior in one scan, then pick the best start.

    Fusing both stages keeps the cloud and its scores on device: round 2's
    two-call version shipped the (E, n_cloud, ndim) cloud up and the
    (E, n_cloud) scores back for a host top-k, and those ~MB transfers
    dominated the centering wall time through the TPU tunnel (~half the
    whole batched pipeline); only the final (E, ndim) centers transfer now.

    Epochs where every start ends non-finite fall back to ``fallback``
    (default: T=10 kK, R=10 kR_sun, sigma=1) — the same degrade-don't-crash
    semantics as the curve_fit RuntimeError path (reference :767-771).

    ``mesh``: shard the epoch axis across a device mesh (zero-collective
    ``shard_map``, same shape as :func:`batched_blackbody_mcmc`;
    non-divisible epoch counts are padded).

    Returns centers (E, ndim) float64 numpy.
    """
    import optax
    from .hmc import BoundsTransform

    ndim = len(priors)
    E = packed["y"].shape[0]
    if fallback is None:
        fallback = np.array([10.0, 10.0] + ([1.0] if use_sigma else []))

    from ..core import config
    dt = config.get_compute_dtype()
    logpost_for = _make_epoch_logpost(priors, cutoff_freq, use_sigma, sigma_type, dt)
    lo = np.array([getattr(p, "p_min", -np.inf) for p in priors])
    up = np.array([getattr(p, "p_max", np.inf) for p in priors])
    bounds = BoundsTransform(lo, up)
    # candidate box: prior support clipped to a generous physical window;
    # log-uniform sampling covers the decades evenly (T and R priors span
    # 2-5 decades)
    lo = np.where(np.isfinite(lo), np.maximum(lo, 1e-6), 0.1)
    up = np.where(np.isfinite(up), up, 100.0)
    log_lo, log_up = np.log(lo), np.log(up)

    keys = jr.split(jr.PRNGKey(seed), E)
    data = [packed["y"], packed["dy"], packed["mask"], packed["nodes"],
            packed["weights"], packed["yscale"]]
    if mesh is not None:
        (keys, *data), _ = _pad_epoch_axis([keys] + data,
                                           mesh.shape[axis_name])
    Ep = keys.shape[0]
    msig = _mesh_sig(mesh, axis_name)

    schedule = optax.cosine_decay_schedule(0.05, n_iter, alpha=0.01)
    opt = optax.adam(schedule)

    def center_one(key_e, y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e):
        lp = logpost_for(y_e, dy_e, mask_e, nodes_e, weights_e, yscale_e)
        cloud = jnp.exp(jr.uniform(key_e, (n_cloud, ndim))
                        * (log_up - log_lo) + log_lo)
        scores = jax.vmap(lp)(cloud)
        scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
        _, top = jax.lax.top_k(scores, n_starts)
        u0 = bounds.to_unbounded_jax(cloud[top])

        def neg(u1):
            return -lp(bounds.to_bounded(u1))

        vg = jax.vmap(jax.value_and_grad(neg))

        def step(carry, _):
            u, state = carry
            _, g = vg(u)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, u)
            return (optax.apply_updates(u, updates), state), None

        (u, _), _ = jax.lax.scan(step, (u0, opt.init(u0)), None, length=n_iter)
        neg_fin, _ = vg(u)
        neg_fin = jnp.where(jnp.isfinite(neg_fin), neg_fin, jnp.inf)
        best = jnp.argmin(neg_fin)
        return bounds.to_bounded(u[best]), jnp.isfinite(neg_fin[best])

    key = _cache_key("center", packed, priors, cutoff_freq, use_sigma,
                     sigma_type, dt, msig, Ep, n_cloud, n_starts, n_iter)
    center_all = _COMPILED_CACHE.get(key)
    if center_all is None:
        center_all = jax.vmap(center_one)
        if mesh is not None:
            spec = P(axis_name)
            center_all = shard_map(center_all, mesh=mesh,
                                   in_specs=(spec,) * 7,
                                   out_specs=(spec, spec), check_vma=False)
        center_all = jax.jit(center_all)
        _COMPILED_CACHE[key] = center_all

    centers_dev, alive = center_all(keys, *data)
    centers = np.asarray(centers_dev, np.float64)[:E]
    dead = ~np.asarray(alive)[:E]
    if dead.any():
        centers = np.where(dead[:, None], fallback, centers)
    return centers
