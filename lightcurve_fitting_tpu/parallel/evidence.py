"""Bayesian evidence (marginal likelihood) by stepping-stone sampling.

The reference offers no model-comparison machinery at all; posterior fits of
ShockCooling vs ShockCooling2 vs ShockCooling4 can only be compared by eye.
The stepping-stone estimator (Xie et al. 2011) computes

    log Z = sum_k log E_{p_k}[ L^(b_{k+1} - b_k) ],
    p_k(theta) ∝ pi(theta) L(theta)^(b_k)

from samples of a ladder of K power posteriors. On TPU the whole ladder is
*one* compiled kernel: the K tempered ensembles differ only by the scalar
``beta`` in their acceptance ratio, so they batch into a single vmapped
stretch-move scan — the same amortization trick as
``EnsembleSampler(replicas=...)``, making evidence roughly as cheap as one
posterior fit per rung count instead of K sequential fits.

The ladder uses the standard quantiles of Beta(0.3, 1) (beta_k = (k/K)^(1/0.3)),
which concentrates rungs near beta = 0 where the integrand varies fastest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

__all__ = ["stepping_stone_evidence", "make_beta_ladder"]


def make_beta_ladder(n_rungs, alpha=0.3):
    """K+1 inverse temperatures 0 = b_0 < ... < b_K = 1, Beta(alpha, 1)
    quantiles (Xie et al. 2011's recommended schedule)."""
    return (np.arange(n_rungs + 1) / n_rungs) ** (1.0 / alpha)


def _make_tempered_step(log_prior_fn, log_like_fn, half, ndim, betas, a=2.0):
    """One stretch-move step of all K tempered ensembles at once.

    carry: x (K, 2, half, ndim), logpri (K, 2, half), logl (K, 2, half).
    The log-likelihood is tracked separately from the prior so (a) each rung's
    acceptance uses logpri + beta_k * logl and (b) the production pass can
    record logl samples for the stepping-stone average without re-evaluating.
    """
    batched_pri = jax.vmap(log_prior_fn)
    batched_ll = jax.vmap(log_like_fn)
    betas = jnp.asarray(betas)

    def half_update(key, beta, x_move, x_other, logpri_move, logl_move):
        kz, kj, ku = jr.split(key, 3)
        u = jr.uniform(kz, (half,), dtype=x_move.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        j = jr.randint(kj, (half,), 0, half)
        if half <= 128 and jax.default_backend() != "cpu":
            sel = jax.nn.one_hot(j, half, dtype=x_move.dtype)
            x_j = sel @ x_other
        else:
            x_j = x_other[j]
        y = x_j + z[:, None] * (x_move - x_j)
        logpri_y = batched_pri(y)
        logl_y = batched_ll(y)
        logl_y = jnp.where(jnp.isnan(logl_y), -jnp.inf, logl_y)
        # beta = 0 rungs sample the bare prior: 0 * (-inf) would poison them
        blogl_y = jnp.where(beta > 0.0, beta * logl_y, 0.0)
        blogl_move = jnp.where(beta > 0.0, beta * logl_move, 0.0)
        log_ratio = (ndim - 1.0) * jnp.log(z) \
            + logpri_y + blogl_y - logpri_move - blogl_move
        accept = jnp.log(jr.uniform(ku, (half,), dtype=x_move.dtype)) < log_ratio
        x_new = jnp.where(accept[:, None], y, x_move)
        return (x_new, jnp.where(accept, logpri_y, logpri_move),
                jnp.where(accept, logl_y, logl_move), accept)

    def step_one(beta, x, logpri, logl, key):
        k1, k2 = jr.split(key)
        x0, p0, l0, a0 = half_update(k1, beta, x[0], x[1], logpri[0], logl[0])
        x1, p1, l1, a1 = half_update(k2, beta, x[1], x0, logpri[1], logl[1])
        return (jnp.stack([x0, x1]), jnp.stack([p0, p1]), jnp.stack([l0, l1]),
                jnp.stack([a0, a1]))

    v_step = jax.vmap(step_one, in_axes=(0, 0, 0, 0, 0))

    def step(carry, keys):
        x, logpri, logl = carry
        x, logpri, logl, accept = v_step(betas, x, logpri, logl, keys)
        return (x, logpri, logl), (logl, accept)

    return step, batched_pri, batched_ll


def stepping_stone_evidence(log_prior_fn, log_like_fn, p0, n_rungs=32,
                            nsteps=500, nsteps_burnin=500, alpha=0.3, a=2.0,
                            seed=0):
    """log Z and its uncertainty from one compiled tempered-ladder run.

    p0: (nwalkers, ndim) starting positions, drawn from (or near) the prior;
    every rung starts from the same cloud. Returns (log_z, log_z_err, info)
    where info carries the ladder, per-rung contributions, and acceptance.
    The error is a 4-block split of the production chain (block estimates of
    each rung's stepping-stone term, combined in quadrature), which captures
    both MC noise and slow mixing.
    """
    p0 = np.asarray(p0, float)
    nwalkers, ndim = p0.shape
    if nwalkers % 2:
        raise ValueError("nwalkers must be even")
    half = nwalkers // 2
    betas_full = make_beta_ladder(n_rungs, alpha)
    betas = betas_full[:-1]               # sample at b_0 .. b_{K-1}
    dbetas = np.diff(betas_full)          # b_{k+1} - b_k
    K = len(betas)

    step, batched_pri, batched_ll = _make_tempered_step(
        log_prior_fn, log_like_fn, half, ndim, betas, a=a)

    @jax.jit
    def run(x, keys_burn, keys_prod):
        logpri = jax.vmap(batched_pri)(x.reshape(K, nwalkers, ndim)).reshape(K, 2, half)
        logl = jax.vmap(batched_ll)(x.reshape(K, nwalkers, ndim)).reshape(K, 2, half)
        logl = jnp.where(jnp.isnan(logl), -jnp.inf, logl)
        carry = (x, logpri, logl)
        carry, _ = jax.lax.scan(lambda c, k: (step(c, k)[0], None), carry, keys_burn)
        carry, (logl_samples, accepts) = jax.lax.scan(step, carry, keys_prod)
        return logl_samples, accepts  # (nsteps, K, 2, half), same for accepts

    x0 = jnp.asarray(np.broadcast_to(p0.reshape(1, 2, half, ndim),
                                     (K, 2, half, ndim)))
    key = jr.PRNGKey(seed)
    kb, kp = jr.split(key)
    keys_burn = jr.split(kb, nsteps_burnin * K)
    keys_burn = keys_burn.reshape((nsteps_burnin, K) + keys_burn.shape[1:])
    keys_prod = jr.split(kp, nsteps * K)
    keys_prod = keys_prod.reshape((nsteps, K) + keys_prod.shape[1:])
    logl_samples, accepts = run(x0, keys_burn, keys_prod)
    logl_samples = np.asarray(logl_samples).reshape(nsteps, K, nwalkers)
    acceptance = np.asarray(accepts).reshape(nsteps, K, nwalkers).mean((0, 2))

    def rung_terms(ll_block):
        """Stepping-stone contribution per rung from (nsteps_b, K, W) logl:
        log mean exp(dbeta_k * logl_k) via a stable logsumexp."""
        out = np.empty(K)
        for k in range(K):
            w = dbetas[k] * ll_block[:, k, :].ravel()
            m = np.max(w)
            out[k] = m + np.log(np.mean(np.exp(w - m)))
        return out

    terms = rung_terms(logl_samples)
    log_z = float(terms.sum())

    blocks = np.array_split(np.arange(nsteps), 4)
    block_terms = np.stack([rung_terms(logl_samples[b]) for b in blocks])
    log_z_err = float(np.sqrt(np.sum(block_terms.var(axis=0, ddof=1)
                                     / block_terms.shape[0])))

    info = {"betas": betas_full, "rung_terms": terms, "acceptance": acceptance,
            "n_rungs": n_rungs, "nsteps": nsteps}
    return log_z, log_z_err, info
