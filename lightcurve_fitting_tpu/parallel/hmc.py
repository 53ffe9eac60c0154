"""Gradient-based Hamiltonian Monte Carlo — a capability the reference cannot
offer: its numpy models are not differentiable, while this framework's model
kernels use NaN-free double-where formulations (ops/mathx.py) precisely so
``jax.grad`` flows through the full likelihood (SURVEY.md §7).

Vectorized multi-chain HMC with dual-averaging step-size adaptation (Hoffman &
Gelman 2014, Alg. 5) and diagonal mass-matrix estimation from the warmup
samples. Whole run is one ``lax.scan``; chains are vmapped (and shardable the
same way walkers are). Hard prior boundaries (-inf) reject trajectories via the
Metropolis correction.

For multimodal or boundary-dominated posteriors the stretch-move ensemble
(parallel/sampler.py) remains the default; HMC shines for higher-dimensional
smooth posteriors (e.g. population hierarchies).
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

__all__ = ["HMCSampler"]


class HMCSampler:
    """Multi-chain adaptive HMC. API parallels EnsembleSampler where sensible:
    ``run_mcmc(initial, n_samples, n_warmup)``, ``flatchain``, ``chain``,
    ``acceptance_fraction``."""

    def __init__(self, nchains, ndim, log_prob_fn, n_leapfrog=16, target_accept=0.8,
                 init_step_size=0.1, init_scales=None, seed=None):
        """``init_scales``: rough per-parameter posterior scales; used as the
        warmup mass matrix. Essential for posteriors with strong scale
        hierarchies (e.g. an explosion epoch constrained 1e4x more tightly
        than a temperature) — with a unit mass, dual averaging shrinks the
        step to the stiffest direction and warmup never mixes."""
        self.nchains = int(nchains)
        self.ndim = int(ndim)
        self.n_leapfrog = int(n_leapfrog)
        self.target_accept = float(target_accept)
        self.init_step_size = float(init_step_size)
        self.init_scales = (np.ones(ndim) if init_scales is None
                            else np.asarray(init_scales, float))
        self._logp_and_grad = jax.value_and_grad(log_prob_fn)
        self._log_prob_fn = log_prob_fn
        if seed is None:
            seed = np.random.randint(0, 2 ** 31 - 1)
        self._key = jr.PRNGKey(seed)
        self.reset()

    def reset(self):
        self._chain = np.empty((0, self.nchains, self.ndim))
        self._accept_prob_sum = np.zeros(self.nchains)
        self._nsteps = 0
        self.step_size = None
        self.inv_mass = None

    # ------------------------------------------------------------- internals
    def _transition(self, x, logp, key, eps, inv_mass):
        """One HMC transition for a single chain (vmapped by the caller)."""
        k_mom, k_acc, k_jit = jr.split(key, 3)
        # jitter the path length 50-100% to avoid resonances
        p0 = jr.normal(k_mom, (self.ndim,)) / jnp.sqrt(inv_mass)

        def leapfrog(carry, _):
            q, p = carry
            _, g = self._logp_and_grad(q)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            p = p + 0.5 * eps * g
            q = q + eps * inv_mass * p
            _, g2 = self._logp_and_grad(q)
            g2 = jnp.where(jnp.isfinite(g2), g2, 0.0)
            p = p + 0.5 * eps * g2
            return (q, p), ()

        n_steps = self.n_leapfrog
        (q_new, p_new), _ = jax.lax.scan(leapfrog, (x, p0), None, length=n_steps)
        logp_new = self._log_prob_fn(q_new)
        h0 = logp - 0.5 * jnp.sum(p0 * p0 * inv_mass)
        h1 = logp_new - 0.5 * jnp.sum(p_new * p_new * inv_mass)
        log_accept = jnp.where(jnp.isfinite(h1), h1 - h0, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_accept, 0.0)))
        accept = jnp.log(jr.uniform(k_acc)) < log_accept
        x_out = jnp.where(accept, q_new, x)
        logp_out = jnp.where(accept, logp_new, logp)
        return x_out, logp_out, accept_prob

    # ---------------------------------------------------------------- run
    def run_mcmc(self, initial_state, n_samples, n_warmup=500):
        x0 = jnp.asarray(np.asarray(initial_state, float))
        if x0.shape != (self.nchains, self.ndim):
            raise ValueError(f"initial_state must be {(self.nchains, self.ndim)}")
        logp0 = jax.vmap(self._log_prob_fn)(x0)
        if not bool(jnp.all(jnp.isfinite(logp0))):
            raise ValueError("non-finite initial log-probability")

        mu = jnp.log(10.0 * self.init_step_size)
        gamma, t0, kappa = 0.05, 10.0, 0.75

        def make_warmup_step(mu_local):
            def warmup_step(carry, key):
                x, logp, inv_mass, log_eps, log_eps_bar, h_bar, m, mean, m2, i = carry
                keys = jr.split(key, self.nchains)
                eps = jnp.exp(log_eps)
                x, logp, aprob = jax.vmap(
                    lambda xi, li, ki: self._transition(xi, li, ki, eps, inv_mass)
                )(x, logp, keys)
                # dual averaging on the mean acceptance across chains
                a = jnp.mean(aprob)
                h_bar = (1.0 - 1.0 / (i + 1 + t0)) * h_bar \
                    + (self.target_accept - a) / (i + 1 + t0)
                log_eps = mu_local - jnp.sqrt(i + 1.0) / gamma * h_bar
                w = (i + 1.0) ** (-kappa)
                log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
                # Welford running variance over all chain states
                m = m + self.nchains
                delta = x - mean
                mean = mean + jnp.sum(delta, axis=0) / m
                m2 = m2 + jnp.sum(delta * (x - mean), axis=0)
                return (x, logp, inv_mass, log_eps, log_eps_bar, h_bar,
                        m, mean, m2, i + 1.0), aprob
            return warmup_step

        def sample_step(carry, key):
            x, logp, eps, inv_mass = carry
            keys = jr.split(key, self.nchains)
            x, logp, aprob = jax.vmap(
                lambda xi, li, ki: self._transition(xi, li, ki, eps, inv_mass)
            )(x, logp, keys)
            return (x, logp, eps, inv_mass), (x, aprob)

        @jax.jit
        def run(x, logp, wkeys1, wkeys2, skeys):
            # phase 1: adapt eps on the user-provided scale mass, estimate the
            # posterior variance; phase 2: re-adapt eps on the estimated mass
            # (Stan-style windows — eps tuned for one metric is invalid for
            # another)
            inv_mass0 = jnp.asarray(self.init_scales ** 2)
            carry = (x, logp, inv_mass0, jnp.log(self.init_step_size),
                     jnp.log(self.init_step_size), 0.0, 0.0,
                     jnp.zeros(self.ndim), jnp.zeros(self.ndim), 0.0)
            carry, _ = jax.lax.scan(make_warmup_step(mu), carry, wkeys1)
            x, logp, _, _, log_eps_bar, _, m, mean, m2, _ = carry
            var = m2 / jnp.maximum(m - 1.0, 1.0)
            inv_mass = jnp.maximum(var, 1e-20)
            mu2 = jnp.log(10.0) + log_eps_bar
            carry = (x, logp, inv_mass, log_eps_bar, log_eps_bar, 0.0, 0.0,
                     jnp.zeros(self.ndim), jnp.zeros(self.ndim), 0.0)
            carry, _ = jax.lax.scan(make_warmup_step(mu2), carry, wkeys2)
            x, logp, _, _, log_eps_bar, _, _, _, _, _ = carry
            eps = jnp.exp(log_eps_bar)
            (x, logp, eps, inv_mass), (xs, aprob) = jax.lax.scan(
                sample_step, (x, logp, eps, inv_mass), skeys)
            return xs, aprob, eps, inv_mass

        self._key, k1, k1b, k2 = jr.split(self._key, 4)
        n_w1 = (2 * n_warmup) // 3
        wkeys = jr.split(k1, n_w1)
        wkeys2 = jr.split(k1b, n_warmup - n_w1)
        skeys = jr.split(k2, n_samples)
        xs, aprob, eps, inv_mass = run(x0, logp0, wkeys, wkeys2, skeys)
        self._chain = np.concatenate([self._chain, np.asarray(xs)])
        self._accept_prob_sum += np.asarray(aprob).sum(0)
        self._nsteps += n_samples
        self.step_size = float(eps)
        self.inv_mass = np.asarray(inv_mass)
        return np.asarray(xs[-1])

    @property
    def chain(self):
        return np.swapaxes(self._chain, 0, 1)

    @property
    def flatchain(self):
        return self._chain.reshape(-1, self.ndim)

    @property
    def acceptance_fraction(self):
        return self._accept_prob_sum / max(self._nsteps, 1)
