"""Prior probability distributions (reference models.py:1048-1098), usable both
host-side (numpy scalars) and device-side (traced jax arrays): out-of-bounds
parameters map to -inf via ``where`` masking instead of Python branching, so the
same objects work inside jit/vmap."""

from abc import ABCMeta, abstractmethod

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["Prior", "UniformPrior", "LogUniformPrior", "GaussianPrior", "KDEPrior"]


class Prior:
    __metaclass__ = ABCMeta

    def __init__(self, p_min=-np.inf, p_max=np.inf):
        self.p_min = p_min
        self.p_max = p_max

    def __call__(self, p):
        in_bounds = (p > self.p_min) & (p < self.p_max)
        # evaluate logp on a value guaranteed in-domain to avoid NaN (e.g. log of
        # a negative number), then mask
        safe_p = jnp.where(in_bounds, p, self._safe_point())
        return jnp.where(in_bounds, self.logp(safe_p), -jnp.inf)

    def _safe_point(self):
        lo = self.p_min if np.isfinite(self.p_min) else 0.0
        hi = self.p_max if np.isfinite(self.p_max) else lo + 2.0
        return 0.5 * (lo + hi) if hi > lo else lo + 1.0

    @abstractmethod
    def logp(self, p):
        pass

    def sample(self, rng, size=None):
        """Draw from the (normalized) prior with a host numpy Generator.

        Beyond-reference addition (the reference priors only evaluate,
        reference models.py:1048-1098): exact inverse-CDF draws where
        analytic, rejection against the bounds otherwise. Used by the
        simulation-based-calibration harness (``parallel/sbc.py``) and for
        prior-predictive checks.
        """
        raise NotImplementedError(
            f"{self.__class__.__name__} does not implement sampling")

    def _rejection_sample(self, rng, size, propose):
        """Draw ``propose(n)`` until all lie strictly inside the bounds."""
        n = 1 if size is None else int(np.prod(size))
        out = np.empty(n)
        filled = 0
        for _ in range(1000):
            cand = np.asarray(propose(max(n - filled, 16)))
            cand = cand[(cand > self.p_min) & (cand < self.p_max)]
            take = min(len(cand), n - filled)
            out[filled:filled + take] = cand[:take]
            filled += take
            if filled == n:
                return float(out[0]) if size is None else out.reshape(size)
        raise RuntimeError(f"{self!r}: rejection sampling failed to find "
                           "in-bounds draws (bounds far in the tail?)")

    def __repr__(self):
        return f"<{self.__class__.__name__}: ({self.p_min}, {self.p_max})>"


class UniformPrior(Prior):
    """dP/dp ∝ 1"""

    def logp(self, p):
        return jnp.zeros_like(p)

    def sample(self, rng, size=None):
        if not (np.isfinite(self.p_min) and np.isfinite(self.p_max)):
            raise ValueError("cannot sample an unbounded uniform prior")
        return rng.uniform(self.p_min, self.p_max, size=size)


class LogUniformPrior(Prior):
    """dP/dp ∝ 1/p"""

    def __init__(self, p_min=0.0, p_max=np.inf):
        if p_min < 0.0:
            raise ValueError("a log-uniform prior cannot have negative limits")
        super().__init__(p_min, p_max)

    def logp(self, p):
        return -jnp.log(p)

    def sample(self, rng, size=None):
        if not (self.p_min > 0.0 and np.isfinite(self.p_max)):
            raise ValueError("cannot sample a log-uniform prior with "
                             "p_min <= 0 or infinite p_max")
        return np.exp(rng.uniform(np.log(self.p_min), np.log(self.p_max),
                                  size=size))


class GaussianPrior(Prior):
    """dP/dp ∝ exp(-(p-mean)^2 / (2 stddev^2))"""

    def __init__(self, p_min=-np.inf, p_max=np.inf, mean=0.0, stddev=1.0):
        super().__init__(p_min, p_max)
        self.mean = mean
        self.stddev = stddev

    def logp(self, p):
        return -0.5 * ((p - self.mean) / self.stddev) ** 2.0

    def _safe_point(self):
        return self.mean

    def sample(self, rng, size=None):
        return self._rejection_sample(
            rng, size, lambda n: rng.normal(self.mean, self.stddev, size=n))

    def __repr__(self):
        return (f"<GaussianPrior: {self.mean} +/- {self.stddev} on "
                f"({self.p_min}, {self.p_max})>")


class KDEPrior(Prior):
    """Gaussian kernel density estimate of a posterior sample, used to chain the
    previous epoch's temperature posterior into single-filter epochs
    (reference bolometric.py:753-759 uses ``scipy.stats.gaussian_kde``).

    Scott's-rule bandwidth, matching scipy's default. Optionally subsamples to
    ``max_components`` for cheap in-graph evaluation (logsumexp over components).
    """

    def __init__(self, samples, p_min=-np.inf, p_max=np.inf, max_components=512, seed=0):
        super().__init__(p_min, p_max)
        samples = np.asarray(samples, float).ravel()
        if len(samples) > max_components:
            rng = np.random.default_rng(seed)
            samples = rng.choice(samples, size=max_components, replace=False)
        self.samples = jnp.asarray(samples)
        n = len(samples)
        factor = n ** (-1.0 / 5.0)  # Scott's rule, d=1
        self.bandwidth = float(np.std(samples, ddof=1) * factor)
        self._lognorm = float(np.log(n) + np.log(self.bandwidth) + 0.5 * np.log(2 * np.pi))

    def logp(self, p):
        z = (jnp.asarray(p)[..., None] - self.samples) / self.bandwidth
        return logsumexp(-0.5 * z ** 2, axis=-1) - self._lognorm

    def sample(self, rng, size=None):
        comp = np.asarray(self.samples)

        def propose(n):
            return (rng.choice(comp, size=n)
                    + self.bandwidth * rng.normal(size=n))

        return self._rejection_sample(rng, size, propose)
