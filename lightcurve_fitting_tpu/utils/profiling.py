"""Profiling and throughput observability (SURVEY.md §5: the reference has no
tracing; we add jax.profiler hooks and evals/sec reporting)."""

import contextlib
import time

import jax

__all__ = ["trace", "Throughput"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax profiler trace (view with TensorBoard/XProf) around a
    block, e.g. a sampler run."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Context manager reporting log-likelihood evaluations per second for a
    sampler run: ``with Throughput(nwalkers * nsteps) as t: ...``."""

    def __init__(self, n_evals, label="sampler"):
        self.n_evals = n_evals
        self.label = label
        self.elapsed = None
        self.evals_per_sec = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        self.evals_per_sec = self.n_evals / self.elapsed
        print(f"{self.label}: {self.n_evals} log-likelihood evals in "
              f"{self.elapsed:.2f}s = {self.evals_per_sec:.3g} evals/s")
        return False
