"""Pallas fused band-flux kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightcurve_fitting_tpu.ops.pallas_bandflux import bandflux_pallas, bandflux_reference
from lightcurve_fitting_tpu import filters as ft
from lightcurve_fitting_tpu.ops.filterbank import FilterBank


@pytest.mark.parametrize("W,N,K", [(16, 12, 100), (8, 8, 128), (10, 61, 343)])
def test_pallas_matches_reference(W, N, K):
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(np.sort(rng.uniform(200, 1500, (N, K)), axis=1), jnp.float32)
    weights = jnp.asarray(rng.uniform(0, 0.02, (N, K)), jnp.float32)
    T = jnp.asarray(rng.uniform(2, 50, (W, N)), jnp.float32)
    R = jnp.asarray(rng.uniform(0.1, 20, (W, N)), jnp.float32)
    got = bandflux_pallas(nodes, weights, T, R, interpret=True)
    want = bandflux_reference(nodes, weights, T, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_pallas_nonpositive_temperature_zero():
    nodes = jnp.full((4, 128), 500.0, jnp.float32)
    weights = jnp.full((4, 128), 1.0 / 128, jnp.float32)
    T = jnp.asarray([[-1.0, 0.0, 10.0, 5.0]], jnp.float32)
    R = jnp.ones((1, 4), jnp.float32)
    y = np.asarray(bandflux_pallas(nodes, weights, T, R, interpret=True))
    assert y[0, 0] == 0.0 and y[0, 1] == 0.0
    assert y[0, 2] > 0 and y[0, 3] > 0


def test_pallas_on_real_filterbank():
    bank = FilterBank([ft.filtdict[n] for n in ["g", "r", "i"]], n_nodes=128)
    ids = np.array([0, 1, 2, 1], np.int32)
    nodes, weights, _ = bank.gather(ids)
    T = jnp.asarray(np.full((6, 4), 10.0), jnp.float32)
    R = jnp.asarray(np.full((6, 4), 8.0), jnp.float32)
    got = bandflux_pallas(jnp.asarray(nodes, jnp.float32), jnp.asarray(weights, jnp.float32),
                          T, R, interpret=True)
    want = bandflux_reference(jnp.asarray(nodes, jnp.float32),
                              jnp.asarray(weights, jnp.float32), T, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)
