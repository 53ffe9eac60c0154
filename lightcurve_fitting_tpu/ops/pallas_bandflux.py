"""Pallas TPU kernel for the fused band-flux reduction.

The sampler hot loop evaluates, for every walker w and photometry point n,

    y[w, n] = sum_k  W[n, k] * Planck(nu[n, k]; T[w, n], R[w, n])

The jnp path materializes the (W, N, K) Planck cube for XLA to fuse. This
kernel keeps the quadrature tables (nodes/weights, shared by all walkers)
resident in VMEM and streams walker tiles through the VPU, so HBM traffic is
just T/R in and y out — the arithmetic-intensity-optimal schedule for this
reduction. Falls back to the jnp implementation off-TPU (or via
``interpret=True`` in tests).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import c1, c2

__all__ = ["bandflux_pallas", "bandflux_reference"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def bandflux_reference(nodes, weights, T, R):
    """jnp reference implementation (same math as models.blackbody)."""
    Tp = T[..., None]
    safe_T = jnp.where(Tp > 0.0, Tp, 1.0)
    x = c1 * nodes * jnp.where(Tp > 0.0, 1.0 / safe_T, 0.0)
    e = jnp.expm1(x)
    denom_inv = jnp.where(e > 0.0, 1.0 / jnp.where(e > 0.0, e, 1.0), 0.0)
    lnu = c2 * R[..., None] ** 2 * nodes ** 3 * denom_inv
    return jnp.sum(weights * lnu, axis=-1)


def _kernel(nodes_ref, w_ref, T_ref, R_ref, out_ref):
    nu = nodes_ref[:]          # (N, K)
    w = w_ref[:]               # (N, K)
    T = T_ref[:]               # (TW, N)
    R = R_ref[:]               # (TW, N)
    Tp = T[:, :, None]
    pos = Tp > 0.0
    x = c1 * nu[None, :, :] * jnp.where(pos, 1.0 / jnp.where(pos, Tp, 1.0), 0.0)
    # Mosaic has no expm1 lowering; exp(x)-1 loses precision only in the deep
    # Rayleigh-Jeans limit (x < 1e-3: rel err ~1e-4 in f32), irrelevant here
    e = jnp.exp(x) - 1.0
    epos = e > 0.0
    denom_inv = jnp.where(epos, 1.0 / jnp.where(epos, e, 1.0), 0.0)
    lnu = (c2 * R[:, :, None] ** 2) * (nu ** 3)[None, :, :] * denom_inv
    out_ref[:] = jnp.sum(w[None, :, :] * lnu, axis=-1)


@functools.partial(jax.jit, static_argnames=("walker_tile", "interpret"))
def bandflux_pallas(nodes, weights, T, R, walker_tile=8, interpret=False):
    """Fused band flux: nodes/weights (N, K) static tables, T/R (W, N) walker
    batches -> (W, N). float32 recommended on TPU.

    Shapes are padded to hardware tiles (N to 8, K to 128, W to walker_tile);
    padded nodes use nu=1 with zero weight, padded walkers are discarded.
    """
    W, N = T.shape
    K = nodes.shape[1]
    dtype = T.dtype
    Np = _round_up(N, 8)
    Kp = _round_up(K, 128)
    Wp = _round_up(W, walker_tile)

    nodes_p = jnp.ones((Np, Kp), dtype)
    nodes_p = nodes_p.at[:N, :K].set(nodes.astype(dtype))
    weights_p = jnp.zeros((Np, Kp), dtype)
    weights_p = weights_p.at[:N, :K].set(weights.astype(dtype))
    T_p = jnp.ones((Wp, Np), dtype)
    T_p = T_p.at[:W, :N].set(T)
    R_p = jnp.zeros((Wp, Np), dtype)
    R_p = R_p.at[:W, :N].set(R)

    grid = (Wp // walker_tile,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((walker_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((walker_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((walker_tile, Np), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp, Np), dtype),
        interpret=interpret,
    )(nodes_p, weights_p, T_p, R_p)
    return out[:W, :N]
