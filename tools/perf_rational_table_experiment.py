#!/usr/bin/env python
"""Round-3 experiment (REJECTED — recorded in docs/design.md): can the
deg-40 Chebyshev band table be replaced by a cheaper representation?

Two candidates, both measured against the exact native-grid quadrature on
the flagship SN 2016bkv filter set (U B g V unfilt r R i I):

1. Chebyshev rational [p/q] fitted by Sanathanan-Koerner iteration.
   Verdict: [10/10] reaches 2e-6 in float64 (half the recurrence flops of
   deg 40), but float32 evaluation — the hot-path dtype — amplifies
   rounding through the division by |ln g| * dQ/|Q| with the achievable
   min|Q| only 0.1-0.4: measured total f32 error 2e-5..1e-3 per band vs
   1.1e-5 for the deg-40 polynomial. Over the ll-parity budget; rejected.

2. Wien-factored ln g = h(s) - c1 nu_ref/T (one extra exp on device).
   Verdict: optimal nu_ref reduces the stiffest band's required degree
   only 40 -> ~32 (the dynamic range lives in the band width, not one Wien
   factor); ~3% of the step after the exp cost. Rejected.

Run on CPU: python tools/perf_rational_table_experiment.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from lightcurve_fitting_tpu.models import ShockCooling2
from lightcurve_fitting_tpu.filters import filtdict
from lightcurve_fitting_tpu.ops.bandtable import ChebyshevBandTable
from lightcurve_fitting_tpu.core.constants import c1, c2

cheb = np.polynomial.chebyshev


def build():
    flagship = ["U", "B", "g", "V", "0", "r", "R", "i", "I"]
    m = ShockCooling2()
    bank = m.bank_for(sorted({filtdict[f] for f in flagship},
                             key=lambda x: x.name))
    tab = ChebyshevBandTable(bank, z=0.0)
    return bank, tab


def exact_ln_g(bank, T, b, z=0.0):
    nodes = bank.emitted_nodes(z)
    T = np.atleast_1d(np.asarray(T, float))
    nu, w = nodes[b], bank.weights[b]
    with np.errstate(over="ignore"):
        x = c1 * nu / T[:, None]
        denom = np.expm1(x)
        integrand = np.where(denom > 0,
                             c2 * nu ** 3 / np.where(denom > 0, denom, 1.0),
                             0.0)
    return np.log(np.maximum(integrand @ w, 1e-300))


def clenshaw_f32(s, c):
    """The device kernel's arithmetic, reproduced in numpy float32."""
    s = s.astype(np.float32)
    c = c.astype(np.float32)
    b1 = np.zeros_like(s)
    b2 = np.zeros_like(s)
    two_s = np.float32(2.0) * s
    for k in range(len(c) - 1, 0, -1):
        b1, b2 = (two_s * b1 - b2 + c[k]).astype(np.float32), b1
    return (s * b1 - b2 + c[0]).astype(np.float32)


def sk_fit_best_f32(s, f, p, q, iters=30):
    """Sanathanan-Koerner rational fit, keeping the iterate whose FLOAT32
    evaluation (numerator/denominator Clenshaw + divide) is closest to f."""
    Vp = cheb.chebvander(s, p)
    Vq = cheb.chebvander(s, q)
    w = np.ones_like(f)
    best = None
    for _ in range(iters):
        A = np.concatenate([Vp * w[:, None], -(f * w)[:, None] * Vq[:, 1:]],
                           axis=1)
        sol, *_ = np.linalg.lstsq(A, f * w, rcond=None)
        pc = sol[:p + 1]
        qc = np.concatenate([[1.0], sol[p + 1:]])
        Q = Vq @ qc
        minq = np.min(np.abs(Q))
        if minq > 1e-12:
            err32 = np.max(np.abs(clenshaw_f32(s, pc) / clenshaw_f32(s, qc)
                                  - f))
            if best is None or err32 < best[0]:
                best = (err32, minq)
            w = 1.0 / np.maximum(np.abs(Q), 1e-6)
        else:
            w = np.ones_like(f)
    return best


def main():
    bank, tab = build()
    B = len(bank)
    log_lo = np.log(tab.T_lo)
    log_hi = np.log(tab.T_max)
    sg = np.linspace(-1, 1, 3001)

    worst_poly = 0.0
    for b in range(B):
        Tg = np.exp(log_lo[b] + (sg + 1) / 2 * (log_hi - log_lo[b]))
        fg = exact_ln_g(bank, Tg, b)
        worst_poly = max(worst_poly,
                         np.max(np.abs(clenshaw_f32(sg, tab._coef[b]) - fg)))
    print(f"deg-{tab.deg} polynomial, f32 total err (worst band): "
          f"{worst_poly:.2e}")

    for (p, q) in [(10, 10), (12, 12)]:
        worst = 0.0
        for b in range(B):
            Tg = np.exp(log_lo[b] + (sg + 1) / 2 * (log_hi - log_lo[b]))
            fg = exact_ln_g(bank, Tg, b)
            best = sk_fit_best_f32(sg, fg, p, q)
            print(f"  band {b} [{p}/{q}]: f32 err {best[0]:.2e} "
                  f"min|Q| {best[1]:.3f}")
            worst = max(worst, best[0])
        print(f"rational [{p}/{q}], f32 total err (worst band): {worst:.2e}")

    # Wien-factored degree requirement on the stiffest band
    nodes = bank.emitted_nodes(0.0)
    for b in range(B):
        Tg = np.exp(log_lo[b] + (sg + 1) / 2 * (log_hi - log_lo[b]))
        nu_min = nodes[b].min()
        nu_mean = (nodes[b] * bank.weights[b]).sum() / bank.weights[b].sum()
        best = None
        for nu_ref in np.linspace(nu_min * 0.8, nu_mean, 13):
            for deg in (16, 20, 24, 28, 32, 40):
                n_fit = max(4 * deg, 512)
                sf = np.cos(np.pi * np.arange(n_fit + 1) / n_fit)
                Tf = np.exp(log_lo[b] + (sf + 1) / 2 * (log_hi - log_lo[b]))
                hf = exact_ln_g(bank, Tf, b) + c1 * nu_ref / Tf
                c = cheb.chebfit(sf, hf, deg)
                h = exact_ln_g(bank, Tg, b) + c1 * nu_ref / Tg
                if np.max(np.abs(cheb.chebval(sg, c) - h)) < 1e-5:
                    break
            if best is None or deg < best[0]:
                best = (deg, nu_ref)
        print(f"  band {b}: Wien-factored min degree {best[0]}")


if __name__ == "__main__":
    main()
