#!/usr/bin/env python
"""Round-4 probe (VERDICT r3 #4): can a lower-precision Clenshaw recurrence
speed up the two half-step likelihood fusions within the ~1e-5*|ll| parity
budget?

Candidates, each timed with the interleaved round-robin method (CLAUDE.md:
the tunnel drifts 2x on ~10-min scales — configs alternate inside ONE
process, varied inputs per repeat, forced scalar transfer; compare minima):

  f32       : the production recurrence (baseline).
  bf16      : whole recurrence in bfloat16. Accuracy is expected hopeless
              (|ln g| ~ 50, bf16 eps ~ 8e-3 -> absolute error ~0.1), but its
              *speed* bounds what any low-precision variant could buy: on
              TPU the VPU computes elementwise f32; bf16 is a storage
              format, so the expected answer is "no faster".
  split     : head (low-degree, carries the O(50) magnitude) in f32 +
              tail (remaining terms, small values) in bf16 — the
              "compensated" layout where bf16 rounding lands on a small
              addend. Only worth considering if bf16 shows ALU/bandwidth
              throughput wins at all.

Accuracy gate (runs on CPU, no tunnel needed): max |Delta ln g| over each
band's fitted domain vs the f64 reference recurrence, against the 1e-5
budget (signed errors accumulate over 149 large residuals; see CLAUDE.md
parity-tolerance caution).

Usage:
  python tools/perf_bf16_clenshaw_experiment.py accuracy   # CPU, fast
  python tools/perf_bf16_clenshaw_experiment.py speed      # on the TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build_table():
    from lightcurve_fitting_tpu.models import ShockCooling2
    from lightcurve_fitting_tpu.filters import filtdict

    flagship = ["U", "B", "g", "V", "0", "r", "R", "i", "I"]
    m = ShockCooling2()
    bank = m.bank_for(sorted({filtdict[f] for f in flagship}, key=lambda x: x.name))
    tab = m.table_for(bank)
    return bank, tab


def _clenshaw_np(coef, s, dtype):
    """Reference Clenshaw in a chosen numpy dtype (coef: (B, D+1), s: (B, n))."""
    coef = coef.astype(dtype)
    s = s.astype(dtype)
    two_s = (2.0 * s).astype(dtype)
    D = coef.shape[-1] - 1
    b1 = np.zeros_like(s)
    b2 = np.zeros_like(s)
    for k in range(D, 0, -1):
        b1, b2 = (two_s * b1 - b2 + coef[:, k:k + 1]).astype(dtype), b1
    return (s * b1 - b2 + coef[:, 0:1]).astype(dtype)


def _clenshaw_np_split(coef, s, head_deg):
    """Head terms (0..head_deg) in f32, tail contribution in bf16 (emulated
    in numpy via ml_dtypes casting per operation)."""
    import ml_dtypes
    bf16 = np.dtype(ml_dtypes.bfloat16)
    tail = coef.copy()
    tail[:, :head_deg + 1] = 0.0
    head = coef[:, :head_deg + 1]
    v_head = _clenshaw_np(head, s, np.float32)
    v_tail = _clenshaw_np(tail, s, bf16).astype(np.float32)
    return v_head + v_tail


def accuracy():
    bank, tab = _build_table()
    coef = np.asarray(tab._coef)          # (B, D+1)
    B, D1 = coef.shape
    s = np.linspace(-1.0, 1.0, 4001)[None, :].repeat(B, axis=0)
    exact = _clenshaw_np(coef, s, np.float64)
    budget = 1e-5
    print(f"bands={B} degree={D1 - 1} budget |dlng| < {budget}")
    import ml_dtypes
    rows = []
    for name, approx in [
            ("f32", _clenshaw_np(coef, s, np.float32)),
            ("bf16", _clenshaw_np(coef, s, np.dtype(ml_dtypes.bfloat16)).astype(np.float64)),
            ("split_head4", _clenshaw_np_split(coef, s, 4)),
            ("split_head8", _clenshaw_np_split(coef, s, 8)),
            ("split_head12", _clenshaw_np_split(coef, s, 12))]:
        err = np.abs(np.asarray(approx, np.float64) - exact).max()
        verdict = "PASS" if err < budget else "FAIL"
        rows.append((name, err, verdict))
        print(f"  {name:12s} max|dlng| = {err:.3e}  {verdict}")
    return rows


def speed(n_walkers=65536, n_points=149, iters=60, repeats=6):
    import jax
    import jax.numpy as jnp

    bank, tab = _build_table()
    coef_b = np.asarray(tab._coef)
    ids = np.resize(np.arange(len(bank)), n_points)
    coef = coef_b[ids]                          # (N, D+1) per-point
    D = coef.shape[-1] - 1

    def make(dtype, head_deg=None):
        c = jnp.asarray(coef, jnp.float32)

        def kernel(s):  # s: (W, N) f32 in [-1, 1]
            if head_deg is None:
                cc = c.astype(dtype)
                ss = s.astype(dtype)
                two_s = 2.0 * ss
                b1 = jnp.zeros_like(ss)
                b2 = jnp.zeros_like(ss)
                for k in range(D, 0, -1):
                    b1, b2 = two_s * b1 - b2 + cc[:, k], b1
                return (ss * b1 - b2 + cc[:, 0]).astype(jnp.float32).sum(-1)
            # split: head f32, tail bf16
            ss32 = s
            two32 = 2.0 * ss32
            b1 = jnp.zeros_like(ss32)
            b2 = jnp.zeros_like(ss32)
            for k in range(head_deg, 0, -1):
                b1, b2 = two32 * b1 - b2 + c[:, k], b1
            head = ss32 * b1 - b2 + c[:, 0]
            ss16 = s.astype(jnp.bfloat16)
            two16 = 2.0 * ss16
            t1 = jnp.zeros_like(ss16)
            t2 = jnp.zeros_like(ss16)
            for k in range(D, head_deg, -1):
                t1, t2 = two16 * t1 - t2 + c[:, k].astype(jnp.bfloat16), t1
            # tail Clenshaw evaluated from degree D down to head_deg+1 only:
            # finish the recurrence with zero coefficients to rebase at deg 0
            for _ in range(head_deg, 0, -1):
                t1, t2 = two16 * t1 - t2, t1
            tail = (ss16 * t1 - t2).astype(jnp.float32)
            return (head + tail).sum(-1)

        def many(s):
            def body(carry, _):
                v = kernel(carry)
                # feed a tiny function of the result back so iterations chain
                carry = jnp.clip(carry + 1e-12 * v[:, None], -1.0, 1.0)
                return carry, ()
            out, _ = jax.lax.scan(body, s, None, length=iters)
            return out

        return jax.jit(many)

    configs = [("f32", make(jnp.float32)),
               ("bf16", make(jnp.bfloat16)),
               ("split_head8", make(None, head_deg=8))]
    rng = np.random.default_rng(0)
    best = {name: np.inf for name, _ in configs}
    # warmup/compile
    s0 = jnp.asarray(rng.uniform(-1, 1, (n_walkers, n_points)), jnp.float32)
    for name, fn in configs:
        jax.block_until_ready(fn(s0))
    for r in range(repeats):
        for name, fn in configs:   # interleaved round-robin
            s = jnp.asarray(rng.uniform(-1, 1, (n_walkers, n_points)), jnp.float32)
            t0 = time.perf_counter()
            out = fn(s)
            float(jnp.sum(out))    # forced transfer (tunnel dedup gotcha)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
    el = n_walkers * n_points * iters
    print(f"elements/iter-chain = {el:.3e} ({iters} chained Clenshaw evals)")
    for name, _ in configs:
        flops = el * 3 * (coef.shape[-1] - 1)
        print(f"  {name:12s} best {best[name]*1e3:8.2f} ms   "
              f"{flops / best[name] / 1e12:6.2f} TFLOP/s-equivalent")
    return best


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "accuracy"
    if mode == "accuracy":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        accuracy()
    else:
        import jax
        jax.config.update("jax_enable_x64", True)
        print("device:", jax.devices()[0])
        speed()
