#!/usr/bin/env python
"""Round-3 asymptote experiments (VERDICT round 2, item 3).

Round-2 end-of-round profile (CLAUDE.md): at 131072 walkers the step costs
2.11 ms in-trace — two 0.58 ms half-step likelihood fusions, ~2 x 0.32 ms of
XLA *in-loop* fusion splits it fuses away in a standalone jit, ~0.2 ms
copies/stretch. The untried levers named by the verdict: XLA TPU compiler
options (loop-fusion-adjacent knobs probed as valid through this tunnel),
buffer donation on the scan carry, and float32 walker state.

Each experiment recompiles the production scan (~minutes through the remote-
compile tunnel) and measures with varied inputs + a forced host transfer per
repeat (the result-dedup gotcha). One JSON line per config; run on the real
TPU (no platform override).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import jax.random as jr

    from lightcurve_fitting_tpu.core import config
    config.set_compute_dtype(jnp.float32)

    from __graft_entry__ import _build_logposterior
    from lightcurve_fitting_tpu.parallel.sampler import make_stretch_kernel

    logpost, _ = _build_logposterior()
    nsteps = 300

    def build_run(nwalkers, donate=False, options=None, state_dtype=jnp.float64,
                  unroll=1):
        half = nwalkers // 2
        step, batched_logp = make_stretch_kernel(logpost, half, 4)
        store = jnp.float32

        def run(x, logp, keys):
            def sstep(carry, key):
                carry, out = step(carry, key)
                out = (out[0].astype(store), out[1].astype(store), out[2])
                return carry, out

            (x, logp), (xs, logps, accepts) = jax.lax.scan(
                sstep, (x, logp), keys, unroll=unroll)
            return x, logp, xs, logps, accepts

        kw = {}
        if donate:
            kw["donate_argnums"] = (0, 1)
        if options:
            kw["compiler_options"] = options
        run_j = jax.jit(run, **kw)

        rng = np.random.default_rng(0)
        p0 = rng.uniform([20.0, 2.0, 20.0, 57468.5], [50.0, 5.0, 50.0, 57468.7],
                         size=(nwalkers, 4))

        def fresh_state():
            x = jnp.asarray(p0.reshape(2, half, 4), dtype=state_dtype)
            logp = batched_logp(x.reshape(-1, 4)).reshape(2, half)
            return x, logp

        return run_j, fresh_state

    def measure(nwalkers, repeats=3, **build_kw):
        run_j, fresh_state = build_run(nwalkers, **build_kw)
        x, logp = fresh_state()
        t_c0 = time.perf_counter()
        out = run_j(x, logp, jr.split(jr.PRNGKey(1), nsteps))
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_c0
        times = []
        for i in range(repeats):
            x, logp = fresh_state()          # donation invalidates buffers
            keys = jr.split(jr.PRNGKey(2 + i), nsteps)  # varied inputs
            t0 = time.perf_counter()
            out = run_j(x, logp, keys)
            float(jnp.sum(out[1]))           # forced host transfer
            times.append(time.perf_counter() - t0)
        elapsed = min(times)
        return nwalkers * nsteps / elapsed, elapsed, compile_s

    experiments = [
        ("baseline", {}),
        ("donate_carry", {"donate": True}),
        ("f32_state", {"state_dtype": jnp.float32}),
        ("f32_state_donate", {"state_dtype": jnp.float32, "donate": True}),
        ("vmem_64m", {"options": {"xla_tpu_scoped_vmem_limit_kib": "65536"}}),
        ("licm_ratio_8", {"options": {"xla_tpu_licm_size_inflation_ratio": "8.0"}}),
        ("latency_sched", {"options": {"xla_tpu_enable_latency_hiding_scheduler": "true"}}),
        ("nested_loop_fusion", {"options": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}}),
        ("no_rwb_fusion", {"options": {"xla_tpu_rwb_fusion": "false"}}),
        ("opt_barrier_removal", {"options": {"xla_tpu_aggressive_opt_barrier_removal": "true"}}),
        ("unroll2_donate", {"donate": True, "unroll": 2}),
    ]

    sizes = [131072, 32768]
    results = {}
    for nwalkers in sizes:
        for name, kw in experiments:
            if nwalkers != 131072 and name not in ("baseline", "donate_carry",
                                                   "f32_state_donate", "vmem_64m",
                                                   "nested_loop_fusion"):
                continue
            try:
                evals, elapsed, compile_s = measure(nwalkers, **kw)
                rec = {"nwalkers": nwalkers, "config": name,
                       "evals_per_sec": evals, "elapsed_s": elapsed,
                       "compile_s": compile_s}
            except Exception as e:
                rec = {"nwalkers": nwalkers, "config": name,
                       "error": str(e).split("\n")[0][:200]}
            results[f"{name}@{nwalkers}"] = rec
            print(json.dumps(rec), flush=True)

    with open("/tmp/perf_r3_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
