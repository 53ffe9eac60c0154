#!/bin/sh
# Round-4 on-chip work queue: run when the TPU tunnel is back.
#   sh tools/onchip_r4.sh
# 1. capture the driver bench headline (BENCH-equivalent JSON, ~20-40 min
#    cold compile; the roofline detail self-describes efficiency)
# 2. bound what bf16 could have bought (speed mode of the rejected probe,
#    for the docs/design.md record; optional)
# 3. check whether the axon backend supports executable serialization
#    (if yes, the persistent compile cache also works through the tunnel)
set -x
cd "$(dirname "$0")/.."
timeout 3600 python bench.py | tee /tmp/bench_r4.json
timeout 1200 python tools/perf_bf16_clenshaw_experiment.py speed || true
timeout 900 python - <<'EOF' || true
import os, tempfile
import jax
td = tempfile.mkdtemp()
jax.config.update("jax_compilation_cache_dir", td)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
@jax.jit
def f(x):
    return jnp.sin(x) @ x
f(jnp.ones((256, 256))).block_until_ready()
n = len(os.listdir(td))
print(f"tunnel persistent-cache support: {n} file(s) persisted "
      f"({'WORKS' if n else 'NOT SUPPORTED by this backend'})")
EOF
