"""Serving-throughput benchmark: exact f32 / exact bf16 / IVF QPS.

Measures the BASELINE.json north-star (>=100k QPS/chip at 1M x 768) with
async-pipelined dispatches (device throughput, not tunnel latency).

Usage: [SERV_N=1000000] [SERV_F=768] [SERV_BATCH=4096] python
benchmarks/bench_serving.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.search import fused_query_pipeline
    from pyarrowspace_tpu.graph.feature import build_feature_laplacian
    from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch, dispersion_batch
    from pyarrowspace_tpu.spectral.taumode import (TAU_MIX, derive_tau_star,
                                                   synthesize)
    from pyarrowspace_tpu.core.params import TauMode

    n = int(os.environ.get("SERV_N", 1_000_000))
    f = int(os.environ.get("SERV_F", 768))
    q_batch = int(os.environ.get("SERV_BATCH", 4096))
    topk = 15
    rng = np.random.default_rng(0)

    # Build the serving state directly (index build timing is bench.py's
    # job); corpus streamed to device in slabs to bound host memory.
    slabs = []
    slab = 250_000
    for s in range(0, n, slab):
        m = min(slab, n - s)
        slabs.append(jnp.asarray(
            rng.standard_normal((m, f), dtype=np.float32)))
    x = jnp.concatenate(slabs, axis=0)
    del slabs
    xu = unit_normalize(x)
    w_f, lap_f, _ = build_feature_laplacian(x[:65536], k_f=15)
    e = rayleigh_batch(x, lap_f, normalized=False)
    ts = derive_tau_star(e, TauMode.MEDIAN)
    g = dispersion_batch(x, w_f, e)
    lams = synthesize(e, g, ts, TAU_MIX)
    queries = jnp.asarray(rng.standard_normal((q_batch, f),
                                              dtype=np.float32))
    tau = jnp.float32(0.62)

    def measure(xu_serv, name, reps=8):
        args = dict(topk=topk, rayleigh_normalized=False, tau_mix=TAU_MIX,
                    backend="xla")
        lam_serv = lams.astype(jnp.float32)
        fused_query_pipeline(xu_serv, lam_serv, lap_f, w_f, ts, queries,
                             tau, **args)[0].block_until_ready()
        t0 = time.perf_counter()
        outs = [fused_query_pipeline(xu_serv, lam_serv, lap_f, w_f, ts,
                                     queries, tau, **args)
                for _ in range(reps)]
        outs[-1][0].block_until_ready()
        dt = time.perf_counter() - t0
        qps = q_batch * reps / dt
        print(f"{name}: {qps:,.0f} QPS  ({dt / reps * 1000:.1f} ms/batch "
              f"of {q_batch}, N={n:,}, F={f})")
        return qps

    measure(xu, "exact f32")
    measure(xu.astype(jnp.bfloat16), "exact bf16")


if __name__ == "__main__":
    main()
