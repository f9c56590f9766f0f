"""Headline benchmark: standard index build at the reference's flagship size.

Reference anchor: arrowspace-rs v0.17 builds the 313,841 x 384 CVE corpus in
744.07 s on a CPU workstation (BASELINE.md).  This benchmark builds a
same-shape synthetic corpus (N(0,1) embeddings, x12 scaling like the CVE
harness, identical graph params eps/k/topk/p/sigma to test_2) on one TPU
chip and reports the steady-state build time.

Prints ONE JSON line:
  {"metric": "index_build_313k_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <speedup vs 744.07 s>}

Env knobs: BENCH_N / BENCH_F (corpus size), BENCH_WARMUP=0 to skip the
compile warm-up build, BENCH_HOST_ITEMS=1 to time the host-sourced build
(tunnel ingest included) instead of the device-resident one, BENCH_QPS=1
to additionally print the serving QPS lines (not the driver metric).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: first compiles of the large k-NN
# programs take many minutes through the remote-compile tunnel; later runs
# (including the driver's) reuse the artifacts.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
# The fused Pallas k-NN is the fast path (6.95s for the 313k corpus sweep
# vs 37.8s for the sort-based XLA path); ARROWSPACE_KNN_BACKEND=xla falls
# back to the chunked XLA kernel.
os.environ.setdefault("ARROWSPACE_KNN_BACKEND", "pallas")
try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

REFERENCE_BUILD_S = 744.07  # BASELINE.md: CVE 313,841 x 384, v0.17


def _wait_backend():
    """Retry transient tunnel outages at startup (bounded).

    The axon TPU tunnel occasionally refuses grants for a few minutes
    (observed: UNAVAILABLE at init after an interrupted run).  jax only
    caches *successful* backend init (xla_bridge.backends: `if _backends:
    return`), so re-calling jax.devices() genuinely retries.  Without
    this, one cold refusal loses the whole benchmark run.
    """
    import jax
    retries = int(os.environ.get("BENCH_BACKEND_RETRIES", 12))
    for attempt in range(retries + 1):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if attempt == retries:
                raise
            print(f"# backend unavailable (attempt {attempt + 1}/"
                  f"{retries}): {e}", file=sys.stderr)
            time.sleep(60)


def main():
    _wait_backend()
    n = int(os.environ.get("BENCH_N", 313841))
    f = int(os.environ.get("BENCH_F", 384))
    # CVE harness graph params (reference tests/test_2_CVE_db.py:33-39).
    gp = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535}

    from pyarrowspace_tpu import ArrowSpaceBuilder, get_phase_timings

    rng = np.random.default_rng(42)
    items_host = (rng.standard_normal((n, f), dtype=np.float32) * 12.0)

    # Stage the corpus into HBM before the timed region.  The reference
    # anchor (744 s) builds from rows already in process RAM; the
    # device-resident equivalent here is rows already in HBM.  On a
    # production TPU host the 482 MB host->HBM move is < 0.5 s of PCIe;
    # through THIS environment's loopback tunnel it is 14-37 s depending
    # on tunnel load (measured across runs), which would otherwise
    # dominate the metric with pure wire noise.  The staging time is
    # reported alongside; BENCH_HOST_ITEMS=1 times the host-sourced
    # build instead (ingest included, ops/ingest.py chunked streaming).
    staging_s = None
    if os.environ.get("BENCH_HOST_ITEMS", "0") == "1":
        items = items_host
    else:
        import jax.numpy as jnp
        t0 = time.perf_counter()
        from pyarrowspace_tpu.ops.ingest import ingest_corpus
        items = ingest_corpus(items_host, np.dtype(np.float32))
        items.block_until_ready()
        staging_s = round(time.perf_counter() - t0, 3)
        print(f"# corpus staged to device: {staging_s:.2f}s "
              f"(tunnel transfer, excluded from the timed build; "
              f"BENCH_HOST_ITEMS=1 to include)", file=sys.stderr)

    def one_build():
        t0 = time.perf_counter()
        aspace, gl = ArrowSpaceBuilder.build(gp, items)
        dt = time.perf_counter() - t0
        return aspace, gl, dt

    if os.environ.get("BENCH_WARMUP", "1") != "0":
        # Warm-up build compiles every kernel at the benchmark shapes.
        _, _, t_cold = one_build()
        print(f"# warm-up (includes compile): {t_cold:.2f}s", file=sys.stderr)

    aspace, gl, t_build = one_build()
    print(f"# phases: { {k: round(v, 3) for k, v in get_phase_timings().items()} }",
          file=sys.stderr)
    print(f"# nnodes={gl.nnodes} nedges={gl.nedges} "
          f"tau_star={aspace.tau_star:.6g}", file=sys.stderr)

    if os.environ.get("BENCH_QPS", "0") == "1":
        # Async-pipelined dispatch: issue all batches, sync once — measures
        # device throughput, not host-device round-trip latency.
        import jax.numpy as jnp
        from pyarrowspace_tpu.ops.search import fused_query_pipeline

        q_batch = int(os.environ.get("BENCH_QBATCH", 4096))
        reps = 8
        # Distinct query batches per rep — the runtime memoizes repeated
        # executions with identical inputs.
        rng_q = np.random.default_rng(7)
        batches = [jnp.asarray(items[rng_q.choice(n, q_batch)] * 1.01)
                   for _ in range(reps)]
        tau = jnp.asarray(0.62, dtype=batches[0].dtype)
        args = dict(topk=gl.params.topk,
                    rayleigh_normalized=aspace._rayleigh_normalized,
                    tau_mix=aspace._tau_mix)
        warm = fused_query_pipeline(
            aspace._data_unit, aspace._lambdas, aspace._lap_f, aspace._w_f,
            aspace._tau_star, batches[-1], tau, **args)
        _ = np.asarray(warm[0])   # force: block_until_ready is unreliable
        t0 = time.perf_counter()  # through the tunneled runtime
        outs = [fused_query_pipeline(
                    aspace._data_unit, aspace._lambdas, aspace._lap_f,
                    aspace._w_f, aspace._tau_star, qb, tau, **args)
                for qb in batches]
        _ = [np.asarray(o[0])[0, 0] for o in outs]
        dt = time.perf_counter() - t0
        qps = q_batch * reps / dt
        print(f"# serving: {qps:,.0f} QPS (batch {q_batch}, N={n}, F={f})",
              file=sys.stderr)

        # Quantized serving: int8 candidate scan + exact f32 rescore
        # (the >=100k QPS/chip path at 1M x 768), with the top-10 overlap
        # vs the exact f32 scan pinned alongside the throughput.
        from pyarrowspace_tpu.ops.quantize import quantize_rows
        from pyarrowspace_tpu.ops.search import (
            fused_query_pipeline_quantized)
        xq, scales = quantize_rows(aspace._data_unit)
        xq.block_until_ready()
        topk = gl.params.topk
        qargs = dict(topk=topk, rescore_m=4 * topk,
                     rayleigh_normalized=aspace._rayleigh_normalized,
                     tau_mix=aspace._tau_mix)
        lam32 = aspace._lambdas.astype(jnp.float32)
        xu32 = aspace._data_unit.astype(jnp.float32)
        warm_q = fused_query_pipeline_quantized(
            xu32, xq, scales, lam32, aspace._lap_f, aspace._w_f,
            aspace._tau_star, batches[-1], tau, **qargs)
        _ = np.asarray(warm_q[0])
        t0 = time.perf_counter()
        outs_q = [fused_query_pipeline_quantized(
                      xu32, xq, scales, lam32, aspace._lap_f, aspace._w_f,
                      aspace._tau_star, qb, tau, **qargs)
                  for qb in batches]
        _ = [np.asarray(o[0])[0, 0] for o in outs_q]
        dt_q = time.perf_counter() - t0
        qps_q = q_batch * reps / dt_q
        k_ov = min(10, topk)
        ie = np.asarray(outs[0][0])[:, :k_ov]
        iq = np.asarray(outs_q[0][0])[:, :k_ov]
        overlap = float(np.mean([len(set(ie[i]) & set(iq[i])) / k_ov
                                 for i in range(ie.shape[0])]))
        print(f"# serving int8+rescore: {qps_q:,.0f} QPS "
              f"(top-{k_ov} overlap vs exact f32: {overlap:.4f})",
              file=sys.stderr)

    # Timing convention recorded IN the artifact (ADVICE r2): the timed
    # region starts from device-resident rows unless BENCH_HOST_ITEMS=1;
    # staging_s is the excluded host->HBM transfer (null when included).
    print(json.dumps({
        "metric": "index_build_313k_s",
        "value": round(t_build, 3),
        "unit": "s",
        "vs_baseline": round(REFERENCE_BUILD_S / t_build, 2),
        "convention": ("host_items" if staging_s is None
                       else "device_resident"),
        "staging_excluded_s": staging_s,
    }))


if __name__ == "__main__":
    main()
