"""Full standard index build at the north-star serving scale (1M x 768).

VERDICT r4 #1: bench.py's headline is 313k x 384 and bench_serving.py
SYNTHESIZES its serving state — so the exact Pallas k-NN, the chunked
symmetrize (`symmetrize_to_ell_chunked`, gated at n*k > 20M and F >= 512,
exactly this regime) and the ELL budget/auto-widen path had no TPU
evidence at 1M x 768.  This runs the FULL standard build (ingest ->
pallas k-NN -> chunked symmetrize -> reduction -> feature Laplacian ->
lambdas) on a 1M x 768 Gaussian-mixture corpus (the bench_serving
recipe, so a saved index serves the same distribution bench_serving
measures) and records a BENCH-style artifact with the phase split.

No reference anchor exists at this size (the 744 s anchor is 313k x 384,
/root/reference/tests/output/1761047573_v0_17/test_results.txt); the
artifact stands alone as the at-scale build evidence.

Usage:
  [BUILD1M_N=1000000] [BUILD1M_F=768] [BUILD1M_WARMUP=1]
  [BUILD1M_SAVE=/path/idx.npz] [BUILD1M_CLUSTERS=4096]
  python benchmarks/bench_build_1m.py
CPU smoke: ARROWSPACE_CPU=1 BUILD1M_N=6000 BUILD1M_F=64 ...
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    # Env defaults live in main(), NOT at module top level: the test
    # suite imports every bench script (tests/test_benchmarks_import.py),
    # and an import-time ARROWSPACE_KNN_BACKEND=pallas leaked into later
    # tests whose exactness contracts pin the XLA backend (test_extend,
    # test_golden_pipeline) — 11 ordering-dependent failures.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("ARROWSPACE_KNN_BACKEND", "pallas")
    from protocols import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    retries = int(os.environ.get("BENCH_BACKEND_RETRIES", 12))
    for attempt in range(retries + 1):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == retries:
                raise
            print(f"# backend unavailable (attempt {attempt + 1}/"
                  f"{retries}): {e}", file=sys.stderr, flush=True)
            time.sleep(60)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyarrowspace_tpu import ArrowSpaceBuilder, get_phase_timings

    n = int(os.environ.get("BUILD1M_N", 1_000_000))
    f = int(os.environ.get("BUILD1M_F", 768))
    k_mix = int(os.environ.get("BUILD1M_CLUSTERS", 4096))
    # The reference CVE harness graph params (tests/test_2_CVE_db.py:33-39)
    # — same set as bench.py's headline, at the serving shape.
    gp = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535}

    # Mixture corpus generated ON DEVICE, bit-matching bench_serving.py's
    # SERV_MIXTURE=1 recipe (same keys/noise), so a saved index serves the
    # exact distribution the serving benchmark measures.  A 1M x 768 f32
    # corpus is 3 GB — ~100 s of tunnel if host-generated, milliseconds of
    # on-device RNG.
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, f), dtype=jnp.float32)
    kc, ka = jax.random.split(jax.random.PRNGKey(1))
    centers = jax.random.normal(kc, (k_mix, f), dtype=jnp.float32)
    assign_mix = jax.random.randint(ka, (n,), 0, k_mix)
    items = centers[assign_mix] + 0.35 * x
    items.block_until_ready()
    del x, centers, assign_mix

    def one_build():
        t0 = time.perf_counter()
        aspace, gl = ArrowSpaceBuilder.build(gp, items)
        dt = time.perf_counter() - t0
        return aspace, gl, dt

    t_cold = None
    if os.environ.get("BUILD1M_WARMUP", "1") != "0":
        aspace, gl, t_cold = one_build()
        print(f"# warm-up (includes compile): {t_cold:.2f}s",
              file=sys.stderr, flush=True)
        del aspace, gl   # free ~7 GB of build outputs before the timed run

    aspace, gl, t_build = one_build()
    phases = {k: round(v, 3) for k, v in get_phase_timings().items()}
    print(f"# phases: {phases}", file=sys.stderr)
    print(f"# nnodes={gl.nnodes} nedges={gl.nedges} "
          f"n_dropped={gl.n_dropped_edges} "
          f"tau_star={aspace.tau_star:.6g}", file=sys.stderr, flush=True)

    results = {
        "metric": "index_build_1m_s",
        "value": round(t_build, 3),
        "unit": "s",
        "config": {"n": n, "f": f, "mixture_clusters": k_mix,
                   "graph_params": gp,
                   "backend": jax.default_backend(),
                   "knn_backend": os.environ.get("ARROWSPACE_KNN_BACKEND"),
                   "convention": "device_resident"},
        "warmup_incl_compile_s": (round(t_cold, 3)
                                  if t_cold is not None else None),
        "phases_s": phases,
        "graph": {"nnodes": gl.nnodes, "nedges": gl.nedges,
                  "n_dropped": int(gl.n_dropped_edges),
                  "ell_width": int(gl.neighbor_indices.shape[1])},
        "tau_star": float(aspace.tau_star),
        "lambda_stats": {
            "mean": float(np.mean(aspace.lambdas())),
            "std": float(np.std(aspace.lambdas())),
            "min": float(np.min(aspace.lambdas())),
            "max": float(np.max(aspace.lambdas()))},
    }
    out_dir = (Path(__file__).resolve().parent / "output"
               / f"{int(time.time())}_build_1m")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "build_1m_results.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out_dir}/build_1m_results.json", file=sys.stderr)
    print(json.dumps({"metric": "index_build_1m_s",
                      "value": round(t_build, 3), "unit": "s"}))

    save_path = os.environ.get("BUILD1M_SAVE")
    if save_path:
        from pyarrowspace_tpu.io.persist import save_index
        t0 = time.perf_counter()
        save_index(save_path, aspace, gl)
        print(f"# saved index to {save_path} in "
              f"{time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(save_path) / 1e9:.2f} GB)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
