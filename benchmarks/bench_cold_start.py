"""Deployment cold-start A/B: does the persistent XLA compilation cache
actually amortize first-process compile time across processes?

VERDICT r4 weak #4: BENCH_r04 recorded a 67.28 s warm-up (compile) for a
3.36 s build — 20x the build itself — and nothing showed the
JAX_COMPILATION_CACHE_DIR bench.py sets doing anything across processes.
This benchmark launches the SAME child workload twice in fresh Python
processes sharing one compilation-cache directory:

  run "cold": empty cache dir — every program compiles from scratch;
  run "warm": same dir, fresh process — compiles should be cache hits.

The child builds the standard index at the bench shape (default
313,841 x 384, bench.py's headline), then serves one fused exact batch
and one certified ivf_block batch (the two flagship serving programs),
timing the FIRST call of each program (includes compile) and a
steady-state repeat.  The deployment-relevant number is the cold->warm
drop of those first-call times.

Usage:
  python benchmarks/bench_cold_start.py                # TPU, bench shape
  ARROWSPACE_CPU=1 COLD_N=2000 COLD_F=48 COLD_BATCH=64 \
      python benchmarks/bench_cold_start.py            # CPU smoke
Knobs: COLD_N / COLD_F / COLD_BATCH / COLD_IVF=0 (skip certified leg) /
COLD_CACHE_DIR (reuse an existing cache dir: runs warm leg only).
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def child():
    """One process-lifetime measurement; prints ONE JSON line."""
    from protocols import force_cpu_if_requested
    force_cpu_if_requested()
    t_proc0 = time.perf_counter()
    import jax
    # Cache dir comes from the parent (never setdefault here: the A/B is
    # the point).  min_compile_time 0 so even small serving programs are
    # cached — deployments care about the whole compile set.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    jax.devices()  # backend init (tunnel grant on TPU)
    t_backend = time.perf_counter() - t_proc0

    import jax.numpy as jnp
    import numpy as np
    from pyarrowspace_tpu import ArrowSpaceBuilder

    n = int(os.environ.get("COLD_N", 313841))
    f = int(os.environ.get("COLD_F", 384))
    q_batch = int(os.environ.get("COLD_BATCH", 4096))
    gp = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535}

    # Corpus generated ON DEVICE: host->device staging is tunnel wire
    # time, not compile time, and would blur the measurement.
    x = (jax.random.normal(jax.random.PRNGKey(0), (n, f),
                           dtype=jnp.float32) * 12.0)
    x.block_until_ready()

    t0 = time.perf_counter()
    aspace, gl = ArrowSpaceBuilder.build(gp, x)
    t_first_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    aspace, gl = ArrowSpaceBuilder.build(gp, x)
    t_steady_build = time.perf_counter() - t0

    out = {
        "backend_init_s": round(t_backend, 3),
        "first_build_s": round(t_first_build, 3),
        "steady_build_s": round(t_steady_build, 3),
        "n": n, "f": f,
    }

    rng = np.random.default_rng(3)

    def one_serve(seed):
        qs = jnp.asarray(
            rng.standard_normal((q_batch, f)).astype(np.float32))
        t0 = time.perf_counter()
        r = aspace.search_batch(qs, gl, tau=0.62, mode="exact")
        _ = np.asarray(r[0])[0, 0]   # real device->host pull
        return time.perf_counter() - t0

    out["first_serve_exact_s"] = round(one_serve(0), 3)
    out["steady_serve_exact_s"] = round(one_serve(1), 3)

    if os.environ.get("COLD_IVF", "1") == "1":
        t0 = time.perf_counter()
        aspace.enable_ivf()
        out["enable_ivf_s"] = round(time.perf_counter() - t0, 3)

        def one_cert(seed):
            qs = jnp.asarray(
                rng.standard_normal((q_batch, f)).astype(np.float32))
            t0 = time.perf_counter()
            r = aspace.search_batch(qs, gl, tau=0.62, mode="certified",
                                    n_probe=8)
            _ = np.asarray(r[0])[0, 0]
            return time.perf_counter() - t0

        out["first_serve_certified_s"] = round(one_cert(0), 3)
        out["steady_serve_certified_s"] = round(one_cert(1), 3)

    out["total_process_s"] = round(time.perf_counter() - t_proc0, 3)
    print("COLD_START_JSON " + json.dumps(out), flush=True)


def run_child(cache_dir: str, label: str) -> dict:
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    print(f"# [{label}] launching child (cache={cache_dir}) ...",
          flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-u", __file__, "--child"], env=env,
        capture_output=True, text=True)
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout)
        raise RuntimeError(f"{label} child failed rc={proc.returncode}")
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("COLD_START_JSON ")][-1]
    rec = json.loads(line[len("COLD_START_JSON "):])
    rec["wall_s"] = round(wall, 3)
    print(f"# [{label}] {json.dumps(rec)}", flush=True)
    return rec


def main():
    reuse = os.environ.get("COLD_CACHE_DIR")
    if reuse:
        cache_dir, runs = reuse, {"warm": run_child(reuse, "warm")}
    else:
        cache_dir = tempfile.mkdtemp(prefix="jax_cache_coldstart_")
        runs = {"cold": run_child(cache_dir, "cold"),
                "warm": run_child(cache_dir, "warm")}
    n_entries = len(list(Path(cache_dir).glob("*")))
    result = {
        "bench": "cold_start",
        "cache_dir_entries": n_entries,
        "runs": runs,
        "env": {k: os.environ.get(k) for k in
                ("COLD_N", "COLD_F", "COLD_BATCH", "COLD_IVF",
                 "ARROWSPACE_CPU") if os.environ.get(k)},
    }
    if "cold" in runs:
        c, w = runs["cold"], runs["warm"]
        result["summary"] = {
            "first_build_cold_vs_warm_s":
                [c["first_build_s"], w["first_build_s"]],
            "first_build_compile_recovered_frac": round(
                1.0 - max(w["first_build_s"] - w["steady_build_s"], 0.0)
                / max(c["first_build_s"] - c["steady_build_s"], 1e-9), 3),
            "total_process_cold_vs_warm_s":
                [c["total_process_s"], w["total_process_s"]],
        }
    ts = int(time.time())
    out_dir = REPO / "benchmarks" / "output" / f"{ts}_cold_start"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "cold_start.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    print(f"# results -> {out_dir / 'cold_start.json'}", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
