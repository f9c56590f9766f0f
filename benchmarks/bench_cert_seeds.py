"""Multi-seed certification-rate sweep at realistic scale (VERDICT r4 #4).

The round-3/4 cert-robustness evidence was toy-scale (1500 x 48 CPU);
the observed collapses were at 1M (np=4 -> 4.8k QPS on one bad
seed/batch mix).  This records, on the TPU at >= 262k x 768, the base
certification rate across CLUSTERING seeds and n_probe in {4, 8}, plus
the rate after one bound-ordered widening round — the floor evidence
behind the "deploy np>=8" guidance and the n_probe volatility warning
(core/space.py).

Usage: [CSEED_N=262144] [CSEED_F=768] [CSEED_SEEDS=5] python
benchmarks/bench_cert_seeds.py
CPU smoke: ARROWSPACE_CPU=1 CSEED_N=20000 CSEED_F=64 CSEED_CLUSTERS=128
           CSEED_SEEDS=2 CSEED_BATCH=256
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
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
            print(f"# backend unavailable ({attempt + 1}/{retries}): {e}",
                  file=sys.stderr, flush=True)
            time.sleep(60)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.reduction.pipeline import (lloyd_reseed,
                                                     lloyd_tighten,
                                                     planned_slab_cap)

    n = int(os.environ.get("CSEED_N", 262_144))
    f = int(os.environ.get("CSEED_F", 768))
    k_cl = int(os.environ.get("CSEED_CLUSTERS", 1024))
    n_q = int(os.environ.get("CSEED_BATCH", 16384))
    n_seeds = int(os.environ.get("CSEED_SEEDS", 5))
    tau = jnp.float32(0.62)
    topk = 15

    # One mixture corpus (the DATA is fixed; the sweep varies the
    # CLUSTERING seed — that is where the observed collapse lives).
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, f), dtype=jnp.float32)
    kc, ka = jax.random.split(jax.random.PRNGKey(1))
    centers = jax.random.normal(kc, (k_cl, f), dtype=jnp.float32)
    x = centers[jax.random.randint(ka, (n,), 0, k_cl)] + 0.35 * x
    xu = unit_normalize(x)
    lams = jnp.zeros((n,), jnp.float32) + 0.62   # lambda plays no role in
    # the certificate's geometry terms; a flat lambda isolates the
    # radius/bound behavior the seed sweep is about (the real-lambda
    # cert rates are recorded in 1787159040_serving_real_index).
    del x, centers

    # In-distribution queries (fixed across seeds — same batch mix).
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(7))
    rows = jax.random.randint(kq1, (n_q,), 0, n)
    q = xu[rows] + (0.25 / np.sqrt(f)) * jax.random.normal(
        kq2, (n_q, f), dtype=jnp.float32)
    qn = unit_normalize(q)
    lam_q = jnp.zeros((n_q,), jnp.float32) + 0.62
    qn.block_until_ready()

    cf = float(os.environ.get("CSEED_IVF_CF", 1.5))
    cap_plan = planned_slab_cap(n, k_cl, cf)
    results = {"config": {"n": n, "f": f, "clusters_req": k_cl,
                          "cap": cap_plan, "n_q": n_q,
                          "backend": jax.default_backend()},
               "seeds": {}}
    rng = np.random.default_rng(123)
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
        cents, assigns = lloyd_reseed(xu, xu[sel], 12, seed=seed)
        cents, assigns = lloyd_tighten(xu, cents, max_size=cap_plan)
        ivf = build_blocked_ivf(xu, lams, np.asarray(cents),
                                np.asarray(assigns), capacity_factor=cf,
                                min_cap=cap_plan)
        ivf.slabs.block_until_ready()
        row = {"clusters": int(cents.shape[0]),
               "cluster_s": round(time.perf_counter() - t0, 1)}
        for np_ in (4, 8):
            _, _, cert = blocked_ivf_search(ivf, qn, lam_q, tau, topk,
                                            n_probe=np_, certify=True)
            base = float(np.asarray(cert).mean())
            # One bound-ordered widening round at 2*np on the refusals.
            ref = np.flatnonzero(~np.asarray(cert))
            widened = base
            if ref.size:
                pad = 1 << int(np.ceil(np.log2(max(ref.size, 16))))
                sel_r = np.concatenate(
                    [ref, np.full(pad - ref.size, ref[0])])
                _, _, cert2 = blocked_ivf_search(
                    ivf, qn[jnp.asarray(sel_r)], lam_q[:pad], tau, topk,
                    n_probe=2 * np_, certify=True)
                fixed = np.asarray(cert2)[: ref.size].sum()
                widened = (np.asarray(cert).sum() + fixed) / n_q
            row[f"np{np_}"] = {"base_cert": round(base, 4),
                               "after_one_widen": round(float(widened), 4)}
            print(f"seed {seed} np={np_}: base {base:.2%}, "
                  f"after one widen {widened:.2%} "
                  f"({row['clusters']} clusters)", flush=True)
        results["seeds"][str(seed)] = row

    # Floor summary (what the pinning test asserts).
    for np_ in (4, 8):
        bases = [results["seeds"][s][f"np{np_}"]["base_cert"]
                 for s in results["seeds"]]
        wids = [results["seeds"][s][f"np{np_}"]["after_one_widen"]
                for s in results["seeds"]]
        results[f"np{np_}_floor"] = {
            "base_min": min(bases), "base_max": max(bases),
            "widened_min": min(wids)}
        print(f"np={np_}: base in [{min(bases):.2%}, {max(bases):.2%}], "
              f"widened floor {min(wids):.2%}", flush=True)

    out = (Path(__file__).resolve().parent / "output"
           / f"{int(time.time())}_cert_seeds")
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "cert_seeds.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out}/cert_seeds.json")


if __name__ == "__main__":
    main()
