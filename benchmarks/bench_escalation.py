"""Collapse-escalation ladder at the north-star serving shape (round 5).

serving_stream's guardrail ladder doubles n_probe on certificate
collapse before degrading to the fallback.  This demonstrates the
ladder END TO END on the PUBLIC surface at 1M x 768: full standard
build (bench_build_1m recipe) -> enable_ivf -> serving_stream starting
at n_probe=4 with a cert_floor chosen between the measured np=4 and
np=8 base rates, so the first batch trips the guardrail, the stream
escalates to n_probe=8, and the remaining batches serve at the full
certified rate — the recovery the ladder exists for (direct fallback
would serve the ~75k subtile rate instead of ~190k certified).

Recorded fields: warm base cert rates at np=4/np=8, the chosen floor,
escalated_at / degraded_at, per-stream cert rates, pipelined QPS.  If
np=4 already certifies every batch at the chosen state the ladder has
nothing to cure; the script records that instead of forcing a fake
collapse (rates are data/seed dependent — CLAUDE.md round-3).

Usage:
  [ESC_N=1000000] [ESC_F=768] [ESC_BATCH=32768] [ESC_CLUSTERS=4096]
  python benchmarks/bench_escalation.py
CPU smoke: ARROWSPACE_CPU=1 ESC_N=6000 ESC_F=64 ESC_BATCH=256 \
           ESC_CLUSTERS=48 ESC_BATCHES=4 python ...
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
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
            print(f"# backend unavailable ({attempt + 1}/{retries}): {e}",
                  file=sys.stderr, flush=True)
            time.sleep(60)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp
    from pyarrowspace_tpu import ArrowSpaceBuilder

    def hbm(tag):
        # Device memory census (OOM forensics at the 1M x 768 shape).
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            used = ms.get("bytes_in_use", 0) / 2**30
            lim = ms.get("bytes_limit", 0) / 2**30
            peak = ms.get("peak_bytes_in_use", 0) / 2**30
            print(f"# hbm[{tag}]: in_use={used:.2f} GiB "
                  f"peak={peak:.2f} limit={lim:.2f}", flush=True)
        except Exception as e:
            print(f"# hbm[{tag}]: memory_stats unavailable ({e})",
                  flush=True)
        live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
        tot = sum(a.nbytes for a in live) / 2**30
        tops = ", ".join(f"{a.shape}/{a.dtype}={a.nbytes / 2**30:.2f}"
                         for a in live[:6])
        print(f"# live[{tag}]: {len(live)} arrays {tot:.2f} GiB; "
              f"top: {tops}", flush=True)

    n = int(os.environ.get("ESC_N", 1_000_000))
    f = int(os.environ.get("ESC_F", 768))
    q_batch = int(os.environ.get("ESC_BATCH", 32768))
    k_mix = int(os.environ.get("ESC_CLUSTERS", 4096))
    n_batches = int(os.environ.get("ESC_BATCHES", 8))
    # normalise=True stores the unit rows (stored IS data_unit — one
    # corpus copy on device, not two).  Single-chip HBM at this shape:
    # xu 2.86 GiB + blocked slabs ~6.2 GiB at capacity_factor 1.5; the
    # normalise=False default adds another 2.86 GiB raw-corpus copy and
    # the un-threaded factor-2.0 slab (the round-5 bug this bench
    # caught) was +2 GiB more — together they overflowed the chip.
    gp = {"eps": 1.31, "k": 25, "topk": 15, "p": 2.0, "sigma": 0.535,
          "normalise": True}

    # Mixture corpus generated ON DEVICE (bench_build_1m recipe).
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, f), dtype=jnp.float32)
    kc, ka = jax.random.split(jax.random.PRNGKey(1))
    centers = jax.random.normal(kc, (k_mix, f), dtype=jnp.float32)
    assign_mix = jax.random.randint(ka, (n,), 0, k_mix)
    items = centers[assign_mix] + 0.35 * x
    items.block_until_ready()
    del x, centers, assign_mix

    hbm("pre-build")
    t0 = time.perf_counter()
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    print(f"# build: {time.perf_counter() - t0:.1f}s", flush=True)
    del items   # same buffer as aspace._data when passed as a device array
    hbm("post-build")
    # Free the item-graph ELL (~4 GB at 1M x 768) and the extend state:
    # the serving path reads only gl.params, and corpus + graph + IVF
    # slabs do NOT co-fit in one chip's 16 GB HBM at this shape (a
    # production deployment persists the graph and serves from the
    # loaded index — bench_build_1m BUILD1M_SAVE -> bench_serving
    # SERV_INDEX; this bench is about the serving-stream ladder).
    gl._nbr_idx = jnp.zeros((n, 1), dtype=jnp.int32)   # keeps nnodes
    gl._nbr_w = jnp.zeros((n, 1), dtype=jnp.float32)
    aspace._knn_dist = aspace._knn_idx = None
    hbm("post-free")
    t0 = time.perf_counter()
    aspace.enable_ivf(n_clusters=k_mix, capacity_factor=1.5)
    print(f"# enable_ivf: {time.perf_counter() - t0:.1f}s", flush=True)
    hbm("post-enable_ivf")
    t0 = time.perf_counter()
    aspace._ensure_ivf_blocked()   # slab build = the OOM site; isolate it
    print(f"# blocked_ivf: {time.perf_counter() - t0:.1f}s", flush=True)
    hbm("post-blocked")

    # In-distribution query batches (distinct per batch), staged on
    # DEVICE before the timed region — same protocol as bench_serving
    # (its recorded QPS assumes queries arrive device-resident from an
    # upstream encoder; submitting host arrays adds an 8 x 96 MB tunnel
    # upload to the timed stream and was measured 13x slower e2e).
    kq = jax.random.PRNGKey(7)
    batches = []
    for _ in range(n_batches + 3):
        kq, k1, k2 = jax.random.split(kq, 3)
        rows = jax.random.randint(k1, (q_batch,), 0, n)
        qd = (aspace._data[rows]
              + (0.25 / np.sqrt(f)) * jax.random.normal(
                  k2, (q_batch, f), dtype=jnp.float32))
        qd.block_until_ready()
        batches.append(qd)
    warms, batches = batches[:3], batches[3:]

    # Warm the probe-depth ladder OUTSIDE the timed stream (compile +
    # rate observation — the floor must sit between two base rates).
    rates = {}
    for np_w, qb in zip((2, 4, 8), warms):
        _i, _v, c = aspace.search_batch(qb, gl, 0.62, mode="ivf_block",
                                        n_probe=np_w, certify=True)
        rates[np_w] = float(np.asarray(c).mean())
        print(f"warm np={np_w}: base cert {rates[np_w]:.4f}", flush=True)

    results = {"config": {"n": n, "f": f, "q_batch": q_batch,
                          "n_batches": n_batches, "graph_params": gp,
                          "backend": jax.default_backend()},
               "warm_base_cert": {f"np{k}": round(v, 6)
                                  for k, v in rates.items()}}

    # Start the stream at the shallowest depth whose base rate sits
    # below np=8's — the regime the ladder exists for.
    start = next((d for d in (2, 4) if rates[d] < rates[8]), None)
    if start is None:
        # Nothing for the ladder to cure on this state/seed — record
        # the observation honestly instead of faking a collapse.
        results["ladder"] = ("not triggerable: np=2/np=4 base rates "
                             f"{rates[2]:.4f}/{rates[4]:.4f} >= np=8 "
                             f"{rates[8]:.4f}")
        print(results["ladder"], flush=True)
    else:
        floor = min(0.9999, 0.5 * (rates[start] + rates[8]))
        results["start_n_probe"] = start
        results["cert_floor"] = round(floor, 5)
        stream = aspace.serving_stream(gl, 0.62, n_probe=start, depth=4,
                                       cert_floor=floor, floor_patience=1,
                                       fallback_mode="auto",
                                       probe_escalations=2)
        t0 = time.perf_counter()
        for qb in batches:
            stream.submit(qb)
        outs = stream.finish()
        t_total = time.perf_counter() - t0
        results["ladder"] = {
            "escalated_at": stream.escalated_at,
            "degraded_at": stream.degraded_at,
            "base_cert_rates": [round(float(r), 4) for _, _, r in outs],
            "pipelined_qps": round(n_batches * q_batch / t_total, 1),
            "total_s": round(t_total, 3),
        }
        print(json.dumps(results["ladder"], indent=2), flush=True)

    out_dir = (Path(__file__).resolve().parent / "output"
               / f"{int(time.time())}_escalation_1m")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "escalation.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out_dir}/escalation.json")


if __name__ == "__main__":
    main()
