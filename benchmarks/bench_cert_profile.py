"""Phase profile of CERTIFIED serving at 1M x 768 (VERDICT r4 #2).

Certified-exact serving measured 117.2k QPS pipelined / 82.4k sync vs
270.9k for approximate ivf_block — this decomposes the gap same-session:

  scan       blocked_ivf_search(certify=False) at the certified q_block
  cert       certify=True minus certify=False (bound matrix + violations)
  sync       the per-batch host pull of (idx, vals, cert) through the
             tunnel (the pipelined stream hides it; sync mode pays it)
  qb sweep   certified q_block 8 vs 16: qb=16 halves the probe-DMA grid
             (ivf_block's default) IF the certification rate holds with
             lloyd_tighten'ed clusters (ivf_scan.py:789-796)
  e2e        search-batch-equivalent certified serve, sync + pipelined

All comparisons are same-process (tunnel weather varies ~1.5x across
runs).  Usage: [CERTP_N=1000000] [CERTP_F=768] [CERTP_BATCH=16384]
python benchmarks/bench_cert_profile.py
CPU smoke: ARROWSPACE_CPU=1 CERTP_N=20000 CERTP_F=64 CERTP_BATCH=256
           CERTP_CLUSTERS=64 CERTP_REPS=2
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
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (
        blocked_ivf_search, blocked_ivf_search_fused, build_blocked_ivf)
    from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch, dispersion_batch
    from pyarrowspace_tpu.graph.feature import build_feature_laplacian
    from pyarrowspace_tpu.reduction.pipeline import (lloyd_reseed,
                                                     lloyd_tighten,
                                                     planned_slab_cap)
    from pyarrowspace_tpu.spectral.taumode import (TAU_MIX, derive_tau_star,
                                                   synthesize)
    from pyarrowspace_tpu.core.params import TauMode

    n = int(os.environ.get("CERTP_N", 1_000_000))
    f = int(os.environ.get("CERTP_F", 768))
    q_batch = int(os.environ.get("CERTP_BATCH", 16384))
    k_cl = int(os.environ.get("CERTP_CLUSTERS", 4096))
    reps = int(os.environ.get("CERTP_REPS", 6))
    n_probe = int(os.environ.get("CERTP_NPROBE", 8))
    topk = 15
    tau = jnp.float32(0.62)
    rng = np.random.default_rng(0)

    # Mixture serving state, bench_serving recipe (same keys).
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, f), dtype=jnp.float32)
    kc, ka = jax.random.split(jax.random.PRNGKey(1))
    centers = jax.random.normal(kc, (k_cl, f), dtype=jnp.float32)
    assign_mix = jax.random.randint(ka, (n,), 0, k_cl)
    x = centers[assign_mix] + 0.35 * x
    xu = unit_normalize(x)
    w_f, lap_f, _ = build_feature_laplacian(x[: min(n, 65536)], k_f=15)
    e = rayleigh_batch(x, lap_f, normalized=False)
    ts = derive_tau_star(e, TauMode.MEDIAN)
    g = dispersion_batch(x, w_f, e)
    lams = synthesize(e, g, ts, TAU_MIX).astype(jnp.float32)
    lams.block_until_ready()
    del x, e, g, centers, assign_mix

    cf = float(os.environ.get("CERTP_IVF_CF", 1.5))
    cap_plan = planned_slab_cap(n, k_cl, cf)
    sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
    cents, assigns = lloyd_reseed(xu, xu[sel], 12, seed=0)
    cents, assigns = lloyd_tighten(xu, cents, max_size=cap_plan)
    ivf = build_blocked_ivf(xu, lams, np.asarray(cents),
                            np.asarray(assigns), capacity_factor=cf,
                            min_cap=cap_plan)
    ivf.slabs.block_until_ready()
    print(f"state ready: N={n:,} F={f} clusters={cents.shape[0]} "
          f"cap={ivf.cap}", flush=True)

    # In-distribution query batches (distinct per rep).
    kq = jax.random.PRNGKey(7)
    qsets, qlams = [], []
    for _ in range(reps):
        kq, k1, k2 = jax.random.split(kq, 3)
        rows = jax.random.randint(k1, (q_batch,), 0, n)
        qd = xu[rows] + (0.25 / np.sqrt(f)) * jax.random.normal(
            k2, (q_batch, f), dtype=jnp.float32)
        qsets.append(qd)
        # Pre-synthesized query lambdas for the non-fused kernel probes
        # (isolates routing/scan/cert from the synthesis stage).
        e_q = rayleigh_batch(qd, lap_f, normalized=False)
        g_q = dispersion_batch(qd, w_f, e_q)
        qlams.append(synthesize(e_q, g_q, ts, TAU_MIX).astype(jnp.float32))
    qn_sets = [unit_normalize(qd) for qd in qsets]
    qn_sets[-1].block_until_ready()

    results = {"config": {"n": n, "f": f, "q_batch": q_batch, "reps": reps,
                          "n_probe": n_probe, "topk": topk,
                          "clusters": int(cents.shape[0]), "cap": ivf.cap,
                          "backend": jax.default_backend()},
               "phases": {}}

    def timed(name, fn, pull=lambda o: int(np.asarray(o[0])[0, 0])):
        """Async-pipelined: dispatch all reps, then force each (order
        preserved); distinct inputs per rep (memoization guard)."""
        warm = fn(reps - 1)
        _ = pull(warm)
        t0 = time.perf_counter()
        outs = [fn(r) for r in range(reps)]
        _ = [pull(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        qps = q_batch / dt
        print(f"{name}: {dt * 1e3:.1f} ms/batch ({qps:,.0f} QPS)",
              flush=True)
        results["phases"][name] = {"ms_per_batch": round(dt * 1e3, 2),
                                   "qps": round(qps, 1)}
        return outs, dt

    # --- kernel-phase ladder (pre-synthesized lambdas) ----------------
    for qb in (8, 16):
        _, t_scan = timed(
            f"scan_qb{qb}",
            lambda r, qb=qb: blocked_ivf_search(
                ivf, qn_sets[r], qlams[r], tau, topk, n_probe=n_probe,
                q_block=qb))
        outs_c, t_cert = timed(
            f"scan+cert_qb{qb}",
            lambda r, qb=qb: blocked_ivf_search(
                ivf, qn_sets[r], qlams[r], tau, topk, n_probe=n_probe,
                q_block=qb, certify=True))
        rate = float(np.mean([np.asarray(o[2]).mean() for o in outs_c]))
        results["phases"][f"cert_overhead_qb{qb}"] = {
            "ms_per_batch": round((t_cert - t_scan) * 1e3, 2)}
        results["phases"][f"scan+cert_qb{qb}"]["cert_rate"] = round(rate, 4)
        print(f"  cert rate qb={qb}: {rate:.2%}", flush=True)

    # --- host-pull (certificate sync) cost ----------------------------
    out_ready = blocked_ivf_search(ivf, qn_sets[0], qlams[0], tau, topk,
                                   n_probe=n_probe, q_block=8,
                                   certify=True)
    _ = int(np.asarray(out_ready[0])[0, 0])   # fully materialized
    t0 = time.perf_counter()
    for _ in range(3):
        _ = (np.asarray(out_ready[0]), np.asarray(out_ready[1]),
             np.asarray(out_ready[2]))
    t_pull = (time.perf_counter() - t0) / 3
    print(f"result pull (idx+vals+cert, ready): {t_pull * 1e3:.1f} ms",
          flush=True)
    results["phases"]["result_pull"] = {
        "ms_per_batch": round(t_pull * 1e3, 2),
        "bytes": int(q_batch * topk * 8 + q_batch)}

    # --- end-to-end certified serve (fused synthesis), sync vs stream,
    # --- triple-pull vs packed-single-pull sync (pack_certified) -------
    from pyarrowspace_tpu.ops.pallas.ivf_scan import unpack_certified
    from pyarrowspace_tpu.serving import CertifiedStream
    for qb, packed, d2h in ((8, False, False), (16, False, False),
                            (16, True, False), (16, True, True)):
        def dispatch(qd, qb=qb, packed=packed, d2h=d2h):
            out = blocked_ivf_search_fused(
                ivf, qd, lap_f, w_f, ts, tau, topk, n_probe=n_probe,
                tau_mix=TAU_MIX, certify=True, q_block=qb,
                pack_out=packed)
            if d2h and hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()   # prefetch the packed result
            return out

        def finalize(_qd, out, packed=packed):
            if packed:
                i, v, c = unpack_certified(out, topk)
                return i, v, float(c.mean())
            return (np.asarray(out[0]), np.asarray(out[1]),
                    float(np.asarray(out[2]).mean()))

        _ = finalize(None, dispatch(qsets[-1]))   # warm
        t0 = time.perf_counter()
        outs = [finalize(None, dispatch(qd)) for qd in qsets]
        dt_sync = (time.perf_counter() - t0) / reps
        rate = float(np.mean([o[2] for o in outs]))
        stream = CertifiedStream(lambda qd: dispatch(qd),
                                 lambda qd, out: finalize(qd, out),
                                 depth=reps)
        t0 = time.perf_counter()
        for qd in qsets:
            stream.submit(qd)
        outs_p = stream.finish()
        dt_pipe = (time.perf_counter() - t0) / reps
        tag = (f"e2e_qb{qb}" + ("_packed" if packed else "")
               + ("_d2h" if d2h else ""))
        print(f"{tag}: sync {q_batch / dt_sync:,.0f} QPS "
              f"({dt_sync * 1e3:.1f} ms), pipelined "
              f"{q_batch / dt_pipe:,.0f} QPS ({dt_pipe * 1e3:.1f} ms), "
              f"cert {rate:.2%}", flush=True)
        results["phases"][tag] = {
            "sync_qps": round(q_batch / dt_sync, 1),
            "sync_ms": round(dt_sync * 1e3, 2),
            "pipelined_qps": round(q_batch / dt_pipe, 1),
            "pipelined_ms": round(dt_pipe * 1e3, 2),
            "cert_rate": round(rate, 4)}

    out_dir = (Path(__file__).resolve().parent / "output"
               / f"{int(time.time())}_cert_profile")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cert_profile.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out_dir}/cert_profile.json")


if __name__ == "__main__":
    main()
