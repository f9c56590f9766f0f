"""Decompose the certified-scan overhead with a variant ladder (round 5).

probe_cert_violations.py showed cert_violations itself is ~27 ms at the
[32768, 4352] shape — nowhere near the 269 ms cert overhead recorded in
1787164272_cert_profile_32k.  This ladder isolates where the rest lives,
on a REAL 1M x 768 index (same state recipe as bench_cert_profile):

  E_scan_only   _ivf_scan alone, probe tables precomputed (kernel floor)
  A_plain       _blocked_ivf_jit use_bound=True  (routing + scan)
  C_bound_mat   routing + scan + bound fully materialized (max-reduce
                consumer), NO cert_violations
  D_viol_const  + cert_violations against a CONSTANT threshold (breaks
                the viol->scan-output dependence; tests serialization)
  B_cert        _blocked_ivf_cert_jit as shipped

B-D = cost of the scan-output dependence; D-C = violations; C-A = bound
materialization; A-E = routing.  Usage:
  [LADDER_N=1000000] [LADDER_BATCH=32768] python benchmarks/probe_cert_ladder.py
CPU smoke: ARROWSPACE_CPU=1 LADDER_N=20000 LADDER_F=64 LADDER_BATCH=256 \
           LADDER_CLUSTERS=64 LADDER_REPS=2 python ...
"""

import functools
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
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas import ivf_scan as IS
    from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch, dispersion_batch
    from pyarrowspace_tpu.graph.feature import build_feature_laplacian
    from pyarrowspace_tpu.reduction.pipeline import (lloyd_reseed,
                                                     lloyd_tighten,
                                                     planned_slab_cap)
    from pyarrowspace_tpu.spectral.taumode import (TAU_MIX, derive_tau_star,
                                                   synthesize)
    from pyarrowspace_tpu.core.params import TauMode

    n = int(os.environ.get("LADDER_N", 1_000_000))
    f = int(os.environ.get("LADDER_F", 768))
    q_batch = int(os.environ.get("LADDER_BATCH", 32768))
    k_cl = int(os.environ.get("LADDER_CLUSTERS", 4096))
    reps = int(os.environ.get("LADDER_REPS", 4))
    n_probe = int(os.environ.get("LADDER_NPROBE", 8))
    topk = 15
    tau = jnp.float32(0.62)
    rng = np.random.default_rng(0)
    interpret = jax.default_backend() not in ("tpu", "axon")

    # Mixture serving state — bench_cert_profile recipe, same keys.
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

    cf = float(os.environ.get("LADDER_IVF_CF", 1.5))
    cap_plan = planned_slab_cap(n, k_cl, cf)
    sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
    cents, assigns = lloyd_reseed(xu, xu[sel], 12, seed=0)
    cents, assigns = lloyd_tighten(xu, cents, max_size=cap_plan)
    ivf = IS.build_blocked_ivf(xu, lams, np.asarray(cents),
                               np.asarray(assigns), capacity_factor=cf,
                               min_cap=cap_plan)
    ivf.slabs.block_until_ready()
    n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
    print(f"state ready: N={n:,} F={f} clusters={n_clusters} "
          f"cap={ivf.cap}", flush=True)

    kq = jax.random.PRNGKey(7)
    qn_sets, qlams = [], []
    for _ in range(reps):
        kq, k1, k2 = jax.random.split(kq, 3)
        rows = jax.random.randint(k1, (q_batch,), 0, n)
        qd = xu[rows] + (0.25 / np.sqrt(f)) * jax.random.normal(
            k2, (q_batch, f), dtype=jnp.float32)
        e_q = rayleigh_batch(qd, lap_f, normalized=False)
        g_q = dispersion_batch(qd, w_f, e_q)
        qlams.append(synthesize(e_q, g_q, ts, TAU_MIX).astype(jnp.float32))
        qn_sets.append(unit_normalize(qd))
    qn_sets[-1].block_until_ready()

    qb = 8
    q = q_batch
    k = topk
    kw = dict(k=k, qb=qb, q=q, cap=ivf.cap, n_probe=n_probe,
              interpret=interpret)
    base = (ivf.centroids_unit, ivf.slabs, ivf.slab_lambdas, ivf.slab_ids)
    bstate = (ivf.radii, ivf.lam_lo, ivf.lam_hi, ivf.nonempty)

    results = {"config": {"n": n, "f": f, "q_batch": q_batch, "reps": reps,
                          "n_probe": n_probe, "topk": topk, "qb": qb,
                          "clusters": n_clusters, "cap": ivf.cap,
                          "backend": jax.default_backend()},
               "phases": {}}

    def timed(name, fn, pull=lambda o: int(np.asarray(o[0])[0, 0])):
        warm = fn(reps - 1)
        _ = pull(warm)
        t0 = time.perf_counter()
        outs = [fn(r) for r in range(reps)]
        _ = [pull(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:.1f} ms/batch ({q_batch / dt:,.0f} QPS)",
              flush=True)
        results["phases"][name] = {"ms_per_batch": round(dt * 1e3, 2),
                                   "qps": round(q_batch / dt, 1)}
        return outs

    # E: scan kernel only — probe tables + padded inputs precomputed.
    q_pad = ((q + qb - 1) // qb) * qb
    lam_row = ivf.slab_lambdas.reshape(1, -1)
    id_row = ivf.slab_ids.reshape(1, -1)

    # All big operands are ARGUMENTS, never closure constants: a jitted
    # closure over the 5 GB slab array embeds it in the remote-compile
    # request (HTTP 413 / broken pipe — CLAUDE.md rule, re-confirmed the
    # hard way in this probe's first run).
    @functools.partial(jax.jit, static_argnames=tuple(kw))
    def route_only(cu, sl, slam, sid, qn32, lamq32, radii, lam_lo,
                   lam_hi, nonempty, **skw):
        *_, probe_tbl, _b = IS._route_scan_core(
            cu, sl, slam, sid, qn32, lamq32, tau,
            bound_state=(radii, lam_lo, lam_hi, nonempty), **skw)
        return probe_tbl

    pre = []
    for r in range(reps):
        probe_tbl = route_only(*base, qn_sets[r], qlams[r], *bstate, **kw)
        order = np.argsort(
            np.asarray(jnp.argmax(jnp.matmul(qn_sets[r],
                                             ivf.centroids_unit.T), axis=1)),
            kind="stable")
        qn_pad = jnp.pad(qn_sets[r][order], ((0, q_pad - q), (0, 0)))
        lamq_pad = jnp.broadcast_to(
            jnp.pad(qlams[r][order], (0, q_pad - q))[:, None],
            (q_pad, 128))
        pre.append((qn_pad, jnp.asarray(lamq_pad), probe_tbl))
    pre[-1][0].block_until_ready()

    timed("E_scan_only",
          lambda r: IS._ivf_scan(ivf.slabs, lam_row, id_row, pre[r][0],
                                 pre[r][1], pre[r][2], tau, k=k,
                                 q_block=qb, cap=ivf.cap, n_probe=n_probe,
                                 interpret=interpret))

    # A: shipped plain path (bound-ordered routing + scan).
    timed("A_plain",
          lambda r: IS._blocked_ivf_jit(*base, qn_sets[r], qlams[r], tau,
                                        *bstate, use_bound=True, **kw))

    # C: + bound fully materialized (cheap max-reduce consumer), no viol.
    @functools.partial(jax.jit, static_argnames=tuple(kw))
    def c_bound_mat(cu, sl, slam, sid, qn32, lamq32, radii, lam_lo,
                    lam_hi, nonempty, **skw):
        sq = skw["q"]
        i, s, inv, _, _, probe_tbl, bound = IS._route_scan_core(
            cu, sl, slam, sid, qn32, lamq32, tau,
            bound_state=(radii, lam_lo, lam_hi, nonempty), **skw)
        return i[:sq][inv[:sq]], s[:sq][inv[:sq]], jnp.max(bound, axis=1)

    timed("C_bound_mat",
          lambda r: c_bound_mat(*base, qn_sets[r], qlams[r], *bstate,
                                **kw))

    # D: + cert_violations against a CONSTANT threshold (no dependence on
    # the scan output — if B >> D the cost is the serialization).
    @functools.partial(jax.jit, static_argnames=tuple(kw))
    def d_viol_const(cu, sl, slam, sid, qn32, lamq32, radii, lam_lo,
                     lam_hi, nonempty, **skw):
        sq, sqb = skw["q"], skw["qb"]
        i, s, inv, _, _, probe_tbl, bound = IS._route_scan_core(
            cu, sl, slam, sid, qn32, lamq32, tau,
            bound_state=(radii, lam_lo, lam_hi, nonempty), **skw)
        viol = IS.cert_violations(bound, jnp.full((sq,), 0.9,
                                                  dtype=jnp.float32),
                                  probe_tbl, jnp.float32(0.0), qb=sqb,
                                  q=sq)
        return i[:sq][inv[:sq]], s[:sq][inv[:sq]], (~viol)[inv[:sq]]

    timed("D_viol_const",
          lambda r: d_viol_const(*base, qn_sets[r], qlams[r], *bstate,
                                 **kw))

    # B: shipped certified path.
    timed("B_cert",
          lambda r: IS._blocked_ivf_cert_jit(*base, qn_sets[r], qlams[r],
                                             tau, *bstate,
                                             jnp.float32(0.0), **kw))

    p = results["phases"]
    results["deltas_ms"] = {
        "routing (A-E)": round(p["A_plain"]["ms_per_batch"]
                               - p["E_scan_only"]["ms_per_batch"], 2),
        "bound_mat (C-A)": round(p["C_bound_mat"]["ms_per_batch"]
                                 - p["A_plain"]["ms_per_batch"], 2),
        "violations (D-C)": round(p["D_viol_const"]["ms_per_batch"]
                                  - p["C_bound_mat"]["ms_per_batch"], 2),
        "kth_dependence (B-D)": round(p["B_cert"]["ms_per_batch"]
                                      - p["D_viol_const"]["ms_per_batch"],
                                      2),
    }
    print(json.dumps(results["deltas_ms"], indent=2), flush=True)

    out_dir = (Path(__file__).resolve().parent / "output"
               / f"{int(time.time())}_cert_ladder")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cert_ladder.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out_dir}/cert_ladder.json")


if __name__ == "__main__":
    main()
