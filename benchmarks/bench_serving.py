"""Serving-throughput benchmark: exact f32 / exact bf16 / IVF QPS.

Measures the BASELINE.json north-star (>=100k QPS/chip at 1M x 768) with
async-pipelined dispatches (device throughput, not tunnel latency).

Usage: [SERV_N=1000000] [SERV_F=768] [SERV_BATCH=4096] python
benchmarks/bench_serving.py
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
    force_cpu_if_requested()   # ARROWSPACE_CPU=1: CPU smoke runs off-TPU
    import jax
    # Patient backend init (same recipe as bench.py:_wait_backend): the
    # axon tunnel refuses grants for minutes-to-hours at a time, and jax
    # only caches SUCCESSFUL backend init, so retrying genuinely retries.
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

    index_path = os.environ.get("SERV_INDEX")
    mixture = (os.environ.get("SERV_MIXTURE", "0") == "1"
               or bool(index_path))
    if index_path:
        # Serve from a REAL built index (bench_build_1m.py BUILD1M_SAVE)
        # instead of synthesized state (VERDICT r4 #1: the serving
        # flagship must rest on an index whose build path ran at scale).
        # Host-side np.load + a selective push: only the arrays serving
        # needs cross the tunnel (data_unit + lambdas + the tiny F x F
        # state, ~3 GB at 1M x 768) — io.load_index would also push the
        # raw data, ELL graph and k-NN state (~10 GB of HBM).
        from pyarrowspace_tpu.ops.ingest import ingest_corpus
        z = np.load(index_path)
        n, f = z["data_unit"].shape
        t0 = time.perf_counter()
        xu = ingest_corpus(
            np.ascontiguousarray(z["data_unit"], dtype=np.float32),
            np.dtype(np.float32))
        lams = jnp.asarray(np.asarray(z["lambdas"], dtype=np.float32))
        lap_f = jnp.asarray(np.asarray(z["lap_f"], dtype=np.float32))
        w_f = jnp.asarray(np.asarray(z["w_f"], dtype=np.float32))
        ts = jnp.asarray(np.float32(z["tau_star"]))
        xu.block_until_ready()
        print(f"# serving from real index {index_path}: N={n:,}, F={f} "
              f"(staged in {time.perf_counter() - t0:.1f}s)", flush=True)
    else:
        # Build the serving state directly (index build timing is
        # bench.py's / bench_build_1m.py's job); corpus generated ON
        # DEVICE — a 1M x 768 f32 corpus is 3 GB, ~100 s through the
        # tunneled host->device link but milliseconds of on-device RNG.
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, f), dtype=jnp.float32)
        if mixture:
            # Gaussian-mixture corpus (embedding corpora are clustered;
            # pure iid gaussian has no structure for IVF routing to
            # exploit).
            k_mix = int(os.environ.get("SERV_CLUSTERS", 4096))
            kc, ka = jax.random.split(jax.random.PRNGKey(1))
            centers = jax.random.normal(kc, (k_mix, f), dtype=jnp.float32)
            assign_mix = jax.random.randint(ka, (n,), 0, k_mix)
            x = centers[assign_mix] + 0.35 * x
        xu = unit_normalize(x)
        w_f, lap_f, _ = build_feature_laplacian(x[:65536], k_f=15)
        e = rayleigh_batch(x, lap_f, normalized=False)
        ts = derive_tau_star(e, TauMode.MEDIAN)
        g = dispersion_batch(x, w_f, e)
        lams = synthesize(e, g, ts, TAU_MIX)
        lams.block_until_ready()
        del x, e, g  # free the raw corpus (HBM is the constraint at 1M)
    # DISTINCT query batches per rep: the runtime can memoize repeated
    # executions with identical inputs, which silently turns a throughput
    # measurement into a cache hit.
    reps = 6
    # Query model.  Throughput is data-independent (fixed shapes), but the
    # overlap/certification metrics are not: with a mixture corpus the
    # realistic serving case is IN-DISTRIBUTION queries (perturbed corpus
    # rows at a fixed RELATIVE perturbation norm).  A per-dim gaussian
    # with sigma 0.05 at F=768 has norm ~1.39 — it swamps the unit corpus
    # row (cos ~ 0.58), an adversarial out-of-distribution query model
    # under which IVF overlap numbers are noise.  SERV_QMODEL=gauss keeps
    # the old iid-gaussian batches.
    qnoise = float(os.environ.get("SERV_QNOISE", 0.25))
    if mixture and os.environ.get("SERV_QMODEL", "indist") == "indist":
        kq0 = jax.random.PRNGKey(11)
        query_batches = []
        for _ in range(reps):
            kq0, k1, k2 = jax.random.split(kq0, 3)
            rows = jax.random.randint(k1, (q_batch,), 0, n)
            query_batches.append(
                xu[rows] + (qnoise / np.sqrt(f)) * jax.random.normal(
                    k2, (q_batch, f), dtype=jnp.float32))
        query_batches[-1].block_until_ready()
    else:
        query_batches = [jnp.asarray(rng.standard_normal((q_batch, f),
                                                         dtype=np.float32))
                         for _ in range(reps)]
    tau = jnp.float32(0.62)

    def measure(xu_serv, name, backend):
        # backend "pallas" streams corpus tiles through VMEM and never
        # materializes the [Q, N] score matrix — required at 1M x 768,
        # where the XLA path's score matrix alone is 16 GB.
        args = dict(topk=topk, rayleigh_normalized=False, tau_mix=TAU_MIX,
                    backend=backend)
        lam_serv = lams.astype(jnp.float32)
        warm = fused_query_pipeline(xu_serv, lam_serv, lap_f, w_f, ts,
                                    query_batches[-1], tau, **args)
        _ = np.asarray(warm[0])   # force: block_until_ready is unreliable
        t0 = time.perf_counter()  # through the tunneled runtime
        outs = [fused_query_pipeline(xu_serv, lam_serv, lap_f, w_f, ts, qb,
                                     tau, **args)
                for qb in query_batches]
        checks = [int(np.asarray(o[0])[0, 0]) for o in outs]
        dt = time.perf_counter() - t0
        assert all(0 <= c < n for c in checks)
        qps = q_batch * reps / dt
        print(f"{name}: {qps:,.0f} QPS  ({dt / reps * 1000:.1f} ms/batch "
              f"of {q_batch}, N={n:,}, F={f})")
        results["modes"][name] = {"qps": round(qps, 1),
                                  "ms_per_batch": round(dt / reps * 1e3, 2)}
        return qps

    backend = "pallas" if n * q_batch > 2**31 else "xla"
    only_ivf = os.environ.get("SERV_ONLY_IVF", "0") == "1"
    lam32 = lams.astype(jnp.float32)
    results = {"config": {
        "n": n, "f": f, "q_batch": q_batch, "topk": topk, "reps": reps,
        "mixture": mixture,
        "index": index_path,
        "query_model": (os.environ.get("SERV_QMODEL", "indist")
                        if mixture else "gauss"),
        "query_noise_rel": qnoise,
        "backend": jax.default_backend()}, "modes": {}}

    def emit_results():
        out_dir = (Path(__file__).resolve().parent / "output"
                   / f"{int(time.time())}_serving")
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "serving_results.json", "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"results -> {out_dir}/serving_results.json")

    def run_ivf_block(ie, k_ov):
        from pyarrowspace_tpu.reduction.pipeline import (lloyd_reseed,
                                                         lloyd_tighten,
                                                         planned_slab_cap)
        k_cl = int(os.environ.get("SERV_CLUSTERS", 4096))
        sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
        # Empty-cluster reseeding + radius/size tightening: plain
        # random-init Lloyd merges mixture components (near-sqrt(2)
        # covering radii) and leaves oversized clusters that SPILL in the
        # slab build — both saturate the certification bound (0% certified
        # at 1M x 768) and cost recall at low n_probe.
        # capacity_factor 1.5 (not the library's 2.0): tightening grows K
        # past the request, and cf=2 slabs (6.9 GB at 1M x 768, K~4.3k)
        # beside the resident 3 GB corpus OOM a 16 GB chip; cap 384 also
        # scans fewer padded slots per probe.
        cf = float(os.environ.get("SERV_IVF_CF", 1.5))
        cap_plan = planned_slab_cap(n, k_cl, cf)
        cents, assigns = lloyd_reseed(xu, xu[sel], 12, seed=0)
        cents, assigns = lloyd_tighten(xu, cents, max_size=cap_plan)
        print(f"clusters: {k_cl} requested -> {cents.shape[0]} after "
              f"radius/size tightening (cap {cap_plan})", flush=True)
        # SERV_IVF_DTYPE: "f32" (default), "bf16", or a comma list for a
        # same-session A/B (same clustering, same query sets — run-to-run
        # tunnel weather varies ~1.5x, so only same-process comparisons
        # are valid).
        for dt_name in os.environ.get("SERV_IVF_DTYPE", "f32").split(","):
            dt_name = dt_name.strip() or "f32"
            run_ivf_block2(ie, k_ov, cents, assigns, min_cap=cap_plan,
                           cf=cf,
                           slab_dtype=jnp.bfloat16 if dt_name == "bf16"
                           else None)

    def run_ivf_block2(ie, k_ov, cents, assigns, min_cap=None, cf=2.0,
                       slab_dtype=None):
        from pyarrowspace_tpu.ops.pallas.ivf_scan import (
            blocked_ivf_search_fused, build_blocked_ivf)
        k_cl = int(cents.shape[0])
        n_probe = int(os.environ.get("SERV_NPROBE", 16))
        qb_env = os.environ.get("SERV_QBLOCK")
        q_blk = int(qb_env) if qb_env else None
        ivf_b = build_blocked_ivf(xu, lam32, np.asarray(cents),
                                  np.asarray(assigns), capacity_factor=cf,
                                  slab_dtype=slab_dtype, min_cap=min_cap)
        ivf_b.slabs.block_until_ready()
        # ONE dispatch per batch: query-lambda synthesis fused with the
        # routing + scan (same convention as the other served modes).
        warm_b = blocked_ivf_search_fused(ivf_b, query_batches[-1], lap_f,
                                          w_f, ts, tau, topk,
                                          n_probe=n_probe, tau_mix=TAU_MIX,
                                          q_block=q_blk)
        _ = np.asarray(warm_b[0])
        t0 = time.perf_counter()
        outs_b = [blocked_ivf_search_fused(ivf_b, qb, lap_f, w_f, ts, tau,
                                           topk, n_probe=n_probe,
                                           tau_mix=TAU_MIX, q_block=q_blk)
                  for qb in query_batches]
        _ = [int(np.asarray(o[0])[0, 0]) for o in outs_b]
        dt = time.perf_counter() - t0
        dt_name = "bf16" if slab_dtype is not None else "f32"
        print(f"ivf_block[{dt_name}] n_probe={n_probe} ({k_cl} clusters): "
              f"{q_batch * reps / dt:,.0f} QPS "
              f"({dt / reps * 1000:.1f} ms/batch of {q_batch})")
        ib = np.asarray(outs_b[0][0])
        ov_b = float(np.mean([len(set(ie[i][:k_ov]) & set(ib[i][:k_ov]))
                              / k_ov for i in range(q_batch)]))
        print(f"ivf_block top-{k_ov} overlap vs exact f32: {ov_b:.4f}")
        results["modes"][f"ivf_block_{dt_name}_np{n_probe}"] = {
            "qps": round(q_batch * reps / dt, 1), "n_probe": n_probe,
            "n_clusters": k_cl,
            "top10_overlap_vs_exact": round(ov_b, 4)}

        if slab_dtype is not None:
            # On-hardware certificate error-model assertion: condition (B)
            # of the rescored certificate is sound only if Mosaic lowers
            # the in-kernel f32 x f32 dot at f32 fidelity (a reduced-pass
            # bf16 lowering would silently void it; the CPU suite runs the
            # kernel in interpret mode and cannot catch that).  Check the
            # kernel's reduced-precision scan scores against XLA f32
            # blended scores for the items the kernel returned.
            from pyarrowspace_tpu.ops.distance import unit_normalize
            from pyarrowspace_tpu.ops.pallas.ivf_scan import \
                _res_eps_vector
            qs = query_batches[0][:256]
            kid_d, kscore_d = blocked_ivf_search_fused(
                ivf_b, qs, lap_f, w_f, ts, tau, topk, n_probe=n_probe,
                tau_mix=TAU_MIX, q_block=q_blk)
            kid = np.asarray(kid_d)
            kscore = np.asarray(kscore_d)
            e_s = rayleigh_batch(qs, lap_f, normalized=False)
            g_s = dispersion_batch(qs, w_f, e_s)
            lam_qs = synthesize(e_s, g_s, ts, TAU_MIX).astype(jnp.float32)
            qn_s = unit_normalize(qs.astype(jnp.float32))
            safe = np.maximum(kid, 0)
            rows = jnp.take(xu, jnp.asarray(safe), axis=0)  # [256,topk,F]
            cos_t = jnp.einsum("qf,qkf->qk", qn_s, rows,
                               preferred_element_type=jnp.float32)
            lam_t = jnp.take(lam32, jnp.asarray(safe), axis=0)
            prox_t = 1.0 / (1.0 + jnp.abs(lam_t - lam_qs[:, None]))
            true_s = np.asarray(float(tau) * cos_t
                                + (1.0 - float(tau)) * prox_t)
            dev = float(np.max(np.abs(
                np.where(kid >= 0, kscore - true_s, 0.0))))
            res_max = float(np.asarray(_res_eps_vector(ivf_b)).max())
            bound = float(tau) * (res_max + 2.0 * f * 2.0 ** -24) + 1e-5
            holds = dev <= bound
            print(f"{dt_name} scan error model: max dev {dev:.3e} vs "
                  f"bound {bound:.3e} -> {'HOLDS' if holds else 'VIOLATED'}")
            results["modes"][f"scan_error_model_{dt_name}"] = {
                "max_dev": dev, "bound": bound, "holds": holds}
            assert holds, (
                f"{dt_name} kernel scan scores deviate {dev:.3e} from f32 "
                f"reference, outside the certificate's error allowance "
                f"{bound:.3e} — the Mosaic dot lowering no longer runs at "
                "f32 fidelity and certified serving over reduced-precision "
                "slabs is UNSOUND on this toolchain")

        # Certified-exact serving (opt-in): in-distribution queries
        # (perturbed corpus rows — the realistic serving case), certified
        # IVF + escalation of refusals to the exact scan.  End-to-end
        # walltime includes the certificate sync and the escalation.
        # bf16 slabs route through the precision-robust rescored
        # certificate (pooled scan + f32 rescore; needs the f32 corpus).
        cert_kw = ({} if slab_dtype is None
                   else dict(rescore_corpus=xu, rescore_lambdas=lam32))
        mp_base = (int(os.environ.get("SERV_MPOOL", 4 * topk))
                   if slab_dtype is not None else None)
        if mp_base is not None:
            cert_kw["m_pool"] = mp_base
        if os.environ.get("SERV_CERTIFIED", "0") == "1":
            kq = jax.random.PRNGKey(7)
            qsets = []
            for r in range(reps):
                kq, k1, k2 = jax.random.split(kq, 3)
                rows = jax.random.randint(k1, (q_batch,), 0, n)
                qd = (xu[rows]
                      + (qnoise / np.sqrt(f)) * jax.random.normal(
                          k2, (q_batch, f), dtype=jnp.float32))
                qsets.append(qd)
            qsets[0].block_until_ready()

            # Escalation batches round to 4 bucket sizes (all warmed
            # below) so no cold compile lands inside the timed region.
            buckets = sorted({max(256, q_batch // 64), q_batch // 16,
                              q_batch // 4, q_batch})

            from pyarrowspace_tpu.ops.pallas.ivf_scan import (
                escalate_uncertified, unpack_certified, widen_refusals)
            n_clusters = int(ivf_b.slab_lambdas.shape[0] // ivf_b.cap)
            n_probe_max = min(n_clusters, n // max(1, 2 * ivf_b.cap),
                              n_probe << 2)

            def dispatch_certified(qb_):
                # ASYNC: the fused certify program returns ONE packed
                # device array (pack_certified); the D2H copy starts at
                # dispatch so finalize's certificate sync finds the
                # bytes already host-resident.
                out = blocked_ivf_search_fused(
                    ivf_b, qb_, lap_f, w_f, ts, tau, topk,
                    n_probe=n_probe, tau_mix=TAU_MIX, certify=True,
                    q_block=q_blk, pack_out=True, **cert_kw)
                if hasattr(out, "copy_to_host_async"):
                    out.copy_to_host_async()
                return out

            def finalize_certified(qb_, out):
                # Same escalation semantics as search_batch
                # (mode="certified"): widen refusals at IVF cost (n_probe
                # doublings via the shared widen_refusals helper) BEFORE
                # paying a full-corpus exact scan — at 99%+ base
                # certification the exact stage almost never fires, and
                # even a 33-query exact escalation streams the whole 3 GB
                # corpus (~150 ms/batch measured, 308k -> 66k QPS).
                idx0, vals0, cert_b = unpack_certified(out, topk)
                cert0 = float(cert_b.mean())

                def run_cert(sel, np2):
                    # Widening scales the rescore pool with the probe
                    # list (library semantics, core/space.py certified).
                    kw2 = dict(cert_kw)
                    if mp_base is not None:
                        kw2["m_pool"] = mp_base * max(1, np2 // n_probe)
                    o2 = blocked_ivf_search_fused(
                        ivf_b, qb_[jnp.asarray(sel)], lap_f, w_f, ts,
                        tau, topk, n_probe=np2, tau_mix=TAU_MIX,
                        certify=True, q_block=q_blk, **kw2)
                    return (np.asarray(o2[0]), np.asarray(o2[1]),
                            np.asarray(o2[2]))

                idx_c, vals_c, cert = widen_refusals(
                    idx0, vals0, cert_b, run_cert, topk,
                    n_probe, n_probe_max)

                def run_exact(sel):
                    n_pad = next(b for b in buckets if b >= sel.size)
                    sel_b = np.concatenate(
                        [sel, np.full(n_pad - sel.size, sel[0])])
                    eo = fused_query_pipeline(
                        xu, lam32, lap_f, w_f, ts,
                        qb_[jnp.asarray(sel_b)], tau, topk=topk,
                        rayleigh_normalized=False, tau_mix=TAU_MIX,
                        backend=backend)
                    return (np.asarray(eo[0])[: sel.size],
                            np.asarray(eo[1])[: sel.size])

                idx_c, vals_c = escalate_uncertified(
                    idx_c, vals_c, cert, run_exact, topk)
                return idx_c, vals_c, cert0

            def serve_certified(qb_):
                return finalize_certified(qb_, dispatch_certified(qb_))

            for b in buckets:   # warm every escalation program
                _ = np.asarray(fused_query_pipeline(
                    xu, lam32, lap_f, w_f, ts, qsets[-1][:b], tau,
                    topk=topk, rayleigh_normalized=False,
                    tau_mix=TAU_MIX, backend=backend)[0])
            # Warm the widened certify programs (pow2 refusal pads at the
            # first n_probe doubling — later doublings rarely fire).
            if n_probe * 2 <= n_probe_max:
                kw_w = dict(cert_kw)
                if mp_base is not None:
                    kw_w["m_pool"] = mp_base * 2
                for pad in (16, 64, 256):
                    _ = np.asarray(blocked_ivf_search_fused(
                        ivf_b, qsets[-1][:pad], lap_f, w_f, ts, tau,
                        topk, n_probe=n_probe * 2, tau_mix=TAU_MIX,
                        certify=True, q_block=q_blk, **kw_w)[0])
            _ = serve_certified(qsets[-1])  # warm the certify program

            # PIPELINED (the production serving shape, serving_stream /
            # serving.CertifiedStream): up to `depth` certify dispatches
            # in flight, so each batch's certificate sync (a host round
            # trip, the dominant cost of the synchronous loop on tunneled
            # runtimes) overlaps the next batches' device execution.
            from pyarrowspace_tpu.serving import CertifiedStream
            depth = int(os.environ.get("SERV_STREAM_DEPTH", reps))
            stream = CertifiedStream(dispatch_certified,
                                     finalize_certified, depth=depth)
            t0 = time.perf_counter()
            for qb_ in qsets:
                stream.submit(qb_)
            outs_c = stream.finish()
            dt_p = time.perf_counter() - t0
            rate = float(np.mean([o[2] for o in outs_c]))
            print(f"certified-exact[{dt_name}] pipelined d={depth} "
                  f"(np={n_probe}): {q_batch * reps / dt_p:,.0f} QPS "
                  f"({dt_p / reps * 1000:.1f} ms/batch, "
                  f"certified {rate:.1%})")

            # SYNCHRONOUS per-batch (the per-call latency bound —
            # search_batch(mode="certified") semantics).
            t0 = time.perf_counter()
            rates = [serve_certified(qb_)[2] for qb_ in qsets]
            dt = time.perf_counter() - t0
            rate_s = float(np.mean(rates))
            print(f"certified-exact[{dt_name}] sync (np={n_probe}): "
                  f"{q_batch * reps / dt:,.0f} QPS "
                  f"({dt / reps * 1000:.1f} ms/batch, "
                  f"certified {rate_s:.1%})")
            cert_key = (f"certified_np{n_probe}" if slab_dtype is None
                        else f"certified_{dt_name}_np{n_probe}")
            results["modes"][cert_key] = {
                "qps": round(q_batch * reps / dt_p, 1),
                "stream_depth": depth,
                "certified_rate": round(rate, 4), "n_probe": n_probe,
                "sync_qps": round(q_batch * reps / dt, 1),
                "sync_ms_per_batch": round(dt / reps * 1e3, 2)}
    if only_ivf:
        # n_probe sweep runs: skip the exact/int8/subtile throughput
        # stages but keep ONE exact batch as the overlap reference.
        try:
            args = dict(topk=topk, rayleigh_normalized=False,
                        tau_mix=TAU_MIX, backend=backend)
            ie = np.asarray(fused_query_pipeline(
                xu, lam32, lap_f, w_f, ts, query_batches[0], tau,
                **args)[0])
            run_ivf_block(ie, min(10, topk))
        finally:
            emit_results()   # partial results survive a late failure
        return
    measure(xu, f"exact f32 ({backend})", backend)
    measure(xu.astype(jnp.bfloat16), f"exact bf16 ({backend})", backend)

    # int8 candidate scan + exact f32 rescore (the 100k-QPS/chip path:
    # MXU int8 rate is 2-8x f32 depending on generation; the rescore pins
    # the served top-k to the exact scan).
    from pyarrowspace_tpu.ops.quantize import quantize_rows
    from pyarrowspace_tpu.ops.search import fused_query_pipeline_quantized
    xq, scales = quantize_rows(xu)
    xq.block_until_ready()
    rescore_m = int(os.environ.get("SERV_RESCORE_M", 4 * topk))
    qargs = dict(topk=topk, rescore_m=rescore_m, rayleigh_normalized=False,
                 tau_mix=TAU_MIX)
    lam32 = lams.astype(jnp.float32)
    warm = fused_query_pipeline_quantized(
        xu, xq, scales, lam32, lap_f, w_f, ts, query_batches[-1], tau,
        **qargs)
    _ = np.asarray(warm[0])
    t0 = time.perf_counter()
    outs = [fused_query_pipeline_quantized(
                xu, xq, scales, lam32, lap_f, w_f, ts, qb, tau, **qargs)
            for qb in query_batches]
    _ = [int(np.asarray(o[0])[0, 0]) for o in outs]
    dt = time.perf_counter() - t0
    qps_q = q_batch * reps / dt
    print(f"int8+rescore (m={rescore_m}): {qps_q:,.0f} QPS  "
          f"({dt / reps * 1000:.1f} ms/batch of {q_batch})")

    # Pinned overlap vs the exact f32 scan on one batch.
    args = dict(topk=topk, rayleigh_normalized=False, tau_mix=TAU_MIX,
                backend=backend)
    ie = np.asarray(fused_query_pipeline(xu, lam32, lap_f, w_f, ts,
                                         query_batches[0], tau, **args)[0])
    iq = np.asarray(outs[0][0])
    k_ov = min(10, topk)
    overlap = float(np.mean([len(set(ie[i][:k_ov]) & set(iq[i][:k_ov]))
                             / k_ov for i in range(q_batch)]))
    print(f"int8+rescore top-{k_ov} overlap vs exact f32: {overlap:.4f}")
    results["modes"]["int8+rescore"] = {
        "qps": round(qps_q, 1), "rescore_m": rescore_m,
        "top10_overlap_vs_exact": round(overlap, 4)}

    # Subtile-routed scan (block-max exact at the scan dtype; the
    # headline serving mode at large N).
    from pyarrowspace_tpu.ops.pallas.subtile_scan import build_subtile_state
    from pyarrowspace_tpu.ops.search import fused_query_pipeline_subtile
    del xq, scales
    st = build_subtile_state(xu, lam32, scan_dtype=jnp.bfloat16)
    st["xu_scan"].block_until_ready()
    sargs = dict(topk=topk, rayleigh_normalized=False, tau_mix=TAU_MIX)
    warm = fused_query_pipeline_subtile(
        st["xu_scan"], st["xu_f32"], st["lambdas"], st["n_real"],
        lap_f, w_f, ts, query_batches[-1], tau, **sargs)
    _ = np.asarray(warm[0])
    t0 = time.perf_counter()
    outs_s = [fused_query_pipeline_subtile(
                  st["xu_scan"], st["xu_f32"], st["lambdas"], st["n_real"],
                  lap_f, w_f, ts, qb, tau, **sargs)
              for qb in query_batches]
    _ = [int(np.asarray(o[0])[0, 0]) for o in outs_s]
    dt = time.perf_counter() - t0
    print(f"subtile bf16 (exact-routed): {q_batch * reps / dt:,.0f} QPS  "
          f"({dt / reps * 1000:.1f} ms/batch of {q_batch})")
    results["modes"]["subtile"] = {
        "qps": round(q_batch * reps / dt, 1),
        "ms_per_batch": round(dt / reps * 1e3, 2)}
    isb = np.asarray(outs_s[0][0])
    ov_s = float(np.mean([len(set(ie[i][:k_ov]) & set(isb[i][:k_ov]))
                          / k_ov for i in range(q_batch)]))
    print(f"subtile top-{k_ov} overlap vs exact f32: {ov_s:.4f}")

    # Blocked IVF (opt-in): cluster-contiguous Pallas slab kernel — the
    # approximate large-corpus mode (`search_batch(mode="ivf_block")`).
    # Slab HBM is capacity_factor * corpus (6 GB at 1M x 768, cf=2), so
    # it runs after the quantized state is freed.
    if os.environ.get("SERV_IVF_BLOCK", "0") == "1":
        del st, outs_s, warm  # slabs need ~2x corpus HBM; free the rest
        run_ivf_block(ie, k_ov)

    # IVF mode (opt-in): the current gather-based IVF materializes
    # [Qb, n_probe*cap, F] candidates, which is fine up to ~100k items but
    # needs a cluster-contiguous corpus layout at 1M scale (planned).
    if os.environ.get("SERV_IVF", "0") == "1":
        from pyarrowspace_tpu.ops.ivf import build_ivf, ivf_lambda_search
        from pyarrowspace_tpu.reduction.pipeline import _lloyd
        k_cl = int(os.environ.get("SERV_CLUSTERS", 4096))
        sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
        cents, assigns = _lloyd(xu, xu[sel], 8)
        ivf = build_ivf(cents, assigns, n, capacity_factor=2.0)
        print(f"ivf: {k_cl} clusters, bucket cap "
              f"{ivf.buckets.shape[1]}, tail {ivf.tail.shape[0]}")
        qn = unit_normalize(query_batches[0])
        lam_q = jnp.zeros((q_batch,), jnp.float32) + float(lams[0])
        small = 256  # IVF gathers [Qb, n_probe*cap, F]; block queries
        warm = ivf_lambda_search(xu, lams.astype(jnp.float32), ivf,
                                 qn[:small], lam_q[:small], tau,
                                 n_probe=8, topk=topk)
        _ = np.asarray(warm[0])
        t0 = time.perf_counter()
        reps_done = 0
        for qb in query_batches:
            qbn = unit_normalize(qb)
            for s in range(0, q_batch, small):
                out = ivf_lambda_search(
                    xu, lams.astype(jnp.float32), ivf, qbn[s:s + small],
                    lam_q[:small], tau, n_probe=8, topk=topk)
                reps_done += small
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(f"ivf n_probe=8: {reps_done / dt:,.0f} QPS "
              f"({k_cl} clusters, N={n:,}, F={f})")

    emit_results()


if __name__ == "__main__":
    main()
