"""Same-session A/B of certificate-violation formulations (round 5).

The certified profile (benchmarks/recorded/1787164272_cert_profile_32k)
shows cert overhead of 269 ms at qb=8 over a 143 ms scan — far above the
~15 ms of HBM traffic the bound math accounts for.  Suspects are the two
known TPU pathologies in cert_violations (ops/pallas/ivf_scan.py):

  scatter   probed.at[rows, probe_tbl].set(True) — XLA scatter on TPU
            serializes
  gather    probed[arange(q) // qb] materializes a [Q, K] bool mask via
            a row gather (CLAUDE.md: XLA row gather runs ~58 GB/s)

The counting formulation is scatter- and mask-free and EXACTLY
equivalent (probe_tbl rows are distinct, top_k output):

  viol[q] = #{c : bound[q,c] > thresh[q]}                (full [Q,K] pass,
          - #{c in probes(block(q)) : bound[q,c] > ...}   fuses w/ bound)
          > 0                                            ([Q, n_probe] gather)

Timed at the 1M x 768 serving shape (Q=32768, K=4352, qb in {8, 16})
over synthetic inputs — the formulation cost does not depend on corpus
content, only on shapes.  Usage:
  python benchmarks/probe_cert_violations.py          (TPU)
  ARROWSPACE_CPU=1 PROBE_Q=2048 PROBE_K=256 python ... (CPU smoke)
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
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.pallas.ivf_scan import cert_violations

    q = int(os.environ.get("PROBE_Q", 32768))
    n_clusters = int(os.environ.get("PROBE_K", 4352))
    n_probe = int(os.environ.get("PROBE_NPROBE", 8))
    reps = int(os.environ.get("PROBE_REPS", 10))
    rng = np.random.default_rng(0)

    def count_violations(bound, kth_sorted, probe_tbl, margin, *, qb, q):
        """Counting formulation — see module docstring."""
        slack = jnp.float32(1e-5)
        thresh = (kth_sorted - margin - slack)[:, None]
        hot = (bound > thresh)
        n_all = jnp.sum(hot, axis=1, dtype=jnp.int32)
        # Per-query bound at the block's probed clusters: [q, n_probe].
        probes_q = probe_tbl[jnp.arange(q) // qb]
        hot_probed = jnp.take_along_axis(bound, probes_q, axis=1) > thresh
        n_probed = jnp.sum(hot_probed, axis=1, dtype=jnp.int32)
        return n_all > n_probed

    results = {"config": {"q": q, "n_clusters": n_clusters,
                          "n_probe": n_probe, "reps": reps,
                          "backend": None},
               "modes": {}}

    import jax
    results["config"]["backend"] = jax.default_backend()

    for qb in (8, 16):
        n_blocks = q // qb
        # Big inputs are generated ON DEVICE (a host->device push of
        # reps x [Q, K] f32 would be minutes of tunnel time); only the
        # tiny probe tables ride the wire.
        key = jax.random.PRNGKey(0)
        bounds, kths, tbls = [], [], []
        for _ in range(reps):
            key, k1, k2 = jax.random.split(key, 3)
            bounds.append(jax.random.normal(
                k1, (q, n_clusters), dtype=jnp.float32))
            kths.append(jax.random.normal(k2, (q,), dtype=jnp.float32))
            # Distinct probe ids per block, like top_k output.
            t = np.argsort(rng.standard_normal((n_blocks, n_clusters)),
                           axis=1)[:, :n_probe].astype(np.int32)
            tbls.append(jnp.asarray(t))
        tbls[-1].block_until_ready()

        f_old = jax.jit(lambda b, k, t, qb=qb: cert_violations(
            b, k, t, jnp.float32(0.0), qb=qb, q=q))
        f_new = jax.jit(lambda b, k, t, qb=qb: count_violations(
            b, k, t, jnp.float32(0.0), qb=qb, q=q))

        # Exact equivalence first (on-device data, pulled once).
        v_old = np.asarray(f_old(bounds[0], kths[0], tbls[0]))
        v_new = np.asarray(f_new(bounds[0], kths[0], tbls[0]))
        same = bool((v_old == v_new).all())
        print(f"qb={qb}: identical={same} "
              f"(viol rate {v_old.mean():.3f})", flush=True)
        assert same, "counting formulation diverged from reference"

        row = {"identical": same}
        for name, fn in (("scatter_mask", f_old), ("counting", f_new)):
            _ = np.asarray(fn(bounds[-1], kths[-1], tbls[-1]))[0]
            t0 = time.perf_counter()
            outs = [fn(bounds[r], kths[r], tbls[r]) for r in range(reps)]
            _ = [np.asarray(o)[0] for o in outs]
            dt = (time.perf_counter() - t0) / reps
            print(f"  {name}: {dt * 1e3:.2f} ms", flush=True)
            row[name] = {"ms": round(dt * 1e3, 3)}
        row["speedup"] = round(
            row["scatter_mask"]["ms"] / row["counting"]["ms"], 2)
        results["modes"][f"qb{qb}"] = row

    out_dir = (Path(__file__).resolve().parent / "output"
               / f"{int(time.time())}_cert_violations_ab")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cert_violations_ab.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out_dir}/cert_violations_ab.json")


if __name__ == "__main__":
    main()
