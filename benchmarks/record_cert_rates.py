"""Record certification rates across query regimes (CPU, f32 math).

Produces benchmarks/recorded-style cert_rates.json: per-regime certified
fraction as a function of n_probe on a planted mixture corpus with
serving-quality clustering (lloyd_reseed + lloyd_tighten — the same
pipeline enable_ivf uses).  Pinned by
tests/test_recorded_artifacts.py::test_cert_rates_artifact (monotone in
n_probe, full coverage by n_probe = K/2).

Usage: python benchmarks/record_cert_rates.py [out_dir]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.reduction.pipeline import (lloyd_reseed,
                                                     lloyd_tighten,
                                                     planned_slab_cap)

    n, f, k_cl, n_q = 20000, 64, 128, 128
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(k_cl, f)).astype(np.float32)

    def corpus(noise):
        assign = rng.integers(0, k_cl, size=n)
        x = centers[assign] + noise * rng.normal(size=(n, f)).astype(
            np.float32)
        return unit_normalize(jnp.asarray(x))

    def rates(xu, lams, lam_q_of, qnoise=0.25):
        cap = planned_slab_cap(n, k_cl)
        sel = jnp.asarray(rng.choice(n, size=k_cl, replace=False))
        cents, assigns = lloyd_reseed(xu, xu[sel], 12, seed=0)
        cents, assigns = lloyd_tighten(xu, cents, max_size=cap)
        ivf = build_blocked_ivf(xu, lams, np.array(cents),
                                np.asarray(assigns), min_cap=cap)
        rows = rng.choice(n, size=n_q, replace=False)
        q = np.asarray(xu)[rows] + (qnoise / np.sqrt(f)) * rng.standard_normal(
            (n_q, f)).astype(np.float32)
        qn = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
        lam_q = lam_q_of(rows)
        out = {}
        for n_probe in (8, 16, 32, 64):
            _, _, cert = blocked_ivf_search(ivf, qn, lam_q, 0.62, 15,
                                            n_probe=n_probe, certify=True,
                                            q_block=8)
            out[str(n_probe)] = float(np.asarray(cert).mean())
        return out

    lams = jnp.asarray(rng.uniform(0.3, 0.5, size=n).astype(np.float32))
    regimes = {}
    xu15 = corpus(0.15)
    regimes["noise0.15_lam_corr"] = rates(
        xu15, lams, lambda rows: lams[jnp.asarray(rows)])
    regimes["noise0.35_lam_corr"] = rates(
        corpus(0.35), lams, lambda rows: lams[jnp.asarray(rows)])
    regimes["noise0.15_lam_rand"] = rates(
        xu15, lams,
        lambda rows: jnp.asarray(
            rng.uniform(0.3, 0.5, size=len(rows)).astype(np.float32)))
    # The TRANSITION regime: heavier query perturbation (0.75 relative)
    # keeps the kth score close to the unprobed-cluster bounds, so the
    # rate climbs with n_probe instead of saturating — the curve shape
    # the certificate's branch-and-bound widening relies on.
    regimes["noise0.35_hardq0.75"] = rates(
        corpus(0.35), lams, lambda rows: lams[jnp.asarray(rows)],
        qnoise=0.75)

    out = {
        "config": {"n": n, "f": f, "clusters": k_cl, "queries": n_q,
                   "q_block": 8, "routing": "bound-ordered",
                   "clustering": "lloyd_reseed + lloyd_tighten "
                                 "(size-capped, spill-free)",
                   "query_model": "perturbed corpus rows "
                                  "(0.25 relative noise)"},
        "regimes": regimes,
    }
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent / "recorded"
        / f"{int(time.time())}_cert_rates")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cert_rates.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["regimes"], indent=2))
    print(f"-> {out_dir}/cert_rates.json")


if __name__ == "__main__":
    main()
