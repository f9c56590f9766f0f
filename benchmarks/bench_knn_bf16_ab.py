"""bf16-vs-f32 k-NN kernel A/B (VERDICT r4 #3, stage 1: is the raw pass
faster at all?).

The fused Pallas k-NN (ops/pallas/knn.py) is MXU-bound (~70% of f32 MXU
peak at 313k x 384), so a bf16 first pass (4x the f32 MXU rate on v5e)
is genuinely open — unlike the VPU-bound serving scan where bf16 gained
nothing (CLAUDE.md).  This times the SAME kernel with f32 vs bf16 inputs
(f32 accumulation either way), same session, distinct inputs per rep.
A >=2x kernel win justifies building the certify-then-escalate exact
pipeline (stage 2); anything less is a recorded dead end.

Usage: [KNNAB_N=262144] [KNNAB_F=768] [KNNAB_K=25] python
benchmarks/bench_knn_bf16_ab.py
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
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.knn import _knn_pallas_all

    n = int(os.environ.get("KNNAB_N", 262_144))
    f = int(os.environ.get("KNNAB_F", 768))
    k = int(os.environ.get("KNNAB_K", 25))
    reps = int(os.environ.get("KNNAB_REPS", 3))
    block, tile = 256, 2048
    interpret = jax.default_backend() not in ("tpu", "axon")

    results = {"config": {"n": n, "f": f, "k": k, "reps": reps,
                          "backend": jax.default_backend()}, "modes": {}}
    eps_arr = jnp.asarray([2.0], dtype=jnp.float32)   # no eps filtering
    nreal = jnp.asarray([n], dtype=jnp.int32)

    # Distinct corpora per rep (memoization guard); mixture-ish structure.
    xs = []
    for r in range(reps):
        kk = jax.random.PRNGKey(r)
        k1, k2, k3 = jax.random.split(kk, 3)
        cents = jax.random.normal(k1, (2048, f), dtype=jnp.float32)
        asn = jax.random.randint(k2, (n,), 0, 2048)
        xs.append(unit_normalize(
            cents[asn] + 0.35 * jax.random.normal(k3, (n, f),
                                                  dtype=jnp.float32)))
    xs[-1].block_until_ready()

    flops = 2.0 * n * n * f
    outs_by_dtype = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xcast = [x.astype(dt) for x in xs]
        xcast[-1].block_until_ready()
        warm = _knn_pallas_all(xcast[-1], eps_arr, nreal, k=k,
                               block_rows=block, col_tile=tile,
                               interpret=interpret)
        _ = int(np.asarray(warm[1])[0, 0])
        t0 = time.perf_counter()
        outs = [_knn_pallas_all(xc, eps_arr, nreal, k=k, block_rows=block,
                                col_tile=tile, interpret=interpret)
                for xc in xcast]
        _ = [int(np.asarray(o[1])[0, 0]) for o in outs]
        dt_s = (time.perf_counter() - t0) / reps
        tf = flops / dt_s / 1e12
        print(f"knn[{name}] {n}x{f} k={k}: {dt_s:.3f} s/pass "
              f"({tf:.1f} TF/s)", flush=True)
        results["modes"][name] = {"s_per_pass": round(dt_s, 4),
                                  "tf_per_s": round(tf, 2)}
        outs_by_dtype[name] = outs[0]

    # Neighbor-set agreement (how much work stage-2 certification has):
    i_f32 = np.asarray(outs_by_dtype["f32"][1])
    i_b16 = np.asarray(outs_by_dtype["bf16"][1])
    same = np.mean([len(set(i_f32[r]) & set(i_b16[r])) / k
                    for r in range(0, n, max(1, n // 4096))])
    ratio = (results["modes"]["f32"]["s_per_pass"]
             / results["modes"]["bf16"]["s_per_pass"])
    print(f"speedup bf16/f32: {ratio:.2f}x; neighbor-set overlap "
          f"(sampled): {same:.4f}", flush=True)
    results["speedup_bf16"] = round(ratio, 3)
    results["neighbor_overlap_sampled"] = round(float(same), 4)

    out = (Path(__file__).resolve().parent / "output"
           / f"{int(time.time())}_knn_bf16_ab")
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "knn_bf16_ab.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out}/knn_bf16_ab.json")


if __name__ == "__main__":
    main()
