"""k-NN kernel merge-strategy A/B: full-tile vs sub-tile vs small tiles.

The bf16 A/B (recorded 1787161308_knn_bf16_ab) showed the fused k-NN
kernel is EXTRACTION-bound: solving t = t_mxu + t_vpu from the f32/bf16
pair puts the lazy top-k merge at ~60% of the pass.  Every extract-
insert pass of the lazy merge touches the whole distance block it
merges, so merging the full [B, 2048] tile makes each pass ~8x more
expensive than it needs to be.  Variants measured same-session:

  rowmajor   — baseline: one dot + one full-tile merge per grid step
  subtileS   — KNNAB_SUBS: per-S-slice dot + [B, S] merge inside the
               kernel (cols sliced on SUBLANES; lane-axis slicing of a
               wide vector crashes Mosaic — see knn.py docstring)
  tileT      — KNNAB_TILES: plain smaller col_tile (same merge economics
               via more grid steps; isolates grid overhead vs in-kernel
               loop)
  transposed — KNNAB_TRANSPOSED=1: sublane-axis merge (measured 0.96x,
               recorded 1787167612_knn_merge_ab — kept for re-checks)

Same-session A/B, distinct corpora per rep, eps filtering off (worst
case for the merge: every candidate is live).

Usage: [KNNAB_N=313841] [KNNAB_F=384] [KNNAB_K=25] [KNNAB_SUBS=256,512]
[KNNAB_TILES=512,1024] python benchmarks/bench_knn_merge_ab.py
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
    from pyarrowspace_tpu.ops.pallas.knn import (
        _knn_pallas_all, _knn_pallas_all_reordered, _knn_pallas_all_t)

    n = int(os.environ.get("KNNAB_N", 313_841))
    f = int(os.environ.get("KNNAB_F", 384))
    k = int(os.environ.get("KNNAB_K", 25))
    reps = int(os.environ.get("KNNAB_REPS", 3))
    block = int(os.environ.get("KNNAB_BLOCK", 256))
    tile = int(os.environ.get("KNNAB_TILE", 2048))
    interpret = jax.default_backend() not in ("tpu", "axon")

    # Pad like knn_graph_candidates_pallas does.
    lcm = int(np.lcm(tile, block))
    n_pad = ((max(n, lcm) + lcm - 1) // lcm) * lcm

    results = {"config": {"n": n, "f": f, "k": k, "reps": reps,
                          "block": block, "tile": tile,
                          "backend": jax.default_backend()}, "modes": {}}
    eps_arr = jnp.asarray([2.0], dtype=jnp.float32)   # no eps filtering
    nreal = jnp.asarray([n], dtype=jnp.int32)

    xs = []
    for r in range(reps):
        kk = jax.random.PRNGKey(r)
        k1, k2, k3 = jax.random.split(kk, 3)
        cents = jax.random.normal(k1, (2048, f), dtype=jnp.float32)
        asn = jax.random.randint(k2, (n,), 0, 2048)
        x = unit_normalize(
            cents[asn] + 0.35 * jax.random.normal(k3, (n, f),
                                                  dtype=jnp.float32))
        xs.append(jnp.pad(x, ((0, n_pad - n), (0, 0))))
    xs[-1].block_until_ready()

    flops = 2.0 * n_pad * n_pad * f
    outs_by_variant = {}
    variants = [("rowmajor", _knn_pallas_all, {})]
    if os.environ.get("KNNAB_TRANSPOSED"):
        variants.append(("transposed", _knn_pallas_all_t, {}))
    for sub in (int(s) for s in
                os.environ.get("KNNAB_SUBS", "256,512").split(",") if s):
        variants.append((f"subtile{sub}", _knn_pallas_all, {"sub": sub}))
    for tl in (int(s) for s in
               os.environ.get("KNNAB_TILES", "").split(",") if s):
        variants.append((f"tile{tl}", _knn_pallas_all, {"col_tile": tl}))
    if os.environ.get("KNNAB_LOCALITY", "1") != "0":
        # Pass-count attack: diagonal-first tile walk alone, and
        # projection-sort + diagonal-first (see knn.py docstrings).
        variants.append(("diagstart", _knn_pallas_all,
                         {"diag_start": True}))
        variants.append(("reorder", _knn_pallas_all_reordered, {}))
    if os.environ.get("KNNAB_DIAG"):
        # WRONG-OUTPUT timing probes (see _knn_block_kernel docstring):
        # rowmajor - nomerge = lazy-merge cost; rowmajor - nomask =
        # mask-build cost; nomerge - (pure dot) ~ fixed VPU floor.
        variants.append(("nomerge", _knn_pallas_all, {"diag": "nomerge"}))
        variants.append(("nomask", _knn_pallas_all, {"diag": "nomask"}))
        # fixed unrolled passes, no while_loop: price the loop structure
        variants.append(("merge1", _knn_pallas_all, {"diag": "merge1"}))
        variants.append(("merge2", _knn_pallas_all, {"diag": "merge2"}))
    for name, fn, over in variants:
        kw = {"k": k, "block_rows": block, "col_tile": tile,
              "interpret": interpret, **over}
        warm = fn(xs[-1], eps_arr, nreal, **kw)
        _ = int(np.asarray(warm[1])[0, 0])
        t0 = time.perf_counter()
        outs = [fn(x, eps_arr, nreal, **kw) for x in xs]
        _ = [int(np.asarray(o[1])[0, 0]) for o in outs]
        dt_s = (time.perf_counter() - t0) / reps
        tf = flops / dt_s / 1e12
        print(f"knn[{name}] {n}x{f} k={k}: {dt_s:.3f} s/pass "
              f"({tf:.1f} TF/s)", flush=True)
        results["modes"][name] = {"s_per_pass": round(dt_s, 4),
                                  "tf_per_s": round(tf, 2)}
        outs_by_variant[name] = outs[0]

    i_a = np.asarray(outs_by_variant["rowmajor"][1])[:n]
    d_a = np.asarray(outs_by_variant["rowmajor"][0])[:n]
    base_s = results["modes"]["rowmajor"]["s_per_pass"]
    for name, _, _over in variants:
        if name == "rowmajor" or "diag" in _over:
            continue
        i_b = np.asarray(outs_by_variant[name][1])[:n]
        d_b = np.asarray(outs_by_variant[name][0])[:n]
        idx_equal = float(np.mean(np.all(i_a == i_b, axis=1)))
        dist_equal = bool(np.array_equal(d_a, d_b))
        ratio = base_s / results["modes"][name]["s_per_pass"]
        print(f"speedup {name}/rowmajor: {ratio:.2f}x; rows with "
              f"identical idx: {idx_equal:.6f}; distances bitwise-equal: "
              f"{dist_equal}", flush=True)
        results["modes"][name]["speedup_vs_rowmajor"] = round(ratio, 3)
        results["modes"][name]["rows_identical_idx"] = round(idx_equal, 6)
        results["modes"][name]["dist_bitwise_equal"] = dist_equal

    out = (Path(__file__).resolve().parent / "output"
           / f"{int(time.time())}_knn_merge_ab")
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "knn_merge_ab.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"results -> {out}/knn_merge_ab.json")


if __name__ == "__main__":
    main()
