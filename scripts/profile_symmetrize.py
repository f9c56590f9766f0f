"""Profile the symmetrize phase at the 313k bench shape on real TPU.

Times the fused one-sort symmetrize (ops/symmetrize.symmetrize_to_ell)
and its sub-stages separately to find where the 1.32 s (BENCH_r03 phase)
goes: the [N,k,k] mutual-detection gather, THE 2Nk-entry 3-key sort, the
rank segment-sums, the fits scatter, and the final ELL placement scatter.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_symmetrize.py
Env: PROF_N / PROF_F (default 313841 / 384).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("ARROWSPACE_KNN_BACKEND", "pallas")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timed(fn, *args, reps=3, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{tag:34s} {best*1e3:9.1f} ms   (reps {['%.0f' % (t*1e3) for t in ts]})",
          flush=True)
    return out, best


def main():
    n = int(os.environ.get("PROF_N", 313841))
    f = int(os.environ.get("PROF_F", 384))
    gp = {"eps": 1.31, "k": 25, "p": 2.0, "sigma": 0.535}
    k = gp["k"]

    from pyarrowspace_tpu.ops.distance import unit_normalize, kernel_weights
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    from pyarrowspace_tpu.ops import symmetrize as S

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((n, f), dtype=np.float32) * 12.0)
    xu = unit_normalize(x)
    d, i = knn_graph_candidates_pallas(xu, k, gp["eps"])
    w = kernel_weights(d, gp["sigma"], gp["p"])
    w = jnp.where(i >= 0, w, 0.0)
    jax.block_until_ready((i, w))
    print(f"knn done: n={n} f={f} k={k} valid={int(jnp.sum(i >= 0))}",
          flush=True)

    m = 2 * k
    (nbr_idx, nbr_w, deg, n_drop), t_full = timed(
        jax.jit(lambda a, b: S.symmetrize_to_ell(a, b, m)), i, w,
        tag="full symmetrize_to_ell(m=50)")
    print(f"n_dropped at m=50: {int(n_drop)}", flush=True)

    node_ids = jnp.arange(n, dtype=jnp.int32)

    # --- stage 1: mutual detection ([N,k,k] gather-compare) -------------
    @jax.jit
    def stage_mutual(idx):
        valid_f = idx >= 0
        safe_idx = jnp.where(valid_f, idx, 0)
        eq = idx[safe_idx] == node_ids[:, None, None]
        mutual = jnp.any(eq, axis=2) & valid_f
        partner_slot = jnp.argmax(eq, axis=2).astype(jnp.int32)
        return mutual, partner_slot

    (mutual, partner_slot), t_mut = timed(stage_mutual, i,
                                          tag="mutual detect [N,k,k]")

    # --- prepare entry arrays (outside timing) --------------------------
    valid_f = i >= 0
    rows_f = jnp.broadcast_to(node_ids[:, None], (n, k)).reshape(-1)
    cols_f = i.reshape(-1)
    w_f = w.reshape(-1)
    rev_valid = (valid_f & ~mutual).reshape(-1)
    valid = jnp.concatenate([valid_f.reshape(-1), rev_valid])
    rows = jnp.where(valid, jnp.concatenate([rows_f, cols_f]), n)
    cols = jnp.concatenate([cols_f, rows_f])
    ww = jnp.concatenate([w_f, w_f])
    eid = jnp.arange(2 * n * k, dtype=jnp.int32)
    jax.block_until_ready((rows, cols, ww))

    # --- stage 2: THE sort ----------------------------------------------
    @jax.jit
    def stage_sort5(rows, ww, cols, eid):
        return jax.lax.sort((rows, -ww, cols, ww, eid), num_keys=3)

    (sorted5), t_sort5 = timed(stage_sort5, rows, ww, cols, eid,
                               tag="sort 3keys+2payload (current)")
    r2, nw2, c2, w2, eid2 = sorted5

    @jax.jit
    def stage_sort4(rows, ww, cols, eid):
        return jax.lax.sort((rows, -ww, cols, eid), num_keys=3)

    _, t_sort4 = timed(stage_sort4, rows, ww, cols, eid,
                       tag="sort 3keys+1payload (drop w)")

    # packed single-key variant: row in high bits + weight bits low.
    @jax.jit
    def stage_sort_packed(rows, ww, cols, eid):
        # order-preserving f32->u32 map, descending weight => invert
        wb = jax.lax.bitcast_convert_type(ww, jnp.uint32)
        wkey = jnp.where(wb >> 31 == 0, wb | jnp.uint32(1 << 31), ~wb)
        key = (rows.astype(jnp.uint64) << jnp.uint64(32)
               | (~wkey).astype(jnp.uint64))
        return jax.lax.sort((key, cols, eid), num_keys=1)

    _, t_sortp = timed(stage_sort_packed, rows, ww, cols, eid,
                       tag="sort packed u64 key+2payload")

    # --- stage 3: ranks (segment_sum + cumsum) --------------------------
    @jax.jit
    def stage_ranks(r2):
        in_row = r2 < n
        pos = S._rank_within_rows(r2, in_row, n)
        return in_row & (pos < m)

    fits_sorted, t_rank = timed(stage_ranks, r2, tag="rank_within_rows")

    # --- stage 4: fits scatter back to entry order ----------------------
    @jax.jit
    def stage_scatter_bool(eid2, fits_sorted):
        return jnp.zeros((2 * n * k,), dtype=bool).at[eid2].set(fits_sorted)

    _, t_scb = timed(stage_scatter_bool, eid2, fits_sorted,
                     tag="scatter bool[2Nk] (fits)")

    @jax.jit
    def stage_scatter_i32(eid2):
        return (jnp.zeros((2 * n * k,), dtype=jnp.int32)
                .at[eid2].set(jnp.arange(2 * n * k, dtype=jnp.int32)))

    inv_perm, t_sci = timed(stage_scatter_i32, eid2,
                            tag="scatter i32[2Nk] (inv perm)")

    # sort-based inverse permutation instead of scatter
    @jax.jit
    def stage_invsort(eid2, fits_sorted):
        _, fs = jax.lax.sort((eid2, fits_sorted), num_keys=1)
        return fs

    _, t_invs = timed(stage_invsort, eid2, fits_sorted,
                      tag="sort-based inverse (eid2 key)")

    # gather through inv_perm (the alternative to the bool scatter)
    @jax.jit
    def stage_gather_inv(fits_sorted, inv_perm):
        return fits_sorted[inv_perm]

    _, t_gai = timed(stage_gather_inv, fits_sorted, inv_perm,
                     tag="gather fits via inv_perm")

    # --- stage 5: final ELL placement scatter ---------------------------
    surv = fits_sorted  # approximation: same density/pattern class
    pos2 = S._rank_within_rows(r2, surv, n)
    flat_pos = jnp.where(surv, r2 * m + pos2, n * m)
    jax.block_until_ready(flat_pos)

    @jax.jit
    def stage_place2(flat_pos, c2, w2):
        nbr_idx = jnp.full((n * m + 1,), -1, dtype=jnp.int32)
        nbr_w = jnp.zeros((n * m + 1,), dtype=w2.dtype)
        nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(surv, c2, -1))
        nbr_w = nbr_w.at[flat_pos].set(jnp.where(surv, w2, 0.0))
        return nbr_idx, nbr_w

    _, t_pl2 = timed(stage_place2, flat_pos, c2, w2,
                     tag="place scatter i32+f32 (current)")

    @jax.jit
    def stage_place1(flat_pos, c2, w2):
        src = jnp.full((n * m + 1,), 2 * n * k, dtype=jnp.int32)
        src = src.at[flat_pos].set(jnp.arange(2 * n * k, dtype=jnp.int32))
        src = src[: n * m]
        c2p = jnp.concatenate([c2, jnp.array([-1], jnp.int32)])
        w2p = jnp.concatenate([w2, jnp.zeros((1,), w2.dtype)])
        return c2p[src], w2p[src]

    _, t_pl1 = timed(stage_place1, flat_pos, c2, w2,
                     tag="place 1 scatter + 2 gathers")

    total = t_mut + t_sort5 + 2 * t_rank + t_scb + t_pl2
    print(f"\nsum of stages ~= {total*1e3:.1f} ms vs full {t_full*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
