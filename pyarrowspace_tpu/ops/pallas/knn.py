"""Fused exact k-NN Pallas kernel — the hottest op of the build pipeline.

ONE `pallas_call` handles the entire corpus over a (row-block, column-tile)
grid: the TPU grid is sequential, so the kernel keeps the current row
block's running (distance, index) top-k in VMEM scratch across the inner
column-tile steps and emits it at each block's last step.  Each step is:

    MXU:  sims = rows @ cols^T                       [B, T]
    VPU:  d = 1 - max(0, sims); self/pad/eps mask
    VPU:  exact k-extraction over [B, k+T] (k passes of min + tie-broken
          argmin via a value-match/index-min trick — no sort)

versus the XLA path (`ops/distance.py`) whose per-tile `lax.top_k` lowers to
a full sort of [B, k+T].  The extraction trick: after computing the row min
`m`, the selected index is `min(where(d == m, idx, INT_MAX))` (deterministic
smallest-index tie-break, matching stable argsort), and exactly that entry
is masked out before the next pass.

Distances within a pass are bitwise-equal to the XLA path (same matmul
precision), so the two backends return identical neighbor sets up to
distance ties.  Tie-break detail: the lazy merge requires STRICT improvement
over the current kth distance to insert, so among exactly-equal distances at
the kth boundary the first-seen entry wins (the XLA path breaks such ties by
smallest index); measured at 313k x 384 f32 this flips 1 row in 20,000 and
the flipped entries are at identical distance — retrieval quality is
unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF_DIST = 2.0
_INT_MAX = jnp.iinfo(jnp.int32).max



def _lazy_merge_min(d, col_ids, run_d, run_i, *, k: int, inf_val,
                    unroll_passes: int = 0):
    """Lazy exact merge, MIN variant (distances ascending; mirror of
    ops/pallas/scan_topk._lazy_merge): extract a tile's min and
    insertion-sort it in only while it beats some row's kth distance;
    scatter-free iota-mask shifts; worst case degrades to dense
    extraction, still exact.  Shared by the Pallas k-NN kernel and the
    sharded ring merge (parallel/sharded.py) so the exactness-critical
    tie-break (smallest column id wins equal distances) lives in ONE
    place.  Returns the merged (rd, ri)."""
    b = d.shape[0]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    int_max = jnp.iinfo(jnp.int32).max

    def improving(carry):
        dd, rd, _ = carry
        kth = rd[:, k - 1:k]
        return jnp.any(jnp.min(dd, axis=1, keepdims=True) < kth)

    def extract_insert(carry):
        dd, rd, ri = carry
        kth = rd[:, k - 1:k]
        m = jnp.min(dd, axis=1, keepdims=True)
        hit = dd == m
        sel = jnp.min(jnp.where(hit, col_ids, int_max), axis=1,
                      keepdims=True)
        improves = m < kth
        pos = jnp.sum((rd < m).astype(jnp.int32), axis=1,
                      keepdims=True)
        rd_shift = jnp.concatenate([rd[:, :1], rd[:, :-1]], axis=1)
        ri_shift = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        ins_d = jnp.where(col_k < pos, rd,
                          jnp.where(col_k == pos, m, rd_shift))
        ins_i = jnp.where(col_k < pos, ri,
                          jnp.where(col_k == pos,
                                    sel.astype(ri.dtype), ri_shift))
        rd = jnp.where(improves, ins_d, rd)
        ri = jnp.where(improves, ins_i, ri)
        dd = jnp.where(hit & (col_ids == sel), inf_val, dd)
        dd = jnp.where(improves, dd, inf_val)  # row done: min >= kth
        return dd, rd, ri

    if unroll_passes:
        # DIAGNOSTIC ONLY (bench_knn_merge_ab KNNAB_DIAG): a fixed
        # number of unconditionally-unrolled passes with NO while_loop,
        # to price the loop structure (cond reduces + the [B, T] dd
        # carry) separately from the pass bodies.  Output is WRONG
        # whenever a tile holds more improving candidates than passes.
        carry = (d, run_d, run_i)
        for _ in range(unroll_passes):
            carry = extract_insert(carry)
        _, rd, ri = carry
        return rd, ri
    _, rd, ri = jax.lax.while_loop(improving, extract_insert,
                                   (d, run_d, run_i))
    return rd, ri

def _lazy_merge_min_t(d, cand_ids, run_d, run_i, *, k: int, k_pad: int,
                      inf_val):
    """Transposed lazy exact merge: candidates on SUBLANES, queries on
    lanes.  `d` is [T, B] (T candidates x B block rows), the running
    top-k lives as [k_pad, B] with the best distance in row 0.  Same
    algorithm and tie-break as _lazy_merge_min, but every reduction
    (tile min, tie-broken argmin, insertion rank) runs over the SUBLANE
    axis — elementwise vreg ops with no cross-lane shuffles, where the
    [B, T] layout's lane-axis min costs a log-tree of cross-lane
    relayouts per pass (the measured extraction share of the k-NN pass
    is ~60%, recorded 1787161308_knn_bf16_ab).  k_pad >= k rows of
    scratch keep the sublane dim aligned; rows >= k stay at inf and are
    never emitted."""
    row_k = jax.lax.broadcasted_iota(jnp.int32, (k_pad, d.shape[1]), 0)
    int_max = jnp.iinfo(jnp.int32).max

    def kth_of(rd):
        return jnp.min(jnp.where(row_k == k - 1, rd, jnp.inf), axis=0,
                       keepdims=True)

    def improving(carry):
        dd, rd, _ = carry
        return jnp.any(jnp.min(dd, axis=0, keepdims=True) < kth_of(rd))

    def extract_insert(carry):
        dd, rd, ri = carry
        kth = kth_of(rd)
        m = jnp.min(dd, axis=0, keepdims=True)                  # [1, B]
        hit = dd == m
        sel = jnp.min(jnp.where(hit, cand_ids, int_max), axis=0,
                      keepdims=True)                            # [1, B]
        improves = m < kth
        pos = jnp.sum((rd < m).astype(jnp.int32), axis=0,
                      keepdims=True)                            # [1, B]
        rd_shift = jnp.concatenate([rd[:1], rd[:-1]], axis=0)
        ri_shift = jnp.concatenate([ri[:1], ri[:-1]], axis=0)
        ins_d = jnp.where(row_k < pos, rd,
                          jnp.where(row_k == pos, m, rd_shift))
        ins_i = jnp.where(row_k < pos, ri,
                          jnp.where(row_k == pos,
                                    sel.astype(ri.dtype), ri_shift))
        rd = jnp.where(improves, ins_d, rd)
        ri = jnp.where(improves, ins_i, ri)
        dd = jnp.where(hit & (cand_ids == sel), inf_val, dd)
        dd = jnp.where(improves, dd, inf_val)  # column done: min >= kth
        return dd, rd, ri

    _, rd, ri = jax.lax.while_loop(improving, extract_insert,
                                   (d, run_d, run_i))
    return rd, ri


def _knn_block_kernel_t(eps_ref, nreal_ref, rows_ref, cols_ref,
                        out_d_ref, out_i_ref, run_d, run_i, *, k: int,
                        k_pad: int, col_tile: int, block_rows: int):
    """Transposed-merge variant of _knn_block_kernel: the dot emits
    [T, B] (corpus tile on sublanes, block rows on lanes) and the merge
    reduces over sublanes; outputs stay transposed ([k_pad, N] — the
    caller transposes once, 40 MB at 313k)."""
    rb = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        run_d[:] = jnp.full_like(run_d, _INF_DIST)
        run_i[:] = jnp.full_like(run_i, -1)

    rows = rows_ref[:]                      # [B, F]
    cols = cols_ref[:]                      # [T, F]
    b = rows.shape[0]

    sims = jax.lax.dot_general(
        cols, rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [T, B]
    d = 1.0 - jnp.maximum(sims, 0.0)

    cand_ids = (t * col_tile
                + jax.lax.broadcasted_iota(jnp.int32, (col_tile, b), 0))
    row_ids = (rb * block_rows
               + jax.lax.broadcasted_iota(jnp.int32, (col_tile, b), 1))
    invalid = (cand_ids == row_ids) | (cand_ids >= nreal_ref[0])
    d = jnp.where(invalid | (d > eps_ref[0]), _INF_DIST, d).astype(
        jnp.float32)

    rd, ri = _lazy_merge_min_t(d, cand_ids, run_d[:], run_i[:], k=k,
                               k_pad=k_pad, inf_val=_INF_DIST)
    run_d[:] = rd
    run_i[:] = ri

    @pl.when(t == n_tiles - 1)
    def _emit():
        out_d_ref[:] = run_d[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "col_tile", "interpret"))
def _knn_pallas_all_t(xu_pad, eps_arr, nreal_arr, *, k, block_rows,
                      col_tile, interpret=False):
    """Transposed-merge twin of _knn_pallas_all: same grid, [k_pad, N]
    outputs (block (k_pad, block_rows) at column rb), one XLA transpose
    at the end."""
    n_pad, f = xu_pad.shape
    n_tiles = n_pad // col_tile
    n_blocks = n_pad // block_rows
    k_pad = max(8, ((k + 7) // 8) * 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((block_rows, f), lambda rb, t, *_: (rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, f), lambda rb, t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, block_rows), lambda rb, t, *_: (0, rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, block_rows), lambda rb, t, *_: (0, rb),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, block_rows), jnp.float32),
            pltpu.VMEM((k_pad, block_rows), jnp.int32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_knn_block_kernel_t, k=k, k_pad=k_pad,
                          col_tile=col_tile, block_rows=block_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(64, 14 * block_rows * col_tile // (1 << 20))
            * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )
    d_t, i_t = kernel(eps_arr, nreal_arr, xu_pad, xu_pad)
    return d_t[:k].T, i_t[:k].T


def _knn_block_kernel(eps_ref, nreal_ref, rows_ref, cols_ref,
                      out_d_ref, out_i_ref, run_d, run_i, *, k: int,
                      col_tile: int, block_rows: int, sub: int = 0,
                      diag: str = "", diag_start: bool = False):
    """Grid dim 0 walks row blocks, dim 1 column tiles (innermost); the
    running top-k for the current row block lives in VMEM scratch.

    sub > 0 selects the SUB-TILE merge variant: the column tile is
    processed in `sub`-row slices, each with its OWN dot — the [B, sub]
    distance slice comes straight off the MXU, so nothing ever slices a
    wide [B, T] vector on the lane axis (Mosaic crashes on that:
    vector_extract_strided_slice 'limits[i] <= dim(i)' in
    ApplyVectorLayout, hit 2026-08-20 with a d[:, 128-lane] slice).
    Rationale: the merge is the measured ~60% of the pass (recorded
    1787161308_knn_bf16_ab) and every extract-insert pass touches the
    whole distance block it merges; with slices a pass touches only
    [B, sub], and a slice holding no improving candidate costs one
    predicate check (a lane-min + compare) instead of a full pass.
    Slices run in ascending column order, so outputs match the
    full-tile merge except where an EXACT distance tie crosses the kth
    boundary (the kept neighbor may differ at identical distance — the
    same tie class already documented vs the XLA backend above).

    diag selects WRONG-OUTPUT timing probes for bench_knn_merge_ab's
    phase decomposition (never reachable from the public entry point):
    "nomerge" replaces the lazy merge with a single row-min reduce
    (times dot + masks + one cross-lane reduce), "nomask" runs the full
    merge on unmasked distances (times the pass without the
    iota/compare mask build)."""
    rb = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        run_d[:] = jnp.full_like(run_d, _INF_DIST)
        run_i[:] = jnp.full_like(run_i, -1)

    rows = rows_ref[:]                      # [B, F]
    b = rows.shape[0]

    # Diagonal-first visit order: the BlockSpec index map rotates the
    # column-tile walk so each row block scans its OWN neighborhood
    # first (see _knn_pallas_all); the candidate ids must use the same
    # rotated tile id.
    t_eff = ((t + rb * block_rows // col_tile) % n_tiles
             if diag_start else t)

    step = sub if (sub and sub < col_tile) else col_tile
    rd, ri = run_d[:], run_i[:]
    for s in range(col_tile // step):
        cols = cols_ref[s * step:(s + 1) * step, :]        # [step, F]
        sims = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, step]
        d = 1.0 - jnp.maximum(sims, 0.0)

        col_ids = (t_eff * col_tile + s * step
                   + jax.lax.broadcasted_iota(jnp.int32, (b, step), 1))
        if diag != "nomask":
            row_ids = (rb * block_rows
                       + jax.lax.broadcasted_iota(jnp.int32, (b, step), 0))
            invalid = (col_ids == row_ids) | (col_ids >= nreal_ref[0])
            d = jnp.where(invalid | (d > eps_ref[0]), _INF_DIST,
                          d).astype(jnp.float32)
        if diag == "nomerge":
            m = jnp.min(d, axis=1, keepdims=True)
            rd = jnp.minimum(rd, m)
        elif diag.startswith("merge"):
            rd, ri = _lazy_merge_min(d, col_ids, rd, ri, k=k,
                                     inf_val=_INF_DIST,
                                     unroll_passes=int(diag[5:]))
        else:
            rd, ri = _lazy_merge_min(d, col_ids, rd, ri, k=k,
                                     inf_val=_INF_DIST)
    run_d[:] = rd
    run_i[:] = ri

    @pl.when(t == n_tiles - 1)
    def _emit():
        out_d_ref[:] = run_d[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "col_tile", "interpret", "sub",
                     "diag", "diag_start"))
def _knn_pallas_all(xu_pad, eps_arr, nreal_arr, *, k, block_rows, col_tile,
                    interpret=False, sub=0, diag="", diag_start=False):
    """The whole corpus in ONE pallas_call: grid (row blocks, col tiles).

    One dispatch instead of a python loop of per-block calls — through the
    axon tunnel the loop's n_pad/block_rows dispatches (~10 ms each) put a
    ~3.1 s floor under the 313k build's kNN phase regardless of kernel
    speed (measured r3: in-bench phase stuck at 3.17 s while the same
    kernel A/B'd 25% faster standalone).  The grid's sequential outer dim
    carries the running top-k scratch; each row block's result block is
    emitted once at its last column step, so nothing is VMEM-pinned across
    blocks (the failure mode that rules out lax.map'ing a pallas_call)."""
    n_pad, f = xu_pad.shape
    n_tiles = n_pad // col_tile
    n_blocks = n_pad // block_rows

    if diag_start:
        # Rotate each row block's column walk to start at its own
        # diagonal tile: after a locality-preserving corpus reorder a
        # row's nearest neighbors live near its own position, so the
        # running kth bound tightens in the first tiles and the lazy
        # merge's improving check kills the remaining ~n_tiles-O(1)
        # tiles in one reduce each (the merge is the measured 53% of
        # the pass — diag decomposition 2026-08-20).
        col_map = lambda rb, t, *_: (
            (t + rb * block_rows // col_tile) % n_tiles, 0)
    else:
        col_map = lambda rb, t, *_: (t, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # eps, n_real
        grid=(n_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((block_rows, f), lambda rb, t, *_: (rb, 0),
                         memory_space=pltpu.VMEM),    # row block rb
            pl.BlockSpec((col_tile, f), col_map,
                         memory_space=pltpu.VMEM),    # column tile t
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda rb, t, *_: (rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda rb, t, *_: (rb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, k), jnp.float32),
            pltpu.VMEM((block_rows, k), jnp.int32),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_knn_block_kernel, k=k, col_tile=col_tile,
                          block_rows=block_rows, sub=sub, diag=diag,
                          diag_start=diag_start),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        # The lazy-merge loop keeps several [B, T] temporaries live; raise
        # the scoped-VMEM budget above the 16 MB default, scaling with the
        # tile footprint (d/col_ids/row_ids are each B*T*4 bytes).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(64, 14 * block_rows * col_tile // (1 << 20))
            * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )
    return kernel(eps_arr, nreal_arr, xu_pad, xu_pad)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "col_tile", "interpret",
                     "diag_start"))
def _knn_pallas_all_reordered(xu_pad, eps_arr, nreal_arr, *, k, block_rows,
                              col_tile, interpret=False, diag_start=True):
    """Locality-sorted k-NN: projection-sort the corpus, run the fused
    kernel with the diagonal-first tile walk, un-permute the results.

    The lazy merge's cost is its extract-insert pass count; a pass fires
    whenever a tile still holds a candidate beating the row's running
    kth bound.  In corpus order, a row's ~k·ln(N/k) top-k updates are
    spread over all n_tiles column tiles, so nearly every (block, tile)
    step pays merge passes.  Sorting rows by a 1-D spectral projection
    (3 power iterations on X^T X — one [F, N]x[N, F] matmul + two F x F
    matvecs) clusters similar rows into the same tiles; with the
    diagonal-first walk each block then finds its true top-k in its
    first few tiles and the remaining tiles die in the improving
    check's single reduce.  Exact same neighbor SET as the unsorted
    kernel (exact algorithm, different visit order); at exact-distance
    ties crossing the kth boundary the kept neighbor may differ (the
    documented tie class).  Pad rows sort to the end (keys forced to
    +inf), so the kernel's col >= nreal mask is unchanged."""
    n_pad, f = xu_pad.shape
    xtx = jax.lax.dot_general(
        xu_pad, xu_pad, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [F, F]
    v = jnp.sum(xtx, axis=1)                                 # XtX @ 1
    for _ in range(2):
        v = xtx @ v
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    keys = xu_pad @ v                                        # [n_pad]
    pos = jax.lax.iota(jnp.int32, n_pad)
    keys = jnp.where(pos < nreal_arr[0], keys, jnp.inf)
    perm = jnp.argsort(keys)                                 # pads last
    d_p, i_p = _knn_pallas_all(xu_pad[perm], eps_arr, nreal_arr, k=k,
                               block_rows=block_rows, col_tile=col_tile,
                               interpret=interpret, diag_start=diag_start)
    inv = jnp.argsort(perm)                  # original row -> sorted row
    d_o, i_s = d_p[inv], i_p[inv]
    i_o = jnp.where(i_s >= 0, perm[jnp.maximum(i_s, 0)], -1)
    return d_o, i_o.astype(jnp.int32)


def knn_graph_candidates_pallas(xu: jnp.ndarray, k: int, eps: float,
                                block_rows: int = 256, col_tile: int = 2048,
                                interpret: bool | None = None,
                                variant: str | None = None):
    # Tile defaults from the 313k x 384 single-dispatch sweeps on v5e:
    # (256, 2048) runs the full corpus in 2.27-2.31s vs 2.45s (128, 2048),
    # 2.50s (256, 4096), 2.90s (512, 4096), 3.26s (1024, 4096) and 5.69s
    # (1024, 2048) — small row blocks keep the running-top-k scratch and
    # merge temporaries VMEM-cheap, and one dispatch means tile choice no
    # longer trades against per-call tunnel latency.  2048-row blocks fail
    # Mosaic compile; identical outputs across configs (first-1000 idx
    # match 1.0, equal eps-masked checksums).
    """Exact eps-filtered k-NN via the fused Pallas kernel.

    Same contract as ops.distance.knn_graph_candidates: (dist [N,k] f32,
    idx [N,k] int32) ascending per row, missing = (2.0, -1).  Falls back to
    interpret mode automatically off-TPU (CPU tests).
    """
    import os

    n, f = xu.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if variant is None:
        variant = os.environ.get("ARROWSPACE_KNN_VARIANT", "rowmajor")
    k_eff = max(1, min(k, n - 1)) if n > 1 else 1
    tile = min(col_tile, max(128, 1 << (n - 1).bit_length()))
    block = min(block_rows, tile)
    lcm = int(np.lcm(tile, block))
    n_pad = ((max(n, lcm) + lcm - 1) // lcm) * lcm
    xu_pad = jnp.pad(xu.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    eps_arr = jnp.asarray([float(eps)], dtype=jnp.float32)
    nreal_arr = jnp.asarray([n], dtype=jnp.int32)
    if variant == "transposed":
        d, i = _knn_pallas_all_t(xu_pad, eps_arr, nreal_arr, k=k_eff,
                                 block_rows=block, col_tile=tile,
                                 interpret=interpret)
    elif variant == "reorder":
        d, i = _knn_pallas_all_reordered(xu_pad, eps_arr, nreal_arr,
                                         k=k_eff, block_rows=block,
                                         col_tile=tile,
                                         interpret=interpret)
    else:
        sub = 0
        if variant == "subtile":
            sub = int(os.environ.get("ARROWSPACE_KNN_SUB", 256))
        d, i = _knn_pallas_all(xu_pad, eps_arr, nreal_arr, k=k_eff,
                               block_rows=block, col_tile=tile,
                               interpret=interpret, sub=sub,
                               diag_start=(variant == "diagstart"))
    d, i = d[:n], i[:n]
    if k_eff < k:
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=_INF_DIST)
        i = jnp.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return d.astype(xu.dtype), i
