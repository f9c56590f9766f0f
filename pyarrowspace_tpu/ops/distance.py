"""Tiled exact rectified-cosine k-NN — the framework's hottest build kernel.

TPU-native redesign of the reference engine's eps/k-NN signal-graph candidate
search (reference behavior: GRAPH_VARIABLES.md — d(i,j) = 1 - max(0, cos),
edges kept iff d <= eps, capped at the k nearest per node).  The reference
does this with rayon CPU threads; here each row-block of the unit-normalized
corpus is matmul'd against column tiles of the corpus on the MXU, and a
running per-row top-k is maintained across column tiles with `lax.top_k`, so
the N x N distance matrix is never materialized (SURVEY.md §7 step 2).

Exactness matters: the reference is exact k-NN (no ANN), so parity means
exact neighbor sets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel distance for masked / filtered candidates.  Rectified-cosine
# distances live in [0, 1], so 2.0 is strictly worse than any real edge.
_INF_DIST = 2.0


def unit_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-30) -> jnp.ndarray:
    """Row-normalize to unit L2 norm; all-zero rows are left at zero
    (they then have cosine 0 against everything => distance 1)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _ceil_to(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def _knn_row_block(xu_pad: jnp.ndarray, row_start: int, block_rows: int,
                   k: int, eps: float, n_real: int, col_tile: int):
    """Exact top-k nearest (smallest rectified-cosine distance) for one block
    of rows against the whole corpus, scanning column tiles.

    xu_pad: [N_pad, F] unit-normalized, zero-padded corpus.
    Returns (dist [block_rows, k], idx [block_rows, k]); entries with
    dist > eps or out-of-range are (inf-dist, -1)-masked by the caller.
    """
    n_pad, f = xu_pad.shape
    n_tiles = n_pad // col_tile
    rows = jax.lax.dynamic_slice(xu_pad, (row_start, 0), (block_rows, f))
    row_ids = (row_start
               + jnp.arange(block_rows, dtype=jnp.int32)[:, None])  # [B, 1]
    row_ids = row_ids.astype(jnp.int32)

    def scan_tile(carry, t):
        best_d, best_i = carry  # [B, k] each
        col_start = t * col_tile
        cols = jax.lax.dynamic_slice(xu_pad, (col_start, 0), (col_tile, f))
        # MXU: [B, F] @ [F, T] -> [B, T]
        sims = jax.lax.dot_general(
            rows, cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
            if rows.dtype != jnp.float64 else jnp.float64,
        )
        d = 1.0 - jnp.maximum(sims, 0.0)
        col_ids = (col_start
                   + jnp.arange(col_tile, dtype=jnp.int32)[None, :])  # [1, T]
        col_ids = col_ids.astype(jnp.int32)
        invalid = (col_ids == row_ids) | (col_ids >= n_real)  # self + padding
        d = jnp.where(invalid, _INF_DIST, d)
        # Merge the tile's candidates with the running best-k.
        cand_d = jnp.concatenate([best_d, d], axis=1)            # [B, k+T]
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids, d.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)                  # smallest-k
        new_d = -neg_top
        new_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (new_d, new_i), None

    init = (
        jnp.full((block_rows, k), _INF_DIST, dtype=xu_pad.dtype),
        jnp.full((block_rows, k), -1, dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(scan_tile, init, jnp.arange(n_tiles))
    # eps filter (reference: edges kept iff d <= eps, GRAPH_VARIABLES.md).
    keep = best_d <= eps
    best_d = jnp.where(keep, best_d, _INF_DIST)
    best_i = jnp.where(keep, best_i, -1)
    return best_d, best_i


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "col_tile", "n_real"))
def _knn_all_blocks(xu_pad, *, k, block_rows, col_tile, n_real, eps):
    n_pad = xu_pad.shape[0]
    n_blocks = n_pad // block_rows

    def do_block(b):
        return _knn_row_block(
            xu_pad, b * block_rows, block_rows, k, eps, n_real, col_tile)

    d, i = jax.lax.map(do_block, jnp.arange(n_blocks))
    return d.reshape(n_pad, k), i.reshape(n_pad, k)


@functools.partial(
    jax.jit, static_argnames=("k", "col_tile"))
def _merge_segment(rows, seg, best_d, best_i, row_start, seg_start, n_real,
                   eps, *, k, col_tile):
    """Merge one corpus segment into the running top-k of one row chunk.

    Fixed shapes: rows [C, F], seg [S, F] — compiled ONCE and reused for
    every (chunk, segment) pair of any corpus size.  Short dispatches keep
    remote-TPU links healthy (a whole-corpus single dispatch at 313k+ rows
    trips tunnel deadlines) and the compile cache hot across corpus sizes.
    """
    c, f = rows.shape
    s = seg.shape[0]
    n_tiles = s // col_tile
    row_ids = (row_start
               + jnp.arange(c, dtype=jnp.int32)[:, None]).astype(jnp.int32)

    def scan_tile(carry, t):
        bd, bi = carry
        cols = jax.lax.dynamic_slice(
            seg, (t * jnp.int32(col_tile), jnp.int32(0)), (col_tile, f))
        sims = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=rows.dtype)
        d = 1.0 - jnp.maximum(sims, 0.0)
        col_ids = (seg_start + t * jnp.int32(col_tile)
                   + jnp.arange(col_tile, dtype=jnp.int32)[None, :]).astype(
                       jnp.int32)
        invalid = (col_ids == row_ids) | (col_ids >= n_real)
        d = jnp.where(invalid | (d > eps), _INF_DIST, d)
        cd = jnp.concatenate([bd, d], axis=1)
        ci = jnp.concatenate([bi, jnp.broadcast_to(col_ids, d.shape)],
                             axis=1)
        neg, pos = jax.lax.top_k(-cd, k)
        return (-neg, jnp.take_along_axis(ci, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        scan_tile, (best_d, best_i), jnp.arange(n_tiles, dtype=jnp.int32))
    return best_d, best_i


def knn_graph_candidates_chunked(xu: jnp.ndarray, k: int, eps: float,
                                 row_chunk: int = 16384,
                                 col_segment: int = 65536,
                                 col_tile: int = 2048):
    """Exact eps-filtered k-NN with size-independent compilation.

    Pads the corpus to a (row_chunk x col_segment) grid and python-loops
    the fixed-shape `_merge_segment` program over it; running top-k buffers
    stay on device between calls.  Same contract as knn_graph_candidates.
    """
    n, f = xu.shape
    k_eff = max(1, min(k, n - 1)) if n > 1 else 1
    # Alignment chain: tile | chunk | seg | n_pad, so every slice in the
    # two loops below is exact.  (An lcm of arbitrary seg/chunk values can
    # explode to tens of millions of padding rows — e.g. lcm(16384, 15000)
    # = 30.7M; keep everything a multiple of the next-smaller unit instead.)
    tile = min(col_tile, _ceil_to(n, 128))
    chunk = min(row_chunk, _ceil_to(n, tile))
    chunk = _ceil_to(chunk, tile)
    seg = min(col_segment, _ceil_to(n, tile))
    seg = _ceil_to(seg, chunk)
    n_pad = _ceil_to(n, seg)
    xu_pad = jnp.pad(xu, ((0, n_pad - n), (0, 0)))
    eps_t = jnp.asarray(eps, dtype=xu.dtype)
    n_real = jnp.int32(n)

    out_d, out_i = [], []
    for r0 in range(0, n_pad, chunk):
        rows = jax.lax.dynamic_slice(xu_pad, (r0, 0), (chunk, f))
        bd = jnp.full((chunk, k_eff), _INF_DIST, dtype=xu.dtype)
        bi = jnp.full((chunk, k_eff), -1, dtype=jnp.int32)
        for s0 in range(0, n_pad, seg):
            seg_arr = jax.lax.dynamic_slice(xu_pad, (s0, 0), (seg, f))
            bd, bi = _merge_segment(rows, seg_arr, bd, bi, jnp.int32(r0),
                                    jnp.int32(s0), n_real, eps_t,
                                    k=k_eff, col_tile=tile)
        out_d.append(bd)
        out_i.append(bi)
        if r0 + chunk >= n:
            break
    d = jnp.concatenate(out_d, axis=0)[:n]
    i = jnp.concatenate(out_i, axis=0)[:n]
    keep = d <= eps_t
    d = jnp.where(keep, d, _INF_DIST)
    i = jnp.where(keep, i, -1)
    if k_eff < k:
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=_INF_DIST)
        i = jnp.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return d, i


def knn_graph_candidates(xu: jnp.ndarray, k: int, eps: float,
                         block_rows: int = 1024, col_tile: int = 2048):
    """Exact eps-filtered k-NN over unit-normalized rows.

    Returns (dist [N, k] float, idx [N, k] int32) sorted ascending by
    distance per row; missing candidates marked (2.0, -1).

    k is capped at N-1 internally but the output is always width-k
    (padded) so downstream shapes stay static.
    """
    n, _ = xu.shape
    k_eff = max(1, min(k, n - 1)) if n > 1 else 1
    # Alignment chain (same rationale as the chunked path): block must
    # divide tile so the padded size is just a tile multiple — an lcm of
    # arbitrary block/tile pairs explodes (e.g. lcm(1000, 1024) = 128000
    # padded rows for a 1000-row corpus).
    import math
    tile = min(col_tile, _ceil_to(n, 128))
    block = min(block_rows, tile)
    block = 128 * math.gcd(tile // 128, max(1, block // 128))
    n_pad = _ceil_to(max(n, tile), tile)
    xu_pad = jnp.pad(xu, ((0, n_pad - n), (0, 0)))
    d, i = _knn_all_blocks(
        xu_pad, k=k_eff, block_rows=block, col_tile=tile, n_real=n,
        eps=jnp.asarray(eps, dtype=xu.dtype))
    d, i = d[:n], i[:n]
    if k_eff < k:
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=_INF_DIST)
        i = jnp.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return d, i


def extend_knn_candidates(xu_all: jnp.ndarray, d_old: jnp.ndarray,
                          i_old: jnp.ndarray, n_old: int, k: int, eps: float,
                          row_chunk: int = 16384, col_tile: int = 2048):
    """Incremental exact k-NN: append xu_all[n_old:] to a corpus whose
    directed top-k over xu_all[:n_old] is already known.

    Equals knn_graph_candidates_chunked(xu_all, k, eps) without redoing the
    old x old scan:

    * old rows merge the stored top-k with candidates among the NEW columns
      only (the stored buffer rides first in the top_k concat, so earlier-
      seen entries win distance ties exactly as in the full scan);
    * new rows scan the whole corpus.

    Work is O((n_old + n) * m * F) for m appended rows vs O(n^2 F) for a
    rebuild.  Exactness argument: column tiles cover the same global index
    ranges as a full scan (tile t is cols [t*tile, (t+1)*tile) regardless
    of corpus length), lax.top_k is stable, and insertion requires strict
    improvement past the running kth — so the merged buffers evolve
    identically to the full scan's.
    """
    n, f = xu_all.shape
    m = n - n_old
    if m <= 0:
        return d_old, i_old
    k_eff = max(1, min(k, n - 1)) if n > 1 else 1
    eps_t = jnp.asarray(eps, dtype=xu_all.dtype)
    n_real = jnp.int32(n)

    # --- old rows: merge the new-column block into the stored top-k ------
    tile_new = min(col_tile, _ceil_to(m, 128))
    m_pad = _ceil_to(m, tile_new)
    seg_new = jnp.pad(xu_all[n_old:], ((0, m_pad - m), (0, 0)))
    # Stored buffers may be width-k padded past k_eff of the small build;
    # top_k below re-selects at today's k_eff and re-pads at the end.
    bd_old = d_old[:, :k_eff] if d_old.shape[1] >= k_eff else jnp.pad(
        d_old, ((0, 0), (0, k_eff - d_old.shape[1])),
        constant_values=_INF_DIST)
    bi_old = i_old[:, :k_eff] if i_old.shape[1] >= k_eff else jnp.pad(
        i_old, ((0, 0), (0, k_eff - i_old.shape[1])), constant_values=-1)
    out_d, out_i = [], []
    chunk = min(row_chunk, _ceil_to(n_old, 128))
    n_old_pad = _ceil_to(n_old, chunk)
    xu_old_pad = jnp.pad(xu_all[:n_old], ((0, n_old_pad - n_old), (0, 0)))
    bd_pad = jnp.pad(bd_old, ((0, n_old_pad - n_old), (0, 0)),
                     constant_values=_INF_DIST)
    bi_pad = jnp.pad(bi_old, ((0, n_old_pad - n_old), (0, 0)),
                     constant_values=-1)
    for r0 in range(0, n_old_pad, chunk):
        rows = jax.lax.dynamic_slice(xu_old_pad, (r0, 0), (chunk, f))
        bd = jax.lax.dynamic_slice(bd_pad, (r0, 0), (chunk, k_eff))
        bi = jax.lax.dynamic_slice(bi_pad, (r0, 0), (chunk, k_eff))
        bd, bi = _merge_segment(rows, seg_new, bd, bi, jnp.int32(r0),
                                jnp.int32(n_old), n_real, eps_t,
                                k=k_eff, col_tile=tile_new)
        out_d.append(bd)
        out_i.append(bi)

    # --- new rows: scan the whole corpus ---------------------------------
    tile = min(col_tile, _ceil_to(n, 128))
    seg_len = _ceil_to(n, tile)
    xu_pad = jnp.pad(xu_all, ((0, seg_len - n), (0, 0)))
    chunk_new = min(row_chunk, m_pad)
    rows_pad = jnp.pad(xu_all[n_old:],
                       ((0, _ceil_to(m, chunk_new) - m), (0, 0)))
    new_d, new_i = [], []
    for r0 in range(0, rows_pad.shape[0], chunk_new):
        rows = jax.lax.dynamic_slice(rows_pad, (r0, 0), (chunk_new, f))
        bd = jnp.full((chunk_new, k_eff), _INF_DIST, dtype=xu_all.dtype)
        bi = jnp.full((chunk_new, k_eff), -1, dtype=jnp.int32)
        bd, bi = _merge_segment(rows, xu_pad, bd, bi, jnp.int32(n_old + r0),
                                jnp.int32(0), n_real, eps_t,
                                k=k_eff, col_tile=tile)
        new_d.append(bd)
        new_i.append(bi)

    d = jnp.concatenate(out_d + new_d, axis=0)
    d = jnp.concatenate([d[:n_old], d[n_old_pad:n_old_pad + m]]) \
        if n_old_pad != n_old else d[:n]
    i = jnp.concatenate(out_i + new_i, axis=0)
    i = jnp.concatenate([i[:n_old], i[n_old_pad:n_old_pad + m]]) \
        if n_old_pad != n_old else i[:n]
    keep = d <= eps_t
    d = jnp.where(keep, d, _INF_DIST)
    i = jnp.where(keep, i, -1)
    if k_eff < k:
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=_INF_DIST)
        i = jnp.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return d, i


def kernel_weights(dist: jnp.ndarray, sigma: float, p: float) -> jnp.ndarray:
    """Edge-weight kernel w = 1 / (1 + (d / sigma)^p)
    (reference GRAPH_VARIABLES.md:7-10)."""
    sigma = jnp.maximum(jnp.asarray(sigma, dtype=dist.dtype), 1e-12)
    return 1.0 / (1.0 + jnp.power(jnp.maximum(dist, 0.0) / sigma, p))
