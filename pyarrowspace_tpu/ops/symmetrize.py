"""Symmetrization of the directed k-NN candidate graph into a padded-ELL
sparse layout.

TPU rationale (SURVEY.md §7 "hard parts"): TPU has no scatter-friendly sparse
format, so the symmetrized graph is stored as fixed-width ELL — per-row
neighbor indices/weights padded to width 2k.  The union graph
E = {(i,j) : j in knn(i) or i in knn(j)} can have unbounded in-degree at hub
nodes; rows are filled highest-weight-first and an edge survives only if it
fits within the width cap in BOTH of its endpoint rows, so the stored graph
stays exactly symmetric (L = L^T, a Laplacian invariant the test suite pins).
The count of dropped undirected edges is returned as a sparsity stat.

Weights are symmetric by construction — d(i,j) = d(j,i) for cosine distance —
so the forward copy and the reverse copy of a kept edge carry equal weight and
dedup is a plain drop (reference behavior: symmetrize then Laplacian,
GRAPH_VARIABLES.md:7-10).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rank_within_rows(rows: jnp.ndarray, flags: jnp.ndarray, n: int):
    """For entries sorted by row, the rank of each flagged entry within its
    row counting flagged entries only."""
    counts = jax.ops.segment_sum(flags.astype(jnp.int32), rows,
                                 num_segments=n + 1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    global_rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
    return global_rank - starts[rows]


@functools.partial(jax.jit, static_argnames=("ell_width",))
def symmetrize_to_ell(idx: jnp.ndarray, w: jnp.ndarray, ell_width: int):
    """Build the symmetrized union graph in padded-ELL form.

    Args:
      idx: [N, k] int32 neighbor indices from the directed k-NN (-1 = missing).
      w:   [N, k] edge weights (same dtype as corpus).
      ell_width: output row width (typically 2k).

    Returns:
      nbr_idx [N, ell_width] int32 (-1 pad), nbr_w [N, ell_width],
      degrees [N], n_dropped (int32: ordered entries dropped by the cap).
    """
    n, k = idx.shape
    m = ell_width
    rows_f = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols_f = idx.reshape(-1)
    w_f = w.reshape(-1)
    valid_f = cols_f >= 0

    # Union with the reversed edges.
    rows = jnp.concatenate([rows_f, cols_f])
    cols = jnp.concatenate([cols_f, rows_f])
    ww = jnp.concatenate([w_f, w_f])
    valid = jnp.concatenate([valid_f, valid_f])
    rows = jnp.where(valid, rows, n)  # sentinel row for invalid entries
    cols = jnp.where(valid, cols, n)

    # Pass 1: sort by (row, col); drop duplicate ordered pairs.  After this,
    # every kept undirected edge has exactly two ordered entries (i,j),(j,i).
    order = jnp.lexsort((cols, rows))
    r1, c1, w1, v1 = rows[order], cols[order], ww[order], valid[order]
    dup = jnp.concatenate([
        jnp.zeros((1,), dtype=bool),
        (r1[1:] == r1[:-1]) & (c1[1:] == c1[:-1]),
    ])
    keep = v1 & ~dup
    r1 = jnp.where(keep, r1, n)
    c1 = jnp.where(keep, c1, n)

    # Pass 2: sort by (row, descending weight); provisional keep = the edge
    # ranks within the top ell_width of its row.
    order2 = jnp.lexsort((-w1, r1))
    r2, c2, w2, keep2 = r1[order2], c1[order2], w1[order2], keep[order2]
    pos = _rank_within_rows(r2, keep2, n)
    fits = keep2 & (pos < m)

    # Pass 3: symmetric cap — an undirected edge survives only if BOTH of its
    # ordered entries fit.  Sort by the unordered key (lo, hi); the two
    # entries of an edge become adjacent, AND their flags.
    lo = jnp.minimum(r2, c2)
    hi = jnp.maximum(r2, c2)
    order3 = jnp.lexsort((hi, lo))
    f3 = fits[order3]
    lo3, hi3, k3 = lo[order3], hi[order3], keep2[order3]
    same_next = jnp.concatenate([
        (lo3[:-1] == lo3[1:]) & (hi3[:-1] == hi3[1:]) & k3[:-1] & k3[1:],
        jnp.zeros((1,), dtype=bool)])
    same_prev = jnp.concatenate([jnp.zeros((1,), dtype=bool), same_next[:-1]])
    f3_next = jnp.concatenate([f3[1:], jnp.zeros((1,), dtype=bool)])
    f3_prev = jnp.concatenate([jnp.zeros((1,), dtype=bool), f3[:-1]])
    both = jnp.where(same_next, f3 & f3_next,
                     jnp.where(same_prev, f3 & f3_prev, False))
    survives = jnp.zeros_like(fits).at[order3].set(both)

    n_dropped = jnp.sum(keep2 & ~survives).astype(jnp.int32)

    # Final placement: rank among surviving entries (sorted by row, -w).
    pos2 = _rank_within_rows(r2, survives, n)
    flat_pos = jnp.where(survives, r2 * m + pos2, n * m)

    nbr_idx = jnp.full((n * m + 1,), -1, dtype=jnp.int32)
    nbr_w = jnp.zeros((n * m + 1,), dtype=w.dtype)
    nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(survives, c2, -1))
    nbr_w = nbr_w.at[flat_pos].set(jnp.where(survives, w2, 0.0))
    nbr_idx = nbr_idx[: n * m].reshape(n, m)
    nbr_w = nbr_w[: n * m].reshape(n, m)
    degrees = jnp.sum(nbr_w, axis=1)
    return nbr_idx, nbr_w, degrees, n_dropped
