"""Symmetrization of the directed k-NN candidate graph into a padded-ELL
sparse layout.

TPU rationale (SURVEY.md §7 "hard parts"): TPU has no scatter-friendly sparse
format, so the symmetrized graph is stored as fixed-width ELL — per-row
neighbor indices/weights padded to a width cap (default 2k).  The union graph
E = {(i,j) : j in knn(i) or i in knn(j)} can have unbounded in-degree at hub
nodes; rows are filled highest-weight-first (ties by ascending column) and an
edge survives only if it fits within the width cap in BOTH of its endpoint
rows, so the stored graph stays exactly symmetric (L = L^T, a Laplacian
invariant the test suite pins).  The count of dropped undirected edges is
returned as a sparsity stat.

Weights are symmetric by construction — d(i,j) = d(j,i) for cosine distance —
so the forward copy and the reverse copy of a kept edge carry equal weight and
dedup is a plain drop (reference behavior: symmetrize then Laplacian,
GRAPH_VARIABLES.md:7-10).

Implementation: ONE fused global sort (lax.sort, keys (row, -w, col)) over
the 2Nk ordered entries.  The two jobs the previous 3-sort version used extra
global sorts for are done with gathers instead:

* dedup of mutual edges — (i,j) with j in knn(i) AND i in knn(j) produces
  duplicate ordered entries; detected directly in ELL form by a row gather
  ``idx[idx]`` + compare, and the reverse copies of mutual edges are dropped
  before the sort;
* the symmetric both-endpoints-fit check — instead of sorting by the
  unordered key to make edge partners adjacent, each forward entry gathers
  its partner's fit flag (at ``argmax(idx[j]==i)`` for mutual edges, or at
  the aligned reverse-entry slot otherwise).

On the 313k x 384 / k=25 build this replaces three 15.7M-entry device sorts
with one, plus an [N,k,k] gather-compare (bandwidth-bound, cheap on MXU-class
HBM).
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
    node_ids = jnp.arange(n, dtype=jnp.int32)
    valid_f = idx >= 0                                     # [N, k]
    safe_idx = jnp.where(valid_f, idx, 0)

    # Mutual-edge detection: (i,s) with j=idx[i,s] is mutual iff i in idx[j].
    # One row gather + compare; also records WHERE (for the partner-flag
    # gather below).  eq is [N, k, k]: eq[i,s,t] = (idx[j, t] == i).
    eq = idx[safe_idx] == node_ids[:, None, None]
    mutual = jnp.any(eq, axis=2) & valid_f                 # [N, k]
    partner_slot = jnp.argmax(eq, axis=2).astype(jnp.int32)  # [N, k]

    # Ordered entry list: all forward copies + reverse copies of NON-mutual
    # edges (a mutual edge's reverse copy duplicates the partner's forward
    # copy — dropping it here is the dedup the 3-sort version did by
    # sorting on (row, col)).
    rows_f = jnp.broadcast_to(node_ids[:, None], (n, k)).reshape(-1)
    cols_f = idx.reshape(-1)
    w_f = w.reshape(-1)
    rev_valid = (valid_f & ~mutual).reshape(-1)

    valid = jnp.concatenate([valid_f.reshape(-1), rev_valid])
    rows = jnp.where(valid, jnp.concatenate([rows_f, cols_f]), n)  # sentinel
    cols = jnp.concatenate([cols_f, rows_f])
    ww = jnp.concatenate([w_f, w_f])
    eid = jnp.arange(2 * n * k, dtype=jnp.int32)

    # THE sort: (row, -w, col) — highest weight first within a row, ties by
    # ascending column (the documented placement order; the golden test pins
    # it).  Payloads ride along in the same fused sort.
    r2, _, c2, w2, eid2 = jax.lax.sort(
        (rows, -ww, cols, ww, eid), num_keys=3)
    in_row = r2 < n
    pos = _rank_within_rows(r2, in_row, n)
    fits_sorted = in_row & (pos < m)

    # Scatter fit flags back to entry order, then resolve the symmetric cap
    # with gathers: an undirected edge survives iff both of its ordered
    # entries fit.
    fits = jnp.zeros((2 * n * k,), dtype=bool).at[eid2].set(fits_sorted)
    fits_fwd = fits[: n * k].reshape(n, k)
    fits_rev = fits[n * k:].reshape(n, k)
    partner_fit_mutual = fits_fwd[safe_idx, partner_slot]  # [N, k]
    partner_fit = jnp.where(mutual, partner_fit_mutual, fits_rev)
    surv_fwd = fits_fwd & partner_fit & valid_f
    surv_rev = fits_rev & fits_fwd & rev_valid.reshape(n, k)
    survives = jnp.concatenate(
        [surv_fwd.reshape(-1), surv_rev.reshape(-1)])

    n_dropped = jnp.sum(valid & ~survives).astype(jnp.int32)

    # Final placement: rank among surviving entries in the sorted order.
    surv_sorted = survives[eid2]
    pos2 = _rank_within_rows(r2, surv_sorted, n)
    flat_pos = jnp.where(surv_sorted, r2 * m + pos2, n * m)

    nbr_idx = jnp.full((n * m + 1,), -1, dtype=jnp.int32)
    nbr_w = jnp.zeros((n * m + 1,), dtype=w.dtype)
    nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(surv_sorted, c2, -1))
    nbr_w = nbr_w.at[flat_pos].set(jnp.where(surv_sorted, w2, 0.0))
    nbr_idx = nbr_idx[: n * m].reshape(n, m)
    nbr_w = nbr_w[: n * m].reshape(n, m)
    degrees = jnp.sum(nbr_w, axis=1)
    return nbr_idx, nbr_w, degrees, n_dropped
