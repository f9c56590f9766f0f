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


def _rank_sorted(r2: jnp.ndarray, flags: jnp.ndarray):
    """Rank of each flagged entry within its row, counting flagged entries
    only — for entries ALREADY SORTED by row, without segment_sum.

    segment_sum lowers to a scatter-add (~290 ms for 15.7M entries on
    v5e, the dominant symmetrize cost measured round 4); on row-sorted
    input the same ranks come from a cummax (row-start index) + cumsum
    (flagged prefix): rank[p] = #flagged<=p - #flagged<row_start(p) - 1.
    Values at non-flagged positions are garbage — callers mask.

    Returns (rank, cum_flagged_inclusive) — the cumsum is reused by the
    placement stage (compacted position of a flagged entry = cumsum-1).
    """
    m = r2.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), r2[1:] != r2[:-1]])
    row_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    c = jnp.cumsum(flags.astype(jnp.int32))           # inclusive prefix
    c_before = jnp.where(row_start > 0, c[jnp.maximum(row_start - 1, 0)],
                         0)
    return c - c_before - 1, c


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
    # it).  One payload (eid); the sorted weight is recovered from the -w
    # key.  Round-4 measured costs drove every stage choice here: scatters
    # run ~150-290 ms for 15.7M entries on v5e while a whole extra sort is
    # 69-130 ms and coherent gathers are ~40 ms — so the pipeline below
    # uses cummax/cumsum ranks (_rank_sorted), a SORT-based inverse
    # permutation, and a compaction-sort + coherent-gather placement
    # instead of the scatter formulations (1297 -> ~600 ms at 313k).
    r2, nw2, c2, eid2 = jax.lax.sort((rows, -ww, cols, eid), num_keys=3)
    w2 = -nw2
    in_row = r2 < n
    pos, _ = _rank_sorted(r2, in_row)
    fits_sorted = in_row & (pos < m)

    # Fit flags back to entry order via a sort-based inverse permutation
    # (cheaper than a 2Nk scatter), then resolve the symmetric cap with
    # gathers: an undirected edge survives iff both of its ordered
    # entries fit.  spos (each entry's sorted position) rides along so
    # the survive flags can return to sorted order with another cheap
    # sort instead of a 15.7M random gather (A/B: 847 vs 926 ms total).
    _, fits, spos = jax.lax.sort((eid2, fits_sorted, eid), num_keys=1)
    fits_fwd = fits[: n * k].reshape(n, k)
    fits_rev = fits[n * k:].reshape(n, k)
    partner_fit_mutual = fits_fwd[safe_idx, partner_slot]  # [N, k]
    partner_fit = jnp.where(mutual, partner_fit_mutual, fits_rev)
    surv_fwd = fits_fwd & partner_fit & valid_f
    surv_rev = fits_rev & fits_fwd & rev_valid.reshape(n, k)
    survives = jnp.concatenate(
        [surv_fwd.reshape(-1), surv_rev.reshape(-1)])

    n_dropped = jnp.sum(valid & ~survives).astype(jnp.int32)

    # Final placement: rank among surviving entries in the sorted order,
    # then one two-array scatter.  (Measured: a compaction-sort +
    # searchsorted + [N,m]-gather placement costs ~570 ms at 313k — XLA
    # gathers are ~145 ms per 15.7M elements even with coherent indices —
    # while the scatter pair is 273 ms.)
    _, surv_sorted = jax.lax.sort((spos, survives), num_keys=1)
    pos2, _ = _rank_sorted(r2, surv_sorted)
    flat_pos = jnp.where(surv_sorted, r2 * m + pos2, n * m)

    nbr_idx = jnp.full((n * m + 1,), -1, dtype=jnp.int32)
    nbr_w = jnp.zeros((n * m + 1,), dtype=w.dtype)
    nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(surv_sorted, c2, -1))
    nbr_w = nbr_w.at[flat_pos].set(jnp.where(surv_sorted, w2, 0.0))
    nbr_idx = nbr_idx[: n * m].reshape(n, m)
    nbr_w = nbr_w[: n * m].reshape(n, m)
    degrees = jnp.sum(nbr_w, axis=1)
    return nbr_idx, nbr_w, degrees, n_dropped


def _mutual_chunked(idx, safe_idx, valid_f, n_chunks: int):
    """Chunked mutual-edge detection: the [N, k, k] gather-compare of the
    fused version processed in row blocks, peak [R, k, k]."""
    n, k = idx.shape
    r = -(-n // n_chunks)
    n_pad = r * n_chunks
    pad = ((0, n_pad - n), (0, 0))
    idx_p = jnp.pad(safe_idx, pad)
    ids_p = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, n_pad - n),
                    constant_values=-1)

    def blk(args):
        sidx, ids = args
        eq = idx[sidx] == ids[:, None, None]          # [R, k, k]
        return jnp.any(eq, axis=2), jnp.argmax(eq, axis=2).astype(jnp.int32)

    mut, slot = jax.lax.map(blk, (idx_p.reshape(n_chunks, r, k),
                                  ids_p.reshape(n_chunks, r)))
    mutual = mut.reshape(n_pad, k)[:n] & valid_f
    partner_slot = slot.reshape(n_pad, k)[:n]
    return mutual, partner_slot


@functools.partial(jax.jit, static_argnames=("ell_width", "n_chunks",
                                             "cap_factor"))
def symmetrize_to_ell_chunked(idx: jnp.ndarray, w: jnp.ndarray,
                              ell_width: int, n_chunks: int = 16,
                              cap_factor: int = 3):
    """Memory-bounded symmetrize: bit-identical to symmetrize_to_ell but
    with peak temporaries ~n_chunks x smaller (VERDICT r2 item 4 — the
    fused single-sort version holds ~10 x 2Nk entry temps, which OOMs a
    16 GB chip at 1M x 768 / k=25 beside the resident corpus).

    Plan: ONE light global sort (key = destination row, payload = entry
    id) buckets the 2Nk ordered entries by row range; each of the
    n_chunks row ranges then holds ALL entries of its rows, so the
    per-row (row, -w, col) ranking — computed by a LOCAL 5-array sort of
    at most cap_factor*R*k entries — is identical to the fused global
    sort's.  Two chunk passes: fit flags (pos < width), then placement
    of the edges that fit in BOTH endpoint rows (the cross-chunk
    both-fit combine uses the same gathers as the fused version).

    Returns (nbr_idx, nbr_w, degrees, n_dropped, n_overflow):
    n_overflow > 0 means a hub-heavy chunk exceeded its entry capacity
    (cap_factor * R * k); results are then INVALID and the caller must
    retry with more chunks / higher cap_factor or fall back.
    """
    n, k = idx.shape
    m = ell_width
    r_rows = -(-n // n_chunks)
    cap = min(cap_factor * r_rows * k, 2 * n * k)
    node_ids = jnp.arange(n, dtype=jnp.int32)
    valid_f = idx >= 0
    safe_idx = jnp.where(valid_f, idx, 0)

    mutual, partner_slot = _mutual_chunked(idx, safe_idx, valid_f, n_chunks)

    rows_f = jnp.broadcast_to(node_ids[:, None], (n, k)).reshape(-1)
    cols_f = idx.reshape(-1)
    w_f = w.reshape(-1)
    rev_valid = (valid_f & ~mutual).reshape(-1)
    entry_row = jnp.concatenate([rows_f, cols_f])
    entry_col = jnp.concatenate([cols_f, rows_f])
    entry_w = jnp.concatenate([w_f, w_f])
    entry_valid = jnp.concatenate([valid_f.reshape(-1), rev_valid])

    # Bucketing sort: 2 int32 arrays only (vs the fused version's 5-array
    # payload sort) — the big-N memory win.
    dest = jnp.where(entry_valid, entry_row, n)
    eid_sorted = jax.lax.sort(
        (dest, jnp.arange(2 * n * k, dtype=jnp.int32)), num_keys=1)[1]
    dest_sorted = dest[eid_sorted]
    # Clamp the row-range boundaries at n: the last range would otherwise
    # end at n_chunks*r_rows > n whenever n % n_chunks != 0, sweeping every
    # sentinel entry (dest = n: -1 pads and dropped mutual reverse copies)
    # into the last chunk's count and spuriously flagging overflow.
    bounds = jnp.searchsorted(
        dest_sorted,
        jnp.minimum(jnp.arange(0, n_chunks + 1, dtype=jnp.int32) * r_rows,
                    n).astype(jnp.int32))
    counts = bounds[1:] - bounds[:-1]
    n_overflow = jnp.sum(jnp.maximum(counts - cap, 0))

    def chunk_entries(c):
        # dynamic_slice clamps start to len-cap near the array end; track
        # the shift so the validity window still covers THIS chunk's
        # entries only.
        start = jnp.minimum(bounds[c], 2 * n * k - cap)
        off = bounds[c] - start
        e = jax.lax.dynamic_slice(eid_sorted, (start,), (cap,))
        pos = jnp.arange(cap)
        ok = (pos >= off) & (pos < off + (bounds[c + 1] - bounds[c]))
        rr = jnp.where(ok & entry_valid[e], entry_row[e], n)
        return e, rr

    def fit_pass(c, fits):
        e, rr = chunk_entries(c)
        r2, _, _, e2 = jax.lax.sort(
            (rr, -entry_w[e], entry_col[e], e), num_keys=3)
        in_row = r2 < n
        pos = _rank_within_rows(r2, in_row, n)
        # The slice window overlaps neighboring chunks' entries (rr = n
        # for them); scatter THEIR writes to the sentinel slot so only
        # each entry's owning chunk sets its flag.
        tgt = jnp.where(in_row, e2, 2 * n * k)
        return fits.at[tgt].set(in_row & (pos < m))

    fits = jnp.zeros((2 * n * k + 1,), dtype=bool)
    fits = jax.lax.fori_loop(0, n_chunks, fit_pass, fits)

    fits_fwd = fits[: n * k].reshape(n, k)
    fits_rev = fits[n * k: 2 * n * k].reshape(n, k)
    partner_fit_mutual = fits_fwd[safe_idx, partner_slot]
    partner_fit = jnp.where(mutual, partner_fit_mutual, fits_rev)
    surv_fwd = fits_fwd & partner_fit & valid_f
    surv_rev = fits_rev & fits_fwd & rev_valid.reshape(n, k)
    survives = jnp.concatenate(
        [surv_fwd.reshape(-1), surv_rev.reshape(-1)])
    n_dropped = jnp.sum(entry_valid & ~survives).astype(jnp.int32)

    def place_pass(c, out):
        nbr_idx, nbr_w = out
        e, rr = chunk_entries(c)
        r2, _, c2, w2, e2 = jax.lax.sort(
            (rr, -entry_w[e], entry_col[e], entry_w[e], e), num_keys=3)
        surv = survives[e2] & (r2 < n)
        pos2 = _rank_within_rows(r2, surv, n)
        flat_pos = jnp.where(surv, r2 * m + pos2, n * m)
        nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(surv, c2, -1))
        nbr_w = nbr_w.at[flat_pos].set(jnp.where(surv, w2, 0.0))
        return nbr_idx, nbr_w

    nbr_idx = jnp.full((n * m + 1,), -1, dtype=jnp.int32)
    nbr_w = jnp.zeros((n * m + 1,), dtype=w.dtype)
    nbr_idx, nbr_w = jax.lax.fori_loop(0, n_chunks, place_pass,
                                       (nbr_idx, nbr_w))
    nbr_idx = nbr_idx[: n * m].reshape(n, m)
    nbr_w = nbr_w[: n * m].reshape(n, m)
    degrees = jnp.sum(nbr_w, axis=1)
    return nbr_idx, nbr_w, degrees, n_dropped, n_overflow


@jax.jit
def union_width_bound(idx: jnp.ndarray) -> jnp.ndarray:
    """Cheap upper bound on the union graph's max row degree.

    union_degree(i) = |knn_out(i)| + |knn_in(i) \\ knn_out(i)|
                    <= fwd_valid(i) + in_count(i)
    (mutual edges double-count, so this overestimates by at most the
    mutual in-degree).  One scatter-add histogram over the Nk directed
    entries — used by the build's auto-widen to PRE-SIZE the ELL width
    so reference-parity (keep every union edge) costs one symmetrize
    pass instead of a doubling re-run (graph/build.symmetrize_auto_widen).
    Padded/invalid rows (idx == -1) contribute nothing."""
    n, k = idx.shape
    valid = idx >= 0
    fwd = jnp.sum(valid, axis=1).astype(jnp.int32)
    safe = jnp.where(valid, idx, 0).reshape(-1)
    in_cnt = (jnp.zeros((n,), jnp.int32)
              .at[safe].add(valid.astype(jnp.int32).reshape(-1)))
    return jnp.max(fwd + in_cnt)
