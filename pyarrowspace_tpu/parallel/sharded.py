"""Multi-chip sharded build and search (shard_map over a 1-D data mesh).

Design (SURVEY.md §7 step 6; BASELINE.json north-star):

  * corpus rows shard across chips; each chip holds [N/d, F];
  * cross-shard exact k-NN: corpus blocks ring-pass between chips with
    `lax.ppermute` (ICI neighbor traffic only) while every chip keeps a
    running per-row top-k over the visiting block's column tiles — the
    SP/ring-attention analogue for similarity search (SURVEY.md §2.2);
  * the F x F feature Laplacian needs the full column Gram: each chip
    computes its partial X_l^T X_l and a `psum` over the data axis yields
    the exact global Gram (one [F,F] collective, F <= a few thousand);
  * per-item lambdas are computed shard-locally against the replicated
    feature Laplacian; the median tau* uses an `all_gather` of the per-item
    energies (N floats total);
  * query serving: scores computed shard-locally, per-shard top-k, then one
    `all_gather` of [topk] candidates per shard and a replicated final
    top-k merge — per-query ICI traffic is d * topk entries, not N.

Symmetrization runs replicated on the gathered [N, k] candidate lists: it is
O(N k log(N k)) sort work, negligible next to the O(N^2 F / d) k-NN, and it
keeps the exact-symmetry guarantee of ops/symmetrize.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.laplacian import GraphLaplacian
from ..core.params import GraphParams, TauMode
from ..core.space import ArrowSpace
from ..graph.build import BuildConfig, DEFAULT_BUILD_CONFIG, validate_items, \
    _pick_dtype
from ..graph.feature import laplacian_from_sq_dists
from ..ops.distance import unit_normalize, kernel_weights
from ..ops.pallas.knn import _lazy_merge_min
from ..ops.rayleigh import dispersion_batch, rayleigh_batch
from ..ops.symmetrize import symmetrize_to_ell, _rank_within_rows
from ..spectral.taumode import TAU_MIX, synthesize
from ..utils.debug import dbg_println, phase
from ..utils.logging import get_logger
from .mesh import DATA_AXIS, make_mesh

log = get_logger("sharded")

_INF = 2.0


def _ring_knn_local(xl: jnp.ndarray, k: int, eps, n_real: int, n_dev: int,
                    col_tile: int):
    """Per-shard body: exact top-k across all shards via ring passes."""
    n_loc, f = xl.shape
    my = jax.lax.axis_index(DATA_AXIS)
    row_ids = (my * n_loc
               + jnp.arange(n_loc, dtype=jnp.int32))[:, None]  # [L,1]

    best_d = jax.lax.pcast(jnp.full((n_loc, k), _INF, dtype=xl.dtype),
                           (DATA_AXIS,), to="varying")
    best_i = jax.lax.pcast(jnp.full((n_loc, k), -1, dtype=jnp.int32),
                           (DATA_AXIS,), to="varying")
    n_tiles = n_loc // col_tile

    def merge_block(carry, visiting, src):
        def tile_step(c, t):
            bd, bi = c
            cols = jax.lax.dynamic_slice(
                visiting, (t * jnp.int32(col_tile), jnp.int32(0)),
                (col_tile, f))
            sims = jax.lax.dot_general(
                xl, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=xl.dtype)
            d = 1.0 - jnp.maximum(sims, 0.0)
            col_ids = (src * n_loc + t * col_tile
                       + jnp.arange(col_tile, dtype=jnp.int32))[None, :]
            invalid = (col_ids == row_ids) | (col_ids >= n_real)
            d = jnp.where(invalid | (d > eps), _INF, d)
            ids_b = jnp.broadcast_to(col_ids, d.shape)

            # Lazy exact merge — the shared min variant (the tie-break
            # contract lives in ops/pallas/knn._lazy_merge_min).
            bd, bi = _lazy_merge_min(d, ids_b, bd, bi, k=k, inf_val=_INF)
            return (bd, bi), None

        (bd, bi), _ = jax.lax.scan(tile_step, carry,
                                   jnp.arange(n_tiles, dtype=jnp.int32))
        return bd, bi

    visiting = xl
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    for s in range(n_dev):
        src = (my + s) % n_dev
        best_d, best_i = merge_block((best_d, best_i), visiting, src)
        if s < n_dev - 1:
            visiting = jax.lax.ppermute(visiting, DATA_AXIS, perm)
    keep = best_d <= eps
    return jnp.where(keep, best_d, _INF), jnp.where(keep, best_i, -1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_real", "n_dev", "col_tile", "mesh"))
def _sharded_knn(xu_pad, *, k, eps, n_real, n_dev, col_tile, mesh):
    fn = shard_map(
        lambda xl: _ring_knn_local(xl, k, eps, n_real, n_dev, col_tile),
        mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS))
    return fn(xu_pad)


def _symmetrize_local(idx_l, w_l, *, L, k, m, cap, n_dev, n_real):
    """Per-shard body of the sharded symmetrize (see _sharded_symmetrize).

    Entry space (flat ids): [0, Lk) forward edges; [Lk, 2Lk) diagonal
    reverse copies (col owned by this shard); [2Lk, 2Lk + n_dev*cap)
    reverse copies received over all_to_all."""
    my = jax.lax.axis_index(DATA_AXIS)
    base = (my * L).astype(jnp.int32)
    row_l = jnp.arange(L, dtype=jnp.int32)
    row_g = base + row_l
    lk = L * k

    valid_f = (idx_l >= 0) & (row_g[:, None] < n_real)       # [L, k]
    col_f = jnp.where(valid_f, idx_l, -1).reshape(-1)        # global cols
    w_f = w_l.reshape(-1)
    orow_f = jnp.broadcast_to(row_g[:, None], (L, k)).reshape(-1)
    vf = valid_f.reshape(-1)

    # ---- phase 1: route reverse copies to their col-owner shard --------
    dest = jnp.where(vf, col_f // L, n_dev)                  # sentinel n_dev
    is_diag = vf & (dest == my)
    off = vf & (dest != my) & (dest < n_dev)
    # Bucket off-diag entries per destination, strongest-weight first, so
    # a capacity overflow would drop the weakest — but any overflow at all
    # routes the whole build to the exact replicated fallback.
    dkey = jnp.where(off, dest, n_dev).astype(jnp.int32)
    eid_f = jnp.arange(lk, dtype=jnp.int32)
    dkey_s, _, col_s, orow_s, w_s, eid_s = jax.lax.sort(
        (dkey, -w_f, col_f, orow_f, w_f, eid_f), num_keys=2)
    in_bucket = dkey_s < n_dev
    brank = _rank_within_rows(dkey_s, in_bucket, n_dev)
    keep = in_bucket & (brank < cap)
    overflow = jnp.sum(in_bucket & ~keep).astype(jnp.int32)
    slot = jnp.where(keep, dkey_s * cap + brank, n_dev * cap)

    def scatter_slots(vals, fill):
        buf = jnp.full((n_dev * cap + 1,), fill, dtype=vals.dtype)
        return buf.at[slot].set(jnp.where(keep, vals, fill))[:n_dev * cap]

    send_col = scatter_slots(col_s, jnp.int32(-1))
    send_orow = scatter_slots(orow_s, jnp.int32(-1))
    send_w = scatter_slots(w_s, jnp.zeros((), w_l.dtype))
    send_eid = scatter_slots(eid_s, jnp.int32(-1))   # stays local
    # Map each forward entry -> its send slot (or lk sentinel).
    sent_slot = jnp.full((lk + 1,), n_dev * cap, dtype=jnp.int32)
    sent_slot = sent_slot.at[jnp.where(keep, eid_s, lk)].set(slot)[:lk]

    a2a = functools.partial(jax.lax.all_to_all, axis_name=DATA_AXIS,
                            split_axis=0, concat_axis=0, tiled=True)
    recv_col = a2a(send_col)                                 # [n_dev*cap]
    recv_orow = a2a(send_orow)
    recv_w = a2a(send_w)
    vr = recv_col >= 0

    # ---- receiver-side mutual detection -------------------------------
    def mutual_of(dest_col, origin_row, valid):
        """(origin_row -> dest_col) is mutual iff origin_row is also in
        idx_l[dest_col_local]; returns (mutual, partner_slot)."""
        c_loc = jnp.clip(jnp.where(valid, dest_col - base, 0), 0, L - 1)
        eq = idx_l[c_loc] == origin_row[:, None]             # [E, k]
        return valid & jnp.any(eq, axis=1), jnp.argmax(eq, axis=1)

    mut_d, pslot_d = mutual_of(col_f, orow_f, is_diag)
    mut_r, pslot_r = mutual_of(recv_col, recv_orow, vr)

    cand_d = is_diag & ~mut_d       # diag reverse entries that are candidates
    cand_r = vr & ~mut_r

    # ---- phase 2: one fused local sort over all candidates ------------
    rows_all = jnp.concatenate([
        jnp.where(vf, orow_f - base, L),
        jnp.where(cand_d, col_f - base, L),
        jnp.where(cand_r, recv_col - base, L)]).astype(jnp.int32)
    cols_all = jnp.concatenate([col_f, orow_f, recv_orow])
    w_all = jnp.concatenate([w_f, w_f, recv_w])
    e_all = jnp.arange(rows_all.shape[0], dtype=jnp.int32)
    r2, _, c2, w2, e2 = jax.lax.sort(
        (rows_all, -w_all, cols_all, w_all, e_all), num_keys=3)
    in_row = r2 < L
    pos = _rank_within_rows(r2, in_row, L)
    fits_sorted = in_row & (pos < m)
    fits = jnp.zeros_like(rows_all, dtype=bool).at[e2].set(fits_sorted)
    fits_fwd = fits[:lk]
    fits_diag = fits[lk:2 * lk]
    fits_recv = fits[2 * lk:]

    # ---- phase 3: exchange fit flags ----------------------------------
    # Receiver -> origin: the partner flag for each routed forward edge
    # (mutual: the matching forward entry's fit; else the reverse
    # candidate's own fit).
    fits_fwd_2d = fits_fwd.reshape(L, k)
    c_loc_r = jnp.clip(jnp.where(vr, recv_col - base, 0), 0, L - 1)
    resp = jnp.where(mut_r, fits_fwd_2d[c_loc_r, pslot_r], fits_recv)
    resp_back = a2a(resp.astype(jnp.int8)) > 0  # [n_dev*cap], sender layout
    # Origin -> receiver: the forward edge's own fit (for the reverse
    # entry's survival on the receiving side).
    fwd_fit_send = jnp.concatenate(
        [fits_fwd, jnp.zeros((1,), bool)])[jnp.where(
            send_eid >= 0, send_eid, lk)]
    fwd_fit_recv = a2a(fwd_fit_send.astype(jnp.int8)) > 0

    # ---- phase 4: survival, counting, placement -----------------------
    partner_routed = jnp.concatenate(
        [resp_back, jnp.zeros((1,), bool)])[sent_slot]
    c_loc_d = jnp.clip(jnp.where(is_diag, col_f - base, 0), 0, L - 1)
    partner_diag = jnp.where(mut_d, fits_fwd_2d[c_loc_d, pslot_d],
                             fits_diag)
    partner = jnp.where(is_diag, partner_diag, partner_routed)
    surv_fwd = vf & fits_fwd & partner

    surv_diag = cand_d & fits_diag & fits_fwd  # origin is the same shard:
    # diag reverse entry i (= forward entry i's copy) survives iff both
    # its own row fit and the forward copy's fit hold.
    surv_recv = cand_r & fits_recv & fwd_fit_recv

    dropped = (jnp.sum(vf & ~surv_fwd) + jnp.sum(cand_d & ~surv_diag)
               + jnp.sum(cand_r & ~surv_recv)).astype(jnp.int32)
    dropped = jax.lax.psum(dropped, DATA_AXIS)
    overflow = jax.lax.psum(overflow, DATA_AXIS)

    surv_all = jnp.concatenate([surv_fwd, surv_diag, surv_recv])
    surv_sorted = surv_all[e2]
    pos2 = _rank_within_rows(r2, surv_sorted, L)
    flat_pos = jnp.where(surv_sorted, r2 * m + pos2, L * m)
    nbr_idx = jnp.full((L * m + 1,), -1, dtype=jnp.int32)
    nbr_w = jnp.zeros((L * m + 1,), dtype=w_l.dtype)
    nbr_idx = nbr_idx.at[flat_pos].set(jnp.where(surv_sorted, c2, -1))
    nbr_w = nbr_w.at[flat_pos].set(jnp.where(surv_sorted, w2, 0.0))
    nbr_idx = nbr_idx[:L * m].reshape(L, m)
    nbr_w = nbr_w[:L * m].reshape(L, m)
    degrees = jnp.sum(nbr_w, axis=1)
    return (nbr_idx, nbr_w, degrees,
            jnp.broadcast_to(dropped, (1,)),
            jnp.broadcast_to(overflow, (1,)))


@functools.partial(jax.jit, static_argnames=("ell_width", "n_real",
                                             "n_dev", "mesh"))
def _sharded_symmetrize_jit(idx_pad, w_pad, *, ell_width, n_real, n_dev,
                            mesh):
    n_pad, k = idx_pad.shape
    L = n_pad // n_dev
    cap = max(k, int(np.ceil(4.0 * L * k / max(n_dev, 1))))
    body = functools.partial(_symmetrize_local, L=L, k=k, m=ell_width,
                             cap=cap, n_dev=n_dev, n_real=n_real)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                   out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                              P(DATA_AXIS), P(DATA_AXIS)),
                   check_vma=False)
    return fn(idx_pad, w_pad)


def sharded_symmetrize(idx_pad, w_pad, ell_width: int, n_real: int,
                       n_dev: int, mesh):
    """Sharded symmetrize-to-ELL: bit-identical to ops.symmetrize_to_ell.

    The replicated path sorts all 2Nk ordered entries on EVERY chip
    (VERDICT weak #6); here each shard sorts only ~(2 + 4)·(Nk/d) entries:
    forward edges stay on their row-owner shard, reverse copies are routed
    to their col-owner with one all_to_all (the col-distribution of a k-NN
    graph is near-uniform over row blocks; the diagonal bucket — dominant
    when input rows arrive cluster-sorted — never leaves the shard), fit
    flags make one round trip, and per-row sort keys/tie-breaks are the
    single-chip ones, so every rank decision is identical.

    Exactness guarantee: off-diagonal buckets have capacity 4·Lk/d; if any
    bucket overflows (pathological col concentration), the function falls
    back to the replicated exact path instead of dropping entries."""
    nbr_idx, nbr_w, degrees, dropped, overflow = _sharded_symmetrize_jit(
        idx_pad, w_pad, ell_width=ell_width, n_real=n_real, n_dev=n_dev,
        mesh=mesh)
    if int(overflow[0]) > 0:
        dbg_println(f"sharded symmetrize: bucket overflow "
                    f"({int(overflow[0])} entries) -> replicated fallback")
        return symmetrize_to_ell(idx_pad[:n_real], w_pad[:n_real],
                                 ell_width)
    return (nbr_idx[:n_real], nbr_w[:n_real], degrees[:n_real],
            dropped[0])


@functools.partial(jax.jit, static_argnames=("mesh",))
def _sharded_col_sq_dists(x_pad, *, mesh):
    """Exact squared Euclidean distances between feature columns, computed
    as a psum of per-shard partial Grams (padding rows are zero => exact)."""

    def body(xl):
        gram = jax.lax.dot_general(
            xl, xl, (((0,), (0,)), ((), ())),
            preferred_element_type=xl.dtype)          # [F, F] partial
        gram = jax.lax.psum(gram, DATA_AXIS)
        sq = jnp.diag(gram)
        return jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)

    fn = shard_map(body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P())
    return fn(x_pad)


@functools.partial(jax.jit, static_argnames=("n_real", "mesh",
                                             "rayleigh_normalized",
                                             "synthesis", "tau_fixed"))
def _sharded_lambdas(stored_pad, lap_f, w_f, *, n_real, mesh,
                     rayleigh_normalized, tau_mix,
                     synthesis=TauMode.MEDIAN, tau_fixed=None):
    """Shard-local Rayleigh/dispersion; exact global tau* dispatched on the
    synthesis mode (same semantics as spectral.taumode.derive_tau_star)."""

    def body(xl, lap, wf):
        e_un = rayleigh_batch(xl, lap, normalized=False)
        e = (rayleigh_batch(xl, lap, normalized=True)
             if rayleigh_normalized else e_un)
        g = dispersion_batch(xl, wf, e_un)
        if synthesis == TauMode.FIXED:
            if tau_fixed is None:
                raise ValueError("TauMode.FIXED requires tau_fixed")
            tau_star = jnp.asarray(tau_fixed, dtype=e.dtype)
        else:
            e_all = jax.lax.all_gather(e, DATA_AXIS, tiled=True)  # [N_pad]
            mask = jnp.arange(e_all.shape[0]) < n_real  # padding excluded
            if synthesis == TauMode.MEDIAN:
                e_sorted = jnp.sort(jnp.where(mask, e_all, jnp.inf))
                lo = e_sorted[(n_real - 1) // 2]
                hi = e_sorted[n_real // 2]
                t = 0.5 * (lo + hi)
            elif synthesis == TauMode.MEAN:
                t = jnp.sum(jnp.where(mask, e_all, 0.0)) / n_real
            elif synthesis == TauMode.MAX:
                t = jnp.max(jnp.where(mask, e_all, -jnp.inf))
            else:  # pragma: no cover
                raise ValueError(f"unknown TauMode {synthesis}")
            tau_star = jnp.maximum(t, 1e-10)
        lam = synthesize(e, g, tau_star, tau_mix)
        return lam, e, e_un, tau_star

    # tau_star is computed identically on every shard from the all_gather'd
    # energies; the static checker can't infer that, hence check_vma=False.
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(), P()),
                   out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                              P()),
                   check_vma=False)
    return fn(stored_pad, lap_f, w_f)


@functools.partial(jax.jit, static_argnames=("topk", "mesh", "tau_mix",
                                             "n_real",
                                             "rayleigh_normalized"))
def _sharded_search_fused(xu_pad, lambdas_pad, q, lap_f, w_f, tau_star, tau,
                          *, topk, mesh, tau_mix, n_real,
                          rayleigh_normalized=False):
    """One compiled program for the whole sharded serving step: replicated
    query-lambda synthesis fused with the per-shard scan + all_gather merge
    (single dispatch — same rationale as ops/search.fused_query_pipeline)."""

    def body(xl, ll, qb, lap, wf, ts, tt):
        e_un = rayleigh_batch(qb, lap, normalized=False)
        e = (rayleigh_batch(qb, lap, normalized=True)
             if rayleigh_normalized else e_un)
        g = dispersion_batch(qb, wf, e_un)
        lq = synthesize(e, g, ts, tau_mix)
        return _search_body(xl, ll, qb, lq, tt, topk, n_real)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(),
                             P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(xu_pad, lambdas_pad, q, lap_f, w_f, tau_star,
              jnp.asarray(tau))


@functools.partial(jax.jit, static_argnames=("k", "mesh", "tau_mix",
                                             "n_real",
                                             "rayleigh_normalized"))
def _sharded_search_energy(x_pad, lambdas_pad, e_pad, q, lap_f, w_f,
                           tau_star, w_l, w_d, *, k, mesh, tau_mix,
                           n_real, rayleigh_normalized=False):
    """Sharded energy-only serving: shard-local residual-Dirichlet scoring
    (ops/search.energy_topk_batch semantics — the one energy formula on
    every path) + all_gather top-k merge.  The cross term is a local
    [Q,F]x[F,n_loc] MXU matmul per shard; qL is replicated.  e_pad must
    hold RAW x^T L x energies (the residual identity needs the quadratic
    form); rayleigh_normalized only switches the query-LAMBDA synthesis
    to the normalized convention the item lambdas were built with."""

    def body(xl, ll, el, qb, lap, wf, ts, wl, wd):
        e_q = rayleigh_batch(qb, lap, normalized=False)
        g_q = dispersion_batch(qb, wf, e_q)
        lam_q = synthesize(
            rayleigh_batch(qb, lap, normalized=True)
            if rayleigh_normalized else e_q,
            g_q, ts, tau_mix)
        tss = jnp.maximum(ts, 1e-10)
        n_loc = ll.shape[0]
        my = jax.lax.axis_index(DATA_AXIS)
        gid = my * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        qL = jnp.matmul(qb, lap, preferred_element_type=qb.dtype)
        cross = jnp.matmul(qL, xl.T, preferred_element_type=qb.dtype)
        d_res = jnp.maximum(e_q[:, None] + el[None, :] - 2.0 * cross, 0.0)
        db = d_res / (d_res + tss)
        prox_l = 1.0 / (1.0 + jnp.abs(ll[None, :] - lam_q[:, None]))
        score = wl * prox_l + wd / (1.0 + db)
        score = jnp.where(gid[None, :] < n_real, score, -jnp.inf)
        vals, idx = jax.lax.top_k(score, k)
        gidx = my * n_loc + idx.astype(jnp.int32)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS)
        d = all_vals.shape[0]
        mv = jnp.transpose(all_vals, (1, 0, 2)).reshape(qb.shape[0], d * k)
        mi = jnp.transpose(all_idx, (1, 0, 2)).reshape(qb.shape[0], d * k)
        fv, fpos = jax.lax.top_k(mv, k)
        fi = jnp.take_along_axis(mi, fpos, axis=1)
        return fi, fv

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                             P(), P(), P(), P(), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(x_pad, lambdas_pad, e_pad, q, lap_f, w_f, tau_star,
              jnp.asarray(w_l), jnp.asarray(w_d))


@functools.partial(jax.jit, static_argnames=("topk", "mesh", "tau_mix",
                                             "rayleigh_normalized",
                                             "n_real"))
def _sharded_search_subtile(xs_pad, xf_pad, lam_pad, q, lap_f, w_f,
                            tau_star, tau, *, topk, mesh, tau_mix,
                            rayleigh_normalized, n_real):
    """Sharded subtile-routed serving: per-shard block-max routed scan
    (ops/pallas/subtile_scan, exact at the scan dtype) + all_gather
    top-k merge — the >100k-QPS multi-chip path (per-chip measured
    56.3k at 1M x 768; the merge traffic is d*topk candidates)."""
    from ..ops.pallas.subtile_scan import subtile_search

    def body(xs, xf, ll, qb, lap, wf, ts, tt):
        e_un = rayleigh_batch(qb, lap, normalized=False)
        e = (rayleigh_batch(qb, lap, normalized=True)
             if rayleigh_normalized else e_un)
        g = dispersion_batch(qb, wf, e_un)
        lq = synthesize(e, g, ts, tau_mix).astype(jnp.float32)
        qn = unit_normalize(qb.astype(jnp.float32), axis=-1)
        n_loc = xs.shape[0]
        my = jax.lax.axis_index(DATA_AXIS)
        local_real = jnp.clip(n_real - my * n_loc, 0, n_loc)
        idx, vals = subtile_search(xs, xf, ll, qn, lq,
                                   tt.astype(jnp.float32), local_real,
                                   topk=topk, pool_m=2 * topk)
        gidx = (my * n_loc + idx).astype(jnp.int32)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS)
        d = all_vals.shape[0]
        mv = jnp.transpose(all_vals, (1, 0, 2)).reshape(
            qb.shape[0], d * topk)
        mi = jnp.transpose(all_idx, (1, 0, 2)).reshape(
            qb.shape[0], d * topk)
        fv, fpos = jax.lax.top_k(mv, topk)
        fi = jnp.take_along_axis(mi, fpos, axis=1)
        return fi, fv

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                             P(), P(), P(), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(xs_pad, xf_pad, lam_pad, q, lap_f, w_f, tau_star,
              jnp.asarray(tau))


@functools.partial(jax.jit, static_argnames=(
    "topk", "cap", "n_probe", "mesh", "tau_mix", "rayleigh_normalized",
    "interpret", "certify"))
def _sharded_search_ivf_block(cu_pad, slabs_pad, lam_s_pad, ids_pad, q,
                              lap_f, w_f, tau_star, tau, radii_pad,
                              lam_lo_pad, lam_hi_pad, nonempty_pad, margin,
                              *, topk, cap, n_probe, mesh, tau_mix,
                              rayleigh_normalized, interpret,
                              certify=False):
    """Sharded blocked IVF: clusters partition across the mesh (contiguous
    slab ranges per device), each shard routes queries against its LOCAL
    centroids and probes its local top-n_probe clusters, then an
    all_gather merges per-shard top-k.  The probe union covers every
    shard, so recall >= the single-chip mode at equal n_probe; per-chip
    scan work is the same n_probe slabs.  slab_ids are global item ids,
    so no offset arithmetic crosses the merge.

    certify=True additionally returns a per-query exactness certificate:
    each shard checks its own unprobed clusters' upper bounds against the
    MERGED kth score, and a psum ORs the violations — sound across the
    whole corpus because the cluster slabs partition it."""
    from ..ops.pallas.ivf_scan import (_route_scan_core, cert_violations,
                                       default_q_block, q_block_for)

    n_q = q.shape[0]
    qb = q_block_for(n_q, default_q_block(certify, n_probe))

    def body(cu, slabs, lam_s, ids_s, qb_, lap, wf, ts, tt, rad, llo, lhi,
             nem, mg):
        e_un = rayleigh_batch(qb_, lap, normalized=False)
        e = (rayleigh_batch(qb_, lap, normalized=True)
             if rayleigh_normalized else e_un)
        g = dispersion_batch(qb_, wf, e_un)
        lq = synthesize(e, g, ts, tau_mix).astype(jnp.float32)
        qn = unit_normalize(qb_.astype(jnp.float32), axis=-1)
        k_local = cu.shape[0]
        tt32 = tt.astype(jnp.float32)
        # Bound-ordered routing whenever the cert state exists (it always
        # does here — _ensure_ivf_block_state builds certify=True): the
        # blended-score bound routes the lambda term too, which cosine
        # demand votes cannot (single-chip rationale at
        # ops/pallas/ivf_scan._blocked_ivf_jit).
        bound_state = (rad, llo, lhi, nem)
        i_s, s_s, inv, sims_sorted, lamq_sorted, probe_tbl, bound = \
            _route_scan_core(cu, slabs, lam_s, ids_s, qn, lq, tt32,
                             k=topk, qb=qb, q=n_q, cap=cap,
                             n_probe=min(n_probe, k_local),
                             interpret=interpret,
                             bound_state=bound_state)
        idx = i_s[:n_q][inv[:n_q]]
        vals = s_s[:n_q][inv[:n_q]]
        all_vals = jax.lax.all_gather(vals, DATA_AXIS)
        all_idx = jax.lax.all_gather(idx, DATA_AXIS)
        d = all_vals.shape[0]
        mv = jnp.transpose(all_vals, (1, 0, 2)).reshape(n_q, d * topk)
        mi = jnp.transpose(all_idx, (1, 0, 2)).reshape(n_q, d * topk)
        fv, fpos = jax.lax.top_k(mv, topk)
        fi = jnp.take_along_axis(mi, fpos, axis=1)
        if not certify:
            return fi, fv
        # Violations vs the MERGED kth, evaluated per shard on its own
        # clusters; sorted-query order needs the merged kth reordered.
        order = jnp.argsort(inv[:n_q], stable=True)
        kth_sorted = fv[:, topk - 1][order]
        viol = cert_violations(bound, kth_sorted, probe_tbl, mg,
                               qb=qb, q=n_q)
        viol_any = jax.lax.psum(viol[inv[:n_q]].astype(jnp.int32),
                                DATA_AXIS) > 0
        return fi, fv, ~viol_any

    out_specs = (P(), P(), P()) if certify else (P(), P())
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                             P(DATA_AXIS), P(), P(), P(), P(), P(),
                             P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                             P(DATA_AXIS), P()),
                   out_specs=out_specs, check_vma=False)
    return fn(cu_pad, slabs_pad, lam_s_pad, ids_pad, q, lap_f, w_f,
              tau_star, jnp.asarray(tau), radii_pad, lam_lo_pad,
              lam_hi_pad, nonempty_pad, jnp.asarray(margin,
                                                    dtype=jnp.float32))


@functools.partial(jax.jit, static_argnames=("topk", "mesh", "tau_mix",
                                             "n_real",
                                             "rayleigh_normalized"))
def _sharded_search_hybrid(xu_pad, lambdas_pad, q, lap_f, w_f, tau_star,
                           tau, *, topk, mesh, tau_mix, n_real,
                           rayleigh_normalized=False):
    """Sharded hybrid serving (multiplicative gate,
    ops/search.hybrid_topk_batch semantics) + all_gather merge."""

    def body(xl, ll, qb, lap, wf, ts, tt):
        e_un = rayleigh_batch(qb, lap, normalized=False)
        e = (rayleigh_batch(qb, lap, normalized=True)
             if rayleigh_normalized else e_un)
        g = dispersion_batch(qb, wf, e_un)
        lq = synthesize(e, g, ts, tau_mix)
        return _search_body(xl, ll, qb, lq, tt, topk, n_real, gate=True)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(),
                             P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(xu_pad, lambdas_pad, q, lap_f, w_f, tau_star,
              jnp.asarray(tau))


def _search_body(xl, ll, qb, lq, tau, topk, n_real, gate=False):
    n_loc = xl.shape[0]
    my = jax.lax.axis_index(DATA_AXIS)
    qn = unit_normalize(qb, axis=-1)
    cos = jax.lax.dot_general(qn, xl, (((1,), (1,)), ((), ())),
                              preferred_element_type=xl.dtype)  # [Q, L]
    prox = 1.0 / (1.0 + jnp.abs(ll[None, :] - lq[:, None]))
    if gate:     # hybrid: cosine modulated by spectral proximity
        score = cos * (tau + (1.0 - tau) * prox)
    else:
        score = tau * cos + (1.0 - tau) * prox
    # Padding rows (zero vectors, lambda 0) score (1-tau)/(1+lq) > 0 and
    # would outrank weakly-matching real items at low tau — mask them so
    # served indices are always < n_real (single-chip has no padding).
    gcol = my * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
    score = jnp.where(gcol[None, :] < n_real, score,
                      jnp.asarray(-jnp.inf, dtype=score.dtype))
    vals, idx = jax.lax.top_k(score, topk)
    gidx = my * n_loc + idx.astype(jnp.int32)
    all_vals = jax.lax.all_gather(vals, DATA_AXIS)   # [d, Q, topk]
    all_idx = jax.lax.all_gather(gidx, DATA_AXIS)
    d = all_vals.shape[0]
    merged_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(
        qb.shape[0], d * topk)
    merged_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(
        qb.shape[0], d * topk)
    fv, fpos = jax.lax.top_k(merged_v, topk)
    fi = jnp.take_along_axis(merged_i, fpos, axis=1)
    return fi, fv


class ShardedArrowSpace:
    """Multi-chip ArrowSpace: row-sharded corpus + replicated spectral state.

    Provides the serving path (`search_batch`) and interoperates with the
    single-chip ArrowSpace for everything else via `.to_local()`.
    """

    def __init__(self, mesh: Mesh, xu_pad, stored_pad, lambdas_pad, e_pad,
                 lap_f, w_f, tau_star, params: GraphParams, n_real: int,
                 tau_mix: float = TAU_MIX, rayleigh_normalized: bool = False,
                 centroids=None, assignments=None, e_un_pad=None,
                 ivf_cap_plan=None, ivf_cap_factor=None):
        self.mesh = mesh
        self._xu_pad = xu_pad
        self._stored_pad = stored_pad
        self._lambdas_pad = lambdas_pad
        self._e_pad = e_pad
        # RAW x^T L x energies when e_pad holds normalized quotients
        # (rayleigh_normalized=True) — the energy kernels need raw
        # (ADVICE r4); None means e_pad IS raw.
        self._e_un_pad = e_un_pad
        self._lap_f = lap_f
        self._w_f = w_f
        self._tau_star = tau_star
        self._params = params
        self._n_real = n_real
        self._tau_mix = tau_mix
        self._rayleigh_normalized = rayleigh_normalized
        self._centroids = centroids
        self._assignments = assignments
        # Slab layout plan from the local space's size-capped clustering
        # (enable_ivf): min_cap keeps the spill-free guarantee, the factor
        # keeps the sharded slab HBM budget equal to the single-chip one.
        self._ivf_cap_plan = ivf_cap_plan
        self._ivf_cap_factor = ivf_cap_factor

    @classmethod
    def from_local(cls, aspace, gl, mesh: Optional[Mesh] = None
                   ) -> "ShardedArrowSpace":
        """Shard a single-chip ArrowSpace (e.g. one loaded with
        io.load_index) across a mesh for multi-chip serving — the
        build-once / serve-sharded deployment path."""
        if mesh is None:
            mesh = make_mesh()
        n_dev = mesh.devices.size
        x = aspace._data
        n = x.shape[0]
        block = n_dev * 128
        n_pad = ((n + block - 1) // block) * block
        row_shard = NamedSharding(mesh, P(DATA_AXIS))

        def shard(arr, pad_rows):
            arr = jnp.pad(arr, ((0, pad_rows),) + ((0, 0),) * (arr.ndim - 1))
            return jax.device_put(arr, row_shard)

        pad = n_pad - n
        return cls(mesh,
                   shard(aspace._data_unit, pad), shard(x, pad),
                   shard(aspace._lambdas, pad), shard(aspace._e_raw, pad),
                   jax.device_put(aspace._lap_f, NamedSharding(mesh, P())),
                   jax.device_put(aspace._w_f, NamedSharding(mesh, P())),
                   aspace._tau_star, aspace._params, n,
                   tau_mix=aspace._tau_mix,
                   rayleigh_normalized=aspace._rayleigh_normalized,
                   centroids=aspace._centroids,
                   assignments=aspace._assignments,
                   e_un_pad=(shard(aspace._energies_raw(), pad)
                             if aspace._rayleigh_normalized else None),
                   ivf_cap_plan=getattr(aspace, "_ivf_cap_plan", None),
                   ivf_cap_factor=getattr(aspace, "_ivf_cap_factor", None))

    def to_local(self):
        """Materialize back to a single-chip ArrowSpace (gathers shards)."""
        from ..core.space import ArrowSpace
        n = self._n_real
        out = ArrowSpace._from_build(
            data=jnp.asarray(np.asarray(self._stored_pad)[:n]),
            data_unit=jnp.asarray(np.asarray(self._xu_pad)[:n]),
            lambdas=jnp.asarray(np.asarray(self._lambdas_pad)[:n]),
            e_raw=jnp.asarray(np.asarray(self._e_pad)[:n]),
            e_un=(jnp.asarray(np.asarray(self._e_un_pad)[:n])
                  if self._e_un_pad is not None else None),
            lap_f=jnp.asarray(np.asarray(self._lap_f)),
            w_f=jnp.asarray(np.asarray(self._w_f)),
            tau_star=jnp.asarray(np.asarray(self._tau_star)),
            params=self._params,
            rayleigh_normalized=self._rayleigh_normalized,
            tau_mix=self._tau_mix, centroids=self._centroids,
            assignments=self._assignments)
        if self._ivf_cap_plan is not None:
            out._ivf_cap_plan = self._ivf_cap_plan
        if self._ivf_cap_factor is not None:
            out._ivf_cap_factor = self._ivf_cap_factor
        return out

    @property
    def nitems(self) -> int:
        return self._n_real

    @property
    def nfeatures(self) -> int:
        return int(self._stored_pad.shape[1])

    def lambdas(self) -> np.ndarray:
        return np.asarray(self._lambdas_pad)[: self._n_real].astype(
            np.float64)

    @property
    def tau_star(self) -> float:
        return float(self._tau_star)

    def prepare_queries(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries, dtype=self._stored_pad.dtype)
        e_un = rayleigh_batch(q, self._lap_f, normalized=False)
        e = (rayleigh_batch(q, self._lap_f, normalized=True)
             if self._rayleigh_normalized else e_un)
        g = dispersion_batch(q, self._w_f, e_un)
        return synthesize(e, g, self._tau_star, self._tau_mix)

    def _ensure_subtile_state(self):
        """Row-sharded subtile serving layout (per-shard length a
        multiple of build_subtile_state's 8192 granularity)."""
        if getattr(self, "_subtile_pad", None) is None:
            n_dev = self.mesh.devices.size
            block = n_dev * 8192
            n0 = self._xu_pad.shape[0]
            n_pad = ((n0 + block - 1) // block) * block
            row = NamedSharding(self.mesh, P(DATA_AXIS))
            xf = jnp.pad(self._xu_pad.astype(jnp.float32),
                         ((0, n_pad - n0), (0, 0)))
            lam = jnp.pad(self._lambdas_pad.astype(jnp.float32),
                          (0, n_pad - n0), constant_values=-2.0)
            self._subtile_pad = (
                jax.device_put(xf.astype(jnp.bfloat16), row),
                jax.device_put(xf, row),
                jax.device_put(lam, row))
        return self._subtile_pad

    def _ensure_ivf_block_state(self):
        """Cluster-partitioned blocked-IVF layout: centroids pad to a
        multiple of n_dev and shard by rows, so the [K*cap, F] slab array
        shards into contiguous per-device cluster ranges.  Requires the
        space to carry centroids/assignments (the build's reduction stage
        provides them; from_local forwards them)."""
        if getattr(self, "_ivf_block_pad", None) is None:
            if self._centroids is None or self._assignments is None:
                raise ValueError(
                    "ivf_block needs centroids/assignments; build with the "
                    "reduction stage or call enable_ivf() on the local "
                    "space before from_local")
            from ..ops.pallas.ivf_scan import build_blocked_ivf
            n_dev = self.mesh.devices.size
            cents = np.asarray(self._centroids)
            k = cents.shape[0]
            k_pad = ((k + n_dev - 1) // n_dev) * n_dev
            cents = np.pad(cents, ((0, k_pad - k), (0, 0)))
            ivf = build_blocked_ivf(
                self._xu_pad[: self._n_real].astype(jnp.float32),
                self._lambdas_pad[: self._n_real].astype(jnp.float32),
                cents, np.asarray(self._assignments),
                capacity_factor=getattr(self, "_ivf_cap_factor", None)
                or 2.0,
                min_cap=getattr(self, "_ivf_cap_plan", None))
            row = NamedSharding(self.mesh, P(DATA_AXIS))
            self._ivf_block_pad = (
                jax.device_put(ivf.centroids_unit, row),
                jax.device_put(ivf.slabs, row),
                jax.device_put(ivf.slab_lambdas, row),
                jax.device_put(ivf.slab_ids, row),
                ivf.cap,
                jax.device_put(ivf.radii, row),
                jax.device_put(ivf.lam_lo, row),
                jax.device_put(ivf.lam_hi, row),
                jax.device_put(ivf.nonempty, row))
        return self._ivf_block_pad

    def search_batch(self, queries, tau: float, topk: Optional[int] = None,
                     mode: str = "exact", n_probe: int = 16,
                     certify: bool = False, margin: float = 0.0,
                     n_widen: int = 2):
        """(indices [Q, topk], scores [Q, topk]) — the multi-chip serving
        path; per-query cross-chip traffic is d*topk candidates.

        mode "auto" picks the fastest exact-quality mode by PER-SHARD
        corpus size (the routing stages amortize per chip); "exact" scans
        the full local shard per chip; "subtile" runs the per-shard
        block-max routed scan (exact at its bf16 scan dtype, f32-rescored
        — the highest-QPS exact mode, see ArrowSpace.search_batch);
        "ivf_block" (approximate) partitions the cluster slabs across
        chips, probing each shard's n_probe best local clusters — recall
        >= the single-chip mode at equal n_probe; "certified" serves
        exact results at IVF cost on certified queries, re-probes
        refusals at doubled n_probe (up to n_widen rounds) and escalates
        only the rest to the exact scan (see ArrowSpace.search_batch)."""
        if mode not in ("auto", "exact", "subtile", "ivf_block",
                        "certified"):
            raise ValueError(f"unknown search mode {mode!r}; expected "
                             "'auto', 'exact', 'subtile', 'ivf_block', "
                             "or 'certified'")
        if mode == "certified":
            queries_np = np.asarray(queries)
            topk_eff = min(self._params.topk if topk is None
                           else int(topk), self._n_real)
            idx, vals, cert = self.search_batch(
                queries_np, tau, topk=topk_eff, mode="ivf_block",
                n_probe=n_probe, certify=True, margin=margin)
            out_i, out_v, _rate = self._certified_finalize(
                queries_np, (idx, vals, cert), tau, topk_eff, n_probe,
                n_widen, margin)
            return out_i, out_v
        if mode == "auto":
            per_shard = self._n_real // max(1, self.mesh.devices.size)
            mode = "subtile" if per_shard >= 131_072 else "exact"
        q = jnp.asarray(queries, dtype=self._stored_pad.dtype)
        topk = self._params.topk if topk is None else int(topk)
        topk = min(topk, self._n_real)
        if certify and mode != "ivf_block":
            raise ValueError("certify=True requires mode='ivf_block'")
        if mode == "ivf_block":
            (cu, slabs, lam_s, ids, cap, radii, lam_lo, lam_hi,
             nonempty) = self._ensure_ivf_block_state()
            interpret = jax.default_backend() not in ("tpu", "axon")
            out = _sharded_search_ivf_block(
                cu, slabs, lam_s, ids, q, self._lap_f, self._w_f,
                self._tau_star, jnp.asarray(tau, dtype=q.dtype),
                radii, lam_lo, lam_hi, nonempty, margin,
                topk=topk, cap=cap, n_probe=n_probe, mesh=self.mesh,
                tau_mix=self._tau_mix,
                rayleigh_normalized=self._rayleigh_normalized,
                interpret=interpret, certify=certify)
            if certify:
                return (np.asarray(out[0]), np.asarray(out[1]),
                        np.asarray(out[2]))
            return np.asarray(out[0]), np.asarray(out[1])
        if mode == "subtile":
            xs, xf, lam = self._ensure_subtile_state()
            idx, vals = _sharded_search_subtile(
                xs, xf, lam, q, self._lap_f, self._w_f, self._tau_star,
                jnp.asarray(tau, dtype=q.dtype), topk=topk,
                mesh=self.mesh, tau_mix=self._tau_mix,
                rayleigh_normalized=self._rayleigh_normalized,
                n_real=self._n_real)
            return np.asarray(idx), np.asarray(vals)
        idx, vals = _sharded_search_fused(
            self._xu_pad, self._lambdas_pad, q, self._lap_f, self._w_f,
            self._tau_star, jnp.asarray(tau, dtype=q.dtype), topk=topk,
            mesh=self.mesh, tau_mix=self._tau_mix, n_real=self._n_real,
            rayleigh_normalized=self._rayleigh_normalized)
        return np.asarray(idx), np.asarray(vals)

    def _probe_ceiling(self, n_probe: int, n_widen: int = 0) -> int:
        """Max useful n_probe — per-shard ceilings: n_probe counts LOCAL
        clusters per shard in the sharded IVF."""
        d = max(1, self.mesh.devices.size)
        cap = self._ensure_ivf_block_state()[4]
        local_k = int(self._ivf_block_pad[2].shape[0] // cap) // d
        cap_global = min(local_k,
                         max(1, (self._n_real // d) // max(1, 2 * cap)))
        return (min(cap_global, n_probe << n_widen) if n_widen
                else cap_global)

    def _certified_finalize(self, queries_np, out, tau, topk_eff: int,
                            n_probe: int, n_widen: int,
                            margin: float = 0.0):
        """Widen + escalate a sharded certified ivf_block result to exact
        results — same ladder semantics as ArrowSpace._certified_finalize
        (bound-ordered widening unless the batch has COLLAPSED below
        _WIDEN_MIN_CERT_RATE, then straight exact escalation — widening
        a collapsed batch re-probes everything every round, the measured
        ~15x cliff).  Returns (idx, vals, base_cert_rate)."""
        from ..core.space import _WIDEN_MIN_CERT_RATE
        from ..ops.pallas.ivf_scan import (escalate_uncertified,
                                           widen_refusals)
        idx = np.asarray(out[0])
        vals = np.asarray(out[1])
        cert = np.asarray(out[2]).astype(bool)
        rate0 = float(cert.mean()) if cert.size else 1.0
        if rate0 >= _WIDEN_MIN_CERT_RATE:
            n_probe_max = self._probe_ceiling(n_probe, n_widen)
            idx, vals, cert = widen_refusals(
                idx, vals, cert,
                lambda sel, np2: self.search_batch(
                    queries_np[sel], tau, topk=topk_eff,
                    mode="ivf_block", n_probe=np2, certify=True,
                    margin=margin),
                topk_eff, n_probe, n_probe_max)
        idx, vals = escalate_uncertified(
            idx, vals, cert,
            lambda sel: self.search_batch(queries_np[sel], tau,
                                          topk=topk_eff, mode="exact"),
            topk_eff)
        return idx, vals, rate0

    def serving_stream(self, tau: float, topk: Optional[int] = None,
                       n_probe: int = 8, n_widen: int = 2,
                       depth: int = 4, cert_floor: float = 0.35,
                       floor_patience: int = 2,
                       fallback_mode: str = "auto",
                       margin: float = 0.0,
                       probe_escalations: int = 2):
        """Pipelined multi-chip certified serving — the sharded
        counterpart of ArrowSpace.serving_stream, with the same
        collapse-guardrail ladder (double n_probe up to
        `probe_escalations` rungs, then degrade to `fallback_mode`).
        Per-batch results match search_batch(mode="certified") exactly
        (shared finalize); each in-flight batch finalizes with the
        probe depth it was dispatched with.  The certificate sync is
        three host pulls here (idx, vals, cert — started async at
        dispatch, so at depth >= 2 they overlap device execution)."""
        from ..serving import CertifiedStream

        topk_eff = min(self._params.topk if topk is None else int(topk),
                       self._n_real)
        self._ensure_ivf_block_state()
        state = {"n_probe": int(n_probe),
                 "rungs": max(0, int(probe_escalations))}

        def dispatch(queries):
            np_cur = state["n_probe"]
            q = jnp.asarray(queries, dtype=self._stored_pad.dtype)
            (cu, slabs, lam_s, ids, cap, radii, lam_lo, lam_hi,
             nonempty) = self._ensure_ivf_block_state()
            interpret = jax.default_backend() not in ("tpu", "axon")
            out = _sharded_search_ivf_block(
                cu, slabs, lam_s, ids, q, self._lap_f, self._w_f,
                self._tau_star, jnp.asarray(tau, dtype=q.dtype),
                radii, lam_lo, lam_hi, nonempty, margin,
                topk=topk_eff, cap=cap, n_probe=np_cur, mesh=self.mesh,
                tau_mix=self._tau_mix,
                rayleigh_normalized=self._rayleigh_normalized,
                interpret=interpret, certify=True)
            for arr in out:
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            return (np.asarray(queries), out, np_cur)

        def finalize(_queries, boxed):
            queries_np, out, np_used = boxed
            return self._certified_finalize(
                queries_np, out, tau, topk_eff, np_used, n_widen, margin)

        def on_collapse() -> bool:
            np_cur = state["n_probe"]
            np_max = self._probe_ceiling(np_cur)
            if state["rungs"] <= 0 or np_cur >= np_max:
                return False
            state["rungs"] -= 1
            state["n_probe"] = min(2 * np_cur, np_max)
            log.warning(
                "sharded certification collapsed at n_probe=%d: "
                "escalating the probe list to n_probe=%d (%d rung(s) "
                "left) before any fallback degradation", np_cur,
                state["n_probe"], state["rungs"])
            return True

        fb = fb_fin = None
        if fallback_mode is not None:
            if fallback_mode not in ("auto", "exact"):
                raise ValueError("fallback_mode must be 'auto', 'exact', "
                                 f"or None, got {fallback_mode!r}")

            def fb(queries):
                return self.search_batch(queries, tau, topk=topk_eff,
                                         mode=fallback_mode
                                         if fallback_mode == "exact"
                                         else "auto")

            def fb_fin(_queries, out):
                return out

        return CertifiedStream(dispatch, finalize, fallback=fb,
                               finalize_fallback=fb_fin, depth=depth,
                               cert_floor=cert_floor,
                               floor_patience=floor_patience,
                               on_collapse=on_collapse)

    def search_hybrid_batch(self, queries, tau: float,
                            topk: Optional[int] = None):
        """Sharded hybrid (multiplicative-gate) serving — identical
        results to ArrowSpace.search_hybrid_batch."""
        q = jnp.asarray(queries, dtype=self._stored_pad.dtype)
        topk = self._params.topk if topk is None else int(topk)
        topk = min(topk, self._n_real)
        idx, vals = _sharded_search_hybrid(
            self._xu_pad, self._lambdas_pad, q, self._lap_f, self._w_f,
            self._tau_star, jnp.asarray(tau, dtype=q.dtype), topk=topk,
            mesh=self.mesh, tau_mix=self._tau_mix, n_real=self._n_real,
            rayleigh_normalized=self._rayleigh_normalized)
        return np.asarray(idx), np.asarray(vals)

    def search_energy_batch(self, queries, k: int,
                            w_lambda: Optional[float] = None,
                            w_dirichlet: Optional[float] = None):
        """Sharded energy-only serving (bounded-energy exact scan) —
        identical results to ArrowSpace.search_energy_batch on a
        standard-built space."""
        q = jnp.asarray(queries, dtype=self._stored_pad.dtype)
        w_l = 1.0 if w_lambda is None else float(w_lambda)
        w_d = 0.5 if w_dirichlet is None else float(w_dirichlet)
        k_eff = min(int(k), self._n_real)
        idx, vals = _sharded_search_energy(
            self._stored_pad, self._lambdas_pad,
            self._e_un_pad if self._e_un_pad is not None else self._e_pad,
            q, self._lap_f, self._w_f, self._tau_star, w_l, w_d, k=k_eff,
            mesh=self.mesh, tau_mix=self._tau_mix, n_real=self._n_real,
            rayleigh_normalized=self._rayleigh_normalized)
        return np.asarray(idx), np.asarray(vals)


def ingest_sharded(arr, mesh: Mesh, dtype, col_tile: int) -> jnp.ndarray:
    """Per-shard streaming ingest: the host corpus reaches the mesh as one
    row-chunk per device (host slice -> device_put to THAT device ->
    assembled with make_array_from_single_device_arrays), so no device
    ever materializes the full corpus — the point of sharding corpora
    larger than one chip's HBM (VERDICT r2 item 5).  Device-resident
    inputs are redistributed with a sharded device_put instead.

    Returns x_pad [n_pad, F] row-sharded over the mesh's data axis, zero
    row padding to a (n_dev * col_tile)-aligned length."""
    n, f = arr.shape
    n_dev = mesh.devices.size
    block = n_dev * col_tile
    n_pad = ((n + block - 1) // block) * block
    row_shard = NamedSharding(mesh, P(DATA_AXIS))
    if isinstance(arr, jax.Array):
        x_pad = jnp.pad(arr.astype(dtype), ((0, n_pad - n), (0, 0)))
        return jax.device_put(x_pad, row_shard)
    rows_per = n_pad // n_dev
    arr_np = np.asarray(arr)
    shards = []
    for d, dev in enumerate(mesh.devices.reshape(-1)):
        lo = d * rows_per
        chunk = arr_np[lo: min(lo + rows_per, n)].astype(dtype, copy=False)
        if chunk.shape[0] < rows_per:
            chunk = np.pad(chunk,
                           ((0, rows_per - chunk.shape[0]), (0, 0)))
        shards.append(jax.device_put(chunk, dev))
    return jax.make_array_from_single_device_arrays(
        (n_pad, f), row_shard, shards)


def build_sharded(items, gp: GraphParams, mesh: Optional[Mesh] = None,
                  config: BuildConfig = DEFAULT_BUILD_CONFIG
                  ) -> tuple[ShardedArrowSpace, GraphLaplacian]:
    """Multi-chip standard build; numerically identical to the single-chip
    pipeline (exact k-NN, exact Gram, exact tau* for every synthesis mode,
    and the same reduction policy — centroid signals feed the feature
    Laplacian when dims_reduction && n >= reduction_min_n), EXCEPT the
    reduction stage itself: its GSPMD-distributed sums can differ from
    the single-chip order in the last ulps (pinned at 1e-8 by
    tests/test_sharded.py)."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    arr = validate_items(items)
    dtype = _pick_dtype(arr)
    n, f = arr.shape
    sigma = gp.sigma_resolved

    # Pad rows so each shard gets an equal, tile-aligned block; the host
    # corpus streams to the mesh shard-by-shard (ingest_sharded).
    col_tile = 128 if n < 8192 else config.col_tile
    with phase("sharded_ingest"):
        x_pad = ingest_sharded(arr, mesh, dtype, col_tile)
    n_pad = x_pad.shape[0]
    xu_pad = unit_normalize(x_pad)
    stored_pad = xu_pad if gp.normalise else x_pad

    k_eff = max(1, min(gp.k, n - 1))
    with phase("sharded_knn"):
        d_pad, i_pad = _sharded_knn(xu_pad, k=k_eff,
                                    eps=jnp.asarray(gp.eps, dtype=dtype),
                                    n_real=n, n_dev=n_dev,
                                    col_tile=col_tile, mesh=mesh)

    with phase("sharded_symmetrize"):
        w_pad = kernel_weights(d_pad, sigma, gp.p)
        w_pad = jnp.where(i_pad >= 0, w_pad, 0.0)
        # Same hub-cap escalation as the single-chip build — the sharded
        # graph must stay identical on hub-heavy corpora (the sharded
        # parity invariant).
        from ..graph.build import symmetrize_auto_widen
        from ..ops.symmetrize import union_width_bound
        nbr_idx, nbr_w, degrees, n_dropped = symmetrize_auto_widen(
            lambda width: sharded_symmetrize(i_pad, w_pad, width, n,
                                             n_dev, mesh),
            config, gp, n=n,
            weight_itemsize=jnp.dtype(w_pad.dtype).itemsize,
            width_bound_fn=lambda: union_width_bound(i_pad))
    gl = GraphLaplacian._from_ell(nbr_idx, nbr_w, degrees, gp,
                                  n_dropped=int(n_dropped))

    # Reduction stage — same policy as the single-chip build (graph/build.py):
    # when dims_reduction is on and the corpus is big enough, the feature
    # Laplacian is built from centroid signals, not the full corpus columns.
    # reduce_corpus consumes the SHARDED rows (sample gather, Lloyd matmuls
    # and segment sums all run distributed under GSPMD) — the stage never
    # materializes the corpus on one device.  Same seeds/sample as the
    # single-chip stage; the distributed summation order can differ in the
    # last float ulps, which the parity tests' 1e-8 tolerance absorbs.
    centroids = None
    assignments = None
    if gp.dims_reduction and n >= config.reduction_min_n:
        with phase("sharded_reduction"):
            from ..reduction import reduce_corpus
            from ..reduction.pipeline import SAMPLING_KEEP_RATE
            keep = (config.sampling_rate if config.sampling_rate is not None
                    else SAMPLING_KEEP_RATE)
            red = reduce_corpus(stored_pad[:n], seed=gp.seed,
                                keep_rate=keep, eps_hint=gp.eps)
            centroids, assignments = red.centroids, red.assignments

    with phase("sharded_feature_laplacian"):
        k_f = config.feature_k if config.feature_k is not None else gp.topk
        if centroids is not None:
            from ..graph.feature import build_feature_laplacian
            # Same eps-kernel weighting as the single-chip reduction path
            # (graph/build.py) — sharded must stay numerically identical.
            w_f, lap_f, _ = build_feature_laplacian(
                centroids, k_f=k_f,
                sigma_scale=float(np.clip(gp.eps / 10.0, 0.25, 4.0)))
        else:
            d2_cols = _sharded_col_sq_dists(stored_pad, mesh=mesh)
            w_f, lap_f, _ = laplacian_from_sq_dists(d2_cols, k_f=k_f)

    tau_mix = TAU_MIX if config.tau_mix is None else config.tau_mix
    with phase("sharded_lambdas"):
        lambdas_pad, e_pad, e_un_pad, tau_star = _sharded_lambdas(
            stored_pad, lap_f, w_f, n_real=n, mesh=mesh,
            rayleigh_normalized=config.rayleigh_normalized,
            tau_mix=tau_mix, synthesis=gp.synthesis,
            tau_fixed=gp.tau_fixed)

    dbg_println(f"sharded build: n={n} over {n_dev} devices, "
                f"tau_star={float(tau_star):.6g}")
    sspace = ShardedArrowSpace(mesh, xu_pad, stored_pad, lambdas_pad, e_pad,
                               lap_f, w_f, tau_star, gp, n, tau_mix,
                               rayleigh_normalized=config.rayleigh_normalized,
                               centroids=centroids, assignments=assignments,
                               e_un_pad=(e_un_pad
                                         if config.rayleigh_normalized
                                         else None))
    return sspace, gl
