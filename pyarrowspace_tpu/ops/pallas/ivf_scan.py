"""Cluster-contiguous blocked IVF — large-corpus accelerated serving.

The gather-based IVF (ops/ivf.py) materializes [Q, n_probe*cap, F]
candidates, which stops scaling around ~10^5 items.  This kernel keeps the
corpus in a cluster-contiguous layout ([K, cap, F] slabs, padded) so a probe
is a contiguous DMA, and routes per QUERY BLOCK:

  1. route: query->centroid scores; queries are sorted by their top
     centroid so blocks are coherent;
  2. each block's probe list = the n_probe best clusters by the block's
     summed routing scores (a [n_blocks, n_probe] scalar-prefetch table);
  3. pallas grid (block, probe): the BlockSpec index_map reads the probe
     table (PrefetchScalarGridSpec) and DMAs exactly that cluster's slab;
     the lazy exact top-k merge (ops/pallas/scan_topk.py) accumulates in
     VMEM across probes.

Per-query compute drops from O(N·F) to O(K·F + n_probe·cap·F).  Approximate
like any IVF (block-level routing trades a little recall for slab
coherence); padding rows carry lambda = +inf and id = -1 so they can never
score above a real item.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_topk import _lazy_merge

_NEG_INF = -3.0e38


class BlockedIVF(NamedTuple):
    centroids_unit: jnp.ndarray  # [K, F]
    slabs: jnp.ndarray           # [K * cap, F] cluster-contiguous, padded
    slab_lambdas: jnp.ndarray    # [K * cap] (+inf on padding)
    slab_ids: jnp.ndarray        # [K * cap] original item ids (-1 padding)
    cap: int
    # Certification state (None when built with certify=False): per-slab
    # Euclidean covering radius around the unit centroid, lambda interval,
    # and non-emptiness — enough to upper-bound any member's blended score.
    radii: jnp.ndarray | None = None       # [K]
    lam_lo: jnp.ndarray | None = None      # [K]
    lam_hi: jnp.ndarray | None = None      # [K]
    nonempty: jnp.ndarray | None = None    # [K] bool
    # Reduced-precision certification state: per-slab max cast-residual
    # norm max_x ||x - cast(x)|| (None for f32 slabs / certify=False).
    # The data-dependent dot-error bound it feeds is ~2-3x tighter than
    # the worst-case u*||x|| — certification rates live in that factor.
    res_eps: jnp.ndarray | None = None     # [K]


def build_blocked_ivf(xu, lambdas, centroids, assignments,
                      capacity_factor: float = 2.0,
                      slab_dtype=None, certify: bool = True,
                      min_cap: int | None = None) -> BlockedIVF:
    """Reorder the corpus cluster-contiguously with per-cluster padding.

    Items beyond a cluster's capacity are appended into other clusters'
    free slots, so the slab layout is a PARTITION of the corpus — every
    item present exactly once, none unreachable (spilled items are simply
    routed with their adopted cluster).  Spill inflates the adopting
    slab's covering radius (in a high-dim mixture there is no NEAR
    cluster to adopt into), degrading certification rates — size-cap the
    clustering first (reduction.pipeline.lloyd_tighten max_size =
    planned_slab_cap) and pass that cap as min_cap so a spill-free
    layout stays spill-free if K grew."""
    n = xu.shape[0]
    k = centroids.shape[0]
    assign = np.asarray(assignments)
    cap = max(8, int(np.ceil(capacity_factor * n / k)))
    if min_cap is not None:
        cap = max(cap, int(min_cap))
    cap = ((cap + 127) // 128) * 128  # Mosaic block tiling: lane dim % 128
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(k))
    rank = np.arange(n) - starts[sorted_assign]
    in_slab = rank < cap
    slot = np.full(k * cap, -1, dtype=np.int64)
    slot_idx = sorted_assign[in_slab] * cap + rank[in_slab]
    slot[slot_idx] = order[in_slab]
    # Overflow items spill to their NEAREST cluster with free capacity
    # (keeps every item reachable; a near miss keeps that slab's covering
    # radius tight — arbitrary spill blows up the adopting cluster's
    # radius and with it the certification rate).  Candidate clusters per
    # overflow item come from one device matmul; placement is a host
    # greedy over the free-capacity table, with an any-free-slot fallback.
    overflow = order[~in_slab]
    if overflow.size:
        free_per = cap - np.minimum(
            np.bincount(assign, minlength=k), cap)    # slots left / cluster
        cu_np = np.array(centroids, dtype=np.float32)  # writable copy
        cu_np /= np.maximum(
            np.linalg.norm(cu_np, axis=1, keepdims=True), 1e-30)
        m_cand = min(8, k)
        sims_o = jnp.matmul(
            jnp.asarray(xu, dtype=jnp.float32)[jnp.asarray(overflow)],
            jnp.asarray(cu_np).T, preferred_element_type=jnp.float32)
        _, cand = jax.lax.top_k(sims_o, m_cand)
        cand = np.asarray(cand)                       # [n_over, m_cand]
        placed = np.zeros(overflow.size, dtype=bool)
        for m in range(m_cand):   # candidate rank, best first (vector pass)
            rem = np.flatnonzero(~placed)
            if rem.size == 0:
                break
            c_m = cand[rem, m]
            order_m = np.argsort(c_m, kind="stable")
            c_sorted = c_m[order_m]
            starts_m = np.searchsorted(c_sorted, np.arange(k))
            pos_in_c = np.arange(rem.size) - starts_m[c_sorted]
            take = pos_in_c < free_per[c_sorted]
            sel_items = rem[order_m[take]]
            sel_c = c_sorted[take]
            slot[sel_c * cap + (cap - free_per[sel_c])
                 + pos_in_c[take]] = overflow[sel_items]
            free_per -= np.bincount(sel_c, minlength=k)
            placed[sel_items] = True
        rest = overflow[~placed]
        if rest.size:
            free = np.flatnonzero(slot < 0)
            if free.size < rest.size:  # cap guarantees total slots >= n
                raise AssertionError("slab capacity accounting violated")
            slot[free[: rest.size]] = rest

    # Only the [K*cap] slot table crosses the host-device link; the corpus
    # reorder itself is a device-side gather (round-tripping a multi-GB
    # corpus through a tunneled host link costs minutes).
    valid = slot >= 0
    safe_dev = jnp.asarray(np.where(valid, slot, 0).astype(np.int32))
    valid_dev = jnp.asarray(valid)
    # Padded slots carry a duplicate of row 0 — NOT zeroed: the scan
    # kernel masks them by id < 0 (score -> -inf) and their lambda=+inf
    # zeroes the proximity term, and the extra jnp.where would double the
    # 6.4 GB gather output at 1M x 768 (HBM peak, not correctness).
    slabs = jnp.asarray(xu, dtype=jnp.float32)[safe_dev]
    lam = jnp.where(valid_dev,
                    jnp.asarray(lambdas, dtype=jnp.float32)[safe_dev],
                    jnp.inf)
    cu = jnp.asarray(centroids, dtype=jnp.float32)
    cu = cu / jnp.maximum(jnp.linalg.norm(cu, axis=1, keepdims=True), 1e-30)
    radii = lam_lo = lam_hi = nonempty = res_eps = None
    if certify:
        radii, lam_lo, lam_hi, nonempty = _cert_state(
            slabs, lam, valid_dev, cu, k, cap)
    if slab_dtype is not None and jnp.dtype(slab_dtype) != jnp.float32:
        # bf16 slabs halve the probe DMA bytes (the scan is bandwidth-
        # bound); approximate for mode="ivf_block", still EXACT for
        # certified serving via the rescored precision-robust
        # certificate — which needs the per-slab cast-residual norms.
        cast = slabs.astype(slab_dtype)
        if certify:
            res_eps = _res_state(slabs, cast, valid_dev, k, cap)
        slabs = cast
    ids = jnp.asarray(np.where(valid, slot, -1).astype(np.int32))
    return BlockedIVF(cu, slabs, lam, ids, cap, radii=radii,
                      lam_lo=lam_lo, lam_hi=lam_hi, nonempty=nonempty,
                      res_eps=res_eps)


@functools.partial(jax.jit, static_argnames=("k", "cap"))
def _cert_state(slabs, lam, valid, cu, k: int, cap: int):
    """Per-slab covering radius (to the UNIT centroid — the same anchor the
    routing similarity uses), lambda interval, and non-emptiness, computed
    over the slab layout (so spilled items are covered by their ADOPTED
    slab's bound — the slabs partition the corpus).  Chunked over clusters
    to bound the [chunk, cap, F] temporaries."""
    f = slabs.shape[1]
    chunk = max(1, min(k, (2 ** 25) // max(1, cap * f)))
    while k % chunk:
        chunk -= 1
    s3 = slabs.reshape(k // chunk, chunk, cap, f)
    v3 = valid.reshape(k // chunk, chunk, cap)
    c3 = cu.reshape(k // chunk, chunk, f)

    def blk(args):
        sb, vb, cb = args
        d2 = jnp.sum(jnp.square(sb.astype(jnp.float32)
                                - cb[:, None, :]), axis=-1)   # [chunk, cap]
        return jnp.sqrt(jnp.max(jnp.where(vb, d2, 0.0), axis=-1))

    radii = jax.lax.map(blk, (s3, v3, c3)).reshape(k)
    lam2 = lam.reshape(k, cap)
    v2 = valid.reshape(k, cap)
    lam_lo = jnp.min(lam2, axis=1)                      # pads are +inf
    lam_hi = jnp.max(jnp.where(v2, lam2, -jnp.inf), axis=1)
    return radii, lam_lo, lam_hi, jnp.any(v2, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "cap"))
def _res_state(slabs32, cast, valid, k: int, cap: int):
    """Per-slab max cast-residual norm max_x ||x - cast(x)|| over real
    rows — the data side of the reduced-precision dot-error bound
    (_blocked_ivf_cert_rescored_jit).  Chunked over clusters to bound the
    [chunk, cap, F] f32 temporaries (the residual of a 1M x 768 corpus is
    another 3 GB if materialized whole)."""
    f = slabs32.shape[1]
    chunk = max(1, min(k, (2 ** 25) // max(1, cap * f)))
    while k % chunk:
        chunk -= 1
    s3 = slabs32.reshape(k // chunk, chunk, cap, f)
    c3 = cast.reshape(k // chunk, chunk, cap, f)
    v3 = valid.reshape(k // chunk, chunk, cap)

    def blk(args):
        sb, cb, vb = args
        r2 = jnp.sum(jnp.square(sb - cb.astype(jnp.float32)), axis=-1)
        return jnp.sqrt(jnp.max(jnp.where(vb, r2, 0.0), axis=-1))

    return jax.lax.map(blk, (s3, c3, v3)).reshape(k)


def cast_residual_worst(slab_dtype) -> float:
    """Worst-case ||x - cast(x)|| for a unit-norm row: per-element
    round-to-nearest error <= u |x_i| gives norm <= u ||x|| = u."""
    dt = jnp.dtype(slab_dtype)
    if dt == jnp.dtype(jnp.float32):
        return 0.0
    u = {"bfloat16": 2.0 ** -8, "float16": 2.0 ** -11}.get(dt.name)
    if u is None:
        raise ValueError(f"no dot-error model for slab dtype {dt.name}")
    return u


def _ivf_kernel(probe_ref, tau_ref, qn_ref, lamq_ref, slab_ref, lam_ref,
                id_ref, out_s_ref, out_i_ref, run_s, run_i, *, k: int,
                cap: int):
    p = pl.program_id(1)
    n_probe = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        run_s[:] = jnp.full_like(run_s, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    # Queries stay f32 and reduced-precision slabs upcast IN KERNEL: the
    # probe scan is DMA-bound (the bf16 win is the halved slab bytes, not
    # the MXU rate), and an f32 x f32 dot removes the query-side rounding
    # from the scan scores — the rescored certificate's error bound then
    # carries only the per-slab cast residual, doubling its headroom.
    qn = qn_ref[:].astype(jnp.float32)     # [QB, F]
    nq = qn.shape[0]
    tau = tau_ref[0]
    cos = jax.lax.dot_general(qn, slab_ref[:].astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [QB,cap]
    lam = lam_ref[0:1, :]                                          # [1,cap]
    prox = 1.0 / (1.0 + jnp.abs(lam - lamq_ref[:, 0:1]))
    score = tau * cos + (1.0 - tau) * prox
    ids = id_ref[0:1, :]                                           # [1,cap]
    ids_b = jnp.broadcast_to(ids, (nq, cap)).astype(jnp.int32)
    score = jnp.where(ids_b < 0, _NEG_INF, score).astype(jnp.float32)

    rs, ri = _lazy_merge(score, ids_b, run_s[:], run_i[:], k=k)
    run_s[:] = rs
    run_i[:] = ri

    @pl.when(p == n_probe - 1)
    def _emit():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "q_block", "cap",
                                             "n_probe", "interpret"))
def _ivf_scan(slabs, lam_pad, id_pad, qn_pad, lamq_pad, probe_tbl, tau, *,
              k, q_block, cap, n_probe, interpret=False):
    q_pad, f = qn_pad.shape
    n_qblocks = q_pad // q_block
    tau_arr = jnp.asarray([tau], dtype=jnp.float32).reshape(1)

    # The probe table prefetches FLAT: 2-D SMEM tables lane-pad 8x and
    # blow the ~1 MB SMEM budget at large query batches (CLAUDE.md rule).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # probe table (flat), tau
        grid=(n_qblocks, n_probe),
        in_specs=[
            pl.BlockSpec((q_block, f), lambda qb, p, probe, tau: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 128), lambda qb, p, probe, tau: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, f),
                         lambda qb, p, probe, tau:
                             (probe[qb * n_probe + p], 0),
                         memory_space=pltpu.VMEM),     # probed cluster slab
            pl.BlockSpec((1, cap),
                         lambda qb, p, probe, tau:
                             (0, probe[qb * n_probe + p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap),
                         lambda qb, p, probe, tau:
                             (0, probe[qb * n_probe + p]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qb, p, probe, tau: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qb, p, probe, tau: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, k), jnp.float32),
            pltpu.VMEM((q_block, k), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ivf_kernel, k=k, cap=cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(probe_tbl.reshape(-1), tau_arr, qn_pad, lamq_pad, slabs, lam_pad,
      id_pad)


def _bound_matrix(sims, lamq, radii, lam_lo, lam_hi, nonempty, tau):
    """Sound per-(query, cluster) score upper bound [rows, K]: unit-vector
    triangle inequality around the unit centroid + lambda-interval
    proximity; empty clusters bound to -inf."""
    d_qc = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sims, 0.0))
    cos_b = jnp.minimum(
        1.0 - 0.5 * jnp.square(jnp.maximum(d_qc - radii[None, :], 0.0)),
        1.0)
    dl = jnp.maximum(
        jnp.maximum(lam_lo[None, :] - lamq[:, None],
                    lamq[:, None] - lam_hi[None, :]), 0.0)
    bound = tau * cos_b + (1.0 - tau) * (1.0 / (1.0 + dl))
    return jnp.where(nonempty[None, :], bound, -jnp.inf)


def _route_scan_core(centroids_unit, slabs, slab_lambdas, slab_ids, qn32,
                     lamq32, tau, *, k, qb, q, cap, n_probe, interpret,
                     bound_state=None):
    """Shared routing + scan body (traced inside the jitted entry points).
    Returns sorted-order outputs plus the routing state the certification
    pass reuses.

    bound_state=(radii, lam_lo, lam_hi, nonempty) switches routing to
    BOUND-ORDERED probing (branch-and-bound): each block probes the
    n_probe clusters with the highest member score upper bounds, so the
    potential certificate violators are exactly the clusters that get
    probed — certification rates follow directly, and recall keeps (a
    query's own cluster has near-maximal bound).  The last return value
    is the [q, K] bound matrix (None under demand-vote routing)."""
    q_pad = ((q + qb - 1) // qb) * qb
    # Route individual queries, then sort by top centroid for coherence.
    sims_c = jnp.matmul(qn32, centroids_unit.T,
                        preferred_element_type=jnp.float32)      # [Q, K]
    top1 = jnp.argmax(sims_c, axis=1)
    order = jnp.argsort(top1, stable=True)
    inv = jnp.argsort(order, stable=True)
    qn_sorted = qn32[order]
    lamq_sorted = lamq32[order]
    sims_sorted = sims_c[order]

    qn_pad = jnp.pad(qn_sorted, ((0, q_pad - q), (0, 0)))
    lamq_pad = jnp.broadcast_to(
        jnp.pad(lamq_sorted, (0, q_pad - q))[:, None], (q_pad, 128))
    bound_sorted = None
    if bound_state is not None:
        radii, lam_lo, lam_hi, nonempty = bound_state
        bound_sorted = _bound_matrix(sims_sorted, lamq_sorted, radii,
                                     lam_lo, lam_hi, nonempty, tau)
        bound_pad = jnp.pad(bound_sorted, ((0, q_pad - q), (0, 0)),
                            constant_values=-jnp.inf)
        block_bound = jnp.max(
            bound_pad.reshape(q_pad // qb, qb, -1), axis=1)
        # Saturated-tie break: clusters whose covering radius exceeds the
        # query distance all bound at exactly tau + (1-tau)·lam_term, so
        # top_k would pick them by INDEX — crowding the query's own
        # cluster out of the probe list (observed at 1M x 768 with a
        # residual of fat clusters: kth collapsed to ~0.43).  A small
        # centroid-similarity term orders ties by actual relevance
        # without reordering materially different bounds.
        sims_pad_b = jnp.pad(sims_sorted, ((0, q_pad - q), (0, 0)),
                             constant_values=-1.0)
        block_sims = jnp.max(
            sims_pad_b.reshape(q_pad // qb, qb, -1), axis=1)
        _, probe_tbl = jax.lax.top_k(block_bound + 1e-4 * block_sims,
                                     n_probe)
        probe_tbl = probe_tbl.astype(jnp.int32)
    else:
        sims_pad = jnp.pad(sims_sorted, ((0, q_pad - q), (0, 0)),
                           constant_values=0.0)
        # Block probe table: demand votes -- each member query nominates
        # its top-2 clusters (so with q_block <= n_probe/2 every member's
        # best two clusters are guaranteed probed); remaining slots go to
        # the clusters with the highest summed routing score.
        n_vote = min(2, sims_pad.shape[1])
        _, top2 = jax.lax.top_k(sims_pad, n_vote)
        # Scatter votes straight into the [n_blocks, K] table (a [Q_pad,
        # K] intermediate is 256 MB at Q=16k, K=4096 — pure waste).
        # Padded query rows (zero sims) must not vote — top_k on zeros
        # returns clusters {0, 1}, which would crowd real demand out of
        # the last block's list.
        valid_q = (jnp.arange(q_pad) < q).astype(jnp.float32)
        block_ids = jnp.broadcast_to(
            (jnp.arange(q_pad) // qb)[:, None], top2.shape)
        block_votes = jnp.zeros((q_pad // qb, sims_pad.shape[1]),
                                dtype=jnp.float32)
        block_votes = block_votes.at[block_ids.reshape(-1),
                                     top2.reshape(-1)].add(
            jnp.broadcast_to(valid_q[:, None], top2.shape).reshape(-1))
        block_sims = jnp.sum(sims_pad.reshape(q_pad // qb, qb, -1),
                             axis=1)
        sims_01 = (block_sims - block_sims.min()) / jnp.maximum(
            block_sims.max() - block_sims.min(), 1e-9)
        _, probe_tbl = jax.lax.top_k(block_votes + 0.5 * sims_01, n_probe)
        probe_tbl = probe_tbl.astype(jnp.int32)

    lam_row = slab_lambdas.reshape(1, -1)
    id_row = slab_ids.reshape(1, -1)
    s, i = _ivf_scan(slabs, lam_row, id_row, qn_pad, lamq_pad,
                     probe_tbl, tau, k=k, q_block=qb, cap=cap,
                     n_probe=n_probe, interpret=interpret)
    return i, s, inv, sims_sorted, lamq_sorted, probe_tbl, bound_sorted


@functools.partial(jax.jit, static_argnames=("k", "qb", "q", "cap",
                                             "n_probe", "interpret",
                                             "use_bound"))
def _blocked_ivf_jit(centroids_unit, slabs, slab_lambdas, slab_ids, qn32,
                     lamq32, tau, radii, lam_lo, lam_hi, nonempty, *, k,
                     qb, q, cap, n_probe, interpret, use_bound):
    """Routing + scan as ONE compiled program: eager per-op dispatch costs a
    host round trip each on tunneled runtimes, which dominated small-batch
    latency before fusion.

    use_bound=True routes by the blended-score upper bound (radius +
    lambda-interval state) instead of cosine demand votes: the blend's
    lambda-proximity term pulls relevant items from clusters a pure-cosine
    router never probes (measured 2026-08-17 round 3 on a 40-component
    mixture: 0.84 -> 1.00 top-10 overlap at equal n_probe)."""
    bound_state = ((radii, lam_lo, lam_hi, nonempty) if use_bound
                   else None)
    i, s, inv, _, _, _, _ = _route_scan_core(
        centroids_unit, slabs, slab_lambdas, slab_ids, qn32, lamq32, tau,
        k=k, qb=qb, q=q, cap=cap, n_probe=n_probe, interpret=interpret,
        bound_state=bound_state)
    # Unsort back to the caller's query order.
    return i[:q][inv[:q]], s[:q][inv[:q]]


@functools.partial(jax.jit, static_argnames=("k", "qb", "q", "cap",
                                             "n_probe", "interpret"))
def _blocked_ivf_cert_jit(centroids_unit, slabs, slab_lambdas, slab_ids,
                          qn32, lamq32, tau, radii, lam_lo, lam_hi,
                          nonempty, margin, *, k, qb, q, cap, n_probe,
                          interpret):
    """Routing + scan + per-query EXACTNESS CERTIFICATION.

    A query is certified when no unprobed cluster's upper bound exceeds
    its served kth score.  The bound is sound: for unit q and unit
    centroid c with covering radius r over the slab's members x,
    ||q-x|| >= ||q-c|| - r, so cos(q,x) = 1 - ||q-x||^2/2
    <= 1 - max(0, ||q-c|| - r)^2 / 2; lambda proximity is bounded by the
    slab's lambda interval.  Slabs partition the corpus (spilled items
    are covered by their adopted slab), so a certified query's served
    top-k provably equals the exact f32 blended-scan top-k.  margin >= 0
    makes the certificate MORE conservative (refuses queries whose kth
    sits within margin of some unprobed bound); certification requires
    f32 slabs — reduced-precision slab scores can mis-rank even probed
    clusters, which no unprobed-cluster bound can repair."""
    i, s, inv, _, _, probe_tbl, bound = _route_scan_core(
        centroids_unit, slabs, slab_lambdas, slab_ids, qn32, lamq32, tau,
        k=k, qb=qb, q=q, cap=cap, n_probe=n_probe, interpret=interpret,
        bound_state=(radii, lam_lo, lam_hi, nonempty))
    viol = cert_violations(bound, s[:q, k - 1], probe_tbl, margin,
                           qb=qb, q=q)
    cert_sorted = ~viol
    return i[:q][inv[:q]], s[:q][inv[:q]], cert_sorted[inv[:q]]


def cert_violations(bound, kth_sorted, probe_tbl, margin, *, qb: int,
                    q: int):
    """Per-query bound violations (sorted-query order): True where some
    UNPROBED cluster's upper bound beats the query's kth served score."""
    n_blocks = probe_tbl.shape[0]
    probed = jnp.zeros((n_blocks, bound.shape[1]), dtype=bool)
    rows = jnp.broadcast_to(jnp.arange(n_blocks)[:, None],
                            probe_tbl.shape)
    probed = probed.at[rows.reshape(-1), probe_tbl.reshape(-1)].set(True)
    probed_q = probed[jnp.arange(q) // qb]                        # [q, K]
    # margin >= 0 STRENGTHENS the certificate (more refusals): a cluster
    # violates when its bound beats kth - margin - slack.  The built-in
    # slack absorbs f32 accumulation-order skew between the bound's
    # centroid matmul and the kernel's slab dot (scores are O(1), so an
    # absolute 1e-5 covers ~F*eps dot-order drift at F <= a few thousand).
    slack = jnp.float32(1e-5)
    return jnp.any(
        (bound > kth_sorted[:, None] - margin - slack) & ~probed_q,
        axis=1)


def scan_dot_eps(slab_dtype, f: int) -> float:
    """Sound absolute bound on |dot(cast(q), cast(x)) - dot_f32(q, x)| for
    unit-norm rows q, x when BOTH operands are rounded to `slab_dtype`
    and accumulated in f32.

    This is the WORST-CASE both-sides error model, kept for tests and as
    a fallback.  The production scan kernel (_ivf_kernel) keeps queries
    f32 and upcasts slabs in VMEM, so its scores carry only the stored
    slab rounding — the rescored certificate therefore uses the tighter
    data-dependent per-slab residual bound (res_eps, see
    _blocked_ivf_cert_rescored_jit), not this function.

    Round-to-nearest gives per-element relative error u (bf16: 8 bits of
    precision, u = 2^-8); the elementwise product error is
    sum_i |q_i x_i| * ((1+u)^2 - 1) <= (2u + u^2) * ||q|| ||x||
    (Cauchy-Schwarz), and f32 accumulation of f partials each bounded by
    ~||q|| ||x|| adds < 2 f * 2^-24.  For unit rows ||q|| ||x|| = 1."""
    dt = jnp.dtype(slab_dtype)
    if dt == jnp.dtype(jnp.float32):
        return 0.0
    u = {"bfloat16": 2.0 ** -8, "float16": 2.0 ** -11}.get(dt.name)
    if u is None:
        raise ValueError(f"no dot-error model for slab dtype {dt.name}")
    return (2.0 * u + u * u) * (1.0 + u) ** 2 + 2.0 * f * 2.0 ** -24


@functools.partial(jax.jit, static_argnames=("k", "m_pool", "qb", "q",
                                             "cap", "n_probe", "interpret"))
def _blocked_ivf_cert_rescored_jit(centroids_unit, slabs, slab_lambdas,
                                   slab_ids, xu_f32, lambdas_f32, qn32,
                                   lamq32, tau, radii, lam_lo, lam_hi,
                                   nonempty, res_eps, margin, *, k, m_pool,
                                   qb, q, cap, n_probe, interpret):
    """Certified serving over REDUCED-PRECISION slabs (precision-robust
    certificates).  bf16 slabs halve the probe DMA bytes that dominate
    certified serving cost at 1M x 768, but reduced-precision scan scores
    can mis-rank items WITHIN probed clusters — which the unprobed-cluster
    bound cannot detect, so the f32 path simply forbids them.  This path
    makes them sound instead:

      1. scan the slabs at merge width m_pool >= topk (the pool);
      2. rescore the pooled candidates against the f32 corpus rows
         (f32-exact blended scores) and cut the served top-k there;
      3. certify with TWO sound conditions against the rescored kth:
         (A) unprobed clusters: the f32 centroid-radius + lambda-interval
             upper bound (cert_violations) — unchanged from the f32 path;
         (B) probed-but-unpooled items: the exact merge keeps the pool's
             scan scores maximal, so any probed item outside the pool has
             scan score <= pool_min and TRUE blended score <= pool_min +
             tau * eps, where eps is the DATA-DEPENDENT slab-side dot
             error bound (per-slab max cast-residual norm res_eps,
             maximized over the block's probed slabs, + f32 accumulation
             slack — the kernel keeps queries f32, so only the stored
             slab rounding enters); certified when that stays below the
             rescored kth.

    A certified query's served top-k therefore provably equals the exact
    f32 blended-scan top-k, with f32-exact served scores."""
    i, s, inv, _sims, lamq_sorted, probe_tbl, bound = _route_scan_core(
        centroids_unit, slabs, slab_lambdas, slab_ids, qn32, lamq32, tau,
        k=m_pool, qb=qb, q=q, cap=cap, n_probe=n_probe,
        interpret=interpret,
        bound_state=(radii, lam_lo, lam_hi, nonempty))
    # Stay in sorted-query order (bound/probe_tbl are block-structured in
    # it); order = inverse of the unsort permutation.
    order = jnp.argsort(inv[:q], stable=True)
    qn_sorted = qn32[order]
    ids = i[:q]                                    # [q, m_pool] original ids
    safe = jnp.maximum(ids, 0)
    xc = xu_f32[safe]                              # [q, m_pool, F]
    cos = jnp.einsum("qmf,qf->qm", xc, qn_sorted,
                     preferred_element_type=jnp.float32)
    prox = 1.0 / (1.0 + jnp.abs(lambdas_f32[safe]
                                - lamq_sorted[:, None]))
    s32 = tau * cos + (1.0 - tau) * prox
    s32 = jnp.where(ids >= 0, s32, _NEG_INF)
    vals, pos = jax.lax.top_k(s32, k)
    idx_k = jnp.take_along_axis(ids, pos, axis=1)
    kth = vals[:, k - 1]
    viol_a = cert_violations(bound, kth, probe_tbl, margin, qb=qb, q=q)
    # (B): pool_min is the m_pool-th scan score (-inf when the probed set
    # had fewer than m_pool real items — then every probed item is pooled
    # and the condition holds trivially).  The dot-error bound is DATA-
    # DEPENDENT and slab-side only: the scan kernel keeps queries f32 and
    # upcasts the slab block in VMEM, so the only rounding in a scan
    # score is the stored slab row x~ = cast(x):
    #   |dot(q, x) - dot(q, x~)| <= ||q|| * ||x - x~|| = r
    # with r the precomputed per-slab max member residual (res_eps),
    # maximized over the query block's probed slabs; f32 accumulation of
    # f partials bounded by ~1 adds < 2 f 2^-24.  (The worst-case
    # both-sides bound scan_dot_eps is ~7x above observed error and
    # refuses everything at realistic score gaps.)  ||q|| = ||x|| = 1 to
    # f32 rounding, absorbed by the same 1e-5 slack as cert_violations.
    f_dim = slabs.shape[1]
    r_blk = jnp.max(res_eps[probe_tbl], axis=1)                 # [n_blocks]
    r_q = r_blk[jnp.arange(q) // qb]                            # [q]
    eps = tau * (r_q + jnp.float32(2.0 * f_dim * 2.0 ** -24))
    pool_min = s[:q, m_pool - 1]
    viol_b = pool_min + eps > kth - margin - jnp.float32(1e-5)
    cert_sorted = ~(viol_a | viol_b)
    return idx_k[inv[:q]], vals[inv[:q]], cert_sorted[inv[:q]]


def pack_certified(idx, vals, cert):
    """Pack a certified result (idx i32, vals f32, cert bool) into ONE
    [Q, 2*topk + 1] f32 device array (idx bitcast, cert as 0/1) so the
    certificate sync is a SINGLE host pull.  On tunneled runtimes each
    device->host pull is a latency-dominated RPC (measured 2026-08-19: a
    fresh 2 MB pull ~97 ms, nearly flat in size), so pulling idx/vals/
    cert separately puts a ~3-RPC floor under every synchronous certified
    batch regardless of device speed.  Applied INSIDE the fused serve
    program (blocked_ivf_search_fused(pack_out=True)) — zero extra
    dispatches."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.float32),
        vals.astype(jnp.float32),
        cert.astype(jnp.float32)[:, None]], axis=1)


def unpack_certified(packed: np.ndarray, topk: int):
    """Host-side inverse of pack_certified: one pulled [Q, 2*k+1] f32
    array -> (idx [Q,k] i32, vals [Q,k] f32, cert [Q] bool).  k is read
    from the array width, NOT from `topk`: the kernel clamps the served
    width to cap * n_probe (blocked_ivf_search_fused), so the packed
    width is authoritative; `topk` only bounds it."""
    packed = np.asarray(packed)
    k = (packed.shape[1] - 1) // 2
    if k > topk:
        raise ValueError(f"packed width {packed.shape[1]} implies k={k} "
                         f"> requested topk={topk}")
    idx = packed[:, :k].view(np.int32)
    vals = packed[:, k:2 * k]
    cert = packed[:, 2 * k] > 0.5
    return idx, vals, cert


def q_block_for(q: int, q_block: int = 16) -> int:
    """Routing-sweep default query-block clamp (shared with the sharded
    mode so the two paths cannot drift)."""
    return min(q_block, max(8, 1 << (q - 1).bit_length()))


def default_q_block(certify: bool, n_probe: int) -> int:
    """Default query-block width, shared by the single-chip and sharded
    IVF paths so their certificates cannot drift.

    Probes are BLOCK-shared (each block of qb queries routes as one, see
    _route_scan_core), so the block width trades probe-DMA grid size
    against per-query routing fidelity.  qb=16 was measured cert-neutral
    at 1M x 768 with n_probe=8 on tightened clusters (recorded
    1787159703_cert_profile: 100% cert at qb=8 AND 16, +18% pipelined
    QPS at 16) — but at small n_probe the wider block dilutes each
    query's share of the probe list and erodes the certificate
    (measured 2026-08-19 on the 1500x48 mixture, 24 clusters,
    n_probe=4: base cert 0.92 at qb=8 vs 0.54 at qb=16).  Certified
    serving therefore keeps qb=8 whenever n_probe < 8; approximate
    serving always takes the wide block (overlap, not exactness, is its
    contract)."""
    return 8 if (certify and n_probe < 8) else 16


def _res_eps_vector(ivf: BlockedIVF) -> jnp.ndarray:
    """Per-slab cast-residual norms for the rescored certificate; indexes
    built before the res_eps state fall back to the sound worst-case
    u * ||x|| = u per slab."""
    if ivf.res_eps is not None:
        return ivf.res_eps
    n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
    return jnp.full((n_clusters,), cast_residual_worst(ivf.slabs.dtype),
                    dtype=jnp.float32)


def cert_pool_width(m_pool: int | None, topk: int, served_max: int) -> int:
    """Scan pool width for the rescored (reduced-precision) certificate.
    Default 4*topk: condition (B) needs the pool_min scan score to sit
    tau*eps below the rescored kth, and the kth-vs-pool_min gap grows
    with the pool (measured 2026-08-18 round 4 on mixture geometry: p10
    gap 0.0013 at m=2k vs 0.0051 at m=6.4k for k=10) at ~linear
    rescore-gather cost.
    Clamped to the served width cap * n_probe (a narrower served width
    refuses via widening)."""
    mp = max(4 * topk, topk + 6) if m_pool is None else int(m_pool)
    if mp < topk:
        raise ValueError(f"m_pool ({mp}) must be >= topk ({topk})")
    return max(1, min(mp, served_max))


def blocked_ivf_search(ivf: BlockedIVF, qn, lam_q, tau, topk: int,
                       n_probe: int = 16, q_block: int | None = None,
                       interpret: bool | None = None,
                       certify: bool = False, margin: float = 0.0,
                       rescore_corpus=None, rescore_lambdas=None,
                       m_pool: int | None = None):
    """Blocked IVF top-k: (idx [Q, topk] int32, scores [Q, topk] f32),
    plus a per-query exactness certificate [Q] bool when certify=True
    (see _blocked_ivf_cert_jit; requires an index built with
    certify=True).

    Certification over reduced-precision slabs (bf16/f16) additionally
    requires `rescore_corpus` ([N, F] f32 unit rows) and
    `rescore_lambdas` ([N] f32), indexed by ORIGINAL item id: the scan
    pools m_pool (default 4*topk, see cert_pool_width) candidates,
    rescoring cuts the served top-k in f32, and the certificate adds the
    precision-robust pool condition (_blocked_ivf_cert_rescored_jit).

    Defaults from the routing sweep: q_block=16 queries share a probe list;
    with top-2 demand votes per member, n_probe=16 gives ~0.97 top-10
    overlap with the exact scan on clustered data."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    q, _f = qn.shape
    n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
    n_probe = max(1, min(n_probe, n_clusters))
    # q_block=None -> shared n_probe-gated default (default_q_block):
    # 16 everywhere except certified serving at n_probe < 8, where the
    # block-shared probe list dilutes and the cert rate collapses.
    qb = q_block_for(q, default_q_block(certify, n_probe)
                     if q_block is None else q_block)
    k = max(1, min(topk, ivf.cap * n_probe))
    args = (ivf.centroids_unit, ivf.slabs, ivf.slab_lambdas, ivf.slab_ids,
            jnp.asarray(qn, dtype=jnp.float32),
            jnp.asarray(lam_q, dtype=jnp.float32),
            jnp.asarray(tau, dtype=jnp.float32))
    kw = dict(k=k, qb=qb, q=q, cap=ivf.cap, n_probe=n_probe,
              interpret=interpret)
    if certify:
        if ivf.radii is None:
            raise ValueError("certify=True needs an index built with "
                             "build_blocked_ivf(..., certify=True)")
        if ivf.slabs.dtype != jnp.float32:
            if rescore_corpus is None or rescore_lambdas is None:
                raise ValueError(
                    "certify=True over reduced-precision slabs needs "
                    "rescore_corpus/rescore_lambdas (f32, original-id "
                    "order) for the precision-robust certificate; pass "
                    "them or rebuild with f32 slabs")
            cu, sl, slam, sid, qn32, lamq32, tau32 = args
            mp = cert_pool_width(m_pool, topk, ivf.cap * n_probe)
            return _blocked_ivf_cert_rescored_jit(
                cu, sl, slam, sid,
                jnp.asarray(rescore_corpus, dtype=jnp.float32),
                jnp.asarray(rescore_lambdas, dtype=jnp.float32),
                qn32, lamq32, tau32, ivf.radii, ivf.lam_lo, ivf.lam_hi,
                ivf.nonempty, _res_eps_vector(ivf), jnp.float32(margin),
                m_pool=mp, **kw)
        return _blocked_ivf_cert_jit(
            *args, ivf.radii, ivf.lam_lo, ivf.lam_hi, ivf.nonempty,
            jnp.float32(margin), **kw)
    use_bound = ivf.radii is not None
    zero_k = jnp.zeros((n_clusters,), dtype=jnp.float32)
    bound_args = ((ivf.radii, ivf.lam_lo, ivf.lam_hi, ivf.nonempty)
                  if use_bound
                  else (zero_k, zero_k, zero_k, zero_k.astype(bool)))
    return _blocked_ivf_jit(*args, *bound_args, use_bound=use_bound, **kw)


@functools.partial(jax.jit, static_argnames=(
    "k", "qb", "q", "cap", "n_probe", "interpret", "rayleigh_normalized",
    "tau_mix", "certify", "use_bound", "pack_out"))
def _blocked_ivf_serve_jit(centroids_unit, slabs, slab_lambdas, slab_ids,
                           q_raw, lap_f, w_f, tau_star, tau, radii, lam_lo,
                           lam_hi, nonempty, margin, *, k, qb, q,
                           cap, n_probe, interpret, rayleigh_normalized,
                           tau_mix, certify, use_bound=False,
                           pack_out=False):
    from ...ops.distance import unit_normalize
    from ...ops.rayleigh import dispersion_batch, rayleigh_batch
    from ...spectral.taumode import synthesize

    e_un = rayleigh_batch(q_raw, lap_f, normalized=False)
    e = (rayleigh_batch(q_raw, lap_f, normalized=True)
         if rayleigh_normalized else e_un)
    g = dispersion_batch(q_raw, w_f, e_un)
    lam_q = synthesize(e, g, tau_star, tau_mix).astype(jnp.float32)
    qn = unit_normalize(q_raw.astype(jnp.float32))
    if certify:
        out = _blocked_ivf_cert_jit(
            centroids_unit, slabs, slab_lambdas, slab_ids, qn, lam_q, tau,
            radii, lam_lo, lam_hi, nonempty, margin, k=k, qb=qb, q=q,
            cap=cap, n_probe=n_probe, interpret=interpret)
        return pack_certified(*out) if pack_out else out
    return _blocked_ivf_jit(centroids_unit, slabs, slab_lambdas, slab_ids,
                            qn, lam_q, tau, radii, lam_lo, lam_hi,
                            nonempty, k=k, qb=qb, q=q, cap=cap,
                            n_probe=n_probe, interpret=interpret,
                            use_bound=use_bound)


@functools.partial(jax.jit, static_argnames=(
    "k", "m_pool", "qb", "q", "cap", "n_probe", "interpret",
    "rayleigh_normalized", "tau_mix", "pack_out"))
def _blocked_ivf_serve_rescored_jit(centroids_unit, slabs, slab_lambdas,
                                    slab_ids, xu_f32, lambdas_f32, q_raw,
                                    lap_f, w_f, tau_star, tau, radii,
                                    lam_lo, lam_hi, nonempty, res_eps,
                                    margin, *, k, m_pool, qb, q, cap,
                                    n_probe, interpret,
                                    rayleigh_normalized, tau_mix,
                                    pack_out=False):
    """ONE-dispatch certified serving over reduced-precision slabs:
    query-lambda synthesis + routing + pooled scan + f32 rescore +
    precision-robust certificate (_blocked_ivf_cert_rescored_jit)."""
    from ...ops.distance import unit_normalize
    from ...ops.rayleigh import dispersion_batch, rayleigh_batch
    from ...spectral.taumode import synthesize

    e_un = rayleigh_batch(q_raw, lap_f, normalized=False)
    e = (rayleigh_batch(q_raw, lap_f, normalized=True)
         if rayleigh_normalized else e_un)
    g = dispersion_batch(q_raw, w_f, e_un)
    lam_q = synthesize(e, g, tau_star, tau_mix).astype(jnp.float32)
    qn = unit_normalize(q_raw.astype(jnp.float32))
    out = _blocked_ivf_cert_rescored_jit(
        centroids_unit, slabs, slab_lambdas, slab_ids, xu_f32,
        lambdas_f32, qn, lam_q, tau, radii, lam_lo, lam_hi, nonempty,
        res_eps, margin, k=k, m_pool=m_pool, qb=qb, q=q, cap=cap,
        n_probe=n_probe, interpret=interpret)
    return pack_certified(*out) if pack_out else out


def blocked_ivf_search_fused(ivf: BlockedIVF, queries, lap_f, w_f,
                             tau_star, tau, topk: int, n_probe: int = 16,
                             q_block: int | None = None,
                             rayleigh_normalized: bool = False,
                             tau_mix: float | None = None,
                             interpret: bool | None = None,
                             certify: bool = False, margin: float = 0.0,
                             rescore_corpus=None, rescore_lambdas=None,
                             m_pool: int | None = None,
                             pack_out: bool = False):
    """ONE-dispatch blocked-IVF serving: query-lambda synthesis + routing
    + Pallas scan in a single compiled program (eager per-op dispatch
    costs a host round trip each on tunneled runtimes — same rationale as
    ops/search.fused_query_pipeline).

    pack_out=True (certify only): return ONE packed [Q, 2*topk+1] f32
    array (pack_certified) instead of the (idx, vals, cert) triple, so
    the caller's certificate sync is a single device->host pull — each
    pull is a latency-dominated RPC on tunneled runtimes (~100 ms
    measured 2026-08-19), so the triple costs ~2 extra RPCs per batch.
    Decode with unpack_certified(pulled, topk)."""
    from ...spectral.taumode import TAU_MIX

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    q, _f = queries.shape
    n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
    n_probe = max(1, min(n_probe, n_clusters))
    # q_block=None -> shared n_probe-gated default (default_q_block):
    # 16 everywhere except certified serving at n_probe < 8.
    qb = q_block_for(q, default_q_block(certify, n_probe)
                     if q_block is None else q_block)
    k = max(1, min(topk, ivf.cap * n_probe))
    if certify and ivf.radii is None:
        raise ValueError("certify=True needs an index built with "
                         "build_blocked_ivf(..., certify=True)")
    if certify and ivf.slabs.dtype != jnp.float32:
        if rescore_corpus is None or rescore_lambdas is None:
            raise ValueError(
                "certify=True over reduced-precision slabs needs "
                "rescore_corpus/rescore_lambdas (f32, original-id order) "
                "for the precision-robust certificate; pass them or "
                "rebuild with f32 slabs")
        mp = cert_pool_width(m_pool, topk, ivf.cap * n_probe)
        return _blocked_ivf_serve_rescored_jit(
            ivf.centroids_unit, ivf.slabs, ivf.slab_lambdas, ivf.slab_ids,
            jnp.asarray(rescore_corpus, dtype=jnp.float32),
            jnp.asarray(rescore_lambdas, dtype=jnp.float32),
            jnp.asarray(queries, dtype=jnp.float32),
            jnp.asarray(lap_f, dtype=jnp.float32),
            jnp.asarray(w_f, dtype=jnp.float32),
            jnp.asarray(tau_star, dtype=jnp.float32),
            jnp.asarray(tau, dtype=jnp.float32),
            ivf.radii, ivf.lam_lo, ivf.lam_hi, ivf.nonempty,
            _res_eps_vector(ivf), jnp.float32(margin), k=k, m_pool=mp,
            qb=qb, q=q, cap=ivf.cap, n_probe=n_probe, interpret=interpret,
            rayleigh_normalized=rayleigh_normalized,
            tau_mix=TAU_MIX if tau_mix is None else float(tau_mix),
            pack_out=pack_out)
    zero_k = jnp.zeros((n_clusters,), dtype=jnp.float32)
    have_bound = ivf.radii is not None
    return _blocked_ivf_serve_jit(
        ivf.centroids_unit, ivf.slabs, ivf.slab_lambdas, ivf.slab_ids,
        jnp.asarray(queries, dtype=jnp.float32),
        jnp.asarray(lap_f, dtype=jnp.float32),
        jnp.asarray(w_f, dtype=jnp.float32),
        jnp.asarray(tau_star, dtype=jnp.float32),
        jnp.asarray(tau, dtype=jnp.float32),
        ivf.radii if have_bound else zero_k,
        ivf.lam_lo if have_bound else zero_k,
        ivf.lam_hi if have_bound else zero_k,
        ivf.nonempty if have_bound else zero_k.astype(bool),
        jnp.float32(margin), k=k, qb=qb, q=q, cap=ivf.cap,
        n_probe=n_probe, interpret=interpret,
        rayleigh_normalized=rayleigh_normalized,
        tau_mix=TAU_MIX if tau_mix is None else float(tau_mix),
        certify=certify, use_bound=have_bound,
        pack_out=pack_out and certify)


def widen_refusals(idx, vals, cert, run_certified, topk: int,
                   n_probe: int, n_probe_max: int):
    """Iterative bound-ordered widening (branch-and-bound deepening):
    re-serve certificate refusals at doubled n_probe while each probe
    round stays far cheaper than the exact scan, splicing in newly
    certified results.  Returns (idx, vals, cert) with cert updated;
    remaining refusals are the caller's to escalate
    (escalate_uncertified).  Shared by the single-chip and sharded
    mode="certified" paths so the escalation semantics cannot drift.

    `run_certified(sel, n_probe)` must return certified ivf_block
    results (idx, vals, cert) for the selected query indices at the
    given n_probe.  Each round's selection pads to the next power of two
    so distinct refusal counts reuse a handful of compiled programs.
    Soundness: a spliced row is only accepted when its OWN certificate
    at the wider probe list holds, so every returned certified row is
    provably the exact blended-scan top-k regardless of how many rounds
    it took."""
    idx = np.array(idx)
    vals = np.array(vals)
    cert = np.array(cert, dtype=bool)
    if idx.shape[1] < topk:
        # Served width was clamped by cap * n_probe below the requested
        # topk: nothing served at this width is usable, but widening
        # raises the width together with the probe list.
        cert = np.zeros_like(cert)
    np_cur = n_probe
    while np_cur * 2 <= n_probe_max:
        bad = np.flatnonzero(~cert)
        if bad.size == 0:
            break
        np_cur *= 2
        n_pad = 1 << int(bad.size - 1).bit_length()
        sel = np.concatenate([bad, np.full(n_pad - bad.size, bad[0])])
        i2, v2, c2 = run_certified(sel, np_cur)
        i2 = np.asarray(i2)[: bad.size]
        v2 = np.asarray(v2)[: bad.size]
        c2 = np.asarray(c2)[: bad.size].astype(bool)
        if i2.shape[1] < topk:
            continue  # still width-clamped; keep widening
        if idx.shape[1] < topk:
            idx = np.zeros((idx.shape[0], topk), dtype=i2.dtype)
            vals = np.zeros((vals.shape[0], topk), dtype=v2.dtype)
        hit = bad[c2]
        idx[hit] = i2[c2, :topk]
        vals[hit] = v2[c2, :topk]
        cert[hit] = True
    return idx, vals, cert


def escalate_uncertified(idx, vals, cert, run_exact, topk: int):
    """Splice exact results over certificate refusals (shared by the
    single-chip and sharded mode="certified" paths so the escalation
    semantics cannot drift).

    idx/vals are the certified ivf_block outputs [Q, k_served].  When
    k_served < topk (cap * n_probe clamped the served width) the
    certificate cannot cover a top-`topk` request — every query
    escalates.  `run_exact(sel)` must return exact [len(sel), topk]
    results for the selected query indices; the escalation batch pads to
    the next power of two so distinct refusal counts reuse a handful of
    compiled programs."""
    idx = np.array(idx)
    vals = np.array(vals)
    n_q = idx.shape[0]
    if idx.shape[1] < topk:
        bad = np.arange(n_q)
    else:
        bad = np.flatnonzero(~np.asarray(cert))
    if bad.size == 0:
        return idx, vals
    n_pad = 1 << int(bad.size - 1).bit_length()
    sel = np.concatenate([bad, np.full(n_pad - bad.size, bad[0])])
    ei, ev = run_exact(sel)
    ei = np.asarray(ei)[: bad.size]
    ev = np.asarray(ev)[: bad.size]
    if idx.shape[1] < topk:
        idx = np.zeros((n_q, topk), dtype=ei.dtype)
        vals = np.zeros((n_q, topk), dtype=ev.dtype)
    idx[bad] = ei
    vals[bad] = ev
    return idx, vals
