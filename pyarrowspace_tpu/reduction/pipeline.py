"""Dims-reduction / sampling / clustering stage.

Behavioral equivalent of the reference engine's reduction pipeline as
reconstructed from its build logs (reference
tests/output/1760705545_v0_16/suggested_eps.md:3-10 and SURVEY.md N10):

  1. random sampling with ~60% keep rate (seeded; reference seed 42),
  2. Two-NN intrinsic-dimension estimate (log line: "TwoNN ratio 1.3560 ->
     ID=3" for 313k x 384),
  3. auto-selection of a clustering K (log: "test K range [178, 179]"),
  4. K-means clustering -> centroid "signals" matrix.

The engine crate is closed-source; K selection follows the OBSERVED
mechanism: a rate estimate K = clamp(round(sqrt(N_kept)/2.5 * eps_factor),
16, 512) seeds a two-candidate SEARCH [K, K+1] scored by a BIC-style
clustering objective on a subsample (select_k_searched) — the reference
logs exactly this shape ("Testing K in range [178, 179] with step 1";
our estimate lands 177 for the 313k corpus at 60% keep, eps=1.31).  All
stages are jitted JAX on-device; K-means is Lloyd's with k-means++-style
seeded init, fixed iteration count (static shapes for XLA).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.debug import dbg_println
from ..utils.logging import get_logger

log_sampling = get_logger("sampling")
log_clustering = get_logger("clustering")

SAMPLING_KEEP_RATE = 0.6  # observed in reference build logs (suggested_eps.md:6)


@dataclasses.dataclass
class ReductionResult:
    centroids: jnp.ndarray       # [K, F]
    assignments: jnp.ndarray     # [N] int32 cluster id per (full-corpus) item
    intrinsic_dim: int
    n_sampled: int
    k_clusters: int


@functools.partial(jax.jit, static_argnames=())
def _twonn_ratio(x: jnp.ndarray) -> jnp.ndarray:
    """Mean log-ratio of 2nd to 1st nearest-neighbor Euclidean distances."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        x, x.T, preferred_element_type=x.dtype)
    d2 = jnp.maximum(d2, 0.0)
    n = x.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    neg2, _ = jax.lax.top_k(-d2, 2)              # two smallest squared dists
    r1 = jnp.sqrt(jnp.maximum(-neg2[:, 0], 1e-30))
    r2 = jnp.sqrt(jnp.maximum(-neg2[:, 1], 1e-30))
    mu = jnp.maximum(r2 / jnp.maximum(r1, 1e-30), 1.0 + 1e-9)
    return jnp.mean(jnp.log(mu))


def twonn_intrinsic_dim(x, seed: int = 42,
                        max_points: int = 2048) -> tuple[int, float]:
    """Two-NN intrinsic-dimension estimate (Facco et al.): ID ≈ 1 / E[log mu].

    Subsamples to max_points for the O(n^2) pairwise step.  Accepts numpy or
    on-device arrays; the subsample gather runs device-side so the full
    corpus never crosses the host-device link.
    Returns (ID rounded to int >= 1, mean log ratio)."""
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    x = jnp.asarray(x)
    if n > max_points:
        sel = jnp.asarray(rng.choice(n, size=max_points, replace=False))
        x = x[sel]
    mean_log_mu = float(_twonn_ratio(x))
    if mean_log_mu <= 1e-9:
        return 1, mean_log_mu
    dim = max(1, int(round(1.0 / mean_log_mu)))
    return dim, mean_log_mu


_ASSIGN_BLOCK_ELEMS = 2 ** 27  # d2 tile budget: 128M f32 elems = 512 MB


def _assign_argmin(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment that never materializes a [N, K]
    distance matrix beyond the element budget (16 GB at 1M rows x 4096
    centroids — more than a v5e's HBM).  Large inputs are processed in
    shape-stable row blocks via lax.map; per-row arithmetic is unchanged,
    so assignments are identical to the one-shot path."""
    n, k = x.shape[0], c.shape[0]
    c_sq = jnp.sum(c * c, axis=1)[None, :]

    def block_assign(xb):
        d2 = (jnp.sum(xb * xb, axis=1)[:, None] + c_sq
              - 2.0 * jnp.matmul(xb, c.T, preferred_element_type=x.dtype))
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    if n * k <= _ASSIGN_BLOCK_ELEMS:
        return block_assign(x)
    block = max(8, (_ASSIGN_BLOCK_ELEMS // k) // 8 * 8)
    n_pad = ((n + block - 1) // block) * block
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    a = jax.lax.map(block_assign, xp.reshape(n_pad // block, block, -1))
    return a.reshape(n_pad)[:n]


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _lloyd(x: jnp.ndarray, centroids: jnp.ndarray, n_iters: int):
    """Fixed-iteration Lloyd's K-means; empty clusters keep their centroid."""
    k = centroids.shape[0]

    def assign(c):
        return _assign_argmin(x, c)

    def step(c, _):
        a = assign(c)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        cnts = jax.ops.segment_sum(jnp.ones((x.shape[0],), x.dtype), a,
                                   num_segments=k)
        new_c = jnp.where(cnts[:, None] > 0,
                          sums / jnp.maximum(cnts[:, None], 1.0), c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    return centroids, assign(centroids)


def _assign_argmin_dist(x: jnp.ndarray, c: jnp.ndarray):
    """`_assign_argmin` that also returns the SQUARED distance to the
    assigned centroid (same blockwise element budget, same assignments)."""
    n, k = x.shape[0], c.shape[0]
    c_sq = jnp.sum(c * c, axis=1)[None, :]

    def block_assign(xb):
        d2 = (jnp.sum(xb * xb, axis=1)[:, None] + c_sq
              - 2.0 * jnp.matmul(xb, c.T, preferred_element_type=x.dtype))
        return (jnp.argmin(d2, axis=1).astype(jnp.int32),
                jnp.min(d2, axis=1))

    if n * k <= _ASSIGN_BLOCK_ELEMS:
        return block_assign(x)
    block = max(8, (_ASSIGN_BLOCK_ELEMS // k) // 8 * 8)
    n_pad = ((n + block - 1) // block) * block
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    a, d2 = jax.lax.map(block_assign,
                        xp.reshape(n_pad // block, block, -1))
    return a.reshape(n_pad)[:n], d2.reshape(n_pad)[:n]


@functools.partial(jax.jit, static_argnames=("n_iters",))
def lloyd_reseed(x: jnp.ndarray, centroids: jnp.ndarray, n_iters: int,
                 seed=0):
    """Lloyd's K-means with empty-cluster reseeding — the serving-quality
    clustering for IVF slab layouts and exactness certificates.

    Random-row init on a well-separated high-dimensional mixture leaves a
    fraction of clusters empty while others absorb 2-3 components
    (measured at 40k x 768 / 163 clusters: 21 empty clusters, 32% of
    members beyond 2x the median centroid distance).  Merged clusters
    have near-sqrt(2) covering radii, which saturates the blocked-IVF
    certification bound (`ops/pallas/ivf_scan._bound_matrix`) at ~1.0 and
    poisons bound-ordered routing (the fattest clusters out-bid every
    query's own cluster for probe slots).

    Each iteration recycles two kinds of centroids, reseeding them at
    corpus points sampled WITHOUT replacement proportional to their
    squared distance to the current assignment (Gumbel top-k over
    log d^2 — far points belong to absorbed components, and d^2
    weighting spreads the picks across components instead of draining
    one):

    - EMPTY clusters (no members this iteration), and
    - one of each pair of TWIN centroids — two centroids much closer to
      each other than typical (both sitting inside one component, made
      redundant once reseeding gives every component its own centroid).
      Mergers never become empty on their own, so without twin recycling
      the reseed supply dries up while merged clusters persist; this is
      the ISODATA merge-split move.  Twins are detected by the bimodal
      nearest-centroid-distance gap (within-component spread vs
      inter-component ~sqrt(2) separations): nn_dist < 0.4 * median.

    The last two iterations never reseed, so the returned assignment is
    a converged plain-Lloyd step.
    """
    k = centroids.shape[0]
    key = jax.random.PRNGKey(seed)

    def step(c, it):
        a, d2 = _assign_argmin_dist(x, c)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        cnts = jax.ops.segment_sum(jnp.ones((x.shape[0],), x.dtype), a,
                                   num_segments=k)
        new_c = jnp.where(cnts[:, None] > 0,
                          sums / jnp.maximum(cnts[:, None], 1.0), c)
        empty = cnts <= 0
        # Twin detection on the UPDATED centroids ([K, K] distances —
        # K is the cluster count, a few thousand, so this is tiny next
        # to the [N, K] assignment).
        cc = (jnp.sum(new_c * new_c, axis=1)[:, None]
              + jnp.sum(new_c * new_c, axis=1)[None, :]
              - 2.0 * jnp.matmul(new_c, new_c.T,
                                 preferred_element_type=jnp.float32))
        cc = cc + jnp.eye(k, dtype=cc.dtype) * jnp.inf
        cc = jnp.where(empty[:, None] | empty[None, :], jnp.inf, cc)
        nn_d2 = jnp.min(cc, axis=1)
        nn_id = jnp.argmin(cc, axis=1)
        med = jnp.median(jnp.where(jnp.isfinite(nn_d2), nn_d2,
                                   jnp.nanmax(jnp.where(
                                       jnp.isfinite(nn_d2), nn_d2, 0.0))))
        twin = ((nn_d2 < 0.16 * med)            # 0.4^2 on distances
                & (jnp.arange(k) < nn_id))      # recycle one per pair
        recycle = empty | twin
        g = jax.random.gumbel(jax.random.fold_in(key, it), (x.shape[0],),
                              dtype=jnp.float32)
        pick = jax.lax.top_k(
            jnp.log(jnp.maximum(d2.astype(jnp.float32), 1e-30)) + g, k)[1]
        rank = jnp.cumsum(recycle.astype(jnp.int32)) - 1
        reseeded = x[pick[jnp.clip(rank, 0, k - 1)]]
        do_reseed = it < n_iters - 2   # let the tail iterations converge
        new_c = jnp.where((recycle & do_reseed)[:, None], reseeded, new_c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, jnp.arange(n_iters))
    return centroids, _assign_argmin(x, centroids)


@jax.jit
def _radius_stats(x, c):
    """Per-cluster max squared member distance TO THE UNIT CENTROID (the
    anchor the blocked-IVF certification bound uses — the Lloyd mean has
    norm < 1 for unit members, so mean-anchored radii understate the
    bound's by ~0.1), one farthest member id, and the cluster sizes.
    Assumes unit-normalized x."""
    k = c.shape[0]
    a, d2 = _assign_argmin_dist(x, c)
    cn = jnp.sqrt(jnp.maximum(jnp.sum(c * c, axis=1), 1e-30))[a]
    # ||x - c/||c||||^2 from ||x-c||^2 via x.c = (1 + ||c||^2 - d^2)/2.
    d2u = jnp.maximum(2.0 - (1.0 + cn * cn - d2) / cn, 0.0)
    rmax2 = jax.ops.segment_max(d2u, a, num_segments=k)
    is_far = d2u >= rmax2[a] - 1e-12
    far = jax.ops.segment_max(
        jnp.where(is_far, jnp.arange(x.shape[0], dtype=jnp.int32), -1),
        a, num_segments=k)
    sizes = jax.ops.segment_sum(jnp.ones_like(a), a, num_segments=k)
    return a, rmax2, far, sizes


def lloyd_tighten(x, centroids, assignments=None, r_max: float = 0.75,
                  max_rounds: int = 8, settle_iters: int = 2,
                  max_size: int | None = None):
    """Grow the centroid set until every cluster's covering radius is
    <= r_max (unit-normalized inputs: merged mixture components sit near
    sqrt(2), single components well under 1) and, when max_size is given,
    no cluster exceeds max_size members.

    Two failure modes motivate this pass — both wreck blocked-IVF
    exactness certification, which needs EVERY cluster's score bound
    tight (one saturated bound refuses all queries):

    - `lloyd_reseed` fixes most random-init mergers, but its recycling
      supply (empties + twins) dries up before the residual does at
      scale (measured 1M x 768 / 4096 clusters: 1516 initial merged
      components -> 94 after 12 iterations).
    - Clusters larger than the slab capacity OVERFLOW in
      build_blocked_ivf; in a high-dimensional mixture there is no near
      alternative cluster, so spilled members inflate the adopting
      slab's covering radius to ~sqrt(2) (measured: max cluster size 738
      vs cap 512 at 1M -> 94 saturated slabs despite tight clustering).
      Pass max_size = the builder's planned slab capacity to guarantee a
      spill-free partition.

    Splits plant a NEW centroid at the offending cluster's farthest
    member (the absorbed component / the shell of an oversized one) and
    settle with plain Lloyd.  K grows by the number of splits;
    blocked-IVF slab layouts take arbitrary K.  Host-side loop:
    build-time only, a few assignment passes per round.

    At scale (K >= 1024) grown centroid sets pad to a multiple of 128
    with FAR sentinels (capture no members, certify as empty slabs) so
    successive rounds reuse one compiled assignment shape — per-round K
    churn cost ~5 min of remote recompiles at 1M x 768."""
    c = jnp.asarray(centroids)

    def _pad_k(ci):
        k = ci.shape[0]
        if k < 1024:
            return ci
        k_pad = ((k + 127) // 128) * 128
        if k_pad == k:
            return ci
        sentinel = jnp.full((k_pad - k, ci.shape[1]), 1e6, dtype=ci.dtype)
        return jnp.concatenate([ci, sentinel], axis=0)

    for _ in range(max_rounds):
        a, rmax2, far, sizes = _radius_stats(x, c)
        fat = np.array(rmax2 > r_max * r_max)   # writable host copy
        if max_size is not None:
            fat |= np.asarray(sizes) > max_size
        fat &= np.asarray(sizes) > 0            # sentinels never split
        if not fat.any():
            return c, (a if assignments is None
                       else _assign_argmin(x, c))
        new_ids = np.asarray(far)[fat]
        new_ids = new_ids[new_ids >= 0]
        c = _pad_k(jnp.concatenate([c, x[jnp.asarray(new_ids)]], axis=0))
        c, _ = _lloyd(x, c, settle_iters)
    return c, _assign_argmin(x, c)


def planned_slab_cap(n: int, k: int, capacity_factor: float = 2.0) -> int:
    """The slab capacity build_blocked_ivf will choose for n items and k
    clusters — pass as lloyd_tighten's max_size so the partition is
    spill-free (and as build_blocked_ivf's min_cap so later centroid
    growth cannot shrink the capacity below it)."""
    cap = max(8, int(np.ceil(capacity_factor * n / k)))
    return ((cap + 127) // 128) * 128


def select_k(n_sampled: int, intrinsic_dim: int,
             eps_hint: float | None = None) -> int:
    """Auto K heuristic calibrated to the reference's observed K≈178 for the
    313k corpus (suggested_eps.md:7-10); behavior-level, not bit parity.

    eps_hint is the builder's dims-reduction tolerance — the reference
    binding passes the graph eps into the reduction stage
    (`with_dims_reduction(true, Some(eps))`, reference src/lib.rs:283;
    `Some(0.35)` for energy builds, src/lib.rs:359), so clustering
    granularity responds to eps.  A looser eps (coarser graph) widens the
    centroid budget logarithmically: K ∝ (1 + 0.08·ln eps).  At the CVE
    eps=1.31 this lands K=177 for the 313k corpus, matching the observed
    K range [178, 179] more closely than the eps-free heuristic (174)."""
    del intrinsic_dim  # reserved for future refinement
    factor = 1.0
    if eps_hint is not None and eps_hint > 0:
        factor = max(0.25, 1.0 + 0.08 * math.log(eps_hint))
    return int(np.clip(round(math.sqrt(n_sampled) / 2.5 * factor), 16, 512))


def k_search_range(n_sampled: int, intrinsic_dim: int,
                   eps_hint: float | None = None) -> tuple[int, int]:
    """Candidate-K range for the optimal-K search, derived from the TwoNN
    rate estimate: [base, base+1] — the reference engine's observed search
    window is exactly two candidates wide ("Testing K in range [178, 179]
    with step 1", reference tests/output/1760705545_v0_16/
    suggested_eps.md:10)."""
    base = select_k(n_sampled, intrinsic_dim, eps_hint)
    return base, base + 1


def _kmeans_bic(xs: jnp.ndarray, k: int, seed: int,
                n_iters: int = 4) -> float:
    """Cheap X-means-style BIC objective for one candidate K: spherical
    log-likelihood of the Lloyd partition plus a parameter-count penalty.
    Lower is better.  Runs on a subsample, so the search costs a few
    small Lloyd passes — not a corpus-scale clustering per candidate."""
    rng = np.random.default_rng(seed)
    init = jnp.asarray(rng.choice(xs.shape[0], size=min(k, xs.shape[0]),
                                  replace=False))
    c, _ = _lloyd(xs, xs[init], n_iters)
    _, d2 = _assign_argmin_dist(xs, c)
    ns = xs.shape[0]
    w = float(jnp.mean(d2))
    return ns * math.log(max(w, 1e-12)) + 0.5 * k * math.log(ns)


def select_k_searched(xs: jnp.ndarray, n_sampled: int, intrinsic_dim: int,
                      eps_hint: float | None = None, seed: int = 42,
                      max_points: int = 4096) -> int:
    """Optimal-K SEARCH (reference N10 mechanism, VERDICT r4 #7): candidate
    Ks from the TwoNN intrinsic-dimension rate, each EVALUATED by a cheap
    clustering objective on a subsample, the winner logged — matching the
    reference engine's observable behavior ("Computing optimal K for
    clustering" -> "Testing K in range [a, b] with step 1", reference
    tests/output/1760705545_v0_16/suggested_eps.md:7-10) instead of
    returning the rate formula's value untested.  Deterministic for a
    given (corpus, seed); ARROWSPACE_K_SEARCH=0 restores the closed-form
    heuristic."""
    import os as _os
    lo, hi = k_search_range(n_sampled, intrinsic_dim, eps_hint)
    lo = min(lo, xs.shape[0])
    hi = min(hi, xs.shape[0])
    if _os.environ.get("ARROWSPACE_K_SEARCH", "1") == "0" or hi <= lo:
        return lo
    rng = np.random.default_rng(seed)
    if xs.shape[0] > max_points:
        sub = xs[jnp.asarray(np.sort(rng.choice(xs.shape[0],
                                                size=max_points,
                                                replace=False)))]
    else:
        sub = xs
    msg = f"reduction: testing K range [{lo}, {hi}] with step 1"
    dbg_println(msg)
    log_clustering.info(msg)
    cands = list(range(lo, hi + 1))
    scores = [_kmeans_bic(sub, kk, seed) for kk in cands]
    k_opt = cands[int(np.argmin(scores))]
    msg = (f"reduction: optimal K={k_opt} (BIC "
           + ", ".join(f"K={kk}: {s:.1f}" for kk, s in zip(cands, scores))
           + ")")
    dbg_println(msg)
    log_clustering.info(msg)
    return k_opt


def reduce_corpus(x: np.ndarray | jnp.ndarray, seed: int = 42,
                  keep_rate: float = SAMPLING_KEEP_RATE,
                  k_clusters: int | None = None,
                  n_iters: int = 12,
                  eps_hint: float | None = None,
                  reseed_empty: bool = False) -> ReductionResult:
    """Run the full reduction stage; returns centroids over the sampled set
    and assignments for the FULL corpus."""
    x = jnp.asarray(x)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    n_keep = max(2, int(round(n * keep_rate)))
    # The host-side draw always runs (the rng stream feeds the centroid
    # init below — skipping it would shift every seeded clustering), but
    # at keep_rate=1.0 the sorted full draw IS arange, so the device
    # gather is the identity: skip it — the gathered copy is a +3 GB
    # HBM spike at 1M x 768, the exact margin that OOMed enable_ivf on
    # one chip.
    sel = np.sort(rng.choice(n, size=n_keep, replace=False))
    xs = x if n_keep >= n else x[jnp.asarray(sel)]
    msg = (f"reduction: raw-input saved; sampled {n_keep}/{n} "
           f"(keep_rate={keep_rate})")
    dbg_println(msg)
    log_sampling.debug(msg)

    idim, mlm = twonn_intrinsic_dim(xs, seed=seed)
    msg = f"reduction: TwoNN mean-log-ratio={mlm:.4f} -> ID={idim}"
    dbg_println(msg)
    log_clustering.debug(msg)

    k = (k_clusters if k_clusters is not None
         else select_k_searched(xs, n_keep, idim, eps_hint, seed=seed))
    k = min(k, n_keep)
    msg = f"reduction: clustering K={k}"
    dbg_println(msg)
    log_clustering.debug(msg)

    init_sel = jnp.asarray(rng.choice(n_keep, size=k, replace=False))
    if reseed_empty:
        # Serving-quality clustering (IVF slabs / certificates): split
        # merged components via empty-cluster reseeding.  Off by default —
        # the reference-parity reduction stage keeps plain Lloyd.
        centroids, _ = lloyd_reseed(xs, xs[init_sel], n_iters, seed=seed)
    else:
        centroids, _ = _lloyd(xs, xs[init_sel], n_iters)

    # Assign the FULL corpus to the learned centroids (blockwise above the
    # element budget — [N, K] alone can exceed HBM at IVF cluster counts).
    assignments = jax.jit(_assign_argmin)(x, centroids)
    return ReductionResult(centroids=centroids, assignments=assignments,
                           intrinsic_dim=idim, n_sampled=n_keep, k_clusters=k)
