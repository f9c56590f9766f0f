"""IVF-accelerated serving — cluster-routed approximate search.

The reference searches by full corpus scan (exact, SURVEY.md §3.2); this is
a TPU-native acceleration mode layered on the reduction stage's K-means
clustering (the same centroids the standard build already computes): items
are bucketed into padded inverted lists at index time, and a query scores
only the members of its n_probe nearest clusters.  Compute per query drops
from O(N·F) to O(K·F + n_probe·(N/K)·F).

Approximate by construction (recall depends on n_probe and cluster balance),
hence opt-in: `ArrowSpace.search_batch(..., mode="ivf")`.  Buckets are
padded to a capacity multiple of the mean cluster size; overflow items
spill into a shared tail bucket that every query also scans, so no item is
ever unreachable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class IVFIndex(NamedTuple):
    centroids: jnp.ndarray     # [K, F]
    buckets: jnp.ndarray       # [K, C] int32 item ids, -1 pad
    tail: jnp.ndarray          # [T] int32 spill item ids (-1 pad)


def build_ivf(centroids, assignments, n_items: int,
              capacity_factor: float = 3.0) -> IVFIndex:
    """Bucket items by cluster assignment (host-side, once per build;
    vectorized — a python loop is minutes at 1M items)."""
    cent = np.asarray(centroids)
    assign = np.asarray(assignments)
    k = cent.shape[0]
    cap = max(8, int(np.ceil(capacity_factor * n_items / k)))
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    # Rank of each item within its cluster.
    starts = np.searchsorted(sorted_assign, np.arange(k))
    rank = np.arange(n_items) - starts[sorted_assign]
    in_bucket = rank < cap
    buckets = np.full((k, cap), -1, dtype=np.int32)
    buckets[sorted_assign[in_bucket], rank[in_bucket]] = order[
        in_bucket].astype(np.int32)
    tail = order[~in_bucket].astype(np.int32)
    tail_arr = tail if tail.size else np.full((1,), -1, dtype=np.int32)
    # Pad the tail to a lane multiple for clean gathers.
    pad = (-len(tail_arr)) % 128
    if pad:
        tail_arr = np.pad(tail_arr, (0, pad), constant_values=-1)
    return IVFIndex(jnp.asarray(centroids), jnp.asarray(buckets),
                    jnp.asarray(tail_arr))


@functools.partial(jax.jit, static_argnames=("n_probe", "topk"))
def ivf_lambda_search(xu, lambdas, ivf: IVFIndex, qn, lam_q, tau, *,
                      n_probe: int, topk: int):
    """Cluster-routed lambda-aware top-k.

    qn [Q, F] unit queries, lam_q [Q].  Returns (idx [Q, topk], scores).
    """
    cent_u = ivf.centroids / jnp.maximum(
        jnp.linalg.norm(ivf.centroids, axis=1, keepdims=True), 1e-30)
    sims_c = jnp.matmul(qn, cent_u.T, preferred_element_type=qn.dtype)
    _, probe = jax.lax.top_k(sims_c, min(n_probe, ivf.centroids.shape[0]))

    # Candidate ids: members of the probed buckets + the shared tail.
    cand = ivf.buckets[probe]                        # [Q, n_probe, C]
    q = qn.shape[0]
    cand = cand.reshape(q, -1)
    tail = jnp.broadcast_to(ivf.tail[None, :], (q, ivf.tail.shape[0]))
    cand = jnp.concatenate([cand, tail], axis=1)     # [Q, M]
    valid = cand >= 0
    safe = jnp.clip(cand, 0, None)

    x_c = xu[safe]                                   # [Q, M, F] gather
    cos = jnp.einsum("qf,qmf->qm", qn, x_c,
                     preferred_element_type=qn.dtype)
    prox = 1.0 / (1.0 + jnp.abs(lambdas[safe] - lam_q[:, None]))
    score = tau * cos + (1.0 - tau) * prox
    score = jnp.where(valid, score, -jnp.inf)
    k = min(topk, score.shape[1])
    vals, pos = jax.lax.top_k(score, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    return idx, vals
