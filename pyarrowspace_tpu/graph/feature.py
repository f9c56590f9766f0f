"""Feature-space spectral Laplacian (F x F), dense.

TPU-native equivalent of the reference engine's
`GraphFactory::build_spectral_laplacian` (reference GRAPH_VARIABLES.md:17,44;
TAUMODE.md: "a feature-space Laplacian L in R^{FxF} stored in ArrowSpace as
signals").  F is at most a few thousand for embedding workloads, so the
feature graph is built fully dense on the MXU: one Gram matmul over the
signals matrix's columns, k-NN masking, symmetrization, L = D - W.

The engine crate is closed-source, so the construction was calibrated against
the reference's observable behavior (the four exact orderings pinned by
tests/test_0.py — see tests/test_parity_test0.py).  The calibrated design:

  * distance  : Euclidean between RAW feature columns of the signals matrix
                (magnitude-sensitive, matching the reference's documented
                coupling between item magnitude and lambda — lib.rs:156-159);
  * adjacency : symmetrized k-NN with k_F = graph_params.topk, UNWEIGHTED
                (binary) — the distance kernel w = 1/(1+(d/sigma)^p) applies
                to the item graph only;
  * Laplacian : L = D - W.

Binary adjacency makes the whole lambda pipeline equivariant under uniform
corpus scaling (k-NN column selection, bounded energy with median tau*, and
dispersion are all scale-invariant), so the harness-side x12 / x100 embedding
scalings the reference requires (test_2:154, test_3:190) are harmless here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k_f",))
def laplacian_from_sq_dists(d2: jnp.ndarray, *, k_f: int,
                            sigma_scale=None):
    """Symmetrized k-NN Laplacian from a dense [F, F] squared-distance
    matrix (shared by the single-chip and sharded build paths).

    sigma_scale None -> BINARY adjacency — the test_0-calibrated
    construction (module docstring), used whenever the signals are the
    raw stored items (small corpora, reduction off).

    sigma_scale (a traced scalar, ~ eps/10) -> the DIFFERENTIAL eps
    channel used on the reduction path (centroid signals), built so the
    recorded eps sweeps move at every step like the reference's
    (tests/output/1761065864_v0_17_msmarco_epssweep, nDCG
    0.5955/0.5986/0.5997; a purely global Gaussian width was a power
    transform of the weights whose effect the median tau* mostly
    cancels — round-2 sweeps were near-flat at bench scale).  Two
    mechanisms, both non-uniform across the graph:

    (a) eps TOPOLOGY: k-NN edges farther than sigma_scale x the median
        kept distance are pruned (each column unconditionally keeps its
        nearest neighbor, so the graph can degrade but not empty out) —
        the feature graph mirrors the item graph's eps-threshold
        semantics (GRAPH_VARIABLES.md:7-10), and topology changes are
        exactly what a monotone weight transform cannot express;
    (b) PER-COLUMN local kernel widths (the round-2 "per-cluster
        widths" diagnosis): sigma_ij = sigma_scale * sqrt(m_i * m_j)
        with m_i = median kept distance of column i — relative weights
        between dense and sparse feature neighborhoods change SHAPE
        with eps, not just scale."""
    f = d2.shape[0]
    eye = jnp.eye(f, dtype=bool)
    d2 = jnp.where(eye, jnp.inf, d2)                  # exclude self-loops
    kk = max(1, min(k_f, f - 1))
    _, nbr = jax.lax.top_k(-d2, kk)                   # [F, kk] nearest columns
    mask = jnp.zeros((f, f), dtype=bool)
    rows = jnp.broadcast_to(jnp.arange(f)[:, None], (f, kk))
    mask = mask.at[rows.reshape(-1), nbr.reshape(-1)].set(True)
    mask = mask | mask.T                              # symmetrize (union)

    if sigma_scale is None:
        w_f = mask.astype(d2.dtype)
    else:
        d = jnp.sqrt(jnp.where(eye, 0.0, jnp.maximum(d2, 0.0)))
        kept = jnp.where(mask, d, jnp.nan)
        med = jnp.nanmedian(kept)
        med = jnp.where(jnp.isfinite(med) & (med > 0), med, 1.0)
        # (a) eps topology: prune kept edges beyond the eps-scaled
        # threshold; every column keeps its single nearest column.
        nn_mask = jnp.zeros((f, f), dtype=bool)
        nn_mask = nn_mask.at[jnp.arange(f), nbr[:, 0]].set(True)
        nn_mask = nn_mask | nn_mask.T
        keep = (mask & (d <= sigma_scale * med)) | nn_mask
        keep = keep | keep.T
        # (b) per-column local widths from the surviving edges.
        kept_d = jnp.where(keep, d, jnp.nan)
        m_i = jnp.nanmedian(kept_d, axis=1)
        m_i = jnp.where(jnp.isfinite(m_i) & (m_i > 0), m_i, med)
        sig2 = (sigma_scale * sigma_scale) * m_i[:, None] * m_i[None, :]
        w_f = jnp.where(keep, jnp.exp(-(d * d) / (2.0 * sig2)), 0.0)
    degrees = jnp.sum(w_f, axis=1)
    lap_f = jnp.diag(degrees) - w_f
    return w_f, lap_f, degrees


@functools.partial(jax.jit, static_argnames=("k_f",))
def build_feature_laplacian(signals: jnp.ndarray, *, k_f: int,
                            sigma_scale=None):
    """Build the dense F x F feature-graph adjacency and Laplacian.

    Args:
      signals: [M, F] signals matrix (stored items or reduction centroids,
        in stored — not unit — scale); the graph is over its F columns.
      k_f: per-column neighbor count (the reference-calibrated policy is
        k_f = graph_params.topk).
      sigma_scale: None -> binary adjacency (calibrated small-n path);
        scalar -> eps-kernel weights (reduction path, see
        laplacian_from_sq_dists).

    Returns:
      (w_f [F, F] symmetric non-negative adjacency, zero diagonal,
       lap_f [F, F] = diag(deg) - w_f,
       degrees [F])
    """
    m, f = signals.shape
    cols = signals.T                                  # [F, M]
    sq = jnp.sum(cols * cols, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        cols, cols.T, preferred_element_type=signals.dtype)
    d2 = jnp.maximum(d2, 0.0)
    return laplacian_from_sq_dists(d2, k_f=k_f, sigma_scale=sigma_scale)
