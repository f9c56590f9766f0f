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

    sigma_scale (a traced scalar) -> Gaussian-kernel adjacency
    w = exp(-d^2 / (2 sigma^2)) with sigma = sigma_scale * median kept
    k-NN distance.  Used on the reduction path (centroid signals): the
    builder passes sigma_scale = eps/10, threading the
    dims-reduction tolerance into the feature graph CONTINUOUSLY.  Two
    deliberate properties: (a) a binary graph over well-separated
    centroid columns is bit-stable under small eps/K perturbations,
    which made recorded eps sweeps flat, while the reference's recorded
    sweeps move at every eps step
    (tests/output/1761065864_v0_17_msmarco_epssweep); (b) because tau*
    is the MEDIAN energy, any uniform rescaling of the weights cancels
    out of the bounded energy — the Gaussian's sigma acts as a POWER
    transform on relative edge weights (exp(-d^2/2s^2)^(s0/s)), a shape
    change the median cannot absorb."""
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
        sigma = med * sigma_scale
        w_f = jnp.where(mask, jnp.exp(-(d * d) / (2.0 * sigma * sigma)),
                        0.0)
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
