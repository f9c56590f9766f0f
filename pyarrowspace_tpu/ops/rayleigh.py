"""Batched Rayleigh/Dirichlet energy and Gini-dispersion against the dense
F x F feature Laplacian — all MXU matmuls, no per-item F x F materialization.

Math parity (reference TAUMODE.md):
  e_raw(x)  = x^T L x          (Dirichlet energy; optionally / x^T x)
  g_raw(x)  = sum_e s_e^2 with s_e = w_e (x_a - x_b)^2 / sum_e' w_e'(...)^2
              over undirected feature-graph edges e=(a,b), w = -L_ab >= 0
  g_clamped = clip(g_raw, 0, 1)

TPU derivation for g_raw without materializing the per-item F x F edge-energy
matrix: with W2 = W ∘ W and sums over ordered pairs,
  sum_ab W2_ab (x_a - x_b)^4
    = 2·sum_a x_a^4 r_a + 6·sum_a x_a^2 (W2 x^2)_a - 8·sum_a x_a^3 (W2 x)_a,
  r = W2·1.  Undirected sums halve both numerator pieces, giving
  g_raw = 2 · sum_ord m^2 / (sum_ord m)^2 with sum_ord m = 2 x^T L x.
Every term is a batched [N,F] x [F,F] matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("normalized",))
def rayleigh_batch(x: jnp.ndarray, lap_f: jnp.ndarray,
                   normalized: bool = False) -> jnp.ndarray:
    """e_raw for a batch of items: diag(X L X^T) via sum((X @ L) * X, -1).

    normalized=True divides by x^T x (the textbook Rayleigh quotient of
    TAUMODE.md); normalized=False keeps the raw Dirichlet energy, which is
    magnitude-sensitive — required to reproduce the reference's observed
    behavior (test_0 reorders a scaled-parallel query; lambda collapses when
    item magnitude is too small: reference src/lib.rs:156-159 and the x100
    scaling in tests/test_3_beir.py:190).
    """
    y = jnp.matmul(x, lap_f, preferred_element_type=x.dtype)
    e = jnp.sum(y * x, axis=-1)
    if normalized:
        denom = jnp.sum(x * x, axis=-1)
        e = jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.maximum(e, 0.0)  # PSD Laplacian => clamp numeric negatives


@jax.jit
def dispersion_batch(x: jnp.ndarray, w_f: jnp.ndarray,
                     e_unnorm: jnp.ndarray) -> jnp.ndarray:
    """g_clamped for a batch of items (see module docstring for derivation).

    Args:
      x: [N, F] items.
      w_f: [F, F] symmetric non-negative feature-graph weights, zero diagonal.
      e_unnorm: [N] unnormalized Dirichlet energies x^T L x (so that
        sum over ordered pairs of w_ab (x_a-x_b)^2 = 2 * e_unnorm).
    """
    w2 = w_f * w_f
    r = jnp.sum(w2, axis=1)                      # [F]
    x2 = x * x
    x3 = x2 * x
    x4 = x2 * x2
    t1 = jnp.matmul(x4, r[:, None],
                    preferred_element_type=x.dtype)[..., 0]     # sum x^4 r
    t2 = jnp.sum(jnp.matmul(x2, w2, preferred_element_type=x.dtype) * x2,
                 axis=-1)                                        # x2 W2 x2
    t3 = jnp.sum(jnp.matmul(x, w2, preferred_element_type=x.dtype) * x3,
                 axis=-1)                                        # x3 W2 x
    sum_ord_m2 = 2.0 * t1 + 6.0 * t2 - 8.0 * t3  # sum over ordered pairs
    sum_ord_m = 2.0 * e_unnorm
    denom = sum_ord_m * sum_ord_m
    g_raw = jnp.where(denom > 0, 2.0 * sum_ord_m2 / jnp.maximum(denom, 1e-30),
                      0.0)
    return jnp.clip(g_raw, 0.0, 1.0)
