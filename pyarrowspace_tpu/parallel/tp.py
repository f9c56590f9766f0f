"""Tensor-parallel taumode lambdas over a 2-D (data, model) mesh.

SURVEY.md §2.2 marks TP as the optional axis: shard the F (feature) axis of
the F x F spectral Laplacian when F is large.  This module implements the
lambda stage column-parallel:

  * corpus rows shard over "data" (DP, as in sharded.py);
  * the feature Laplacian / adjacency shard column-wise over "model";
  * each chip computes its partial Rayleigh / dispersion contractions
    (column-parallel matmul + `psum` over "model" — the classic Megatron
    column-parallel-linear reduction, here for x^T L x instead of XW);
  * tau* (median energy) reduces over "data" via all_gather, as before.

Numerically identical to the single-chip lambda stage (exact psums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..spectral.taumode import TAU_MIX, synthesize

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _local_cols(x: jnp.ndarray, f_local: int) -> jnp.ndarray:
    """This chip's column slice of a row-sharded [*, F] array."""
    m = jax.lax.axis_index(MODEL_AXIS)
    return jax.lax.dynamic_slice_in_dim(x, m * f_local, f_local, axis=1)


@functools.partial(jax.jit, static_argnames=("mesh", "tau_mix", "n_real"))
def lambdas_dp_tp(stored_pad, lap_f, w_f, *, mesh: Mesh, n_real: int,
                  tau_mix: float = TAU_MIX):
    """Per-item lambdas with rows sharded over "data" and the F x F spectral
    state sharded column-wise over "model".

    Returns (lambdas [N_pad] sharded over data, e_raw likewise, tau_star).
    """

    def body(xl, lap_l, wf_l):
        # xl [N_loc, F] ; lap_l [F, F_loc] ; wf_l [F, F_loc]
        f_local = lap_l.shape[1]
        xl_cols = _local_cols(xl, f_local)            # [N_loc, F_loc]

        # Rayleigh: e = sum_j (X @ L)_ij * X_ij — column-parallel + psum.
        y = jnp.matmul(xl, lap_l, preferred_element_type=xl.dtype)
        e = jax.lax.psum(jnp.sum(y * xl_cols, axis=1), MODEL_AXIS)
        e = jnp.maximum(e, 0.0)

        # Dispersion (see ops/rayleigh.py derivation), column-parallel:
        w2_l = wf_l * wf_l                            # [F, F_loc]
        r = jax.lax.psum(jnp.sum(w2_l, axis=1), MODEL_AXIS)   # [F]
        x2 = xl * xl
        x3 = x2 * xl
        x4 = x2 * x2
        t1 = jnp.matmul(x4, r[:, None],
                        preferred_element_type=xl.dtype)[..., 0]
        t2 = jax.lax.psum(
            jnp.sum(jnp.matmul(x2, w2_l, preferred_element_type=xl.dtype)
                    * _local_cols(x2, f_local), axis=1), MODEL_AXIS)
        t3 = jax.lax.psum(
            jnp.sum(jnp.matmul(xl, w2_l, preferred_element_type=xl.dtype)
                    * _local_cols(x3, f_local), axis=1), MODEL_AXIS)
        sum_ord_m2 = 2.0 * t1 + 6.0 * t2 - 8.0 * t3
        denom = (2.0 * e) ** 2
        g = jnp.where(denom > 0,
                      2.0 * sum_ord_m2 / jnp.maximum(denom, 1e-30), 0.0)
        g = jnp.clip(g, 0.0, 1.0)

        # Exact median energy over the real rows (data-axis reduction).
        e_all = jax.lax.all_gather(e, DATA_AXIS, tiled=True)
        mask = jnp.arange(e_all.shape[0]) < n_real
        e_sorted = jnp.sort(jnp.where(mask, e_all, jnp.inf))
        lo = e_sorted[(n_real - 1) // 2]
        hi = e_sorted[n_real // 2]
        tau_star = jnp.maximum(0.5 * (lo + hi), 1e-10)

        lam = synthesize(e, g, tau_star, tau_mix)
        return lam, e, tau_star

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, MODEL_AXIS),
                  P(None, MODEL_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        check_vma=False)
    return fn(stored_pad, lap_f, w_f)
