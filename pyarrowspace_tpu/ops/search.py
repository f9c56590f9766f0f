"""Query-time scoring kernels.

Lambda-aware ranking (reference TAUMODE.md:33, src/lib.rs:132-174):
  score(q, i) = tau * cos(q, x_i) + (1 - tau) * 1 / (1 + |lambda_i - lambda_q|)
with tau the blend control (tau = 1.0 -> pure cosine ranking).

Energy-only ranking (reference src/lib.rs:221-262): no cosine — lambda
proximity plus a Rayleigh-Dirichlet smoothness term, weighted by
w_lambda / w_dirichlet.

All kernels are single fused scans over the corpus: one [N,F] x [F] (or
batched [N,F] x [F,Q]) matmul on the MXU, elementwise blend on the VPU, then
`lax.top_k` — XLA fuses the blend into the matmul epilogue, which is the
SURVEY.md §7 step-4 design (stream corpus tiles from HBM once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import unit_normalize


@functools.partial(jax.jit, static_argnames=("topk",))
def lambda_aware_topk(xu: jnp.ndarray, lambdas: jnp.ndarray, q: jnp.ndarray,
                      lam_q: jnp.ndarray, tau: jnp.ndarray, topk: int):
    """Top-k by tau-blended cosine + lambda-proximity (single query)."""
    qn = unit_normalize(q)
    cos = jnp.matmul(xu, qn, preferred_element_type=xu.dtype)
    prox = 1.0 / (1.0 + jnp.abs(lambdas - lam_q))
    score = tau * cos + (1.0 - tau) * prox
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


def _acc_dtype(dtype):
    """Accumulate low-precision (bf16/f16) matmuls in f32 on the MXU."""
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


@functools.partial(jax.jit, static_argnames=("topk",))
def lambda_aware_topk_batch(xu: jnp.ndarray, lambdas: jnp.ndarray,
                            q_batch: jnp.ndarray, lam_q: jnp.ndarray,
                            tau: jnp.ndarray, topk: int):
    """Batched variant: q_batch [Q, F], lam_q [Q] -> (idx [Q, topk], vals).

    Accepts a bf16 corpus (the high-QPS serving layout): the cosine matmul
    runs on the MXU at bf16 rate with f32 accumulation."""
    qn = unit_normalize(q_batch.astype(_acc_dtype(q_batch.dtype)), axis=-1)
    cos = jnp.matmul(qn.astype(xu.dtype), xu.T,
                     preferred_element_type=_acc_dtype(xu.dtype))  # [Q, N]
    lam32 = lambdas.astype(cos.dtype)
    prox = 1.0 / (1.0 + jnp.abs(lam32[None, :]
                                - lam_q.astype(cos.dtype)[:, None]))
    score = tau.astype(cos.dtype) * cos + (1.0 - tau.astype(cos.dtype)) * prox
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


@functools.partial(jax.jit,
                   static_argnames=("topk", "rayleigh_normalized", "tau_mix",
                                    "backend"))
def fused_query_pipeline(xu: jnp.ndarray, lambdas: jnp.ndarray,
                         lap_f: jnp.ndarray, w_f: jnp.ndarray,
                         tau_star: jnp.ndarray, q_batch: jnp.ndarray,
                         tau: jnp.ndarray, *, topk: int,
                         rayleigh_normalized: bool, tau_mix: float,
                         backend: str = "auto"):
    """The full serving step in ONE compiled program: query lambda synthesis
    (Rayleigh + dispersion against the stored feature Laplacian) fused with
    the blended scan + top-k.  A single dispatch per batch — essential when
    the host-device link has per-call latency (remote TPU tunnels).

    backend "pallas" streams corpus tiles through the fused Pallas scan
    (ops/pallas/scan_topk.py) instead of lax.top_k over [Q, N]; "auto"
    picks pallas on TPU."""
    from .rayleigh import dispersion_batch, rayleigh_batch
    from ..spectral.taumode import synthesize

    e_un = rayleigh_batch(q_batch, lap_f, normalized=False)
    e_raw = (rayleigh_batch(q_batch, lap_f, normalized=True)
             if rayleigh_normalized else e_un)
    g = dispersion_batch(q_batch, w_f, e_un)
    lam_q = synthesize(e_raw, g, tau_star, tau_mix)
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                   else "xla")
    if backend == "pallas":
        from .pallas.scan_topk import lambda_search_pallas
        qn = unit_normalize(q_batch, axis=-1)
        idx, vals = lambda_search_pallas(xu, lambdas, qn, lam_q, tau, topk,
                                         interpret=False)
        return idx, vals.astype(xu.dtype)
    return lambda_aware_topk_batch(xu, lambdas, q_batch, lam_q, tau, topk)


@functools.partial(jax.jit, static_argnames=("topk",))
def hybrid_topk_batch(xu: jnp.ndarray, lambdas: jnp.ndarray,
                      q_batch: jnp.ndarray, lam_q: jnp.ndarray,
                      tau: jnp.ndarray, topk: int):
    """Batched hybrid ranking (multiplicative gate, see hybrid_topk)."""
    qn = unit_normalize(q_batch.astype(_acc_dtype(q_batch.dtype)), axis=-1)
    cos = jnp.matmul(qn.astype(xu.dtype), xu.T,
                     preferred_element_type=_acc_dtype(xu.dtype))
    lam32 = lambdas.astype(cos.dtype)
    prox = 1.0 / (1.0 + jnp.abs(lam32[None, :]
                                - lam_q.astype(cos.dtype)[:, None]))
    t = tau.astype(cos.dtype)
    score = cos * (t + (1.0 - t) * prox)
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("topk",))
def energy_topk_batch(lambdas: jnp.ndarray, e_raw: jnp.ndarray,
                      lam_q: jnp.ndarray, e_q: jnp.ndarray,
                      w_lambda: jnp.ndarray, w_dirichlet: jnp.ndarray,
                      topk: int):
    """Batched energy-only ranking (no cosine): lam_q/e_q are [Q]."""
    prox_l = 1.0 / (1.0 + jnp.abs(lambdas[None, :] - lam_q[:, None]))
    prox_e = 1.0 / (1.0 + jnp.abs(e_raw[None, :] - e_q[:, None]))
    score = w_lambda * prox_l + w_dirichlet * prox_e
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("topk",))
def hybrid_topk(xu: jnp.ndarray, lambdas: jnp.ndarray, q: jnp.ndarray,
                lam_q: jnp.ndarray, tau: jnp.ndarray, topk: int):
    """Hybrid ranking: multiplicative gate instead of an additive blend.

    score = cos * (tau + (1 - tau) * prox) — cosine modulated by spectral
    proximity; tau = 1.0 degenerates to pure cosine, like `search`.  The
    reference exposes `search_lambda_aware_hybrid` without documenting or
    testing its formula (reference src/lib.rs:182-219 — "exposed, undocumented,
    untested" per SURVEY.md §3.2), so the gate is this framework's design;
    it preserves the observed property that hybrid tracks cosine more closely
    than the additive blend (BASELINE.md: hybrid nDCG 0.9948 vs taumode 0.9838).
    """
    qn = unit_normalize(q)
    cos = jnp.matmul(xu, qn, preferred_element_type=xu.dtype)
    prox = 1.0 / (1.0 + jnp.abs(lambdas - lam_q))
    score = cos * (tau + (1.0 - tau) * prox)
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("topk",))
def energy_topk(x: jnp.ndarray, lambdas: jnp.ndarray, e_raw: jnp.ndarray,
                q: jnp.ndarray, lam_q: jnp.ndarray, e_q: jnp.ndarray,
                w_lambda: jnp.ndarray, w_dirichlet: jnp.ndarray, topk: int):
    """Energy-only ranking — no cosine (reference src/lib.rs:221-262).

    score(q, i) = w_lambda * 1/(1 + |lambda_i - lambda_q|)
                + w_dirichlet * 1/(1 + |e_i - e_q|)
    where e is the raw Rayleigh-Dirichlet energy of the item/query against the
    stored feature Laplacian.  (The reference engine's exact formula is
    closed-source; this keeps its documented structure: "lambda proximity +
    Rayleigh-Dirichlet smoothness", src/lib.rs:221-231.)
    """
    prox_l = 1.0 / (1.0 + jnp.abs(lambdas - lam_q))
    prox_e = 1.0 / (1.0 + jnp.abs(e_raw - e_q))
    score = w_lambda * prox_l + w_dirichlet * prox_e
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals
