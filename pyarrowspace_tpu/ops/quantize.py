"""Per-row symmetric int8 quantization of the serving corpus.

The exact 1M x 768 f32 scan is MXU-rate-bound (~54 TF/s f32 sustained in
round-1 measurements; 100k QPS at that shape needs ~154 TF/s).  TPU MXUs
run int8 x int8 -> int32 at 2-8x the f32 rate (generation-dependent), so
the high-QPS serving layout stores the unit-normalized corpus as int8 with
one f32 scale per row:

    xq[i]  = round(xu[i] / s_i),   s_i = max|xu[i]| / 127
    cos(q, x_i) ~= (qq . xq[i]) * s_q * s_i

The quantized scan is a CANDIDATE generator: it keeps a top-M pool
(M = rescore_multiple * topk) per query, and ops/search.rescore_candidates
re-scores the pool against the exact f32 corpus, so the served top-k is
f32-exact whenever the true top-k survives into the pool (measured top-10
overlap vs the exact scan >= 0.99 at 1M x 768 — see bench.py BENCH_QPS).

The reference has no quantized path (CPU f64 rayon scan); this is
TPU-native serving engineering on top of the reference's
search_lambda_aware semantics (src/lib.rs:132-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows(xu: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N, F] float rows -> ([N, F] int8, [N] f32 per-row scales).

    Symmetric per-row absmax quantization; rows of zeros get scale 1 so the
    dequantized row is exactly zero."""
    x = xu.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    safe = jnp.where(absmax > 0, absmax, 1.0)
    scale = safe / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale[..., 0]
