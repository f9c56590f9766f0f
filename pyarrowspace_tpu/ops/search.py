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


@functools.partial(jax.jit, static_argnames=("topk", "q_chunk"))
def rescore_candidates(xu: jnp.ndarray, lambdas: jnp.ndarray,
                       qn: jnp.ndarray, lam_q: jnp.ndarray,
                       tau: jnp.ndarray, cand_idx: jnp.ndarray, *,
                       topk: int, q_chunk: int = 512):
    """Exact f32 re-scoring of a quantized scan's candidate pool.

    cand_idx [Q, M] comes from lambda_search_quantized; each query's M
    candidates are re-scored with the exact f32 blend (gathered corpus rows,
    one [qc, M, F] einsum per query chunk so the gather never materializes
    Q x M x F at once).  Returns (idx [Q, topk], scores [Q, topk]) —
    identical to the exact scan whenever the true top-k is in the pool."""
    q, m = cand_idx.shape
    qc = min(q_chunk, q)
    q_pad = ((q + qc - 1) // qc) * qc
    idx_p = jnp.pad(cand_idx, ((0, q_pad - q), (0, 0)), constant_values=-1)
    qn_p = jnp.pad(qn.astype(jnp.float32), ((0, q_pad - q), (0, 0)))
    lamq_p = jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))
    nc = q_pad // qc
    tau32 = tau.astype(jnp.float32)

    def chunk_fn(args):
        idx_c, qn_c, lamq_c = args
        safe = jnp.maximum(idx_c, 0)
        xc = xu.astype(jnp.float32)[safe]              # [qc, M, F] gather
        cos = jnp.einsum("qmf,qf->qm", xc, qn_c,
                         preferred_element_type=jnp.float32)
        prox = 1.0 / (1.0 + jnp.abs(lambdas.astype(jnp.float32)[safe]
                                    - lamq_c[:, None]))
        s = tau32 * cos + (1.0 - tau32) * prox
        s = jnp.where(idx_c >= 0, s, -jnp.inf)
        vals, pos = jax.lax.top_k(s, topk)
        return jnp.take_along_axis(idx_c, pos, axis=1), vals

    idxs, vals = jax.lax.map(chunk_fn, (idx_p.reshape(nc, qc, m),
                                        qn_p.reshape(nc, qc, -1),
                                        lamq_p.reshape(nc, qc)))
    return idxs.reshape(q_pad, topk)[:q], vals.reshape(q_pad, topk)[:q]


@functools.partial(jax.jit,
                   static_argnames=("topk", "rescore_m",
                                    "rayleigh_normalized", "tau_mix"))
def fused_query_pipeline_quantized(
        xu: jnp.ndarray, xq: jnp.ndarray, scales: jnp.ndarray,
        lambdas: jnp.ndarray, lap_f: jnp.ndarray, w_f: jnp.ndarray,
        tau_star: jnp.ndarray, q_batch: jnp.ndarray, tau: jnp.ndarray, *,
        topk: int, rescore_m: int, rayleigh_normalized: bool,
        tau_mix: float):
    """High-QPS serving step: query lambda synthesis + int8 candidate scan
    (MXU int8 rate, ops/pallas/scan_topk.lambda_search_quantized) + exact
    f32 rescore of the top rescore_m pool — one compiled program."""
    from .pallas.scan_topk import lambda_search_quantized
    from .rayleigh import dispersion_batch, rayleigh_batch
    from ..spectral.taumode import synthesize

    e_un = rayleigh_batch(q_batch, lap_f, normalized=False)
    e_raw = (rayleigh_batch(q_batch, lap_f, normalized=True)
             if rayleigh_normalized else e_un)
    g = dispersion_batch(q_batch, w_f, e_un)
    lam_q = synthesize(e_raw, g, tau_star, tau_mix)
    qn = unit_normalize(q_batch.astype(jnp.float32), axis=-1)
    cand_idx, _ = lambda_search_quantized(xq, scales, lambdas, qn, lam_q,
                                          tau, rescore_m)
    return rescore_candidates(xu, lambdas, qn, lam_q, tau, cand_idx,
                              topk=topk)


@functools.partial(jax.jit,
                   static_argnames=("topk", "rayleigh_normalized",
                                    "tau_mix"))
def fused_query_pipeline_subtile(
        xu_scan: jnp.ndarray, xu_f32: jnp.ndarray, lambdas_pad: jnp.ndarray,
        n_real, lap_f: jnp.ndarray, w_f: jnp.ndarray,
        tau_star: jnp.ndarray, q_batch: jnp.ndarray, tau: jnp.ndarray, *,
        topk: int, rayleigh_normalized: bool, tau_mix: float):
    """Highest-QPS serving step: query lambda synthesis + the subtile-max
    routed scan (ops/pallas/subtile_scan) — one compiled program.  The
    state arrays come from build_subtile_state; selection is exact in the
    scan dtype by the block-max bound, scores f32-rescored."""
    from .pallas.subtile_scan import subtile_search
    from .rayleigh import dispersion_batch, rayleigh_batch
    from ..spectral.taumode import synthesize

    e_un = rayleigh_batch(q_batch, lap_f, normalized=False)
    e_raw = (rayleigh_batch(q_batch, lap_f, normalized=True)
             if rayleigh_normalized else e_un)
    g = dispersion_batch(q_batch, w_f, e_un)
    lam_q = synthesize(e_raw, g, tau_star, tau_mix)
    qn = unit_normalize(q_batch.astype(jnp.float32), axis=-1)
    # pool 2x topk: the f32 rescore can promote items past bf16
    # near-ties (keeps served top-k aligned with the exact f32 scan)
    # while the pool cut stays in the cheap scan-extraction regime.
    return subtile_search(xu_scan, xu_f32, lambdas_pad, qn,
                          lam_q.astype(jnp.float32),
                          tau.astype(jnp.float32), n_real, topk=topk,
                          pool_m=2 * topk)


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


def bounded_energy(e: jnp.ndarray, tau_star: jnp.ndarray) -> jnp.ndarray:
    """E' = e / (e + tau*) — the taumode bounding (TAUMODE.md).  The
    energy-search kernels apply this to the RESIDUAL Dirichlet energy
    D(q, x) inline (raw energies are unbounded; bounding puts the
    Dirichlet term on the same (0,1) scale as lambda proximity)."""
    ts = jnp.maximum(tau_star, 1e-10)
    return e / (e + ts)


@functools.partial(jax.jit, static_argnames=("topk",))
def energy_topk_batch(x: jnp.ndarray, lambdas: jnp.ndarray,
                      e_raw: jnp.ndarray, lap_f: jnp.ndarray,
                      q_batch: jnp.ndarray, lam_q: jnp.ndarray,
                      e_q: jnp.ndarray, tau_star: jnp.ndarray,
                      w_lambda: jnp.ndarray, w_dirichlet: jnp.ndarray,
                      topk: int):
    """Batched energy-only ranking — same residual-Dirichlet formula as
    energy_topk (see its docstring): lam_q/e_q are [Q], cross terms via
    one [Q,F]x[F,N] MXU matmul."""
    ts = jnp.maximum(tau_star, 1e-10)
    qL = jnp.matmul(q_batch, lap_f, preferred_element_type=x.dtype)  # [Q,F]
    cross = jnp.matmul(qL, x.T, preferred_element_type=x.dtype)      # [Q,N]
    d = jnp.maximum(e_q[:, None] + e_raw[None, :] - 2.0 * cross, 0.0)
    db = d / (d + ts)
    prox_l = 1.0 / (1.0 + jnp.abs(lambdas[None, :] - lam_q[:, None]))
    score = w_lambda * prox_l + w_dirichlet / (1.0 + db)
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("probe", "topk"))
def energy_routed_topk_batch(x: jnp.ndarray, lambdas: jnp.ndarray,
                             e_items: jnp.ndarray, nodes: jnp.ndarray,
                             node_lambda: jnp.ndarray,
                             node_e: jnp.ndarray,
                             node_centroid: jnp.ndarray,
                             lap_f: jnp.ndarray, tau_star: jnp.ndarray,
                             buckets: jnp.ndarray, tail: jnp.ndarray,
                             q: jnp.ndarray, lam_q: jnp.ndarray,
                             e_q: jnp.ndarray,
                             w_l: jnp.ndarray, w_d: jnp.ndarray, *,
                             probe: int, topk: int):
    """Candidate-pool-routed energy search, fully device-side (one program,
    no host sync inside the query loop — the reference's candidate_m-pool
    routing, src/lib.rs:311-323, expressed as gathers).

    The Rayleigh-Dirichlet term is the residual Dirichlet energy
    D(q, v) = (q-v)^T L_f (q-v) = e_q + e_v - 2 q^T L_f v, bounded
    D' = D/(D + tau*) — no cosine anywhere; L_f is the feature Laplacian
    of the DIFFUSED energy map, so retrieval quality rides on the map:
    a mildly diffused (denoised) map routes and ranks well, an
    over-diffused/diverged one degenerates (the reference's recorded
    sweep shape).

    Routing preserves the reference's pool semantics (ADVICE r2): the
    best `probe` (= candidate_m) NODES per query are selected, then
    deduplicated to their centroids (~candidate_m/3 unique cells after
    dedup — split nodes share a centroid), and those cells' bucket
    members plus the shared overflow tail are scored at ITEM level:

        score(q, a) = w_l / (1 + |lambda_a - lambda_q|)
                    + w_d / (1 + D'(q, x_a))

    The routed item score is the SAME residual-Dirichlet formula as the
    exact fallback (ops.energy_topk — one formula on every path, VERDICT
    r3 item 9): routed results equal the exact scan restricted to the
    candidate pool, and agree with it outright whenever the pool covers
    the true top-k (tests/test_energy.py::
    test_routed_equals_fallback_when_pool_covers).  Callers fall back
    only when the routed pool is narrower than k (core/space.py).

    Returns (idx [Q, topk] — -1 where a query had fewer valid candidates,
    vals).
    """
    nq = lam_q.shape[0]
    ts = jnp.maximum(tau_star, 1e-10)
    qL = jnp.matmul(q.astype(lap_f.dtype), lap_f,
                    preferred_element_type=lap_f.dtype)        # [Q, F]
    cross = jnp.matmul(qL, nodes.T,
                       preferred_element_type=lap_f.dtype)     # [Q, M]
    d_qn = jnp.maximum(e_q[:, None] + node_e[None, :] - 2.0 * cross, 0.0)
    d_qn_b = d_qn / (d_qn + ts)
    d_nodes = (w_l * jnp.abs(node_lambda[None, :] - lam_q[:, None])
               + w_d * d_qn_b)                                 # [Q, M]
    m_nodes = min(probe, d_nodes.shape[1])
    _, node_sel = jax.lax.top_k(-d_nodes, m_nodes)             # [Q, P]
    cent_sel = node_centroid[node_sel]                         # [Q, P]
    # First-occurrence dedup (P is small — O(P^2) mask, no sort): later
    # occurrences of an already-probed centroid contribute no candidates.
    dup = jnp.any((cent_sel[:, :, None] == cent_sel[:, None, :])
                  & jnp.tri(m_nodes, m_nodes, -1,
                            dtype=bool)[None, :, :], axis=2)   # [Q, P]
    cand = jnp.where(dup[:, :, None], -1, buckets[cent_sel])
    cand = cand.reshape(nq, -1)                              # [Q, P*C]
    tailb = jnp.broadcast_to(tail[None, :], (nq, tail.shape[0]))
    cand = jnp.concatenate([cand, tailb], axis=1)
    valid = cand >= 0
    safe = jnp.clip(cand, 0, None)
    xc = x[safe]                                             # [Q, M, F]
    cross_i = jnp.einsum("qf,qmf->qm", qL, xc.astype(qL.dtype),
                         preferred_element_type=qL.dtype)
    d_qa = jnp.maximum(e_q[:, None] + e_items[safe] - 2.0 * cross_i, 0.0)
    d_qa_b = d_qa / (d_qa + ts)
    prox_l = 1.0 / (1.0 + jnp.abs(lambdas[safe] - lam_q[:, None]))
    score = jnp.where(valid,
                      w_l * prox_l + w_d / (1.0 + d_qa_b), -jnp.inf)
    vals, pos = jax.lax.top_k(score, min(topk, score.shape[1]))
    idx = jnp.take_along_axis(cand, pos, axis=1)
    idx = jnp.where(jnp.isfinite(vals), idx, -1)
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
                lap_f: jnp.ndarray, q: jnp.ndarray, lam_q: jnp.ndarray,
                e_q: jnp.ndarray, tau_star: jnp.ndarray,
                w_lambda: jnp.ndarray, w_dirichlet: jnp.ndarray, topk: int):
    """Energy-only ranking — no cosine (reference src/lib.rs:221-262).

    score(q, i) = w_lambda * 1/(1 + |lambda_i - lambda_q|)
                + w_dirichlet * 1/(1 + D'(q, x_i))

    with D(q, x) = (q-x)^T L_f (q-x) = e_q + e_i - 2 q^T L_f x_i the
    RESIDUAL Dirichlet energy (how rough the difference vector is on the
    feature graph) and D' = D/(D + tau*) its taumode bounding.  This is
    the ONE energy formula on every path — exact scan, batched scan,
    sharded scan, and the routed candidate-pool search all score with it
    (VERDICT r3 item 9: no routed-vs-fallback discontinuity).  (The
    reference engine's exact formula is closed-source; this keeps its
    documented structure — "lambda proximity + Rayleigh-Dirichlet
    smoothness", src/lib.rs:221-231 — and the query-item interaction a
    cosine-free ranking needs: |e_i - e_q| self-energy proximity alone
    ranks unrelated items with coincidentally-equal roughness together,
    measured at MRR 0.24 vs 1.0 on the test_8 protocol.)

    e_raw/e_q are the RAW (unnormalized) Dirichlet energies x^T L_f x —
    the residual identity above requires the quadratic form, not the
    Rayleigh quotient.

    f32 precision floor (ADVICE r4): the expanded identity computes a
    near-zero residual as the difference of large terms, so when q ~ x_i
    and raw energies reach ~1e3-1e4 (CVE scale) the true D ~ 0 carries
    ~e * 2^-24 absolute noise before the clamp — among the CLOSEST
    candidates, D' resolves no finer than ~e*2^-24/tau* on TPU f32.
    Ranking impact is confined to near-duplicate ties; the CPU suite
    runs f64 end-to-end and sees none of it.  Deployments that need
    exact near-tie energy ordering at scale should keep f64 inputs with
    jax_enable_x64 (the kernels follow the input dtype)."""
    ts = jnp.maximum(tau_star, 1e-10)
    qL = jnp.matmul(lap_f, q, preferred_element_type=x.dtype)    # [F]
    cross = jnp.matmul(x, qL, preferred_element_type=x.dtype)    # [N]
    d = jnp.maximum(e_q + e_raw - 2.0 * cross, 0.0)
    db = d / (d + ts)
    prox_l = 1.0 / (1.0 + jnp.abs(lambdas - lam_q))
    score = w_lambda * prox_l + w_dirichlet / (1.0 + db)
    vals, idx = jax.lax.top_k(score, topk)
    return idx, vals
