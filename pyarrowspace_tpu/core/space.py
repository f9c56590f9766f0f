"""ArrowSpace — the built index: item data, per-item synthetic lambdas, and
the stored feature-space spectral state used to score queries.

API parity with the reference's `PyArrowSpace` wrapper (reference
src/lib.rs:64-263): builder-only construction; `nitems`, `nfeatures`,
`get_item(idx) -> (np.ndarray float64, float)`, `lambdas() -> np.ndarray`,
`search(query, gl, tau)`, `search_hybrid(query, gl, tau)`,
`search_energy(query, gl, k, w_lambda=None, w_dirichlet=None)` — all returning
lists of (index, score) sorted by descending score.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .laplacian import GraphLaplacian
from .params import GraphParams
from ..ops import search as search_ops
from ..ops.distance import unit_normalize
from ..ops.rayleigh import rayleigh_batch, dispersion_batch
from ..spectral.taumode import synthesize
from ..utils.debug import dbg_println
from ..utils.logging import get_logger

log = get_logger("serving")

_BUILDER_TOKEN = object()

# Certified serving: below this base certification rate, bound-ordered
# widening is skipped and refusals escalate straight to the exact scan —
# re-probing a near-fully-refused batch through multiple probe doublings
# costs more than the scan it tries to avoid (see _certified_finalize).
_WIDEN_MIN_CERT_RATE = 0.25


class ArrowItem:
    """A single (features, lambda) pair (reference core::ArrowItem)."""

    __slots__ = ("item", "lambda_")

    def __init__(self, item: np.ndarray, lambda_: float):
        self.item = np.asarray(item, dtype=np.float64)
        self.lambda_ = float(lambda_)


class ArrowSpace:
    def __init__(self, *args, **kwargs):
        # Parity: reference src/lib.rs:71-76 rejects direct construction.
        if kwargs.get("_token") is not _BUILDER_TOKEN:
            raise ValueError(
                "ArrowSpace cannot be constructed directly; "
                "use ArrowSpaceBuilder.build"
            )
        self._data: jnp.ndarray = kwargs["data"]          # [N, F] stored items
        self._data_unit: jnp.ndarray = kwargs["data_unit"]  # [N, F] unit rows
        self._lambdas: jnp.ndarray = kwargs["lambdas"]    # [N]
        self._e_raw: jnp.ndarray = kwargs["e_raw"]        # [N] Dirichlet energy
        # [N] RAW x^T L_f x, kept separately when rayleigh_normalized=True
        # (then _e_raw holds Rayleigh QUOTIENTS, which the residual-Dirichlet
        # identity in the energy kernels cannot use — ADVICE r4).
        self._e_un: Optional[jnp.ndarray] = kwargs.get("e_un")
        self._lap_f: jnp.ndarray = kwargs["lap_f"]        # [F, F] feature Lap.
        self._w_f: jnp.ndarray = kwargs["w_f"]            # [F, F] feature wts
        self._tau_star: jnp.ndarray = kwargs["tau_star"]  # scalar
        self._params: GraphParams = kwargs["params"]
        self._rayleigh_normalized: bool = kwargs.get("rayleigh_normalized",
                                                     False)
        from ..spectral.taumode import TAU_MIX
        self._tau_mix: float = kwargs.get("tau_mix", TAU_MIX)
        # Optional reduction / energy artifacts (set by the energy builder).
        self._centroids: Optional[jnp.ndarray] = kwargs.get("centroids")
        self._assignments: Optional[jnp.ndarray] = kwargs.get("assignments")
        # Directed k-NN candidates from the build scan ([N, k] each, the
        # pre-symmetrize state).  Kept so ArrowSpaceBuilder.extend can
        # append items without redoing the O(N_old^2 F) corpus scan.
        self._knn_dist: Optional[jnp.ndarray] = kwargs.get("knn_dist")
        self._knn_idx: Optional[jnp.ndarray] = kwargs.get("knn_idx")

    @classmethod
    def _from_build(cls, **kwargs) -> "ArrowSpace":
        return cls(_token=_BUILDER_TOKEN, **kwargs)

    # -- reference API --------------------------------------------------------
    @property
    def nitems(self) -> int:
        return int(self._data.shape[0])

    @property
    def nfeatures(self) -> int:
        return int(self._data.shape[1])

    def get_item(self, idx: int) -> tuple[np.ndarray, float]:
        """(features float64, lambda) for item idx
        (parity: reference src/lib.rs:100-124, ValueError on out-of-range)."""
        if idx >= self.nitems or idx < 0:
            raise ValueError(f"index {idx} out of range [0, {self.nitems})")
        feats = np.asarray(self._data[idx], dtype=np.float64)
        return feats, float(self._lambdas[idx])

    def lambdas(self) -> np.ndarray:
        """Per-item synthetic lambdas as float64 (reference lib.rs:126-128)."""
        return np.asarray(self._lambdas, dtype=np.float64)

    def prepare_query_item(self, query: jnp.ndarray,
                           gl: GraphLaplacian) -> float:
        """Synthetic lambda of a query vector against the stored feature
        Laplacian (reference engine `prepare_query_item`; math TAUMODE.md)."""
        q = jnp.asarray(query, dtype=self._data.dtype).reshape(1, -1)
        e_un = rayleigh_batch(q, self._lap_f, normalized=False)
        e_raw = e_un
        if self._rayleigh_normalized:
            e_raw = rayleigh_batch(q, self._lap_f, normalized=True)
        g = dispersion_batch(q, self._w_f, e_un)
        lam = synthesize(e_raw, g, self._tau_star, self._tau_mix)
        return float(lam[0])

    def _energies_raw(self) -> jnp.ndarray:
        """Per-item RAW Dirichlet energies x^T L_f x — what every energy
        kernel's residual identity D(q,x) = e_q + e_x - 2 q^T L x needs.
        With rayleigh_normalized=False this IS _e_raw; with True, _e_raw
        holds normalized quotients, so the raw energies ride separately
        (build/persist) or are recomputed once here (one [N,F]x[F,F]
        matmul) for indexes saved before they were stored (ADVICE r4:
        mixing a raw e_q with normalized item energies silently degrades
        energy rankings)."""
        if not self._rayleigh_normalized:
            return self._e_raw
        if self._e_un is None:
            self._e_un = rayleigh_batch(self._data, self._lap_f,
                                        normalized=False)
        return self._e_un

    def _check_query(self, query) -> np.ndarray:
        v = np.asarray(query, dtype=np.float64).reshape(-1)
        if v.shape[0] != self.nfeatures:
            raise ValueError(
                f"query length {v.shape[0]} must match nfeatures "
                f"{self.nfeatures}")
        return v

    def _search_single(self, query, gl: GraphLaplacian, tau: float,
                       kernel, check_lambda: bool
                       ) -> list[tuple[int, float]]:
        v = self._check_query(query)
        lam_q = self.prepare_query_item(v, gl)
        if check_lambda:
            # Loud-failure parity (reference lib.rs:156-159): degenerate
            # query lambda OR a degenerate (edgeless) signal graph — the
            # reference's observed collapse mode when eps/magnitude are
            # mismatched (BASELINE.md cross-scale failure rows).
            # Explicit raise (not a bare assert) so the check survives
            # `python -O`, matching the reference's unconditional assert_ne!.
            if lam_q == 0.0 or gl.nedges == 0:
                raise AssertionError(
                    "The lambdas are zero, check the magnitude of items "
                    "and eps.")
        dbg_println(f"search: qlen={v.shape[0]}, lambda_q={lam_q:.6f}")
        topk = min(gl.params.topk, self.nitems)
        q = jnp.asarray(v, dtype=self._data.dtype)
        idx, vals = kernel(
            self._data_unit, self._lambdas, q,
            jnp.asarray(lam_q, dtype=self._data.dtype),
            jnp.asarray(tau, dtype=self._data.dtype), topk)
        return [(int(i), float(s)) for i, s in zip(np.asarray(idx),
                                                   np.asarray(vals))]

    def search(self, query, gl: GraphLaplacian, tau: float
               ) -> list[tuple[int, float]]:
        """Lambda-aware search (parity: reference src/lib.rs:132-174).

        Returns graph_params.topk results as (index, score) descending.
        tau is the blend: score = tau*cos + (1-tau)*lambda-proximity.
        """
        return self._search_single(query, gl, tau,
                                   search_ops.lambda_aware_topk,
                                   check_lambda=True)

    def search_hybrid(self, query, gl: GraphLaplacian, tau: float
                      ) -> list[tuple[int, float]]:
        """Hybrid lambda-aware search (reference src/lib.rs:182-219; no
        zero-lambda assert on this path, matching the reference)."""
        return self._search_single(query, gl, tau, search_ops.hybrid_topk,
                                   check_lambda=False)

    def search_energy(self, query, gl: GraphLaplacian, k: int,
                      w_lambda: Optional[float] = None,
                      w_dirichlet: Optional[float] = None
                      ) -> list[tuple[int, float]]:
        """Energy-only search, no cosine (parity: reference
        src/lib.rs:221-262; defaults w_lambda=1.0, w_dirichlet=0.5)."""
        v = self._check_query(query)
        w_l = 1.0 if w_lambda is None else float(w_lambda)
        w_d = 0.5 if w_dirichlet is None else float(w_dirichlet)
        dbg_println(
            f"search_energy: qlen={v.shape[0]}, k={k}, w_λ={w_l:.2f}, "
            f"w_D={w_d:.2f}")
        q = jnp.asarray(v, dtype=self._data.dtype).reshape(1, -1)
        e_q = rayleigh_batch(q, self._lap_f, normalized=False)
        g_q = dispersion_batch(q, self._w_f, e_q)
        lam_q = synthesize(
            e_q if not self._rayleigh_normalized
            else rayleigh_batch(q, self._lap_f, normalized=True),
            g_q, self._tau_star, self._tau_mix)
        k_eff = min(int(k), self.nitems)
        routed = self._search_energy_routed(q, lam_q, e_q, w_l, w_d, k_eff)
        if routed is not None:
            idx_r, vals_r = routed
            # Width check first: the routed pool can be narrower than k_eff
            # (min(topk, pool) results), in which case the [:k_eff] slice
            # silently no-ops and the >=0 check alone would accept a short
            # result (ADVICE r2).
            if idx_r.shape[1] >= k_eff and np.all(
                    np.asarray(idx_r[0, :k_eff]) >= 0):
                return [(int(i), float(s))
                        for i, s in zip(np.asarray(idx_r[0]),
                                        np.asarray(vals_r[0]))]
            # Fewer valid candidates than k -> exact fallback below.
        idx, vals = search_ops.energy_topk(
            self._data, self._lambdas, self._energies_raw(), self._lap_f,
            q[0],
            lam_q[0], e_q[0], self._tau_star,
            jnp.asarray(w_l, dtype=self._data.dtype),
            jnp.asarray(w_d, dtype=self._data.dtype), k_eff)
        return [(int(i), float(s)) for i, s in zip(np.asarray(idx),
                                                   np.asarray(vals))]

    def _energy_routing(self):
        """Lazily built centroid->member bucket table for the device-side
        energy routing (same padded-inverted-list layout as ops/ivf.py),
        plus each tail item's centroid id for its cell term."""
        rt = getattr(self, "_energy_routing_cache", None)
        if rt is None:
            from ..ops.ivf import build_ivf
            ivf = build_ivf(self._centroids, self._assignments, self.nitems,
                            capacity_factor=2.0)
            rt = (ivf.buckets, ivf.tail)
            self._energy_routing_cache = rt
        return rt

    def _search_energy_routed(self, q, lam_q, e_q, w_l: float, w_d: float,
                              k_eff: int):
        """Candidate-pool routing (reference src/lib.rs:311-323), one
        device program per batch (VERDICT: no per-query host np.unique /
        np.isin).  Returns (idx [Q,k], vals [Q,k]) or None when the space
        has no energy maps."""
        emaps = getattr(self, "_energy_maps", None)
        if emaps is None or self._assignments is None:
            return None
        buckets, tail = self._energy_routing()
        # candidate_m counts NODES (reference pool semantics); dedup to
        # centroids happens inside energy_routed_topk_batch.
        probe = min(emaps.candidate_m, int(emaps.nodes.shape[0]))
        # Candidate pool per query = probe * bucket_cap + tail; the scoring
        # gather materializes [Qc, M, F], so chunk queries to keep it under
        # ~512 MB (at 313k scale the pool alone is ~10^5 items/query).
        m_pool = probe * int(buckets.shape[1]) + int(tail.shape[0])
        budget = 512 * 1024 * 1024
        qc = max(1, budget // max(1, m_pool * self.nfeatures * 4))
        nq = q.shape[0]
        if nq <= qc:
            chunks = [(q, lam_q, e_q)]
        else:
            chunks = [(q[s:s + qc], lam_q[s:s + qc], e_q[s:s + qc])
                      for s in range(0, nq, qc)]
        outs = [search_ops.energy_routed_topk_batch(
                    self._data, self._lambdas, self._energies_raw(),
                    emaps.nodes,
                    emaps.node_lambda, emaps.node_dirichlet,
                    emaps.node_centroid, self._lap_f, self._tau_star,
                    buckets, tail, qs, lams, es,
                    jnp.asarray(w_l, dtype=self._data.dtype),
                    jnp.asarray(w_d, dtype=self._data.dtype),
                    probe=probe, topk=k_eff)
                for qs, lams, es in chunks]
        if len(outs) == 1:
            return outs[0]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    # -- TPU-native extras ----------------------------------------------------
    def _resolve_slab_dtype(self):
        """Blocked-slab scan dtype: explicit enable_ivf choice wins, then
        the ARROWSPACE_IVF_SLABS env (bf16|f16|f32), else f32 (None).
        Unknown env values raise (a silent f32 fallback would serve a
        different precision than the deployment asked for)."""
        import os

        choice = getattr(self, "_ivf_slab_choice", None)
        if choice is not None:
            return None if choice == jnp.dtype(jnp.float32) else choice
        env = os.environ.get("ARROWSPACE_IVF_SLABS", "").strip().lower()
        if not env:
            return None
        known = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                 "f16": jnp.float16, "float16": jnp.float16,
                 "f32": None, "float32": None}
        if env not in known:
            raise ValueError(
                f"ARROWSPACE_IVF_SLABS={env!r} is not a known slab dtype; "
                "expected one of bf16|bfloat16|f16|float16|f32|float32")
        return known[env]

    def enable_ivf(self, n_clusters: Optional[int] = None,
                   capacity_factor: Optional[float] = None, slab_dtype=None,
                   slab_capacity_factor: Optional[float] = None):
        """Build the IVF routing index for `search_batch(mode="ivf")`.

        Reuses the reduction stage's centroids/assignments when the build
        computed them; otherwise clusters now (seeded).

        slab_dtype sets the blocked-slab scan precision for
        mode="ivf_block"/"certified" (default f32; jnp.bfloat16 halves
        the probe DMA bytes — approximate for ivf_block, still EXACT for
        certified serving via the precision-robust rescored certificate).
        Env override ARROWSPACE_IVF_SLABS=bf16|f16|f32 applies when no
        explicit choice was made here.

        capacity_factor (default 3.0) sizes the cheap [K, cap] postings
        table (mode="ivf"); slab_capacity_factor sizes the [K*cap, F]
        blocked slab array for mode="ivf_block"/"certified" — the
        HBM-expensive one (slab rows = slab_capacity_factor * n, plus
        lane rounding).  When None it follows min(2.0, capacity_factor)
        for an EXPLICIT capacity_factor (so a lean 1.5 — at 1M x 768 the
        factor-2.0 slab is +2 GiB and overflows one chip — reaches the
        slabs), and otherwise keeps the space's current slab factor
        (e.g. one restored by io.load_index), defaulting to 2.0."""
        from ..ops.ivf import build_ivf

        if slab_capacity_factor is not None:
            slab_cf = float(slab_capacity_factor)
        elif capacity_factor is not None:
            slab_cf = min(2.0, float(capacity_factor))
        else:
            slab_cf = float(getattr(self, "_ivf_cap_factor", None) or 2.0)
        if capacity_factor is None:
            capacity_factor = 3.0
        if slab_cf != getattr(self, "_ivf_cap_factor", None):
            self._ivf_blocked = None   # slab layout follows the factor
        self._ivf_cap_factor = slab_cf

        if slab_dtype is not None:
            if jnp.dtype(slab_dtype) != getattr(
                    self, "_ivf_slab_choice", None):
                self._ivf_blocked = None
            self._ivf_slab_choice = jnp.dtype(slab_dtype)

        if self._centroids is None or n_clusters is not None:
            from ..reduction import reduce_corpus
            # reseed_empty: serving-quality clustering — random-init Lloyd
            # merges mixture components (huge covering radii), which wrecks
            # IVF recall at low n_probe and saturates the certification
            # bound (reduction/pipeline.lloyd_reseed docstring).
            red = reduce_corpus(self._data, seed=self._params.seed,
                                keep_rate=1.0, k_clusters=n_clusters,
                                reseed_empty=True)
            # Tighten in UNIT space (the space the slab scan scores in):
            # grow centroids until every covering radius is small enough
            # for the certification bound to discriminate — one fat
            # cluster refuses every certified query
            # (reduction/pipeline.lloyd_tighten).  K may grow past
            # n_clusters on data the reseeding Lloyd cannot separate.
            from ..reduction.pipeline import lloyd_tighten, planned_slab_cap
            cents_u = unit_normalize(jnp.asarray(red.centroids,
                                                 dtype=self._data.dtype))
            self._ivf_cap_plan = planned_slab_cap(self.nitems,
                                                  int(cents_u.shape[0]),
                                                  capacity_factor=slab_cf)
            self._centroids, self._assignments = lloyd_tighten(
                self._data_unit, cents_u, max_size=self._ivf_cap_plan)
            self._ivf_blocked = None   # slab layout follows the clustering
        self._ivf = build_ivf(self._centroids, self._assignments,
                              self.nitems, capacity_factor)
        return self._ivf

    def _ensure_ivf_blocked(self):
        """Build (or rebuild on slab-dtype change) the cluster-contiguous
        blocked-slab index used by mode="ivf_block"/"certified"."""
        from ..ops.pallas.ivf_scan import build_blocked_ivf

        if getattr(self, "_ivf", None) is None:
            self.enable_ivf()
        want_dtype = jnp.dtype(self._resolve_slab_dtype() or jnp.float32)
        if (getattr(self, "_ivf_blocked", None) is not None
                and self._ivf_blocked.slabs.dtype != want_dtype):
            # The env/choice changed after the index was built: a
            # stale-dtype index would silently keep serving the old
            # precision.
            self._ivf_blocked = None
        if getattr(self, "_ivf_blocked", None) is None:
            # min_cap keeps the spill-free guarantee from the size-capped
            # clustering even when tightening grew K.
            self._ivf_blocked = build_blocked_ivf(
                self._data_unit, self._lambdas, self._centroids,
                self._assignments,
                capacity_factor=getattr(self, "_ivf_cap_factor", 2.0),
                min_cap=getattr(self, "_ivf_cap_plan", None),
                slab_dtype=self._resolve_slab_dtype())
        return self._ivf_blocked

    def _ivf_block_dispatch(self, q, tau: float, topk: int, n_probe: int,
                            certify: bool, m_pool, q_block=None,
                            pack_out: bool = False):
        """ASYNC blocked-IVF dispatch (device-resident outputs): the fused
        synthesis + routing + scan (+ certificate) program.  pack_out
        (certify only) returns ONE packed array so the certificate sync
        is a single host pull (pack_certified)."""
        from ..ops.pallas.ivf_scan import blocked_ivf_search_fused

        ivf = self._ensure_ivf_blocked()
        # Reduced-precision slabs + certify: the rescored certificate
        # needs the f32 corpus (original-id order).
        kw = {}
        if certify and ivf.slabs.dtype != jnp.float32:
            kw = dict(
                rescore_corpus=self._data_unit.astype(jnp.float32),
                rescore_lambdas=self._lambdas.astype(jnp.float32))
        return blocked_ivf_search_fused(
            ivf, q, self._lap_f, self._w_f, self._tau_star, tau, topk,
            n_probe=n_probe, q_block=q_block,
            rayleigh_normalized=self._rayleigh_normalized,
            tau_mix=self._tau_mix, certify=certify, m_pool=m_pool,
            pack_out=pack_out and certify, **kw)

    def _certified_finalize(self, queries_np, out, gl, tau, topk_eff: int,
                            n_probe: int, n_widen: int, base_m: int,
                            q_block=None):
        """Widen + escalate a certified ivf_block result to exact results
        (shared by search_batch(mode="certified") and serving_stream so
        the escalation semantics cannot drift).  Returns (idx, vals,
        base_cert_rate); pulling `out` to host is the certificate sync.

        Refusals first WIDEN (bound-ordered deepening: re-probe at
        doubled n_probe, still certified — m_pool doubles with the probe
        list, since pool-condition refusals are fixed by a wider pool,
        not more probes) while a probe round stays well under the exact
        scan's cost; only queries no widening round certifies escalate
        to mode="exact" (NOT "auto": at large N auto picks the
        bf16-selected subtile path, and certified's contract is
        f32-exact everywhere).

        Guardrail: when nearly the WHOLE batch refuses certification
        (certificate collapse, base rate ~0 on a bad seed/batch mix),
        every widening round re-probes the whole batch through doubled
        probe lists and still escalates — measured ~15x slower than just
        paying the exact scan (4.8k QPS vs ~70k at 1M x 768).  Below
        _WIDEN_MIN_CERT_RATE, skip widening and escalate refusals
        directly; results are exact either way.  Moderate refusal rates
        keep widening: a probe round is IVF-cost, far cheaper per query
        than the full exact scan."""
        from ..ops.pallas.ivf_scan import (escalate_uncertified,
                                           unpack_certified,
                                           widen_refusals)

        if isinstance(out, tuple):
            idx = np.asarray(out[0])
            vals = np.asarray(out[1])
            cert = np.asarray(out[2]).astype(bool)
        else:
            # Packed dispatch (pack_certified): ONE host pull is the
            # whole certificate sync.
            idx, vals, cert = unpack_certified(out, topk_eff)
        rate0 = float(cert.mean()) if cert.size else 1.0
        if rate0 >= _WIDEN_MIN_CERT_RATE:
            ivf = self._ivf_blocked
            n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
            n_probe_max = min(n_clusters,
                              self.nitems // max(1, 2 * ivf.cap),
                              n_probe << n_widen)
            idx, vals, cert = widen_refusals(
                idx, vals, cert,
                lambda sel, np2: self.search_batch(
                    queries_np[sel], gl, tau, topk=topk_eff,
                    mode="ivf_block", n_probe=np2, certify=True,
                    m_pool=base_m * max(1, np2 // n_probe),
                    q_block=q_block),
                topk_eff, n_probe, n_probe_max)
        idx, vals = escalate_uncertified(
            idx, vals, cert,
            lambda sel: self.search_batch(queries_np[sel], gl, tau,
                                          topk=topk_eff, mode="exact"),
            topk_eff)
        return idx, vals, rate0

    def _warn_volatile_nprobe(self, n_probe: int):
        """Loud volatility warning (VERDICT r4 #4): at large N, certified
        serving with a shallow probe list is seed/batch VOLATILE — one bad
        clustering-seed/batch mix at 1M x 768 measured np=4 base
        certification ~0 on some batches, so widening fired on every
        batch and throughput collapsed 4.8k QPS vs ~70k (CLAUDE.md
        round-3 measurement; multi-seed floor recorded in
        benchmarks/recorded *cert_seeds).  Results stay exact either way
        (the guardrail reroutes); the warning is about throughput."""
        if n_probe <= 4 and self.nitems >= 262_144:
            log.warning(
                "certified serving with n_probe=%d at N=%d is throughput-"
                "volatile (measured collapse to 4.8k QPS at 1M x 768 on a "
                "bad seed/batch mix — widening re-probes every batch); "
                "deploy n_probe>=8", n_probe, self.nitems)

    def serving_stream(self, gl: GraphLaplacian, tau: float,
                       topk: Optional[int] = None, n_probe: int = 8,
                       n_widen: int = 2, m_pool: Optional[int] = None,
                       depth: int = 4, cert_floor: float = 0.35,
                       floor_patience: int = 2,
                       fallback_mode: str = "auto",
                       q_block: Optional[int] = None,
                       probe_escalations: int = 2):
        """Pipelined certified serving for batch STREAMS (the production
        serving shape): returns a `serving.CertifiedStream` whose
        `submit(queries)` keeps up to `depth` certified dispatches in
        flight, overlapping each batch's certificate sync (a host round
        trip) with the next batches' device execution.  Per-batch results
        match search_batch(mode="certified") exactly; `finish()` returns
        [(idx, vals, base_cert_rate)] in submission order.

        Guardrail ladder: if the base certification rate sits below
        `cert_floor` for `floor_patience` consecutive batches
        (certificate collapse — seed/data dependent, and widening on
        every batch costs ~15x the exact scan), the stream first
        ESCALATES the probe list — doubles n_probe for all later
        batches, up to `probe_escalations` times (one recompile per
        rung; certification rates recover with probe depth: the
        measured np=4 collapse at 1M x 768 certifies ~100% at np=8,
        CLAUDE.md round-3) — and only when the rungs are exhausted
        reroutes later batches to `fallback_mode`: "exact" (strictly
        f32-exact, certified's contract) or "auto" (subtile above the
        ~131k-item crossover — selection exact at the scan dtype with
        f32-rescored scores — else exact).  Escalated batch indices
        are recorded on the stream (`escalated_at`).  Pass
        fallback_mode=None to keep certifying (escalations still
        apply); probe_escalations=0 restores the direct-degrade
        behavior."""
        from ..serving import CertifiedStream

        topk_eff = min(gl.params.topk if topk is None else int(topk),
                       self.nitems)
        base_m = (m_pool if m_pool is not None
                  else max(4 * topk_eff, topk_eff + 6))
        self._warn_volatile_nprobe(n_probe)
        self._ensure_ivf_blocked()

        # Mutable dispatch knobs the collapse-escalation hook bumps; each
        # in-flight batch is finalized with the values it was DISPATCHED
        # with (boxed below), so escalation never mixes probe depths.
        state = {"n_probe": int(n_probe), "m": int(base_m),
                 "rungs": max(0, int(probe_escalations))}

        def dispatch(queries):
            q = jnp.asarray(queries, dtype=self._data.dtype)
            if q.ndim != 2 or q.shape[1] != self.nfeatures:
                raise ValueError(f"queries must be [Q, {self.nfeatures}], "
                                 f"got {q.shape}")
            np_cur, m_cur = state["n_probe"], state["m"]
            out = self._ivf_block_dispatch(
                q, float(tau), topk_eff, np_cur, True, m_cur,
                q_block=q_block, pack_out=True)
            # Start the device->host copy of the packed result NOW: by
            # finalize time the bytes are already on the host and the
            # certificate sync costs ~0 RPCs on the critical path.
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
            return (np.asarray(queries), out, np_cur, m_cur)

        def finalize(_queries, boxed):
            queries_np, out, np_used, m_used = boxed
            return self._certified_finalize(
                queries_np, out, gl, tau, topk_eff, np_used, n_widen,
                m_used, q_block=q_block)

        def on_collapse() -> bool:
            ivf = self._ivf_blocked
            n_clusters = int(ivf.slab_lambdas.shape[0] // ivf.cap)
            np_max = min(n_clusters,
                         max(1, self.nitems // max(1, 2 * ivf.cap)))
            np_cur = state["n_probe"]
            if state["rungs"] <= 0 or np_cur >= np_max:
                return False
            state["rungs"] -= 1
            state["n_probe"] = min(2 * np_cur, np_max)
            state["m"] = base_m * max(1, state["n_probe"] // int(n_probe))
            log.warning(
                "certification collapsed at n_probe=%d: escalating the "
                "probe list to n_probe=%d (%d rung(s) left) before any "
                "fallback degradation", np_cur, state["n_probe"],
                state["rungs"])
            return True

        fb = fb_fin = None
        if fallback_mode is not None:
            if fallback_mode not in ("auto", "exact"):
                raise ValueError("fallback_mode must be 'auto', 'exact', "
                                 f"or None, got {fallback_mode!r}")
            eff_mode = ("subtile" if fallback_mode == "auto"
                        and self.nitems >= 131_072 else "exact")

            def fb(queries):
                # Synchronous inside submit() is fine: degraded batches
                # pay one exact-scan latency, the guardrail's whole point.
                return self.search_batch(queries, gl, tau, topk=topk_eff,
                                         mode=eff_mode)

            def fb_fin(_queries, out):
                return out

        return CertifiedStream(dispatch, finalize, fallback=fb,
                               finalize_fallback=fb_fin, depth=depth,
                               cert_floor=cert_floor,
                               floor_patience=floor_patience,
                               on_collapse=on_collapse)

    def search_hybrid_batch(self, queries, gl: GraphLaplacian, tau: float,
                            topk: Optional[int] = None):
        """Batched hybrid search (multiplicative gate) — TPU-native extra."""
        q = jnp.asarray(queries, dtype=self._data.dtype)
        if q.ndim != 2 or q.shape[1] != self.nfeatures:
            raise ValueError(
                f"queries must be [Q, {self.nfeatures}], got {q.shape}")
        topk = min(gl.params.topk if topk is None else int(topk),
                   self.nitems)
        e_un = rayleigh_batch(q, self._lap_f, normalized=False)
        e_raw = (rayleigh_batch(q, self._lap_f, normalized=True)
                 if self._rayleigh_normalized else e_un)
        g = dispersion_batch(q, self._w_f, e_un)
        lam_q = synthesize(e_raw, g, self._tau_star, self._tau_mix)
        idx, vals = search_ops.hybrid_topk_batch(
            self._data_unit, self._lambdas, q, lam_q,
            jnp.asarray(tau, dtype=self._data.dtype), topk)
        return np.asarray(idx), np.asarray(vals)

    def search_energy_batch(self, queries, gl: GraphLaplacian, k: int,
                            w_lambda: Optional[float] = None,
                            w_dirichlet: Optional[float] = None):
        """Batched energy-only search — TPU-native extra."""
        q = jnp.asarray(queries, dtype=self._data.dtype)
        if q.ndim != 2 or q.shape[1] != self.nfeatures:
            raise ValueError(
                f"queries must be [Q, {self.nfeatures}], got {q.shape}")
        w_l = 1.0 if w_lambda is None else float(w_lambda)
        w_d = 0.5 if w_dirichlet is None else float(w_dirichlet)
        e_q = rayleigh_batch(q, self._lap_f, normalized=False)
        g_q = dispersion_batch(q, self._w_f, e_q)
        # Query lambda from the same energy convention as the item lambdas
        # (normalized quotients when the build used them); e_q itself stays
        # RAW for the residual-Dirichlet term.
        lam_q = synthesize(
            e_q if not self._rayleigh_normalized
            else rayleigh_batch(q, self._lap_f, normalized=True),
            g_q, self._tau_star, self._tau_mix)
        k_eff = min(int(k), self.nitems)
        routed = self._search_energy_routed(q, lam_q, e_q, w_l, w_d, k_eff)
        if (routed is not None and routed[0].shape[1] >= k_eff
                and np.all(np.asarray(routed[0][:, :k_eff]) >= 0)):
            return np.asarray(routed[0]), np.asarray(routed[1])
        idx, vals = search_ops.energy_topk_batch(
            self._data, self._lambdas, self._energies_raw(), self._lap_f, q,
            lam_q, e_q, self._tau_star,
            jnp.asarray(w_l, dtype=self._data.dtype),
            jnp.asarray(w_d, dtype=self._data.dtype), k_eff)
        return np.asarray(idx), np.asarray(vals)

    def search_batch(self, queries, gl: GraphLaplacian, tau: float,
                     topk: Optional[int] = None, mode: str = "exact",
                     n_probe: int = 8, certify: bool = False,
                     n_widen: int = 2, m_pool: Optional[int] = None,
                     q_block: Optional[int] = None):
        """Batched lambda-aware search: queries [Q, F] ->
        (indices [Q, topk] np.int32, scores [Q, topk] np.float32/64).
        The high-QPS serving path (BASELINE.json north-star).

        mode "auto" picks the fastest exact-quality mode by corpus size
        (subtile above the measured ~0.13M-item crossover, else exact);
        "exact" (default) scans the full corpus in one fused dispatch;
        "int8" runs the quantized candidate scan with an exact f32 rescore
        of a 4x-topk pool — served results match the exact scan whenever
        the true top-k survives the pool (measured top-10 overlap >= 0.99
        at 1M x 768).  Its QPS advantage depends on the chip's int8 MXU
        rate: on v5e, Mosaic int8 dot_general measures NO faster than f32
        and the wider candidate merge makes this mode ~25% slower than
        exact — prefer it only on int8-rich parts (v5p/v6e) or
        bandwidth-bound deployments (the int8 corpus is 4x smaller);
        "subtile" runs the block-max routed scan (transposed Pallas
        phase-a + whole-subtile bf16 rescan + f32 rescore): selection is
        EXACT at the scan dtype by the block-max bound, and it is the
        fastest mode at large N (1M x 768: 74.9k QPS vs 41k exact; 512k:
        102.6k vs 64.9k; 262k: 135.4k vs 111.5k; its fixed routing
        stages only amortize above ~0.13M items — measured tie at 131k
        (176k both), "exact" faster below, 229k vs 197k at 65k);
        "ivf" routes through the n_probe nearest clusters per query
        (gather-based, best up to ~10^5 items); "ivf_block" uses the
        cluster-contiguous Pallas slab kernel (block-shared probes,
        large-corpus scale).  ivf modes are approximate; enable_ivf() is
        built on demand;
        "certified" serves EXACT results at IVF cost on routable queries:
        ivf_block + per-query exactness certificates; refusals first
        re-probe at doubled n_probe (up to `n_widen` bound-ordered
        widening rounds, still certified), and only queries no widening
        round certifies escalate to the exact f32 scan (escalation and
        widening batches pad to powers of two to bound recompiles).
        Certification works over bf16 slabs too (enable_ivf(slab_dtype=
        jnp.bfloat16) or ARROWSPACE_IVF_SLABS=bf16 — half the probe DMA
        bytes): the scan pools `m_pool` candidates (default 4*topk), the
        pool is rescored against the f32 corpus (served scores stay
        f32-exact), and the certificate adds a precision-robust pool
        condition; widening doubles the pool with the probe list.

        certify=True (ivf_block only) additionally returns a per-query
        bool [Q]: True means the served top-k PROVABLY equals the exact
        blended-scan top-k (no unprobed cluster's centroid-radius +
        lambda-interval upper bound beats the served kth score) — re-run
        refused queries with a higher n_probe or mode="exact".

        q_block (ivf_block/certified): queries per shared probe list.
        None -> 16 for approximate modes and for certified serving at
        n_probe >= 8 (measured 2026-08-19 at 1M x 768 np=8: 100%
        certified on tightened clusters, +18% pipelined QPS vs 8 —
        recorded 1787159703_cert_profile), but 8 for certified serving
        at n_probe < 8: the probe list is block-shared, and the wide
        block at small n_probe dilutes per-query routing (measured
        2026-08-19 on a 1500x48 mixture at np=4: base cert 0.92 at
        qb=8 vs 0.54 at qb=16 — ops/pallas/ivf_scan.default_q_block).
        Pass 8 explicitly for SMALL or topically diverse batches, where
        16 queries rarely agree on n_probe clusters."""
        if certify and mode != "ivf_block":
            raise ValueError("certify=True requires mode='ivf_block'")
        if mode not in ("auto", "exact", "int8", "subtile", "ivf",
                        "ivf_block", "certified"):
            raise ValueError(f"unknown search mode {mode!r}; expected "
                             "'auto', 'exact', 'int8', 'subtile', 'ivf', "
                             "'ivf_block', or 'certified'")
        if mode == "certified":
            self._warn_volatile_nprobe(n_probe)
            queries_np = np.asarray(queries)
            topk_eff = min(gl.params.topk if topk is None else int(topk),
                           self.nitems)
            base_m = (m_pool if m_pool is not None
                      else max(4 * topk_eff, topk_eff + 6))
            out = self.search_batch(
                queries_np, gl, tau, topk=topk_eff, mode="ivf_block",
                n_probe=n_probe, certify=True, m_pool=base_m,
                q_block=q_block)
            idx, vals, _rate = self._certified_finalize(
                queries_np, out, gl, tau, topk_eff, n_probe, n_widen,
                base_m, q_block=q_block)
            return idx, vals
        if mode == "auto":
            mode = "subtile" if self.nitems >= 131_072 else "exact"
        q = jnp.asarray(queries, dtype=self._data.dtype)
        if q.ndim != 2 or q.shape[1] != self.nfeatures:
            raise ValueError(
                f"queries must be [Q, {self.nfeatures}], got {q.shape}")
        topk = gl.params.topk if topk is None else int(topk)
        topk = min(topk, self.nitems)
        if mode == "int8":
            if getattr(self, "_quantized", None) is None:
                from ..ops.quantize import quantize_rows
                self._quantized = quantize_rows(
                    self._data_unit.astype(jnp.float32))
            xq, scales = self._quantized
            idx, vals = search_ops.fused_query_pipeline_quantized(
                self._data_unit.astype(jnp.float32), xq, scales,
                self._lambdas.astype(jnp.float32),
                self._lap_f.astype(jnp.float32),
                self._w_f.astype(jnp.float32),
                self._tau_star.astype(jnp.float32),
                q.astype(jnp.float32), jnp.float32(tau), topk=topk,
                rescore_m=min(4 * topk, self.nitems),
                rayleigh_normalized=self._rayleigh_normalized,
                tau_mix=self._tau_mix)
            return np.asarray(idx), np.asarray(vals)
        if mode == "subtile":
            from ..ops.pallas.subtile_scan import build_subtile_state
            if getattr(self, "_subtile", None) is None:
                self._subtile = build_subtile_state(
                    self._data_unit.astype(jnp.float32),
                    self._lambdas.astype(jnp.float32))
            st = self._subtile
            idx, vals = search_ops.fused_query_pipeline_subtile(
                st["xu_scan"], st["xu_f32"], st["lambdas"], st["n_real"],
                self._lap_f.astype(jnp.float32),
                self._w_f.astype(jnp.float32),
                self._tau_star.astype(jnp.float32),
                q.astype(jnp.float32), jnp.float32(tau), topk=topk,
                rayleigh_normalized=self._rayleigh_normalized,
                tau_mix=self._tau_mix)
            return np.asarray(idx), np.asarray(vals)
        if mode in ("ivf", "ivf_block"):
            from ..ops.distance import unit_normalize
            if getattr(self, "_ivf", None) is None:
                self.enable_ivf()
            if mode == "ivf_block":
                # One compiled program (synthesis + routing + scan): eager
                # per-op dispatch costs a host round trip each on tunneled
                # runtimes.
                out = self._ivf_block_dispatch(q, float(tau), topk,
                                               n_probe, certify, m_pool,
                                               q_block=q_block,
                                               pack_out=certify)
                if certify:
                    # ONE pull: idx/vals/cert ride a single packed array
                    # (each pull is a full RPC on tunneled runtimes).
                    from ..ops.pallas.ivf_scan import unpack_certified
                    return unpack_certified(out, topk)
                return np.asarray(out[0]), np.asarray(out[1])
            e_un = rayleigh_batch(q, self._lap_f, normalized=False)
            e_raw = (rayleigh_batch(q, self._lap_f, normalized=True)
                     if self._rayleigh_normalized else e_un)
            g = dispersion_batch(q, self._w_f, e_un)
            lam_q = synthesize(e_raw, g, self._tau_star, self._tau_mix)
            from ..ops.ivf import ivf_lambda_search
            idx, vals = ivf_lambda_search(
                self._data_unit, self._lambdas, self._ivf,
                unit_normalize(q), lam_q,
                jnp.asarray(tau, dtype=self._data.dtype),
                n_probe=n_probe, topk=topk)
            return np.asarray(idx), np.asarray(vals)
        # One fused dispatch: query-lambda synthesis + blended scan + top-k.
        idx, vals = search_ops.fused_query_pipeline(
            self._data_unit, self._lambdas, self._lap_f, self._w_f,
            self._tau_star, q, jnp.asarray(tau, dtype=self._data.dtype),
            topk=topk, rayleigh_normalized=self._rayleigh_normalized,
            tau_mix=self._tau_mix)
        return np.asarray(idx), np.asarray(vals)

    def as_serving(self, dtype=None) -> "ArrowSpace":
        """A serving-optimized view: the scanned corpus (unit rows) cast to
        `dtype` (default bfloat16 — 2x MXU rate, f32 accumulation in the
        scan).  Rankings can differ from f32 only on near-ties; build state
        and lambdas keep full precision."""
        import jax.numpy as _jnp
        dtype = dtype or _jnp.bfloat16
        clone = ArrowSpace._from_build(
            data=self._data, data_unit=self._data_unit.astype(dtype),
            lambdas=self._lambdas, e_raw=self._e_raw, e_un=self._e_un,
            lap_f=self._lap_f,
            w_f=self._w_f, tau_star=self._tau_star, params=self._params,
            rayleigh_normalized=self._rayleigh_normalized,
            tau_mix=self._tau_mix, centroids=self._centroids,
            assignments=self._assignments)
        if getattr(self, "_energy_maps", None) is not None:
            clone._energy_maps = self._energy_maps
        return clone

    @property
    def data(self) -> np.ndarray:
        return np.asarray(self._data)

    @property
    def tau_star(self) -> float:
        return float(self._tau_star)

    def spectral_summary(self) -> dict:
        """Eigen-summary of the F x F feature Laplacian (the `with_spectral`
        capability): spectral gap, algebraic connectivity, spectral radius,
        and the full spectrum (F is small, dense eigh on the MXU)."""
        if getattr(self, "_spectral_cache", None) is None:
            evals = np.asarray(jnp.linalg.eigvalsh(self._lap_f))
            evals = np.maximum(evals, 0.0)
            nonzero = evals[evals > 1e-10]
            self._spectral_cache = {
                "eigenvalues": evals,
                "spectral_radius": float(evals[-1]),
                "algebraic_connectivity": float(nonzero[0])
                if nonzero.size else 0.0,
                "spectral_gap": float(nonzero[0]) if nonzero.size else 0.0,
                "n_components": int((evals <= 1e-10).sum()),
            }
        return self._spectral_cache

    @property
    def feature_laplacian(self) -> np.ndarray:
        return np.asarray(self._lap_f)

    def __repr__(self) -> str:
        return (f"ArrowSpace(nitems={self.nitems}, "
                f"nfeatures={self.nfeatures}, tau_star={self.tau_star:.6g})")
