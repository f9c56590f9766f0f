"""Standard index-build pipeline (reference call stack SURVEY.md §3.1).

Stages, mirroring the reference engine's observed build stages
(tests/output/1760705545_v0_16/suggested_eps.md:3-10) but mapped to TPU:

  1. validate + ingest (NaN/Inf scan — reference src/helpers.rs:24-46)
  2. unit-normalize items (graph is cosine-based; GRAPH_VARIABLES.md)
  3. [optional] dims-reduction: sample -> TwoNN ID -> K-means centroids
  4. exact eps/k-NN via tiled MXU matmuls + running top-k (never N x N)
  5. symmetrize -> padded-ELL Laplacian
  6. F x F feature-space spectral Laplacian from the signals matrix
  7. per-item taumode lambda synthesis (Median tau by default)

TPU-first deviation from the reference: the reference reduces the corpus
before graph building because exact k-NN is too slow on CPU; on TPU the item
graph is always built over the FULL corpus exactly (better recall at lower
cost), and the reduction stage only feeds the feature-Laplacian signals
matrix and downstream Energy/IVF consumers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.laplacian import GraphLaplacian
from ..core.params import GraphParams
from ..core.space import ArrowSpace
from ..ops.distance import knn_graph_candidates, kernel_weights, unit_normalize
from ..ops.rayleigh import dispersion_batch, rayleigh_batch
from ..ops.symmetrize import symmetrize_to_ell
from ..reduction import reduce_corpus
from ..spectral.taumode import TAU_MIX, derive_tau_star, synthesize
from ..utils.debug import dbg_println, phase, reset_phase_timings
from ..utils.logging import get_logger
from .feature import build_feature_laplacian

log = get_logger("builder")


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    """Engine-internal knobs (calibration surface; defaults are the behavior
    that reproduces the reference's observed outputs — see tests)."""

    # e_raw = x^T L x (False) vs x^T L x / x^T x (True).  False is required
    # for the reference's observed magnitude sensitivity (see ops/rayleigh.py).
    rayleigh_normalized: bool = False
    # Mixing weight between bounded energy and dispersion; None -> the
    # calibrated engine constant (spectral/taumode.py TAU_MIX).
    tau_mix: Optional[float] = None
    # Feature-graph k; None -> graph_params.topk (the calibrated policy,
    # see graph/feature.py).
    feature_k: Optional[int] = None
    # Reduction only kicks in at this corpus size (tiny corpora keep full
    # signals; the reference engine also skips its sampling path for toys).
    reduction_min_n: int = 4096
    # Sampling keep-rate for the reduction stage; None -> engine default
    # 0.6 (with_inline_sampling knob).
    sampling_rate: Optional[float] = None
    # k-NN tiling.
    block_rows: int = 1024
    col_tile: int = 2048
    # k-NN backend: "pallas" (fused MXU+select-k kernel, ops/pallas/knn.py),
    # "xla" (lax.top_k per tile), or "auto" (pallas on TPU, xla elsewhere).
    knn_backend: str = "auto"
    # Padded-ELL row width for the symmetrized Laplacian; None -> 2k.
    # The reference's CSR keeps every union edge (unbounded degree,
    # GRAPH_VARIABLES.md:7-10); the ELL layout caps rows and drops the
    # weakest edges of hub rows from BOTH endpoint rows (exact symmetry
    # preserved, count surfaced as gl.n_dropped).
    # tests/test_hub_cap.py quantifies the cap's measured cost.
    ell_width: Optional[int] = None
    # Auto-widen: when the cap binds (n_dropped > 0), re-symmetrize at
    # doubled widths until nothing drops — so a hub-heavy corpus builds
    # the reference's uncapped union graph at defaults instead of
    # silently dropping edges.  None -> on iff ell_width was NOT set
    # explicitly (an explicit width is a user choice).  Escalation stays
    # under an ELL HBM budget (ARROWSPACE_ELL_BUDGET_BYTES, default
    # 2 GiB); a loud warning reports any edges still dropped at the cap.
    ell_auto_widen: Optional[bool] = None


DEFAULT_BUILD_CONFIG = BuildConfig()


def validate_items(items) -> np.ndarray:
    """Ingest validation with reference-identical error text
    (reference src/helpers.rs:24-46).  Device-resident corpora pass
    through without a host round-trip (np.asarray on a jax.Array would
    pull the whole corpus back over the link)."""
    arr = items if isinstance(items, jax.Array) else np.asarray(items)
    if arr.ndim != 2 or arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError("items must be non-empty 2D array")
    n, d = arr.shape
    dbg_println(f"items shape: ({n}, {d})")
    # The NaN/Inf scan's only observable effect is the debug line
    # (reference src/helpers.rs:24-46 counts them to log); skip the ~1 s
    # host pass over large corpora when debug is off.
    from ..utils.debug import debug_enabled
    if debug_enabled():
        dbg_println(
            f"items[0][:5]: {list(np.asarray(arr[0][:5], dtype=float))}")
        nan_cnt = int(np.isnan(arr).sum())
        inf_cnt = int(np.isinf(arr).sum())
        dbg_println(f"NaNs: {nan_cnt}, Infs: {inf_cnt}")
    return arr


def _pick_dtype(arr: np.ndarray) -> np.dtype:
    """f64 end-to-end when x64 is enabled and the input is f64 (reference is
    f64 end-to-end, src/helpers.rs:24); f32 otherwise (TPU fast path)."""
    if arr.dtype == np.float64 and jax.config.jax_enable_x64:
        return np.dtype(np.float64)
    return np.dtype(np.float32)


def _run_symmetrize(i, w, ell_width: int, n: int, k: int, f: int):
    """Symmetrize-stage dispatch (memory-bounded on device, VERDICT r2
    item 4 — the old path predicted an OOM and routed large builds
    through the native host engine).

    Modes (ARROWSPACE_SYMMETRIZE):
      auto / device (default): the fused one-sort op
        (ops/symmetrize.symmetrize_to_ell) for small graphs; the chunked
        row-range op (symmetrize_to_ell_chunked, bit-identical, ~n_chunks
        x lower peak HBM) when the fused sort's ~10 x 2Nk temps would
        crowd a 16 GB chip (n*k > 20M, f >= 512).  Chunk overflow (hub-
        heavy rows) retries with more chunks, then falls back.
      device_fused: always the fused op.
      host: the native OpenMP engine (io/native.symmetrize_host).
    A real device OOM still falls back to the host engine when available.
    """
    import os as _os
    from ..ops.symmetrize import symmetrize_to_ell_chunked
    mode = _os.environ.get("ARROWSPACE_SYMMETRIZE", "auto")

    def host_fallback(reason: str):
        from ..io.native import symmetrize_host
        dbg_println(f"symmetrize: {reason} -> native host engine")
        log.warning("symmetrize fell back to the native host engine (%s)",
                    reason)
        host = symmetrize_host(np.asarray(i), np.asarray(w, np.float64),
                               ell_width)
        if host is None:
            return None
        h_idx, h_w, n_dropped = host
        return (jnp.asarray(h_idx),
                jnp.asarray(h_w.astype(np.asarray(w).dtype)),
                None, n_dropped)

    if mode == "host":
        out = host_fallback("ARROWSPACE_SYMMETRIZE=host")
        if out is None:
            raise RuntimeError(
                "ARROWSPACE_SYMMETRIZE=host but the native engine is "
                "unavailable (no compiler / build failure)")
        nbr_idx, nbr_w, _, n_dropped = out
        return nbr_idx, nbr_w, jnp.sum(nbr_w, axis=1), int(n_dropped)

    large = n * k > 20_000_000 and f >= 512
    use_chunked = mode != "device_fused" and large
    try:
        if use_chunked:
            # Overflow means a row range held more entries than its
            # capacity (cap_factor * rows_per_chunk * k) — a hub-row
            # problem, so the retry must RAISE capacity, not add chunks
            # (more chunks shrink per-chunk capacity proportionally and
            # can never fix a single over-full row).
            for n_chunks, cap_factor in ((16, 3), (16, 12)):
                nbr_idx, nbr_w, degrees, n_dropped, n_over = \
                    symmetrize_to_ell_chunked(i, w, ell_width,
                                              n_chunks=n_chunks,
                                              cap_factor=cap_factor)
                if int(n_over) == 0:
                    return nbr_idx, nbr_w, degrees, int(n_dropped)
                log.warning("chunked symmetrize overflow at n_chunks=%d "
                            "cap_factor=%d (%d entries); retrying",
                            n_chunks, cap_factor, int(n_over))
            raise MemoryError("chunked symmetrize overflow (hub-heavy "
                              "graph exceeds per-chunk capacity)")
        nbr_idx, nbr_w, degrees, n_dropped = symmetrize_to_ell(
            i, w, ell_width)
        return nbr_idx, nbr_w, degrees, int(n_dropped)
    except Exception as e:  # real device OOM / overflow -> host engine
        if ("out of memory" not in str(e).lower()
                and not isinstance(e, MemoryError)):
            raise
        out = host_fallback(f"device symmetrize failed: "
                            f"{str(e).splitlines()[0][:120]}")
        if out is None:
            raise
        nbr_idx, nbr_w, _, n_dropped = out
        return nbr_idx, nbr_w, jnp.sum(nbr_w, axis=1), int(n_dropped)


def symmetrize_auto_widen(run, config: BuildConfig, gp: GraphParams, *,
                          n: int, weight_itemsize: int,
                          width_bound_fn=None):
    """Run a symmetrize stage with the shared hub-cap escalation policy
    (reference parity: the sprs CSR keeps EVERY union edge,
    GRAPH_VARIABLES.md:7-10).  Used by BOTH the single-chip build
    (_assemble_from_knn) and the sharded build (parallel/sharded.py) so
    their graphs stay identical on hub-heavy corpora.

    `run(width)` -> (nbr_idx, nbr_w, degrees, n_dropped).  When the knob
    was left at defaults, `width_bound_fn()` (an upper bound on the max
    union row degree, ops/symmetrize.union_width_bound — one ~100 ms
    histogram) PRE-SIZES the width to a k-multiple bucket so the stage
    runs ONCE even on hub corpora, instead of paying a full doubling
    re-run (~600 ms at 313k).  A doubling loop remains as the backstop
    for the bound being beaten by the budget cap.  Bounded by an ELL HBM
    budget (ARROWSPACE_ELL_BUDGET_BYTES, default 2 GiB) so a
    pathological corpus cannot OOM the build; a loud warning reports any
    edges still dropped at the budget cap."""
    import os as _os
    auto_widen = (config.ell_auto_widen
                  if config.ell_auto_widen is not None
                  else config.ell_width is None)
    budget = int(_os.environ.get("ARROWSPACE_ELL_BUDGET_BYTES", 2 << 30))
    bytes_per = weight_itemsize + 4                   # weight + idx
    width_cap = min(max(n - 1, 1),
                    max(2 * gp.k, budget // (bytes_per * n)))
    ell_width = (config.ell_width if config.ell_width is not None
                 else 2 * gp.k)
    ell_width = min(ell_width, max(n - 1, 1))
    if auto_widen and width_bound_fn is not None:
        need = int(width_bound_fn())
        if need > ell_width:
            # Bucket to a k multiple: bounds compile-cache variety while
            # following the corpus (widths recur across same-k builds).
            step = max(gp.k, 8)
            sized = min(width_cap, -(-need // step) * step)
            if sized > ell_width:
                dbg_println(f"hub presize: union degree bound {need} > "
                            f"ell_width {ell_width}; sizing to {sized}")
                ell_width = sized
    nbr_idx, nbr_w, degrees, n_dropped = run(ell_width)
    if auto_widen and n_dropped > 0:
        while n_dropped > 0 and ell_width < width_cap:
            new_width = min(2 * ell_width, width_cap)
            msg = (f"hub cap dropped {int(n_dropped)} edges at "
                   f"ell_width={ell_width}; widening to {new_width}")
            dbg_println(msg)
            log.info(msg)
            ell_width = new_width
            nbr_idx, nbr_w, degrees, n_dropped = run(ell_width)
        if n_dropped > 0:
            log.warning(
                "hub cap still drops %d edges at the ELL budget cap "
                "(ell_width=%d, ARROWSPACE_ELL_BUDGET_BYTES=%d): the "
                "exported Laplacian is narrower than the reference's "
                "unbounded union graph; raise the budget or pass "
                "BuildConfig(ell_width=...) explicitly",
                int(n_dropped), ell_width, budget)
    return nbr_idx, nbr_w, degrees, n_dropped


def build_standard(items, gp: GraphParams,
                   config: BuildConfig = DEFAULT_BUILD_CONFIG
                   ) -> tuple[ArrowSpace, GraphLaplacian]:
    """Full standard build: (ArrowSpace, GraphLaplacian)."""
    import os
    profile_dir = os.environ.get("ARROWSPACE_PROFILE")
    if profile_dir:
        from ..utils.debug import profile_trace
        with profile_trace(profile_dir):
            return _build_standard_inner(items, gp, config)
    return _build_standard_inner(items, gp, config)


def _build_standard_inner(items, gp: GraphParams,
                          config: BuildConfig = DEFAULT_BUILD_CONFIG
                          ) -> tuple[ArrowSpace, GraphLaplacian]:
    reset_phase_timings()
    arr = validate_items(items)
    dtype = _pick_dtype(arr)
    # Host->device transfer is the dominant build cost on tunneled TPU
    # runtimes; ops/ingest.py streams it in ~64 MB row chunks (2-3x the
    # monolithic jnp.asarray throughput, measured).  Dispatch is async, so
    # the normalize below overlaps with the tail of the transfer.
    with phase("ingest"):
        from ..ops.ingest import ingest_corpus
        x = ingest_corpus(arr, dtype)
    n, f = x.shape
    sigma = gp.sigma_resolved
    cfg_line = (
        f"Build configuration: eps={gp.eps}, k={gp.k}, p={gp.p}, "
        f"sigma={sigma}, normalise={str(gp.normalise).lower()}, "
        f"synthesis={gp.synthesis.name.capitalize()}")
    dbg_println(cfg_line)
    log.debug(cfg_line)

    import os as _os
    suggest_dir = _os.environ.get("ARROWSPACE_SUGGEST_DIR")
    if suggest_dir:
        # Per-build parameter-recommendation artifact (the reference
        # engine's suggested_eps.md, tests/output/1760705545_v0_16/).
        from .suggest import emit_build_suggestions
        emit_build_suggestions(
            x, gp, suggest_dir,
            build_log=[cfg_line,
                       f"ArrowSpace created with {n} items and {f} "
                       "features"])

    # Each phase ends with a device sync so the recorded timings attribute
    # work to the stage that does it (dispatch is async otherwise); the
    # pipeline is sequential, so the syncs cost nothing.
    with phase("normalize"):
        xu = unit_normalize(x)
        xu.block_until_ready()
    stored = xu if gp.normalise else x

    import os as _os
    backend = _os.environ.get("ARROWSPACE_KNN_BACKEND", config.knn_backend)
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                   else "xla")
    with phase("knn"):
        if backend == "pallas":
            from ..ops.pallas.knn import knn_graph_candidates_pallas
            d, i = knn_graph_candidates_pallas(xu, gp.k, gp.eps)
        else:
            from ..ops.distance import knn_graph_candidates_chunked
            d, i = knn_graph_candidates_chunked(xu, gp.k, gp.eps,
                                                col_tile=config.col_tile)
        d.block_until_ready()

    return _assemble_from_knn(stored, xu, d, i, gp, config)


def _assemble_from_knn(stored, xu, d, i, gp: GraphParams,
                       config: BuildConfig
                       ) -> tuple[ArrowSpace, GraphLaplacian]:
    """Everything downstream of the k-NN candidate scan: weights ->
    symmetrize -> reduction -> feature Laplacian -> lambdas.  Shared by
    the standard build and the incremental extend (graph/extend.py) so
    the two paths cannot drift."""
    n, f = stored.shape
    sigma = gp.sigma_resolved
    with phase("weights"):
        w = kernel_weights(d, sigma, gp.p)
        w = jnp.where(i >= 0, w, 0.0)

    with phase("symmetrize"):
        from ..ops.symmetrize import union_width_bound
        nbr_idx, nbr_w, degrees, n_dropped = symmetrize_auto_widen(
            lambda width: _run_symmetrize(i, w, width, n, gp.k, f),
            config, gp, n=n, weight_itemsize=jnp.dtype(w.dtype).itemsize,
            width_bound_fn=lambda: union_width_bound(i))
    gl = GraphLaplacian._from_ell(nbr_idx, nbr_w, degrees, gp,
                                  n_dropped=n_dropped)

    centroids = None
    assignments = None
    signals = stored
    if gp.dims_reduction and n >= config.reduction_min_n:
        with phase("reduction"):
            from ..reduction.pipeline import SAMPLING_KEEP_RATE
            keep = (config.sampling_rate if config.sampling_rate is not None
                    else SAMPLING_KEEP_RATE)
            # The reference threads eps into the reduction stage
            # (with_dims_reduction(true, Some(eps)), src/lib.rs:283), so
            # clustering granularity — and thus the feature-Laplacian
            # signals and every lambda — responds to eps.
            red = reduce_corpus(stored, seed=gp.seed, keep_rate=keep,
                                eps_hint=gp.eps)
            centroids, assignments = red.centroids, red.assignments
            signals = centroids

    with phase("feature_laplacian"):
        k_f = config.feature_k if config.feature_k is not None else gp.topk
        # Reduction path: eps-kernel feature weights (continuous eps
        # response, see graph/feature.laplacian_from_sq_dists); raw-signal
        # path keeps the calibrated binary construction.
        # Clamped: an unclamped eps/10 underflows every Gaussian weight
        # to zero for small-eps protocols (Quora eps=0.5 -> exp(-200)),
        # collapsing all lambdas.
        sig_scale = (float(np.clip(gp.eps / 10.0, 0.25, 4.0))
                     if centroids is not None else None)
        w_f, lap_f, _ = build_feature_laplacian(signals, k_f=k_f,
                                                sigma_scale=sig_scale)

    tau_mix = TAU_MIX if config.tau_mix is None else config.tau_mix
    with phase("lambdas"):
        e_un = rayleigh_batch(stored, lap_f, normalized=False)
        e_raw = (rayleigh_batch(stored, lap_f, normalized=True)
                 if config.rayleigh_normalized else e_un)
        tau_star = derive_tau_star(e_raw, gp.synthesis, gp.tau_fixed)
        g = dispersion_batch(stored, w_f, e_un)
        lambdas = synthesize(e_raw, g, tau_star, tau_mix)
        # Force a real host pull, not just block_until_ready: some tunneled
        # runtimes report readiness before execution completes, which would
        # leak build work past the caller's timer.
        float(lambdas[-1])

    aspace = ArrowSpace._from_build(
        data=stored, data_unit=xu, lambdas=lambdas, e_raw=e_raw,
        e_un=(e_un if config.rayleigh_normalized else None),
        lap_f=lap_f, w_f=w_f, tau_star=tau_star, params=gp,
        rayleigh_normalized=config.rayleigh_normalized, tau_mix=tau_mix,
        centroids=centroids, assignments=assignments,
        knn_dist=d, knn_idx=i)
    dbg_println(
        f"built ArrowSpace: nitems={aspace.nitems}, "
        f"nfeatures={aspace.nfeatures}, lambdas_len={aspace.nitems}")
    return aspace, gl
