"""EnergyMaps — the cosine-free (energy-only) index pipeline.

Behavioral equivalent of the reference engine's `EnergyMapsBuilder`
(reference src/lib.rs:303-376; parameter semantics documented at
lib.rs:309-331).  The engine crate is closed-source; the observable contract
is:

  * compress the corpus to ~optical_tokens centroids ("optical" compression;
    observed 313,841 items -> 120 graph nodes with optical_tokens=40,
    reference tests/output/1761239603_v0_18_energymaps_9_fixed/test_results.txt:44),
  * diffusion smoothing over the centroid graph (eta step size, steps
    iterations) — over-smoothing degrades retrieval (the recorded sweep's
    worst config is the largest eta x steps, BASELINE.md),
  * dispersion-quantile splitting (split_quantile, split_tau),
  * trimmed binning (trim_quantile),
  * energy-feature edge weights (w_lambda, w_disp, w_dirichlet) and a
    candidate pool size (candidate_m) for search routing,
  * edges are weighted purely by energy features — no cosine anywhere.

TPU-first design notes:
  * centroid compression is seeded Lloyd k-means (reduction/pipeline.py) —
    one [N,F]x[F,K] matmul per iteration on the MXU;
  * diffusion is `steps` applications of C <- C - eta * D^-1 L C over the
    centroid k-NN graph (dense [K,K] x [K,F] matmuls; K is O(100));
  * splitting: the top split_quantile fraction of centroids by
    member-dispersion is replaced by 3 nodes each — the centroid and two
    copies offset by ±split_tau along its dominant member-residual
    direction (power iteration).  The default 0.9 splits the top ~90% of
    centroids: 40 optical tokens -> 112 graph nodes (36 of 40 split; the
    reference's recorded 313k run shows 120, i.e. all 40 split — its
    quantile semantics there are saturated; this implementation keeps
    the documented "top split_quantile fraction" semantics, a documented
    behavior-level deviation of 8 nodes);
  * trimmed binning: per-centroid energy statistics drop the top
    trim_quantile fraction of member distances before stats are computed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.laplacian import GraphLaplacian
from ..core.params import EnergyParams, GraphParams
from ..core.space import ArrowSpace
from ..graph.build import validate_items, _pick_dtype
from ..graph.feature import build_feature_laplacian
from ..ops.distance import unit_normalize
from ..ops.rayleigh import dispersion_batch, rayleigh_batch
from ..ops.symmetrize import symmetrize_to_ell
from ..reduction import reduce_corpus
from ..reduction.pipeline import select_k
from ..spectral.taumode import TAU_MIX, derive_tau_star, synthesize
from ..utils.debug import dbg_println, phase, reset_phase_timings
from ..utils.logging import get_logger

log = get_logger("energymaps")


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d2 = (jnp.sum(a * a, axis=1)[:, None] + jnp.sum(b * b, axis=1)[None, :]
          - 2.0 * jnp.matmul(a, b.T, preferred_element_type=a.dtype))
    return jnp.maximum(d2, 0.0)


def _centroid_knn_graph(c: jnp.ndarray, k: int):
    """Dense k-NN graph over centroids (Euclidean), kernel-weighted with an
    adaptive sigma = median kept distance.  Returns (w [K,K], lap [K,K])."""
    kk = max(1, min(k, c.shape[0] - 1))
    d2 = _pairwise_sq_dists(c, c)
    d = jnp.sqrt(d2)
    d = jnp.where(jnp.eye(c.shape[0], dtype=bool), jnp.inf, d)
    _, nbr = jax.lax.top_k(-d, kk)
    kdim = c.shape[0]
    mask = jnp.zeros((kdim, kdim), dtype=bool)
    rows = jnp.broadcast_to(jnp.arange(kdim)[:, None], (kdim, kk))
    mask = mask.at[rows.reshape(-1), nbr.reshape(-1)].set(True)
    mask = mask | mask.T
    kept = jnp.where(mask, d, jnp.nan)
    sigma = jnp.nanmedian(kept)
    sigma = jnp.where(jnp.isfinite(sigma) & (sigma > 0), sigma, 1.0)
    w = jnp.where(mask, 1.0 / (1.0 + (d / sigma) ** 2), 0.0)
    lap = jnp.diag(jnp.sum(w, axis=1)) - w
    return w, lap


@functools.partial(jax.jit, static_argnames=("steps",))
def _diffuse(c: jnp.ndarray, lap: jnp.ndarray, deg: jnp.ndarray,
             eta: float, steps: int) -> jnp.ndarray:
    """steps of explicit-Euler heat diffusion: C <- C - eta * L C.

    Deliberately UNNORMALIZED, like a textbook explicit heat step: eta is
    a true step size with a stability limit eta < 2/lambda_max(L)
    (lambda_max ~ 2*max_degree, i.e. roughly 8-16 for the kernel-weighted
    centroid k-NN graph).  Small eta denoises the energy map; eta*steps
    past the stability limit amplifies the high-frequency modes and the
    map degenerates — reproducing the reference's recorded sweep shape
    (best configs in the low-eta region, degenerate rows at high
    eta x steps, e.g. eta=0.1/steps=8 -> nDCG 0.0,
    tests/output/1761234699_v0_18_energymaps_8_sweep/diffusion_sweep_results.csv)."""
    del deg  # kept for signature stability (persisted-index rebuild paths)

    def step(cc, _):
        cc = cc - eta * jnp.matmul(lap, cc,
                                   preferred_element_type=cc.dtype)
        return cc, None

    c, _ = jax.lax.scan(step, c, None, length=steps)
    return c


def _member_stats(x: jnp.ndarray, centroids: jnp.ndarray,
                  assignments: jnp.ndarray, trim_quantile: float):
    """Per-centroid dispersion (mean trimmed member distance) and dominant
    residual direction (one power-iteration step on the member residuals)."""
    k = centroids.shape[0]
    resid = x - centroids[assignments]
    dist = jnp.linalg.norm(resid, axis=1)
    # Trimmed binning: zero-weight members above the per-corpus
    # (1 - trim_quantile) distance quantile (reference trim_quantile default
    # 0.1 trims the top decile of each bin).
    cutoff = jnp.quantile(dist, 1.0 - trim_quantile)
    wgt = (dist <= cutoff).astype(x.dtype)
    cnt = jax.ops.segment_sum(wgt, assignments, num_segments=k)
    disp = jax.ops.segment_sum(wgt * dist, assignments, num_segments=k)
    disp = jnp.where(cnt > 0, disp / jnp.maximum(cnt, 1.0), 0.0)
    # Dominant residual direction per centroid: v_k ∝ sum_i r_i (r_i . u)
    # with u a fixed probe vector — a single power-iteration step, batched.
    u = jnp.ones((x.shape[1],), dtype=x.dtype) / jnp.sqrt(x.shape[1])
    proj = jnp.matmul(resid, u, preferred_element_type=x.dtype)
    v = jax.ops.segment_sum(resid * (wgt * proj)[:, None], assignments,
                            num_segments=k)
    vnorm = jnp.linalg.norm(v, axis=1, keepdims=True)
    v = jnp.where(vnorm > 0, v / jnp.maximum(vnorm, 1e-12), 0.0)
    return disp, v


@dataclasses.dataclass
class EnergyMaps:
    """Energy-node table attached to an energy-built ArrowSpace."""

    nodes: jnp.ndarray          # [M, F] energy-node coordinates
    node_lambda: jnp.ndarray    # [M]
    node_disp: jnp.ndarray      # [M]
    node_dirichlet: jnp.ndarray # [M]
    node_centroid: jnp.ndarray  # [M] int32 source-centroid id
    candidate_m: int


def build_energy_maps(items, ep: EnergyParams, gp: GraphParams
                      ) -> tuple[ArrowSpace, GraphLaplacian]:
    """Full energy-only build (reference call stack SURVEY.md §3.3)."""
    reset_phase_timings()
    arr = validate_items(items)
    dtype = _pick_dtype(arr)
    x = jnp.asarray(arr, dtype=dtype)
    n, f = x.shape
    stored = unit_normalize(x) if gp.normalise else x

    # 1. Optical compression: k-means to ~optical_tokens centroids.
    with phase("energy_compress"):
        # Energy builds pass a fixed 0.35 reduction tolerance, not the graph
        # eps (reference src/lib.rs:358-359).
        k0 = ep.optical_tokens if ep.optical_tokens is not None else select_k(
            n, 0, eps_hint=0.35)
        k0 = max(2, min(k0, n))
        red = reduce_corpus(stored, seed=gp.seed, k_clusters=k0)
        centroids, assignments = red.centroids, red.assignments
        # reduce_corpus samples before clustering and clamps K to the
        # sample size; the pipeline must use the ACTUAL centroid count
        # (tiny corpora: n=3, keep 0.6 -> 2 centroids from k0=3).
        k0 = int(centroids.shape[0])
    msg = f"energy: compressed {n} items -> {k0} optical tokens"
    dbg_println(msg)
    log.debug(msg)

    # 2. Diffusion smoothing over the centroid graph.
    with phase("energy_diffuse"):
        w_c, lap_c = _centroid_knn_graph(centroids, ep.neighbor_k)
        centroids = _diffuse(centroids, lap_c, jnp.sum(w_c, axis=1),
                             ep.eta, ep.steps)

    # 3. Dispersion-quantile splitting -> energy nodes.  split_quantile is
    # the FRACTION of centroids eligible to split (threshold at the
    # (1 - split_quantile) dispersion quantile): the default 0.9 splits the
    # top 90%, reproducing the observed ~3x node growth (optical_tokens=40
    # -> 120 graph nodes in the reference's recorded 313k run).
    with phase("energy_split"):
        disp, vdir = _member_stats(stored, centroids, assignments,
                                   ep.trim_quantile)
        thresh = jnp.quantile(disp, 1.0 - ep.split_quantile)
        split = np.asarray(disp >= thresh)
        scale = np.asarray(disp)[:, None]
        c_np = np.asarray(centroids)
        v_np = np.asarray(vdir)
        nodes = [c_np]
        node_src = [np.arange(k0, dtype=np.int32)]
        off = ep.split_tau * np.maximum(scale, 1e-12) * v_np
        for sign in (+1.0, -1.0):
            nodes.append((c_np + sign * off)[split])
            node_src.append(np.arange(k0, dtype=np.int32)[split])
        nodes = jnp.asarray(np.concatenate(nodes, axis=0), dtype=dtype)
        node_src = jnp.asarray(np.concatenate(node_src))
    m = int(nodes.shape[0])
    dbg_println(f"energy: split {int(split.sum())} high-dispersion tokens "
                f"-> {m} graph nodes")

    # 4. Per-node and per-item energy features against the feature Laplacian
    #    of the diffused signals.
    with phase("energy_features"):
        k_f = gp.topk
        w_f, lap_f, _ = build_feature_laplacian(nodes, k_f=k_f)
        e_nodes = rayleigh_batch(nodes, lap_f, normalized=False)
        g_nodes = dispersion_batch(nodes, w_f, e_nodes)
        e_items = rayleigh_batch(stored, lap_f, normalized=False)
        tau_star = derive_tau_star(e_items, gp.synthesis, gp.tau_fixed)
        g_items = dispersion_batch(stored, w_f, e_items)
        lam_items = synthesize(e_items, g_items, tau_star, TAU_MIX)
        lam_nodes = synthesize(e_nodes, g_nodes, tau_star, TAU_MIX)
        disp_nodes = disp[node_src]

    # 5. Energy-feature edge weights: distance is a pure energy blend —
    #    no cosine (reference lib.rs:303-331).
    with phase("energy_graph"):
        d_energy = (ep.w_lambda * jnp.abs(lam_nodes[:, None]
                                          - lam_nodes[None, :])
                    + ep.w_disp * jnp.abs(disp_nodes[:, None]
                                          - disp_nodes[None, :])
                    + ep.w_dirichlet * jnp.abs(e_nodes[:, None]
                                               - e_nodes[None, :]))
        d_energy = jnp.where(jnp.eye(m, dtype=bool), jnp.inf, d_energy)
        kk = max(1, min(ep.neighbor_k, m - 1))
        nd, ni = jax.lax.top_k(-d_energy, kk)
        nd = -nd
        w_e = 1.0 / (1.0 + nd)
        nbr_idx, nbr_w, degrees, n_dropped = symmetrize_to_ell(
            ni.astype(jnp.int32), w_e, 2 * kk)
    gl_energy = GraphLaplacian._from_ell(nbr_idx, nbr_w, degrees, gp,
                                         n_dropped=int(n_dropped))

    emaps = EnergyMaps(nodes=nodes, node_lambda=lam_nodes,
                       node_disp=disp_nodes, node_dirichlet=e_nodes,
                       node_centroid=node_src, candidate_m=ep.candidate_m)
    aspace = ArrowSpace._from_build(
        data=stored, data_unit=unit_normalize(x), lambdas=lam_items,
        e_raw=e_items, lap_f=lap_f, w_f=w_f, tau_star=tau_star, params=gp,
        rayleigh_normalized=False, tau_mix=TAU_MIX,
        centroids=centroids, assignments=assignments)
    aspace._energy_maps = emaps
    return aspace, gl_energy
