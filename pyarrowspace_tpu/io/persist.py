"""Index persistence — build once, serve from a separate job.

The reference has no public save/load of a built index (SURVEY.md §5:
"every run rebuilds"); this fills that gap.  Format: a single .npz with the
arrays {data, data_unit, lambdas, e_raw, lap_f, w_f, tau_star, ELL graph}
plus a JSON-encoded manifest of params — self-contained, mmap-friendly,
no pickle.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..core.laplacian import GraphLaplacian
from ..core.params import GraphParams, TauMode
from ..core.space import ArrowSpace
from ..utils.debug import dbg_println

FORMAT_VERSION = 1


def save_index(path: str, aspace: ArrowSpace, gl: GraphLaplacian) -> None:
    """Serialize a built (ArrowSpace, GraphLaplacian) pair to one .npz."""
    gp = aspace._params
    manifest = {
        "format_version": FORMAT_VERSION,
        "graph_params": {
            "eps": gp.eps, "k": gp.k, "topk": gp.topk, "p": gp.p,
            "sigma": gp.sigma, "normalise": gp.normalise, "seed": gp.seed,
            "synthesis": gp.synthesis.value, "tau_fixed": gp.tau_fixed,
            "dims_reduction": gp.dims_reduction,
            "reduction_eps": gp.reduction_eps,
            "sparsity_check": gp.sparsity_check,
        },
        "rayleigh_normalized": aspace._rayleigh_normalized,
        "tau_mix": aspace._tau_mix,
        "n_dropped": gl.n_dropped_edges,
        # Blocked-slab layout plan (enable_ivf): a loaded index must
        # rebuild the SAME slab layout — min_cap keeps the size-capped
        # clustering's spill-free guarantee, the factor keeps the slab
        # HBM footprint the deployment was sized for.
        "ivf_cap_plan": getattr(aspace, "_ivf_cap_plan", None),
        "ivf_cap_factor": getattr(aspace, "_ivf_cap_factor", None),
    }
    arrays = {
        "data": np.asarray(aspace._data),
        "data_unit": np.asarray(aspace._data_unit),
        "lambdas": np.asarray(aspace._lambdas),
        "e_raw": np.asarray(aspace._e_raw),
        "lap_f": np.asarray(aspace._lap_f),
        "w_f": np.asarray(aspace._w_f),
        "tau_star": np.asarray(aspace._tau_star),
        "nbr_idx": np.asarray(gl.neighbor_indices),
        "nbr_w": np.asarray(gl.neighbor_weights),
        "degrees": np.asarray(gl.degrees),
        "manifest": np.frombuffer(
            json.dumps(manifest).encode("utf-8"), dtype=np.uint8),
    }
    if aspace._rayleigh_normalized:
        # e_raw above holds normalized Rayleigh quotients; the energy
        # kernels also need the RAW x^T L x energies (ADVICE r4).
        arrays["e_un"] = np.asarray(aspace._energies_raw())
    if aspace._centroids is not None:
        arrays["centroids"] = np.asarray(aspace._centroids)
        arrays["assignments"] = np.asarray(aspace._assignments)
    if aspace._knn_dist is not None:
        # Directed k-NN build state — lets a loaded index keep accepting
        # ArrowSpaceBuilder.extend appends.
        arrays["knn_dist"] = np.asarray(aspace._knn_dist)
        arrays["knn_idx"] = np.asarray(aspace._knn_idx)
    emaps = getattr(aspace, "_energy_maps", None)
    if emaps is not None:
        arrays["em_nodes"] = np.asarray(emaps.nodes)
        arrays["em_lambda"] = np.asarray(emaps.node_lambda)
        arrays["em_disp"] = np.asarray(emaps.node_disp)
        arrays["em_dirichlet"] = np.asarray(emaps.node_dirichlet)
        arrays["em_centroid"] = np.asarray(emaps.node_centroid)
        arrays["em_candidate_m"] = np.asarray([emaps.candidate_m])
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # file handle: savez won't append ".npz"
        np.savez(fh, **arrays)
    os.replace(tmp, path)
    dbg_println(f"saved index to {path} "
                f"({os.path.getsize(path) / 1e6:.1f} MB)")


def load_index(path: str) -> tuple[ArrowSpace, GraphLaplacian]:
    """Load an index saved by save_index."""
    z = np.load(path)
    manifest = json.loads(bytes(z["manifest"]).decode("utf-8"))
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"unsupported index format {manifest['format_version']}")
    gpd = manifest["graph_params"]
    gp = GraphParams(
        eps=gpd["eps"], k=gpd["k"], topk=gpd["topk"], p=gpd["p"],
        sigma=gpd["sigma"], normalise=gpd["normalise"], seed=gpd["seed"],
        synthesis=TauMode(gpd["synthesis"]), tau_fixed=gpd["tau_fixed"],
        dims_reduction=gpd["dims_reduction"],
        reduction_eps=gpd["reduction_eps"],
        sparsity_check=gpd["sparsity_check"])
    gl = GraphLaplacian._from_ell(
        jnp.asarray(z["nbr_idx"]), jnp.asarray(z["nbr_w"]),
        jnp.asarray(z["degrees"]), gp, n_dropped=manifest["n_dropped"])
    aspace = ArrowSpace._from_build(
        data=jnp.asarray(z["data"]), data_unit=jnp.asarray(z["data_unit"]),
        lambdas=jnp.asarray(z["lambdas"]), e_raw=jnp.asarray(z["e_raw"]),
        e_un=jnp.asarray(z["e_un"]) if "e_un" in z else None,
        lap_f=jnp.asarray(z["lap_f"]), w_f=jnp.asarray(z["w_f"]),
        tau_star=jnp.asarray(z["tau_star"]), params=gp,
        rayleigh_normalized=manifest["rayleigh_normalized"],
        tau_mix=manifest["tau_mix"],
        centroids=jnp.asarray(z["centroids"]) if "centroids" in z else None,
        assignments=(jnp.asarray(z["assignments"])
                     if "assignments" in z else None),
        knn_dist=jnp.asarray(z["knn_dist"]) if "knn_dist" in z else None,
        knn_idx=jnp.asarray(z["knn_idx"]) if "knn_idx" in z else None)
    if "em_nodes" in z:
        from ..energy.maps import EnergyMaps
        aspace._energy_maps = EnergyMaps(
            nodes=jnp.asarray(z["em_nodes"]),
            node_lambda=jnp.asarray(z["em_lambda"]),
            node_disp=jnp.asarray(z["em_disp"]),
            node_dirichlet=jnp.asarray(z["em_dirichlet"]),
            node_centroid=jnp.asarray(z["em_centroid"]),
            candidate_m=int(z["em_candidate_m"][0]))
    if manifest.get("ivf_cap_plan") is not None:
        aspace._ivf_cap_plan = int(manifest["ivf_cap_plan"])
    if manifest.get("ivf_cap_factor") is not None:
        aspace._ivf_cap_factor = float(manifest["ivf_cap_factor"])
    dbg_println(f"loaded index from {path}: nitems={aspace.nitems}")
    return aspace, gl
