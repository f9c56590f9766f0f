"""Graph-parameter recommendation (eps / sigma / k) from data statistics.

The reference engine emits parameter recommendations during builds
(reference tests/output/1760705545_v0_16/suggested_eps.md): dimension-aware
graph-consistency rates driven by the TwoNN intrinsic dimension d,

    eps(n)   ~ (log n / n)^(2/(d+2))
    sigma(n) ~ (log n / n)^(1/(d+2))
    s(n)     ~ (n / log n)^(1/d)          (neighbor-count rate)

calibrated to the corpus's actual rectified-cosine neighbor-distance scale
(the theoretical rates are unit-free; the observed artifact calibrates
0.0175 -> 1.31 for the 313k corpus).  We calibrate directly: eps is the
90th percentile of the sampled k-NN distance at the recommended k, sigma
keeps the reference's observed sigma/eps ratio (0.535/1.31 ≈ 0.41), and k
is the clamped neighbor rate.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.distance import unit_normalize
from ..reduction.pipeline import twonn_intrinsic_dim
from ..utils.logging import get_logger

log = get_logger("suggest")

SIGMA_EPS_RATIO = 0.41  # observed recommendation ratio (0.535 / 1.31)


def suggest_graph_params(items, sample: int = 4096, seed: int = 42) -> dict:
    """Recommend {eps, sigma, k, intrinsic_dim, rates} for a corpus.

    Samples up to `sample` rows; O(sample^2) pairwise work on-device.
    """
    x = np.asarray(items)
    n, f = x.shape
    rng = np.random.default_rng(seed)
    if n > sample:
        xs = x[rng.choice(n, size=sample, replace=False)]
    else:
        xs = x
    m = xs.shape[0]

    idim, _ = twonn_intrinsic_dim(xs, seed=seed)
    log_n = math.log(max(n, 3))
    rate_eps = (log_n / n) ** (2.0 / (idim + 2))
    rate_sigma = (log_n / n) ** (1.0 / (idim + 2))
    rate_k = (n / log_n) ** (1.0 / max(idim, 1))
    k_rec = int(np.clip(round(rate_k * 0.85), 4, 64))

    # Calibrate eps on the sampled k-th-NN rectified-cosine distances.
    xu = unit_normalize(jnp.asarray(xs))
    sims = jnp.matmul(xu, xu.T, preferred_element_type=xu.dtype)
    d = 1.0 - jnp.maximum(sims, 0.0)
    d = jnp.where(jnp.eye(m, dtype=bool), jnp.inf, d)
    kk = min(k_rec, m - 1)
    import jax
    neg, _ = jax.lax.top_k(-d, kk)
    kth = np.asarray(-neg[:, -1])
    eps_rec = float(np.quantile(kth, 0.90))
    sigma_rec = eps_rec * SIGMA_EPS_RATIO

    # topk ~ 0.6k mirrors the reference protocols' pairings (CVE and
    # MS MARCO both use k=25/topk=15); p=2.0 is the documented default
    # (GRAPH_VARIABLES.md).  The dict is directly buildable:
    # ArrowSpaceBuilder.build(suggest_graph_params(x), x).
    rec = {
        "eps": round(eps_rec, 4),
        "sigma": round(sigma_rec, 4),
        "k": k_rec,
        "topk": max(2, int(round(k_rec * 0.6))),
        "p": 2.0,
        "intrinsic_dim": idim,
        "rates": {"eps": rate_eps, "sigma": rate_sigma, "k": rate_k},
        "n": n,
        "nfeatures": f,
    }
    log.info("suggested params for N=%d F=%d ID=%d: eps=%.4g sigma=%.4g "
             "k=%d", n, f, idim, eps_rec, sigma_rec, k_rec)
    return rec
