"""Incremental index extension — append items without a full rebuild.

The reference rebuilds from scratch on every run (SURVEY.md §5
checkpoint/resume: "every run rebuilds"); together with io/persist.py this
makes the index a long-lived production artifact: build once, keep
appending.

Exactness contract: `extend_build(aspace, gl, new_items)` returns the same
index as `ArrowSpaceBuilder.build(gp, concat(old_items, new_items))` with
the XLA k-NN backend — bit-identical graph, lambdas, tau_star and search
results (pinned by tests/test_extend.py).  The directed k-NN of the old
rows against the old corpus is reused from the build (ArrowSpace._knn_*),
so the dominant O(N_old^2 F) scan is skipped; only the new-vs-all and
old-vs-new scans run, plus the cheap downstream stages (weights,
symmetrize, reduction, feature Laplacian, lambdas) which are recomputed on
the full corpus exactly as a rebuild would.

Cost: appending m items to N costs O((2N + m) * m * F) matmul work vs
O((N + m)^2 F) for a rebuild — ~16x less for a 3% append at 313k.

Builds made with the Pallas k-NN backend can also be extended: the stored
top-k is merged with the same strict-improvement boundary rule, so results
can differ from a full Pallas rebuild only in the kernel's documented
1-in-20k equal-distance boundary ties (ops/pallas/knn.py docstring).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.laplacian import GraphLaplacian
from ..core.space import ArrowSpace
from ..ops.distance import extend_knn_candidates, unit_normalize
from ..utils.debug import dbg_println, phase, reset_phase_timings
from .build import (BuildConfig, DEFAULT_BUILD_CONFIG, _assemble_from_knn,
                    validate_items)


def extend_build(aspace: ArrowSpace, gl: GraphLaplacian, new_items,
                 config: BuildConfig = DEFAULT_BUILD_CONFIG
                 ) -> tuple[ArrowSpace, GraphLaplacian]:
    """Append `new_items` to a built index; returns a NEW
    (ArrowSpace, GraphLaplacian) pair over the concatenated corpus.

    `config` must match the original build's BuildConfig (the default for
    indices built via ArrowSpaceBuilder.build).
    """
    if aspace._knn_idx is None or aspace._knn_dist is None:
        raise ValueError(
            "this ArrowSpace has no stored k-NN state and cannot be "
            "extended; rebuild it with ArrowSpaceBuilder.build (indices "
            "saved before the extend feature lack the knn arrays)")
    reset_phase_timings()
    arr = validate_items(new_items)
    if arr.shape[1] != aspace.nfeatures:
        raise ValueError(
            f"new items have {arr.shape[1]} features, index has "
            f"{aspace.nfeatures}")
    gp = aspace._params
    dtype = aspace._data.dtype

    with phase("ingest"):
        from ..ops.ingest import ingest_corpus
        import numpy as np
        x_new = ingest_corpus(arr, np.dtype(dtype))
    with phase("normalize"):
        xu_new = unit_normalize(x_new)
        xu_new.block_until_ready()
    stored_new = xu_new if gp.normalise else x_new

    n_old = aspace.nitems
    xu_all = jnp.concatenate([aspace._data_unit, xu_new])
    stored = jnp.concatenate([aspace._data, stored_new])

    with phase("knn_extend"):
        d, i = extend_knn_candidates(
            xu_all, aspace._knn_dist, aspace._knn_idx, n_old, gp.k, gp.eps,
            col_tile=config.col_tile)
        d.block_until_ready()

    dbg_println(f"extend: {n_old} + {arr.shape[0]} items")
    return _assemble_from_knn(stored, xu_all, d, i, gp, config)
