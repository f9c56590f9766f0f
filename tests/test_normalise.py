"""normalise-flag semantics (docs/NORMALISATION.md; reference
NORMALISATION.md): identical graph topology, different stored data/spectra."""

import numpy as np

from pyarrowspace_tpu.core.params import GraphParams
from pyarrowspace_tpu.graph.build import build_standard


def _edge_set(gl):
    nbr = np.asarray(gl.neighbor_indices)
    edges = set()
    for i in range(nbr.shape[0]):
        for j in nbr[i]:
            if j >= 0:
                edges.add((min(i, int(j)), max(i, int(j))))
    return edges


def test_normalise_preserves_topology_changes_spectra():
    rng = np.random.default_rng(12)
    items = rng.normal(size=(40, 10)) + 0.5
    items[::4] *= 10.0  # inject magnitude variation
    base = dict(eps=0.8, k=5, topk=4, p=2.0, sigma=0.3)
    a_raw, gl_raw = build_standard(items, GraphParams(**base,
                                                      normalise=False))
    a_norm, gl_norm = build_standard(items, GraphParams(**base,
                                                        normalise=True))
    # Cosine is scale-invariant: identical edge sets and weights.
    assert _edge_set(gl_raw) == _edge_set(gl_norm)
    np.testing.assert_allclose(gl_raw.to_dense(), gl_norm.to_dense(),
                               atol=1e-10)
    # Stored vectors differ (unit rows vs raw).
    assert not np.allclose(a_raw.get_item(0)[0], a_norm.get_item(0)[0])
    np.testing.assert_allclose(np.linalg.norm(a_norm.data, axis=1), 1.0,
                               rtol=1e-9)
    # Downstream spectra differ.
    assert not np.allclose(a_raw.lambdas(), a_norm.lambdas())
