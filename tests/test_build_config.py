"""BuildConfig engine-knob variants (the calibration surface)."""

import numpy as np
import pytest

from pyarrowspace_tpu.core.params import GraphParams
from pyarrowspace_tpu.graph.build import BuildConfig, build_standard

GP = GraphParams(eps=0.9, k=5, topk=6, p=2.0, sigma=0.3)


@pytest.fixture(scope="module")
def items():
    rng = np.random.default_rng(41)
    return rng.normal(size=(80, 16)) + 0.3


def test_rayleigh_normalized_variant(items):
    """normalized Rayleigh (x^T L x / x^T x): lambdas become scale-invariant
    for the query too — the variant the docs discuss (ops/rayleigh.py)."""
    cfg = BuildConfig(rayleigh_normalized=True)
    aspace, gl = build_standard(items, GP, cfg)
    lams = aspace.lambdas()
    assert np.all((0 <= lams) & (lams <= 1))
    # scale-invariant query lambda under this variant
    l1 = aspace.prepare_query_item(items[3], gl)
    l2 = aspace.prepare_query_item(items[3] * 7.0, gl)
    assert l1 == pytest.approx(l2, rel=1e-9)
    # default variant is magnitude-sensitive
    a2, gl2 = build_standard(items, GP)
    assert (a2.prepare_query_item(items[3], gl2)
            != pytest.approx(a2.prepare_query_item(items[3] * 7.0, gl2),
                             rel=1e-6))
    # search + batch agree under the variant
    hits = aspace.search(items[3] * 1.02, gl, 0.7)
    bi, bv = aspace.search_batch(items[3:4] * 1.02, gl, 0.7)
    assert [h[0] for h in hits] == list(bi[0])
    np.testing.assert_allclose([h[1] for h in hits], bv[0], rtol=1e-8)


def test_custom_tau_mix(items):
    """tau_mix=1.0 -> pure bounded energy; 0.0 -> pure dispersion."""
    a_e, _ = build_standard(items, GP, BuildConfig(tau_mix=1.0))
    a_g, _ = build_standard(items, GP, BuildConfig(tau_mix=0.0))
    a_d, _ = build_standard(items, GP)
    assert not np.allclose(a_e.lambdas(), a_g.lambdas())
    # default is the calibrated blend, strictly between the extremes
    lam_d = a_d.lambdas()
    lam_blend = 0.275 * a_e.lambdas() + 0.725 * a_g.lambdas()
    np.testing.assert_allclose(lam_d, lam_blend, rtol=1e-9)


def test_knn_backend_env_override(items, monkeypatch):
    """ARROWSPACE_KNN_BACKEND forces the backend regardless of config."""
    monkeypatch.setenv("ARROWSPACE_KNN_BACKEND", "xla")
    a1, gl1 = build_standard(items, GP, BuildConfig(knn_backend="pallas"))
    monkeypatch.delenv("ARROWSPACE_KNN_BACKEND")
    a2, gl2 = build_standard(items, GP)
    np.testing.assert_allclose(gl1.to_dense(), gl2.to_dense(), atol=1e-12)
    np.testing.assert_allclose(a1.lambdas(), a2.lambdas(), rtol=1e-12)