"""Taumode lambda-synthesis properties (math: reference TAUMODE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyarrowspace_tpu import ArrowSpaceBuilder, TauMode
from pyarrowspace_tpu.core.params import GraphParams
from pyarrowspace_tpu.graph.build import build_standard
from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
from pyarrowspace_tpu.spectral.taumode import derive_tau_star, synthesize

GP = {"eps": 0.9, "k": 6, "topk": 4, "p": 2.0, "sigma": 0.3}


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(21)
    items = rng.normal(size=(80, 16)) + 0.3
    return ArrowSpaceBuilder.build(GP, items), items


def test_lambdas_bounded_unit_interval(built):
    (aspace, _), _ = built
    lams = aspace.lambdas()
    assert np.all(lams >= 0.0)
    assert np.all(lams <= 1.0)
    assert lams.std() > 0  # non-degenerate spread


def test_lambda_scale_equivariance(built):
    (_, _), items = built
    a1, _ = ArrowSpaceBuilder.build(GP, items)
    a2, _ = ArrowSpaceBuilder.build(GP, items * 100.0)
    np.testing.assert_allclose(a1.lambdas(), a2.lambdas(), rtol=1e-8)


def test_query_lambda_magnitude_sensitive(built):
    """A scaled-parallel query must get a different lambda than its source
    item — the reference's observed behavior (test_0 reorders under tau<1)."""
    (aspace, gl), items = built
    lam_base = aspace.prepare_query_item(items[5], gl)
    lam_scaled = aspace.prepare_query_item(items[5] * 1.05, gl)
    assert lam_base != pytest.approx(lam_scaled, rel=1e-6)


def test_rayleigh_identity_small():
    """x^T L x equals the edgewise Dirichlet sum w_ab (x_a - x_b)^2."""
    rng = np.random.default_rng(2)
    f = 6
    w = rng.uniform(size=(f, f))
    w = np.triu(w, 1)
    w = w + w.T
    L = np.diag(w.sum(1)) - w
    x = rng.normal(size=(3, f))
    e = np.asarray(rayleigh_batch(jnp.asarray(x), jnp.asarray(L)))
    for b in range(3):
        expected = sum(w[a, c] * (x[b, a] - x[b, c]) ** 2
                       for a in range(f) for c in range(a + 1, f))
        assert e[b] == pytest.approx(expected, rel=1e-9)


def test_dispersion_matches_direct_computation():
    """The matmul-expansion of g equals the direct per-edge share sum."""
    rng = np.random.default_rng(4)
    f = 8
    w = (rng.uniform(size=(f, f)) > 0.5).astype(float)
    w = np.triu(w, 1)
    w = w + w.T
    L = np.diag(w.sum(1)) - w
    x = rng.normal(size=(5, f))
    e = np.asarray(rayleigh_batch(jnp.asarray(x), jnp.asarray(L)))
    g = np.asarray(dispersion_batch(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(e)))
    for b in range(5):
        m = np.array([w[a, c] * (x[b, a] - x[b, c]) ** 2
                      for a in range(f) for c in range(a + 1, f)])
        tot = m.sum()
        expected = ((m / tot) ** 2).sum() if tot > 0 else 0.0
        assert g[b] == pytest.approx(min(expected, 1.0), rel=1e-8)


def test_tau_modes():
    e = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 100.0]))
    assert float(derive_tau_star(e, TauMode.MEDIAN)) == 3.0
    assert float(derive_tau_star(e, TauMode.MEAN)) == 22.0
    assert float(derive_tau_star(e, TauMode.MAX)) == 100.0
    assert float(derive_tau_star(e, TauMode.FIXED, 0.5)) == 0.5
    with pytest.raises(ValueError, match="requires tau_fixed"):
        derive_tau_star(e, TauMode.FIXED)


def test_synthesize_bounds():
    e = jnp.asarray(np.linspace(0, 50, 11))
    g = jnp.asarray(np.linspace(0, 1, 11))
    s = np.asarray(synthesize(e, g, jnp.asarray(2.0)))
    assert np.all(s >= 0) and np.all(s <= 1)


def test_fixed_synthesis_mode_via_builder():
    rng = np.random.default_rng(9)
    items = rng.normal(size=(30, 8)) + 0.2
    gp = GraphParams(eps=0.9, k=5, topk=3, p=2.0, sigma=0.3,
                     synthesis=TauMode.FIXED, tau_fixed=1.0)
    aspace, _ = build_standard(items, gp)
    assert aspace.tau_star == 1.0
