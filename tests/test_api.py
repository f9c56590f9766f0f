"""API-surface and error-message parity with the reference binding
(reference src/lib.rs, src/helpers.rs)."""


import numpy as np
import pytest

from pyarrowspace_tpu import (ArrowSpace, ArrowSpaceBuilder, GraphLaplacian,
                              parse_energy_params, parse_graph_params,
                              set_debug)
from pyarrowspace_tpu.core.params import EnergyParams

ITEMS = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]],
                 dtype=np.float64)
GP = {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0, "sigma": 1.0}


def test_direct_construction_rejected():
    # Parity: reference src/lib.rs:33-38, 71-76.
    with pytest.raises(ValueError, match="cannot be constructed directly"):
        ArrowSpace()
    with pytest.raises(ValueError, match="cannot be constructed directly"):
        GraphLaplacian()


@pytest.mark.parametrize("missing", ["eps", "k", "topk", "p"])
def test_required_graph_params(missing):
    # Parity: reference src/helpers.rs:48-77.
    gp = dict(GP)
    del gp[missing]
    with pytest.raises(ValueError,
                       match=rf"graph_params\['{missing}'\] is required"):
        parse_graph_params(gp)


def test_sigma_default_is_half_eps():
    # Parity: reference src/helpers.rs:69-72 (missing OR None -> eps * 0.5).
    gp = parse_graph_params({"eps": 2.0, "k": 4, "topk": 2, "p": 2.0})
    assert gp.sigma_resolved == 1.0
    gp = parse_graph_params(
        {"eps": 2.0, "k": 4, "topk": 2, "p": 2.0, "sigma": None})
    assert gp.sigma_resolved == 1.0


def test_empty_items_rejected():
    # Parity: reference src/helpers.rs:28-30.
    with pytest.raises(ValueError, match="items must be non-empty 2D array"):
        ArrowSpaceBuilder.build(GP, np.zeros((0, 3)))
    with pytest.raises(ValueError, match="items must be non-empty 2D array"):
        ArrowSpaceBuilder.build(GP, np.zeros((3, 0)))
    with pytest.raises(ValueError, match="items must be non-empty 2D array"):
        ArrowSpaceBuilder.build(GP, np.zeros((3,)))


def test_query_length_mismatch():
    # Parity: reference src/lib.rs:140-146.
    aspace, gl = ArrowSpaceBuilder.build(GP, ITEMS)
    with pytest.raises(ValueError,
                       match="query length 2 must match nfeatures 3"):
        aspace.search(np.array([0.1, 0.2]), gl, 1.0)
    with pytest.raises(ValueError,
                       match="query length 4 must match nfeatures 3"):
        aspace.search_hybrid(np.array([0.1, 0.2, 0.3, 0.4]), gl, 1.0)
    with pytest.raises(ValueError,
                       match="query length 2 must match nfeatures 3"):
        aspace.search_energy(np.array([0.1, 0.2]), gl, 3)


def test_get_item():
    # Parity: reference src/lib.rs:100-124.
    aspace, _ = ArrowSpaceBuilder.build(GP, ITEMS)
    feats, lam = aspace.get_item(1)
    assert feats.dtype == np.float64
    np.testing.assert_allclose(feats, ITEMS[1], rtol=1e-6)
    assert lam == pytest.approx(float(aspace.lambdas()[1]))
    with pytest.raises(ValueError, match=r"index 3 out of range \[0, 3\)"):
        aspace.get_item(3)


def test_graph_params_dict():
    # Parity: reference src/lib.rs:50-62 — exactly these five keys.
    _, gl = ArrowSpaceBuilder.build(GP, ITEMS)
    assert gl.graph_params == {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0,
                               "sigma": 1.0}


def test_zero_query_asserts():
    # Parity: reference src/lib.rs:156-159 (loud failure on degenerate λ).
    aspace, gl = ArrowSpaceBuilder.build(GP, ITEMS)
    with pytest.raises(AssertionError, match="lambdas are zero"):
        aspace.search(np.zeros(3), gl, 0.9)


def test_set_debug_toggles_stderr(capsys):
    # Parity: reference src/helpers.rs:8-21.
    set_debug(True)
    try:
        ArrowSpaceBuilder.build(GP, ITEMS)
        err = capsys.readouterr().err
        assert "[pyarrowspace]" in err
        assert "items shape: (3, 3)" in err
    finally:
        set_debug(False)
    ArrowSpaceBuilder.build(GP, ITEMS)
    assert "[pyarrowspace]" not in capsys.readouterr().err


def test_energy_params_defaults():
    # Parity: reference src/energyparams.rs:6-46 + src/lib.rs:311-323.
    ep = parse_energy_params(None)
    assert ep == EnergyParams(
        optical_tokens=None, trim_quantile=0.1, eta=0.1, steps=4,
        split_quantile=0.9, neighbor_k=8, split_tau=0.15, w_lambda=1.0,
        w_disp=0.5, w_dirichlet=0.25, candidate_m=32)
    ep = parse_energy_params({"eta": 0.05, "steps": 6, "optical_tokens": 40})
    assert ep.eta == 0.05 and ep.steps == 6 and ep.optical_tokens == 40
    assert ep.candidate_m == 32


def test_search_returns_topk_descending():
    rng = np.random.default_rng(0)
    items = rng.normal(size=(50, 16))
    gp = {"eps": 1.0, "k": 8, "topk": 7, "p": 2.0, "sigma": 0.5}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    hits = aspace.search(items[0] * 1.1, gl, 0.8)
    assert len(hits) == 7
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(i, int) for i, _ in hits)


def test_degenerate_graph_asserts_on_search():
    """eps mismatched to the data (edgeless graph) must abort search loudly
    (reference collapse behavior, BASELINE.md cross-scale failure rows)."""
    rng = np.random.default_rng(31)
    items = rng.normal(size=(30, 8))
    gp = {"eps": 1e-9, "k": 5, "topk": 3, "p": 2.0, "sigma": None}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    with pytest.raises(AssertionError, match="lambdas are zero"):
        aspace.search(items[0], gl, 0.9)


def test_fluent_builder_full_surface():
    """The engine's fluent API incl. the previously dormant knobs
    (reference src/lib.rs:278-289: with_lambda_graph, with_dims_reduction,
    with_seed, with_sparsity_check, with_inline_sampling, with_spectral)."""
    from pyarrowspace_tpu import ArrowSpaceBuilder, TauMode
    rng = np.random.default_rng(19)
    items = rng.normal(size=(40, 12)) + 0.3
    aspace, gl = (ArrowSpaceBuilder.new()
                  .with_lambda_graph(0.9, 5, 4, 2.0, 0.3)
                  .with_dims_reduction(True, 0.9)
                  .with_seed(42)
                  .with_sparsity_check(False)
                  .with_inline_sampling(0.8)
                  .with_spectral(True)
                  .with_normalisation(False)
                  .with_synthesis(TauMode.MEDIAN)
                  .build_rows(items))
    assert gl.graph_params["eps"] == 0.9
    spec = aspace.spectral_summary()
    assert spec["spectral_radius"] > 0
    assert spec["n_components"] >= 1
    assert len(spec["eigenvalues"]) == 12
    hits = aspace.search(items[3] * 1.02, gl, 0.8)
    assert hits[0][0] == 3
