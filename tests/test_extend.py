"""Incremental extend (ArrowSpaceBuilder.extend) — exactness vs a full
rebuild of the concatenated corpus (graph/extend.py contract).

The XLA k-NN backend is deterministic on CPU, so every comparison here is
exact array equality, not tolerance."""

import dataclasses

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.graph.build import BuildConfig
from pyarrowspace_tpu.io.persist import load_index, save_index

GP = {"eps": 0.8, "k": 5, "topk": 4, "p": 2.0, "sigma": None}


def _corpus(n, f=16, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, f)) * scale


def _assert_index_equal(a, b):
    aspace_a, gl_a = a
    aspace_b, gl_b = b
    np.testing.assert_array_equal(np.asarray(gl_a.neighbor_indices),
                                  np.asarray(gl_b.neighbor_indices))
    np.testing.assert_array_equal(np.asarray(gl_a.neighbor_weights),
                                  np.asarray(gl_b.neighbor_weights))
    np.testing.assert_array_equal(np.asarray(gl_a.degrees),
                                  np.asarray(gl_b.degrees))
    assert gl_a.n_dropped_edges == gl_b.n_dropped_edges
    np.testing.assert_array_equal(np.asarray(aspace_a._lambdas),
                                  np.asarray(aspace_b._lambdas))
    np.testing.assert_array_equal(np.asarray(aspace_a._knn_dist),
                                  np.asarray(aspace_b._knn_dist))
    np.testing.assert_array_equal(np.asarray(aspace_a._knn_idx),
                                  np.asarray(aspace_b._knn_idx))
    assert float(aspace_a._tau_star) == float(aspace_b._tau_star)


def test_extend_equals_rebuild():
    old = _corpus(60)
    new = _corpus(25, seed=1)
    built = ArrowSpaceBuilder.build(GP, old)
    extended = ArrowSpaceBuilder.extend(*built, new)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    _assert_index_equal(extended, rebuilt)


def test_extend_search_matches_rebuild():
    old = _corpus(80, seed=2)
    new = _corpus(40, seed=3)
    ea, eg = ArrowSpaceBuilder.extend(*ArrowSpaceBuilder.build(GP, old), new)
    ra, rg = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    q = old[7] * 1.01
    for tau in (1.0, 0.62):
        assert ea.search(q, eg, tau) == ra.search(q, rg, tau)


def test_sequential_extends_equal_one_rebuild():
    parts = [_corpus(50, seed=s) for s in range(4)]
    idx = ArrowSpaceBuilder.build(GP, parts[0])
    for p in parts[1:]:
        idx = ArrowSpaceBuilder.extend(*idx, p)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate(parts))
    _assert_index_equal(idx, rebuilt)


def test_single_row_extend():
    old = _corpus(40, seed=4)
    new = _corpus(1, seed=5)
    extended = ArrowSpaceBuilder.extend(*ArrowSpaceBuilder.build(GP, old),
                                        new)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    _assert_index_equal(extended, rebuilt)


def test_extend_larger_than_original():
    old = _corpus(12, seed=6)
    new = _corpus(90, seed=7)
    extended = ArrowSpaceBuilder.extend(*ArrowSpaceBuilder.build(GP, old),
                                        new)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    _assert_index_equal(extended, rebuilt)


def test_extend_from_tiny_corpus_grows_k():
    # n_old - 1 < k: stored top-k is truncated/padded; growth must re-open
    # the extra slots.
    old = _corpus(4, seed=8)
    new = _corpus(30, seed=9)
    extended = ArrowSpaceBuilder.extend(*ArrowSpaceBuilder.build(GP, old),
                                        new)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    _assert_index_equal(extended, rebuilt)


def test_extend_across_reduction_threshold():
    # Crossing reduction_min_n switches the feature-Laplacian signals from
    # raw rows to centroids; extend must follow the same gate.
    cfg = BuildConfig(reduction_min_n=128)
    old = _corpus(100, seed=10)
    new = _corpus(60, seed=11)
    gp_full = dict(GP)
    built = (ArrowSpaceBuilder.new()
             .with_lambda_graph(gp_full["eps"], gp_full["k"],
                                gp_full["topk"], gp_full["p"], 0.4)
             .with_dims_reduction(True, gp_full["eps"])
             .with_build_config(cfg))
    a, g = built.build_rows(old)
    extended = ArrowSpaceBuilder.extend(a, g, new, config=cfg)
    rebuilt = (ArrowSpaceBuilder.new()
               .with_lambda_graph(gp_full["eps"], gp_full["k"],
                                  gp_full["topk"], gp_full["p"], 0.4)
               .with_dims_reduction(True, gp_full["eps"])
               .with_build_config(cfg)
               .build_rows(np.concatenate([old, new])))
    assert extended[0].nitems == 160
    _assert_index_equal(extended, rebuilt)


def test_extend_eps_isolated_rows():
    # Rows with no neighbors within eps stay isolated identically.
    rng = np.random.default_rng(12)
    old = np.eye(20) * 5.0 + 0.01 * rng.standard_normal((20, 20))
    new = np.eye(20)[:6] * -5.0
    gp = {"eps": 0.3, "k": 4, "topk": 3, "p": 2.0, "sigma": None}
    try:
        extended = ArrowSpaceBuilder.extend(
            *ArrowSpaceBuilder.build(gp, old), new)
        rebuilt = ArrowSpaceBuilder.build(gp, np.concatenate([old, new]))
    except AssertionError:
        pytest.skip("degenerate graph rejected by build (acceptable)")
    _assert_index_equal(extended, rebuilt)


def test_extend_persist_roundtrip(tmp_path):
    old = _corpus(50, seed=13)
    new = _corpus(20, seed=14)
    a, g = ArrowSpaceBuilder.build(GP, old)
    p = str(tmp_path / "idx.npz")
    save_index(p, a, g)
    loaded = load_index(p)
    extended = ArrowSpaceBuilder.extend(*loaded, new)
    rebuilt = ArrowSpaceBuilder.build(GP, np.concatenate([old, new]))
    _assert_index_equal(extended, rebuilt)


def test_extend_without_knn_state_raises():
    a, g = ArrowSpaceBuilder.build(GP, _corpus(30, seed=15))
    a._knn_dist = None
    a._knn_idx = None
    with pytest.raises(ValueError, match="cannot be extended"):
        ArrowSpaceBuilder.extend(a, g, _corpus(5, seed=16))


def test_extend_feature_mismatch_raises():
    a, g = ArrowSpaceBuilder.build(GP, _corpus(30, seed=17))
    with pytest.raises(ValueError, match="features"):
        ArrowSpaceBuilder.extend(a, g, _corpus(5, f=8, seed=18))


def test_extend_empty_rejected():
    a, g = ArrowSpaceBuilder.build(GP, _corpus(30, seed=19))
    with pytest.raises(ValueError, match="non-empty 2D"):
        ArrowSpaceBuilder.extend(a, g, np.zeros((0, 16)))
