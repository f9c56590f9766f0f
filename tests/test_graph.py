"""Graph-construction invariants and exactness (SURVEY.md §4: property tests
for symmetry, PSD Laplacian, zero row sums; exact k-NN vs brute force)."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.ops.distance import (kernel_weights,
                                           knn_graph_candidates,
                                           unit_normalize)

import jax.numpy as jnp


def brute_force_knn(x, k, eps):
    """Reference implementation: rectified-cosine eps/k-NN per row."""
    xu = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = 1.0 - np.maximum(xu @ xu.T, 0.0)
    np.fill_diagonal(d, np.inf)
    out_i, out_d = [], []
    for r in range(x.shape[0]):
        order = np.argsort(d[r], kind="stable")[:k]
        keep = d[r][order] <= eps
        out_i.append(np.where(keep, order, -1))
        out_d.append(np.where(keep, d[r][order], 2.0))
    return np.array(out_d), np.array(out_i)


@pytest.mark.parametrize("n,f,k,eps", [(37, 8, 5, 0.8), (200, 24, 10, 0.5),
                                       (128, 16, 4, 1.5)])
def test_knn_exact_vs_brute_force(n, f, k, eps):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(n, f))
    xu = unit_normalize(jnp.asarray(x))
    d, i = knn_graph_candidates(xu, k, eps)
    d, i = np.asarray(d), np.asarray(i)
    bd, bi = brute_force_knn(x, k, eps)
    # Distances must match exactly (same candidates); indices may differ only
    # on exact ties.
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(bd, axis=1),
                               atol=1e-10)
    # Neighbor SETS must match wherever distances are untied.
    for r in range(n):
        assert set(i[r][i[r] >= 0]) == set(bi[r][bi[r] >= 0]), r


def test_laplacian_invariants():
    rng = np.random.default_rng(3)
    items = rng.normal(size=(64, 12)) + 0.5
    gp = {"eps": 0.9, "k": 6, "topk": 4, "p": 2.0, "sigma": 0.3}
    _, gl = ArrowSpaceBuilder.build(gp, items)
    L = gl.to_dense()
    # Symmetry.
    np.testing.assert_allclose(L, L.T, atol=1e-12)
    # Zero row sums.
    np.testing.assert_allclose(L.sum(axis=1), 0.0, atol=1e-10)
    # Off-diagonal non-positive; diagonal = degrees >= 0.
    off = L - np.diag(np.diag(L))
    assert np.all(off <= 1e-12)
    assert np.all(np.diag(L) >= 0)
    # PSD.
    evals = np.linalg.eigvalsh(L)
    assert evals.min() > -1e-8
    # matvec agrees with dense.
    v = rng.normal(size=L.shape[0])
    np.testing.assert_allclose(np.asarray(gl.matvec(jnp.asarray(v))), L @ v,
                               atol=1e-8)


def test_eps_filters_edges():
    """eps is the sparsity control: tiny eps -> no edges survive."""
    rng = np.random.default_rng(5)
    items = rng.normal(size=(32, 8))
    gp = {"eps": 1e-9, "k": 6, "topk": 3, "p": 2.0, "sigma": None}
    _, gl = ArrowSpaceBuilder.build(gp, items)
    assert gl.nedges == 0
    gp_loose = {"eps": 2.0, "k": 6, "topk": 3, "p": 2.0, "sigma": None}
    _, gl2 = ArrowSpaceBuilder.build(gp_loose, items)
    assert gl2.nedges > 0


def test_k_caps_degree_before_symmetrization():
    rng = np.random.default_rng(11)
    items = rng.normal(size=(40, 6)) + 2.0  # positive-ish: dense cosine graph
    k = 3
    gp = {"eps": 1.0, "k": k, "topk": 3, "p": 2.0, "sigma": 0.5}
    _, gl = ArrowSpaceBuilder.build(gp, items)
    nbr = np.asarray(gl.neighbor_indices)
    row_deg = (nbr >= 0).sum(axis=1)
    # Each directed row keeps <= k out-edges, so the symmetric union has at
    # most n*k edges; a single row's degree may exceed 2k (hub in-edges) and
    # the ELL auto-widens to keep every union edge (reference parity,
    # GRAPH_VARIABLES.md:7-10) rather than capping at width 2k.
    assert row_deg.sum() <= 2 * items.shape[0] * k
    assert gl.n_dropped_edges == 0
    assert row_deg.min() >= 1


def test_kernel_weights_form():
    d = jnp.asarray([0.0, 0.1, 0.2, 1.0])
    w = np.asarray(kernel_weights(d, sigma=0.1, p=2.0))
    np.testing.assert_allclose(w, [1.0, 0.5, 1 / 5, 1 / 101], rtol=1e-6)


def test_weight_symmetry_of_built_graph():
    rng = np.random.default_rng(13)
    items = rng.normal(size=(50, 10)) + 1.0
    gp = {"eps": 0.8, "k": 5, "topk": 3, "p": 2.0, "sigma": 0.2}
    _, gl = ArrowSpaceBuilder.build(gp, items)
    W = -gl.to_dense()
    np.fill_diagonal(W, 0.0)
    np.testing.assert_allclose(W, W.T, atol=1e-12)
    assert np.all(W >= 0)


def test_pallas_knn_matches_xla():
    """The fused Pallas kernel (interpret mode on CPU) must produce the
    same neighbor sets and distances as the XLA path."""
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    rng = np.random.default_rng(23)
    x = rng.normal(size=(150, 32)).astype(np.float32)
    xu = unit_normalize(jnp.asarray(x))
    d1, i1 = knn_graph_candidates(xu, 6, 0.9)
    d2, i2 = knn_graph_candidates_pallas(xu, 6, 0.9, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    for r in range(150):
        a = set(np.asarray(i1[r])[np.asarray(i1[r]) >= 0].tolist())
        b = set(np.asarray(i2[r])[np.asarray(i2[r]) >= 0].tolist())
        assert a == b, r


def test_pallas_knn_multi_row_block_grid():
    """Force a multi-block (row blocks x column tiles) grid so the per-block
    scratch reinit of the single-dispatch kernel is exercised off-TPU: with
    block_rows=col_tile=128 and n=300 (padded to 384), the grid is 3x3 and
    every row block past the first reuses the VMEM top-k scratch."""
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    rng = np.random.default_rng(31)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    xu = unit_normalize(jnp.asarray(x))
    d1, i1 = knn_graph_candidates(xu, 7, 0.9)
    d2, i2 = knn_graph_candidates_pallas(xu, 7, 0.9, block_rows=128,
                                         col_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    for r in range(300):
        a = set(np.asarray(i1[r])[np.asarray(i1[r]) >= 0].tolist())
        b = set(np.asarray(i2[r])[np.asarray(i2[r]) >= 0].tolist())
        assert a == b, r


def test_pallas_knn_transposed_variant_bitwise():
    """The transposed-merge kernel variant (candidates on sublanes,
    merge reductions over the sublane axis) must be BITWISE identical to
    the row-major default — same distances, same indices, same
    tie-breaks — across multi-block grids.  Measured on TPU 2026-08-19
    (recorded knn_merge_ab): 0.96x at 313k x 384, i.e. the merge is
    elementwise-bound (every pass touches the whole tile), not
    relayout-bound, so the variant stays an env-gated A/B probe
    (ARROWSPACE_KNN_VARIANT=transposed), not the default."""
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    rng = np.random.default_rng(57)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    xu = unit_normalize(jnp.asarray(x))
    for kwargs in ({}, {"block_rows": 128, "col_tile": 128}):
        d1, i1 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                             variant="rowmajor", **kwargs)
        d2, i2 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                             variant="transposed", **kwargs)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_knn_subtile_variant_bitwise(monkeypatch):
    """The sub-tile merge variant (per-slice dot + [B, sub] lazy merge,
    ascending column order) must match the full-tile merge bitwise on
    tie-free data: with eps < 1 the exact-tie plateau at d = 1.0 is
    masked, and float distances below it are tie-free w.p. 1, so
    distances, indices, and tie-breaks all coincide.  (At exact kth-
    boundary ties the kept neighbor may legitimately differ — same tie
    class as pallas-vs-XLA, documented in knn.py.)"""
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    rng = np.random.default_rng(58)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    xu = unit_normalize(jnp.asarray(x))
    d1, i1 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                         variant="rowmajor")
    for sub_width in (64, 128):
        monkeypatch.setenv("ARROWSPACE_KNN_SUB", str(sub_width))
        d2, i2 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                             variant="subtile")
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_knn_locality_variants_bitwise():
    """diagstart (rotated tile walk) and reorder (projection-sorted
    corpus + rotated walk) visit the same exact candidate set in a
    different order, so on tie-free data (eps < 1 masks the d = 1.0
    plateau) distances and indices match the rowmajor kernel bitwise;
    row order of the output must be the ORIGINAL corpus order."""
    from pyarrowspace_tpu.ops.pallas.knn import knn_graph_candidates_pallas
    rng = np.random.default_rng(61)
    # clustered corpus: the regime the locality variants are built for
    cents = rng.normal(size=(12, 32))
    x = (cents[rng.integers(0, 12, size=500)]
         + 0.3 * rng.normal(size=(500, 32))).astype(np.float32)
    xu = unit_normalize(jnp.asarray(x))
    d1, i1 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                         variant="rowmajor")
    for variant in ("diagstart", "reorder"):
        d2, i2 = knn_graph_candidates_pallas(xu, 7, 0.9, interpret=True,
                                             variant=variant)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2),
                                      err_msg=variant)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2),
                                      err_msg=variant)


def test_chunked_knn_matches_monolithic():
    from pyarrowspace_tpu.ops.distance import knn_graph_candidates_chunked
    rng = np.random.default_rng(29)
    x = rng.normal(size=(700, 24))
    xu = unit_normalize(jnp.asarray(x))
    d1, i1 = knn_graph_candidates(xu, 9, 0.7)
    d2, i2 = knn_graph_candidates_chunked(xu, 9, 0.7, row_chunk=256,
                                          col_segment=256, col_tile=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)
    for r in range(700):
        a = set(np.asarray(i1[r])[np.asarray(i1[r]) >= 0].tolist())
        b = set(np.asarray(i2[r])[np.asarray(i2[r]) >= 0].tolist())
        assert a == b, r


def test_suggest_graph_params():
    from pyarrowspace_tpu.graph.suggest import suggest_graph_params
    rng = np.random.default_rng(6)
    # low intrinsic dim: 3-d manifold embedded in 64-d
    latent = rng.normal(size=(2000, 3))
    proj = rng.normal(size=(3, 64))
    items = latent @ proj + 0.01 * rng.normal(size=(2000, 64))
    rec = suggest_graph_params(items, sample=1024)
    assert 2 <= rec["intrinsic_dim"] <= 5
    assert 0 < rec["eps"] < 1.0
    assert rec["sigma"] == pytest.approx(rec["eps"] * 0.41, rel=0.02)
    assert 4 <= rec["k"] <= 64
    # the suggestion must produce a connected-enough build
    gp = {"eps": rec["eps"], "k": rec["k"], "topk": 5, "p": 2.0,
          "sigma": rec["sigma"]}
    _, gl = ArrowSpaceBuilder.build(gp, items)
    assert gl.nedges > items.shape[0]  # well-connected


def test_suggested_eps_artifact(tmp_path, monkeypatch):
    """Per-build suggested_eps.md artifact (reference tests/output/
    1760705545_v0_16/suggested_eps.md): emitted when
    ARROWSPACE_SUGGEST_DIR is set, reference section layout."""
    monkeypatch.setenv("ARROWSPACE_SUGGEST_DIR", str(tmp_path))
    rng = np.random.default_rng(6)
    latent = rng.normal(size=(1500, 3))
    items = latent @ rng.normal(size=(3, 64))
    gp = {"eps": 0.2, "k": 6, "topk": 4, "p": 2.0, "sigma": None}
    ArrowSpaceBuilder.build(gp, items)
    doc = (tmp_path / "suggested_eps.md").read_text()
    assert doc.startswith("# what is the suggested eps and sigma")
    for section in ("## Recommended Parameters", "## Key Insights",
                    "## Scenario Adjustments", "## Warnings",
                    "## Action Items"):
        assert section in doc, section
    assert "Build configuration: eps=0.2" in doc
    assert "| **eps** | 0.2 |" in doc
    assert "intrinsic dimension=" in doc


def test_suggest_graph_params_list_input():
    """r3 review regression: list-of-lists input (public API) crashed
    with AttributeError after the device-sampling rework."""
    from pyarrowspace_tpu.graph.suggest import suggest_graph_params
    rec = suggest_graph_params([[0.1, 0.2, 0.3, 0.1], [0.3, 0.4, 0.1, 0.2],
                                [0.5, 0.1, 0.2, 0.4], [0.2, 0.2, 0.1, 0.6]])
    assert rec["eps"] > 0 and rec["k"] >= 1
