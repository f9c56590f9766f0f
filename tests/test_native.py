"""Native C++ host runtime: OpenMP k-NN golden engine, ingest scan, blob IO.
Skipped wholesale when the toolchain is unavailable."""

import numpy as np
import pytest

from pyarrowspace_tpu.io import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


def test_scan_validate():
    x = np.ones((10, 4))
    x[0, 0] = np.nan
    x[1, 1] = np.inf
    x[2, 2] = -np.inf
    assert native.scan_validate(x) == (1, 2)
    assert native.scan_validate(np.zeros((3, 3))) == (0, 0)


def test_native_knn_matches_jax():
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import (knn_graph_candidates,
                                               unit_normalize)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(120, 16))
    nd, ni = native.knn_host(x, k=7, eps=0.8)
    jd, ji = knn_graph_candidates(unit_normalize(jnp.asarray(x)), 7, 0.8)
    np.testing.assert_allclose(nd, np.asarray(jd), atol=1e-8)
    for r in range(120):
        assert (set(ni[r][ni[r] >= 0].tolist())
                == set(np.asarray(ji[r])[np.asarray(ji[r]) >= 0].tolist())), r


def test_blob_roundtrip(tmp_path):
    payload = np.arange(1000, dtype=np.float32).tobytes()
    path = str(tmp_path / "seg.asx")
    assert native.write_blob(path, payload)
    back = native.read_blob(path)
    assert back == payload


def test_blob_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.asx")
    with open(path, "wb") as fh:
        fh.write(b"not a blob")
    assert native.read_blob(path) is None


def test_native_symmetrize_matches_device_op():
    """The OpenMP host symmetrize reproduces ops/symmetrize.py bit-exactly
    (order, dedup, both-fit cap, drop count) across edge densities."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.io.native import native_available, symmetrize_host
    from pyarrowspace_tpu.ops.symmetrize import symmetrize_to_ell
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from pyarrowspace_tpu.ops.distance import kernel_weights, unit_normalize
    for seed, n, k, eps in [(0, 333, 6, 0.9), (1, 500, 10, 1.9),
                            (2, 200, 4, 0.05)]:
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, 24)) + 0.3
        xu = np.asarray(unit_normalize(jnp.asarray(x)))
        d = 1.0 - np.maximum(xu @ xu.T, 0.0)
        np.fill_diagonal(d, np.inf)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        dd = np.take_along_axis(d, order, 1)
        keep = dd <= eps
        i = np.where(keep, order, -1).astype(np.int32)
        w = np.asarray(kernel_weights(jnp.asarray(np.where(keep, dd, 2.0)),
                                      0.3, 2.0))
        w = np.where(i >= 0, w, 0.0)
        m = 2 * k
        ref = symmetrize_to_ell(jnp.asarray(i), jnp.asarray(w), m)
        got = symmetrize_host(i, w, m)
        assert got is not None
        np.testing.assert_array_equal(np.asarray(ref[0]), got[0])
        np.testing.assert_allclose(np.asarray(ref[1]), got[1], rtol=1e-12)
        assert int(ref[3]) == got[2], (seed, int(ref[3]), got[2])


def test_host_symmetrize_build_path(monkeypatch):
    """ARROWSPACE_SYMMETRIZE=host routes the build through the native
    engine and yields an identical GraphLaplacian."""
    from pyarrowspace_tpu.io.native import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from pyarrowspace_tpu import ArrowSpaceBuilder
    rng = np.random.default_rng(5)
    items = rng.normal(size=(300, 24)) + 0.3
    gp = {"eps": 0.9, "k": 6, "topk": 8, "p": 2.0, "sigma": 0.3}
    a1, gl1 = ArrowSpaceBuilder.build(gp, items)
    monkeypatch.setenv("ARROWSPACE_SYMMETRIZE", "host")
    a2, gl2 = ArrowSpaceBuilder.build(gp, items)
    np.testing.assert_array_equal(np.asarray(gl1.to_dense()),
                                  np.asarray(gl2.to_dense()))
    assert gl1.n_dropped_edges == gl2.n_dropped_edges
    np.testing.assert_allclose(a1.lambdas(), a2.lambdas(), rtol=1e-12)
