"""Chunked (memory-bounded) symmetrize must be BIT-identical to the
fused one-sort op for every chunking — the L = L^T invariant and the
exact (row, -w, col) placement order both ride on it (VERDICT r2
item 4: the chunked op retires the 1M x 768 host-fallback cut)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyarrowspace_tpu.ops.symmetrize import (symmetrize_to_ell,
                                             symmetrize_to_ell_chunked)


def _random_knn(n, k, seed, hub_frac=0.0):
    """Directed k-NN-like candidate lists; optionally point a fraction of
    all rows at a single hub node (unbounded in-degree stress)."""
    rng = np.random.default_rng(seed)
    idx = np.full((n, k), -1, np.int32)
    w = np.zeros((n, k))
    for i in range(n):
        kk = rng.integers(max(1, k - 2), k + 1)
        choices = rng.choice(n - 1, size=kk, replace=False)
        choices = np.where(choices >= i, choices + 1, choices)
        idx[i, :kk] = choices
        w[i, :kk] = rng.uniform(0.1, 1.0, kk)
    if hub_frac > 0:
        hub = 0
        n_point = int(hub_frac * n)
        for i in rng.choice(np.arange(1, n), size=n_point, replace=False):
            idx[i, 0] = hub
    # weights must be symmetric per undirected pair for the dedup to be
    # meaningful (cosine distance property); enforce w(i,j)=w(j,i)
    for i in range(n):
        for s in range(k):
            j = idx[i, s]
            if j >= 0:
                w[i, s] = 0.1 + 0.9 * (((i + 1) * (j + 1)) % 97) / 97.0
    return jnp.asarray(idx), jnp.asarray(w)


@pytest.mark.parametrize("n_chunks", [1, 3, 8])
@pytest.mark.parametrize("hub_frac", [0.0, 0.5])
def test_chunked_matches_fused(n_chunks, hub_frac):
    idx, w = _random_knn(300, 6, seed=1, hub_frac=hub_frac)
    m = 12
    ref = symmetrize_to_ell(idx, w, m)
    got = symmetrize_to_ell_chunked(idx, w, m, n_chunks=n_chunks,
                                    cap_factor=6)
    assert int(got[4]) == 0, "unexpected overflow"
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
    assert int(ref[3]) == int(got[3])


def test_chunked_overflow_flagged():
    """A hub chunk beyond cap_factor*R*k entries must flag, not corrupt."""
    idx, w = _random_knn(400, 5, seed=2, hub_frac=0.9)
    got = symmetrize_to_ell_chunked(idx, w, 10, n_chunks=16, cap_factor=1)
    assert int(got[4]) > 0


def test_chunked_symmetry_invariant():
    idx, w = _random_knn(257, 7, seed=3, hub_frac=0.3)
    nbr_idx, nbr_w, _, _, over = symmetrize_to_ell_chunked(
        idx, w, 9, n_chunks=4, cap_factor=8)
    assert int(over) == 0
    n = idx.shape[0]
    dense = np.zeros((n, n))
    ni, nw = np.asarray(nbr_idx), np.asarray(nbr_w)
    for i in range(n):
        for s in range(ni.shape[1]):
            if ni[i, s] >= 0:
                dense[i, ni[i, s]] = nw[i, s]
    np.testing.assert_array_equal(dense, dense.T)


def test_build_env_mode_device_chunked(monkeypatch):
    """ARROWSPACE_SYMMETRIZE=device on a small corpus still builds (the
    auto path picks the fused op; the mode names stay accepted)."""
    from pyarrowspace_tpu import ArrowSpaceBuilder
    rng = np.random.default_rng(0)
    items = rng.normal(size=(200, 24)) * 2.0
    gp = {"eps": 0.8, "k": 5, "topk": 4, "p": 2.0, "sigma": None}
    for mode in ("auto", "device", "device_fused"):
        monkeypatch.setenv("ARROWSPACE_SYMMETRIZE", mode)
        aspace, gl = ArrowSpaceBuilder.build(gp, items)
        assert gl.nnodes == 200


def test_chunked_no_spurious_overflow_on_ragged_n():
    """r3 review regression: when n % n_chunks != 0 the last row-range
    boundary used to land past n and sweep every sentinel entry (-1 pads
    and dropped mutual reverse copies) into the last chunk's count —
    flagging overflow at the DEFAULT cap_factor for perfectly normal
    graphs, so the memory-bounded device path never engaged."""
    idx, w = _random_knn(1000, 6, seed=7)
    m = 12
    ref = symmetrize_to_ell(idx, w, m)
    got = symmetrize_to_ell_chunked(idx, w, m, n_chunks=16)  # default cap
    assert int(got[4]) == 0, f"spurious overflow: {int(got[4])}"
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
