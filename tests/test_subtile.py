"""Subtile-max scan (ops/pallas/subtile_scan): correctness of the
block-max routed serving path vs the exact scan."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def state():
    import jax
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.subtile_scan import build_subtile_state
    rng = np.random.default_rng(0)
    n, f = 5000, 256
    xu = unit_normalize(jnp.asarray(
        rng.standard_normal((n, f), dtype=np.float32)))
    lam = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    st = build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    return st, xu, lam, rng


def test_subtile_matches_exact(state):
    from pyarrowspace_tpu.ops.pallas.subtile_scan import subtile_search
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    st, xu, lam, rng = state
    q = 64
    qn = jnp.asarray(rng.standard_normal((q, xu.shape[1]),
                                         dtype=np.float32))
    qn = qn / jnp.linalg.norm(qn, axis=1, keepdims=True)
    lam_q = jnp.asarray(rng.uniform(0.05, 0.3, q).astype(np.float32))
    tau = jnp.float32(0.62)
    idx_s, val_s = subtile_search(st["xu_scan"], st["xu_f32"],
                                  st["lambdas"],
                                  qn, lam_q, tau, st["n_real"], topk=10,
                                  n_subtiles_keep=16, pool_m=64)
    idx_e, val_e = lambda_aware_topk_batch(
        xu.astype(jnp.float32), lam, qn, lam_q, tau, 10)
    ie, isb = np.asarray(idx_e), np.asarray(idx_s)
    overlap = np.mean([len(set(ie[i]) & set(isb[i])) / 10.0
                       for i in range(q)])
    assert overlap >= 0.99, overlap
    same = ie == isb
    np.testing.assert_allclose(np.asarray(val_e)[same],
                               np.asarray(val_s)[same], rtol=1e-5)


def test_subtile_pad_guard(state):
    from pyarrowspace_tpu.ops.pallas.subtile_scan import subtile_search
    st, xu, lam, rng = state
    qn = jnp.zeros((4, xu.shape[1]), jnp.float32)
    with pytest.raises(ValueError, match="padded"):
        subtile_search(xu.astype(jnp.float32),
                       st["xu_f32"], st["lambdas"], qn,
                       jnp.zeros((4,), jnp.float32), 0.62, st["n_real"],
                       topk=5)


def test_subtile_topk_beyond_s_keep(state):
    """topk > n_subtiles_keep must still be exact: s_keep scales with
    topk so the block-max bound holds (silent mis-routing otherwise)."""
    from pyarrowspace_tpu.ops.pallas.subtile_scan import subtile_search
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    st, xu, lam, rng = state
    q = 16
    qn = jnp.asarray(rng.standard_normal((q, xu.shape[1]),
                                         dtype=np.float32))
    qn = qn / jnp.linalg.norm(qn, axis=1, keepdims=True)
    lam_q = jnp.asarray(rng.uniform(0.05, 0.3, q).astype(np.float32))
    idx_s, _ = subtile_search(st["xu_scan"], st["xu_f32"], st["lambdas"],
                              qn, lam_q, jnp.float32(0.62), st["n_real"],
                              topk=25, n_subtiles_keep=16)
    idx_e, _ = lambda_aware_topk_batch(xu, lam, qn, lam_q,
                                       jnp.float32(0.62), 25)
    ie, isb = np.asarray(idx_e), np.asarray(idx_s)
    overlap = np.mean([len(set(ie[i]) & set(isb[i])) / 25.0
                       for i in range(q)])
    assert overlap >= 0.99, overlap


def test_subtile_two_level_select_matches_exact():
    """Corpus large enough (n_tiles > s_keep) to route through the
    two-level supertile select; top-k must still match the exact scan."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.subtile_scan import (
        build_subtile_state, subtile_search)
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    rng = np.random.default_rng(11)
    n, f, q = 20000, 32, 32
    xu = unit_normalize(jnp.asarray(
        rng.standard_normal((n, f), dtype=np.float32)))
    lam = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    st = build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    assert st["xu_scan"].shape[0] // 1024 > 16  # two-level branch taken
    qn = jnp.asarray(rng.standard_normal((q, f), dtype=np.float32))
    qn = qn / jnp.linalg.norm(qn, axis=1, keepdims=True)
    lam_q = jnp.asarray(rng.uniform(0.05, 0.3, q).astype(np.float32))
    idx_s, val_s = subtile_search(st["xu_scan"], st["xu_f32"],
                                  st["lambdas"], qn, lam_q,
                                  jnp.float32(0.62), st["n_real"], topk=10)
    idx_e, _ = lambda_aware_topk_batch(xu, lam, qn, lam_q,
                                       jnp.float32(0.62), 10)
    ie, isb = np.asarray(idx_e), np.asarray(idx_s)
    overlap = np.mean([len(set(ie[i]) & set(isb[i])) / 10.0
                       for i in range(q)])
    assert overlap >= 0.99, overlap


def test_subtile_never_serves_padding():
    """ADVICE r2 regression: anti-aligned queries on a clustered corpus
    make every real blended score negative (tau*cos < 0 dominates), while
    a padded row's score would be ~(1-tau)/(1+|lam_pad-lam_q|) ~ 0.1 —
    without index masking the pad rows win the top-k."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.subtile_scan import (
        build_subtile_state, subtile_search)
    rng = np.random.default_rng(3)
    n, f = 5000, 256
    direction = rng.standard_normal(f).astype(np.float32)
    xu = unit_normalize(jnp.asarray(
        direction[None, :] + 0.05 * rng.standard_normal(
            (n, f)).astype(np.float32)))
    lam = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    st = build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    qn = unit_normalize(jnp.asarray(-direction[None, :].repeat(8, 0)))
    lam_q = jnp.full((8,), 0.1, jnp.float32)
    idx, vals = subtile_search(st["xu_scan"],
                               st["xu_f32"], st["lambdas"], qn, lam_q,
                               jnp.float32(0.62), st["n_real"], topk=10)
    assert int(np.asarray(idx).max()) < n, np.asarray(idx).max()


@pytest.mark.parametrize("pool_m", [30, 60])
def test_subtile_no_duplicate_results(pool_m):
    """r3 review regression: with fewer real subtiles than s_keep the
    extract kernel used to re-select already-extracted ids once every
    score hit the elimination value, so routing returned duplicate
    subtiles and the pool served duplicate items (measured: 5 unique of
    a top-30 at n=1000).  Covers both pool paths (extract <= 48 < top_k)."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.subtile_scan import (
        build_subtile_state, subtile_search)
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    rng = np.random.default_rng(11)
    n, f, topk = 1000, 64, 30
    xu = unit_normalize(jnp.asarray(
        rng.standard_normal((n, f), dtype=np.float32)))
    lam = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    st = build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    q = 16
    qn = unit_normalize(jnp.asarray(
        rng.standard_normal((q, f), dtype=np.float32)))
    lam_q = jnp.asarray(rng.uniform(0.05, 0.3, q).astype(np.float32))
    idx_s, _ = subtile_search(st["xu_scan"], st["xu_f32"], st["lambdas"],
                              qn, lam_q, jnp.float32(0.62), st["n_real"],
                              topk=topk, pool_m=pool_m)
    isb = np.asarray(idx_s)
    assert isb.max() < n
    for i in range(q):
        assert len(set(isb[i])) == topk, f"duplicates in row {i}: {isb[i]}"
    idx_e, _ = lambda_aware_topk_batch(xu, lam, qn, lam_q,
                                       jnp.float32(0.62), topk)
    ie = np.asarray(idx_e)
    overlap = np.mean([len(set(ie[i]) & set(isb[i])) / topk
                       for i in range(q)])
    assert overlap >= 0.99, overlap


def test_subtile_partial_subtile_routing_exact():
    """r3 review regression: zero-pad rows in the PARTIALLY-padded last
    subtile scored (1-tau)/(1+|lam_pad-lam_q|) ~ 0.127 in phase a,
    inflating that subtile's routing max and (with s_keep == topk, no
    slack) evicting a real subtile — losing true top-k items for
    near-orthogonal queries.  n=3000: last subtile = 56 real + 8 pad."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.subtile_scan import (
        build_subtile_state, subtile_search)
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    rng = np.random.default_rng(3)
    n, f, topk = 3000, 128, 16
    xu = unit_normalize(jnp.asarray(
        rng.standard_normal((n, f), dtype=np.float32)))
    # lambda-mismatched corpus: blended scores small enough that the
    # 0.127 pad score would out-rank the k-th best real subtile max.
    lam = jnp.asarray(rng.uniform(5.0, 9.0, n).astype(np.float32))
    st = build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    q = 32
    qn = unit_normalize(jnp.asarray(
        rng.standard_normal((q, f), dtype=np.float32)))
    lam_q = jnp.asarray(rng.uniform(0.05, 0.2, q).astype(np.float32))
    idx_s, _ = subtile_search(st["xu_scan"], st["xu_f32"], st["lambdas"],
                              qn, lam_q, jnp.float32(0.62), st["n_real"],
                              topk=topk, n_subtiles_keep=topk)
    idx_e, _ = lambda_aware_topk_batch(xu, lam, qn, lam_q,
                                       jnp.float32(0.62), topk)
    ie, isb = np.asarray(idx_e), np.asarray(idx_s)
    overlap = np.mean([len(set(ie[i]) & set(isb[i])) / topk
                       for i in range(q)])
    assert overlap == 1.0, overlap


def test_subtile_two_level_fallback_matches_single_level(monkeypatch):
    """The two-level select (used beyond _SINGLE_LEVEL_MAX_NSUB subtiles,
    where the one-level block no longer fits VMEM) must pick the same
    results as the one-level path."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas import subtile_scan as ss
    rng = np.random.default_rng(21)
    # The one-level/two-level boundary is monkeypatched to 8 subtiles
    # below, so corpus size only needs n_sub > 8 with several second-level
    # groups: n_pad 4096 -> n_sub 64 -> 8 groups of 8 (was 30000/512/64 —
    # 92 s of interpret-mode scan for the same coverage).
    n, f, topk = 4000, 64, 10
    xu = unit_normalize(jnp.asarray(
        rng.standard_normal((n, f), dtype=np.float32)))
    lam = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    st = ss.build_subtile_state(xu, lam, scan_dtype=jnp.float32)
    q = 16
    qn = unit_normalize(jnp.asarray(
        rng.standard_normal((q, f), dtype=np.float32)))
    lam_q = jnp.asarray(rng.uniform(0.05, 0.3, q).astype(np.float32))
    args = (st["xu_scan"], st["xu_f32"], st["lambdas"], qn, lam_q,
            jnp.float32(0.62), st["n_real"])
    idx_one, val_one = ss.subtile_search(*args, topk=topk)
    monkeypatch.setattr(ss, "_SINGLE_LEVEL_MAX_NSUB", 8)
    import jax
    jax.clear_caches()
    try:
        idx_two, val_two = ss.subtile_search(*args, topk=topk)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(idx_one), np.asarray(idx_two))
    np.testing.assert_allclose(np.asarray(val_one), np.asarray(val_two),
                               rtol=1e-6)
