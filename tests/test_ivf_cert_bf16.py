"""Precision-robust certified serving over reduced-precision slabs.

bf16 slabs halve the probe DMA bytes that dominate certified-serving cost
at 1M x 768, but reduced-precision scan scores can mis-rank items within
probed clusters.  ops/pallas/ivf_scan._blocked_ivf_cert_rescored_jit makes
them sound: pooled scan -> f32 rescore -> certificate with the extra
pool condition (pool_min + tau * scan_dot_eps < rescored kth).  These
tests pin soundness (certified == exact), teeth (refusals exist where
bf16 genuinely cannot separate), and the public surface.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyarrowspace_tpu import ArrowSpaceBuilder

GP = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(77)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    aspace.enable_ivf(n_clusters=40, slab_dtype=jnp.bfloat16)
    return aspace, gl, items


def _queries(items, rng, n_in=16, n_rand=8):
    return np.concatenate([
        items[rng.choice(len(items), n_in, replace=False)] * 1.02,
        rng.normal(size=(n_rand, items.shape[1]))])


def test_bf16_slabs_built(built):
    aspace, gl, items = built
    aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block", n_probe=4)
    assert aspace._ivf_blocked.slabs.dtype == jnp.bfloat16
    assert aspace._ivf_blocked.radii is not None


def test_bf16_certificate_sound(built):
    """Every certified query's served top-k equals the exact scan's,
    at full AND tiny probe counts; tiny probes must refuse some."""
    aspace, gl, items = built
    rng = np.random.default_rng(51)
    queries = _queries(items, rng)
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    for n_probe in (40, 3):
        bi, bv, cert = aspace.search_batch(
            queries, gl, 0.62, mode="ivf_block", n_probe=n_probe,
            certify=True)
        for r in range(len(queries)):
            if cert[r]:
                assert set(bi[r].tolist()) == set(ei[r].tolist()), \
                    (n_probe, r)
    # Precision-condition teeth: at the MINIMAL pool (m_pool == topk) the
    # pool boundary IS the kth score, so pool_min + eps > kth - slack
    # always — nothing may certify (any certification there would be
    # unsound: an unpooled probed item could sit within eps of kth).
    _, _, cert_min = aspace.search_batch(
        queries, gl, 0.62, mode="ivf_block", n_probe=40, certify=True,
        m_pool=10)
    assert not cert_min.any()


def test_bf16_certified_scores_f32_exact(built):
    """Certified rows' served scores are f32-exact (rescored), not bf16
    scan scores: they must match the exact scan's scores for the same
    items to f32 tolerance."""
    aspace, gl, items = built
    rng = np.random.default_rng(52)
    queries = _queries(items, rng)
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    bi, bv, cert = aspace.search_batch(queries, gl, 0.62, mode="ivf_block",
                                       n_probe=40, certify=True)
    for r in np.flatnonzero(cert):
        order_e = {int(i): float(v) for i, v in zip(ei[r], ev[r])}
        for i, v in zip(bi[r], bv[r]):
            assert int(i) in order_e
            np.testing.assert_allclose(v, order_e[int(i)], rtol=2e-5,
                                       atol=1e-5)


def test_certified_mode_bf16_exact_everywhere(built):
    """mode="certified" with bf16 slabs: exact top-k for EVERY query via
    widening + escalation, scores f32-exact."""
    aspace, gl, items = built
    rng = np.random.default_rng(53)
    queries = np.concatenate([_queries(items, rng, 8, 8),
                              -items[rng.choice(2000, 3, replace=False)]])
    ci, cv = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                 n_probe=4)
    ei, ev = aspace.search_batch(queries, gl, 0.62, mode="exact")
    for r in range(len(queries)):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r
    np.testing.assert_allclose(np.sort(cv, axis=1), np.sort(ev, axis=1),
                               rtol=2e-5, atol=1e-5)


def test_bf16_certify_requires_rescore_corpus():
    """The kernel-level surface refuses bf16 certification without the
    f32 rescore corpus (the certificate would be unsound)."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)

    rng = np.random.default_rng(5)
    xu = unit_normalize(jnp.asarray(rng.normal(size=(256, 16)),
                                    dtype=jnp.float32))
    lam = jnp.asarray(rng.uniform(0.1, 0.9, size=256), dtype=jnp.float32)
    cents = unit_normalize(jnp.asarray(rng.normal(size=(8, 16)),
                                       dtype=jnp.float32))
    assign = np.asarray(
        jnp.argmax(xu @ cents.T, axis=1))
    ivf = build_blocked_ivf(xu, lam, cents, assign,
                            slab_dtype=jnp.bfloat16)
    qn = xu[:4]
    lq = lam[:4]
    with pytest.raises(ValueError, match="rescore_corpus"):
        blocked_ivf_search(ivf, qn, lq, 0.62, 5, n_probe=8, certify=True)
    # With the corpus it runs and stays sound at full probe.
    idx, vals, cert = blocked_ivf_search(
        ivf, qn, lq, 0.62, 5, n_probe=8, certify=True,
        rescore_corpus=xu, rescore_lambdas=lam)
    assert idx.shape == (4, 5) and cert.shape == (4,)


def test_scan_dot_eps_model():
    """The dot-error bound: zero for f32, ~2^-7 for bf16 unit rows,
    smaller for f16; unknown dtypes refused."""
    from pyarrowspace_tpu.ops.pallas.ivf_scan import scan_dot_eps

    assert scan_dot_eps(jnp.float32, 768) == 0.0
    e_bf16 = scan_dot_eps(jnp.bfloat16, 768)
    assert 2.0 ** -7 < e_bf16 < 2.0 ** -6
    e_f16 = scan_dot_eps(jnp.float16, 768)
    assert e_f16 < e_bf16
    with pytest.raises(ValueError, match="dot-error"):
        scan_dot_eps(jnp.int8, 768)


def test_scan_dot_eps_bounds_observed_error():
    """Empirical: the bound dominates the actual bf16 dot error on random
    unit rows (the soundness of certificate condition (B))."""
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import scan_dot_eps

    rng = np.random.default_rng(9)
    f = 768
    x = np.asarray(unit_normalize(jnp.asarray(
        rng.normal(size=(512, f)), dtype=jnp.float32)))
    q = np.asarray(unit_normalize(jnp.asarray(
        rng.normal(size=(64, f)), dtype=jnp.float32)))
    exact = q.astype(np.float64) @ x.astype(np.float64).T
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16), dtype=np.float32)
    qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16), dtype=np.float32)
    approx = qb @ xb.T
    err = np.abs(approx - exact).max()
    assert err <= scan_dot_eps(jnp.bfloat16, f), (err,)


def test_cert_pool_width():
    from pyarrowspace_tpu.ops.pallas.ivf_scan import cert_pool_width

    assert cert_pool_width(None, 10, 10_000) == 40
    assert cert_pool_width(None, 2, 10_000) == 8     # topk + 6 floor
    assert cert_pool_width(64, 10, 10_000) == 64
    assert cert_pool_width(None, 10, 16) == 16       # served-width clamp
    with pytest.raises(ValueError, match="m_pool"):
        cert_pool_width(5, 10, 10_000)


@pytest.mark.slow
def test_enable_ivf_slab_dtype_invalidates():
    """Changing the slab dtype through enable_ivf rebuilds the blocked
    index; the env knob applies when no explicit choice exists."""
    rng = np.random.default_rng(21)
    items = rng.normal(size=(400, 16))
    aspace, gl = ArrowSpaceBuilder.build(
        {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0, "sigma": 0.3}, items)
    aspace.enable_ivf(n_clusters=8)
    aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block", n_probe=2)
    assert aspace._ivf_blocked.slabs.dtype == jnp.float32
    aspace.enable_ivf(n_clusters=None, slab_dtype=jnp.bfloat16)
    assert aspace._ivf_blocked is None
    aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block", n_probe=2)
    assert aspace._ivf_blocked.slabs.dtype == jnp.bfloat16


def test_env_slab_dtype(monkeypatch):
    rng = np.random.default_rng(22)
    items = rng.normal(size=(400, 16))
    aspace, gl = ArrowSpaceBuilder.build(
        {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0, "sigma": 0.3}, items)
    monkeypatch.setenv("ARROWSPACE_IVF_SLABS", "bf16")
    aspace.enable_ivf(n_clusters=8)
    idx, vals, cert = aspace.search_batch(
        items[:4], gl, 0.62, mode="ivf_block", n_probe=8, certify=True)
    assert aspace._ivf_blocked.slabs.dtype == jnp.bfloat16
    ei, _ = aspace.search_batch(items[:4], gl, 0.62)
    for r in np.flatnonzero(cert):
        assert set(idx[r].tolist()) == set(ei[r].tolist())


@pytest.mark.slow
def test_env_slab_dtype_unknown_raises(monkeypatch):
    """Unknown ARROWSPACE_IVF_SLABS values must raise, not silently serve
    f32 (a deployment that asked for int8 would get the wrong precision
    with no signal)."""
    rng = np.random.default_rng(23)
    items = rng.normal(size=(200, 16))
    aspace, gl = ArrowSpaceBuilder.build(
        {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0, "sigma": 0.3}, items)
    aspace.enable_ivf(n_clusters=8)
    monkeypatch.setenv("ARROWSPACE_IVF_SLABS", "int8")
    with pytest.raises(ValueError, match="ARROWSPACE_IVF_SLABS"):
        aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block",
                            n_probe=2)


def test_env_slab_dtype_change_rebuilds(monkeypatch):
    """Changing ARROWSPACE_IVF_SLABS after a blocked index was built must
    invalidate it — a stale-dtype index would keep serving the old
    precision."""
    rng = np.random.default_rng(24)
    items = rng.normal(size=(400, 16))
    aspace, gl = ArrowSpaceBuilder.build(
        {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0, "sigma": 0.3}, items)
    monkeypatch.setenv("ARROWSPACE_IVF_SLABS", "f32")
    aspace.enable_ivf(n_clusters=8)
    aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block", n_probe=2)
    assert aspace._ivf_blocked.slabs.dtype == jnp.float32
    monkeypatch.setenv("ARROWSPACE_IVF_SLABS", "bf16")
    aspace.search_batch(items[:4], gl, 0.62, mode="ivf_block", n_probe=2)
    assert aspace._ivf_blocked.slabs.dtype == jnp.bfloat16
