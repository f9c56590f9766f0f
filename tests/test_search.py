"""Search-path behavior: cosine degeneration at tau=1, blending, batching."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder

GP = {"eps": 0.9, "k": 8, "topk": 10, "p": 2.0, "sigma": 0.3}


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(42)
    items = rng.normal(size=(120, 24)) + 0.4
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    return aspace, gl, items


def cosine_order(items, q, topk):
    xu = items / np.linalg.norm(items, axis=1, keepdims=True)
    qu = q / np.linalg.norm(q)
    return list(np.argsort(-(xu @ qu), kind="stable")[:topk])


def test_tau_one_is_pure_cosine(built):
    aspace, gl, items = built
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = rng.normal(size=items.shape[1]) + 0.4
        got = [i for i, _ in aspace.search(q, gl, 1.0)]
        assert got == cosine_order(items, q, GP["topk"])


def test_hybrid_tau_one_is_pure_cosine(built):
    aspace, gl, items = built
    q = items[3] * 1.2
    got = [i for i, _ in aspace.search_hybrid(q, gl, 1.0)]
    assert got == cosine_order(items, q, GP["topk"])


def test_blend_changes_ranking(built):
    """tau < 1 must actually use lambda proximity (rankings differ for some
    query); guards against the blend silently degenerating to cosine."""
    aspace, gl, items = built
    rng = np.random.default_rng(2)
    diffs = 0
    for _ in range(10):
        q = rng.normal(size=items.shape[1]) + 0.4
        a = [i for i, _ in aspace.search(q, gl, 1.0)]
        b = [i for i, _ in aspace.search(q, gl, 0.5)]
        diffs += a != b
    assert diffs > 0


def test_score_formula(built):
    """score = tau*cos + (1-tau)/(1+|lam_i - lam_q|) exactly
    (reference TAUMODE.md:33)."""
    aspace, gl, items = built
    q = items[7] * 1.1
    tau = 0.62
    lam_q = aspace.prepare_query_item(q, gl)
    lams = aspace.lambdas()
    xu = items / np.linalg.norm(items, axis=1, keepdims=True)
    cos = xu @ (q / np.linalg.norm(q))
    expected = tau * cos + (1 - tau) / (1 + np.abs(lams - lam_q))
    hits = aspace.search(q, gl, tau)
    for i, s in hits:
        assert s == pytest.approx(expected[i], rel=1e-6)


def test_batch_matches_single(built):
    aspace, gl, items = built
    rng = np.random.default_rng(3)
    queries = rng.normal(size=(6, items.shape[1])) + 0.4
    idx, vals = aspace.search_batch(queries, gl, 0.7)
    assert idx.shape == (6, GP["topk"])
    for qi in range(6):
        single = aspace.search(queries[qi], gl, 0.7)
        assert list(idx[qi]) == [i for i, _ in single]
        np.testing.assert_allclose(vals[qi], [s for _, s in single],
                                   rtol=1e-6)


def test_search_energy_returns_k(built):
    aspace, gl, items = built
    hits = aspace.search_energy(items[0], gl, 5)
    assert len(hits) == 5
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)
    # default weights parity: w_lambda=1.0, w_dirichlet=0.5
    hits2 = aspace.search_energy(items[0], gl, 5, 1.0, 0.5)
    assert hits == hits2


def test_energy_search_self_retrieval(built):
    """An exact stored item should rank itself (equal lambda and energy)
    at the top under energy scoring."""
    aspace, gl, items = built
    for probe in (0, 11, 42):
        hits = aspace.search_energy(items[probe], gl, 3)
        assert hits[0][0] == probe


def test_pallas_scan_matches_xla(built):
    """Fused Pallas serving kernel (interpret mode) == XLA batch search."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.scan_topk import lambda_search_pallas
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    aspace, gl, items = built
    rng = np.random.default_rng(9)
    q = rng.normal(size=(7, items.shape[1])).astype(np.float32) + 0.4
    qn = unit_normalize(jnp.asarray(q))
    lam_q = jnp.asarray(rng.uniform(0.1, 0.3, size=7).astype(np.float32))
    xu = jnp.asarray(aspace._data_unit, dtype=jnp.float32)
    lams = jnp.asarray(aspace._lambdas, dtype=jnp.float32)
    i1, s1 = lambda_aware_topk_batch(xu, lams, qn, lam_q,
                                     jnp.float32(0.62), 10)
    i2, s2 = lambda_search_pallas(xu, lams, qn, lam_q, 0.62, 10,
                                  interpret=True)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_bf16_serving_view(built):
    """as_serving(bfloat16): self-retrieval exact, near-identical top-k."""
    import jax.numpy as jnp
    aspace, gl, items = built
    serving = aspace.as_serving(jnp.bfloat16)
    rng = np.random.default_rng(5)
    queries = items[rng.choice(items.shape[0], 10, replace=False)] * 1.01
    fi, _ = aspace.search_batch(queries, gl, 0.62)
    bi, _ = serving.search_batch(queries, gl, 0.62)
    # top-1 identical; top-10 overlap high (bf16 only breaks near-ties)
    assert np.array_equal(fi[:, 0], bi[:, 0])
    overlap = np.mean([len(set(fi[r]) & set(bi[r])) / fi.shape[1]
                       for r in range(10)])
    assert overlap >= 0.8, overlap


def test_hybrid_batch_matches_single(built):
    aspace, gl, items = built
    rng = np.random.default_rng(11)
    queries = rng.normal(size=(5, items.shape[1])) + 0.4
    idx, vals = aspace.search_hybrid_batch(queries, gl, 0.8)
    for r in range(5):
        single = aspace.search_hybrid(queries[r], gl, 0.8)
        assert list(idx[r]) == [i for i, _ in single]
        np.testing.assert_allclose(vals[r], [s for _, s in single],
                                   rtol=1e-6)


def test_energy_batch_matches_single(built):
    aspace, gl, items = built
    rng = np.random.default_rng(12)
    queries = rng.normal(size=(5, items.shape[1])) + 0.4
    idx, vals = aspace.search_energy_batch(queries, gl, 7)
    for r in range(5):
        single = aspace.search_energy(queries[r], gl, 7)
        assert list(idx[r]) == [i for i, _ in single]
        np.testing.assert_allclose(vals[r], [s for _, s in single],
                                   rtol=1e-6)


def test_quantized_scan_with_rescore_matches_exact(built):
    """int8 candidate scan + exact f32 rescore: the served top-k equals the
    exact f32 scan's (the rescore pool is 4x topk, and int8 cosine error
    ~4e-3 absolute cannot push a true top-k item out of a 4x pool on this
    corpus); rescored scores are the exact f32 scores."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.quantize import quantize_rows
    from pyarrowspace_tpu.ops.search import (fused_query_pipeline,
                                             fused_query_pipeline_quantized)
    aspace, gl, items = built
    rng = np.random.default_rng(21)
    q = jnp.asarray(
        items[rng.choice(items.shape[0], 16, replace=False)] * 1.01,
        dtype=jnp.float32)
    xu = aspace._data_unit.astype(jnp.float32)
    lam = aspace._lambdas.astype(jnp.float32)
    lap_f = aspace._lap_f.astype(jnp.float32)
    w_f = aspace._w_f.astype(jnp.float32)
    ts = aspace._tau_star.astype(jnp.float32)
    tau = jnp.float32(0.62)
    common = dict(rayleigh_normalized=aspace._rayleigh_normalized,
                  tau_mix=aspace._tau_mix)
    ie, ve = fused_query_pipeline(xu, lam, lap_f, w_f, ts, q, tau,
                                  topk=10, backend="xla", **common)
    xq, scales = quantize_rows(xu)
    iq, vq = fused_query_pipeline_quantized(xu, xq, scales, lam, lap_f,
                                            w_f, ts, q, tau, topk=10,
                                            rescore_m=40, **common)
    ie, iq = np.asarray(ie), np.asarray(iq)
    overlap = np.mean([len(set(ie[r]) & set(iq[r])) / 10.0
                       for r in range(16)])
    assert overlap >= 0.99, overlap
    same = ie == iq
    np.testing.assert_allclose(np.asarray(ve)[same], np.asarray(vq)[same],
                               rtol=1e-5)


def test_quantize_rows_bounds():
    """Per-row int8 quantization: elements in [-127, 127], dequant within
    one half-step of the input, zero rows exactly preserved."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.quantize import quantize_rows
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 64)).astype(np.float32)
    x[7] = 0.0
    xq, s = quantize_rows(jnp.asarray(x))
    xq, s = np.asarray(xq), np.asarray(s)
    assert xq.dtype == np.int8 and np.all(np.abs(xq) <= 127)
    deq = xq.astype(np.float32) * s[:, None]
    err = np.abs(deq - x)
    assert np.all(err <= s[:, None] * 0.5 + 1e-7)
    assert np.all(deq[7] == 0.0)


def test_search_batch_int8_mode(built):
    """mode="int8" serves the same top-k as exact on this corpus."""
    aspace, gl, items = built
    rng = np.random.default_rng(31)
    queries = items[rng.choice(items.shape[0], 8, replace=False)] * 1.01
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    qi, qv = aspace.search_batch(queries, gl, 0.62, mode="int8")
    overlap = np.mean([len(set(ei[r]) & set(qi[r])) / ei.shape[1]
                       for r in range(8)])
    assert overlap >= 0.99, overlap


def test_search_batch_subtile_mode(built):
    """mode="subtile" serves the same top-k as exact (block-max bound:
    selection is exact at the scan dtype; here the corpus is small enough
    that every subtile fits the routed pool)."""
    aspace, gl, items = built
    rng = np.random.default_rng(37)
    queries = items[rng.choice(items.shape[0], 8, replace=False)] * 0.99
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    si, sv = aspace.search_batch(queries, gl, 0.62, mode="subtile")
    overlap = np.mean([len(set(ei[r]) & set(si[r])) / ei.shape[1]
                       for r in range(8)])
    assert overlap >= 0.99, overlap
    same = ei == si
    np.testing.assert_allclose(np.asarray(ev)[same], np.asarray(sv)[same],
                               rtol=2e-5)


def test_search_batch_rejects_unknown_mode(built):
    aspace, gl, items = built
    with pytest.raises(ValueError, match="unknown search mode"):
        aspace.search_batch(items[:1], gl, 0.62, mode="warp")


def test_search_batch_auto_mode(built):
    """mode="auto" resolves to exact below the crossover (small corpus)
    and serves the exact scan's results."""
    aspace, gl, items = built
    ei, ev = aspace.search_batch(items[:4], gl, 0.62)
    ai, av = aspace.search_batch(items[:4], gl, 0.62, mode="auto")
    assert np.array_equal(ei, ai)
    np.testing.assert_allclose(ev, av, rtol=1e-12)
