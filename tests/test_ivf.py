"""IVF-accelerated serving mode: recall vs exact search."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder

GP = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(77)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    return aspace, gl, items


def test_ivf_builds_and_routes(built):
    aspace, gl, items = built
    ivf = aspace.enable_ivf(n_clusters=40)
    assert ivf.centroids.shape[0] == 40
    # every item is reachable: buckets + tail cover all ids exactly once
    ids = np.asarray(ivf.buckets).reshape(-1)
    ids = ids[ids >= 0].tolist() + [
        i for i in np.asarray(ivf.tail).tolist() if i >= 0]
    assert sorted(ids) == list(range(2000))


def test_ivf_recall_vs_exact(built):
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(1)
    queries = items[rng.choice(2000, 20, replace=False)] * 1.02
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    ai, _ = aspace.search_batch(queries, gl, 0.62, mode="ivf", n_probe=8)
    recalls = [len(set(ei[r].tolist()) & set(ai[r].tolist())) / 10
               for r in range(20)]
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_full_probe_is_exact(built):
    """Probing every cluster must reproduce the exact ranking."""
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(2)
    queries = items[rng.choice(2000, 5, replace=False)] * 1.05
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    ai, av = aspace.search_batch(queries, gl, 0.62, mode="ivf", n_probe=40)
    assert np.array_equal(ei, ai)
    np.testing.assert_allclose(ev, av, rtol=1e-6)


def test_blocked_ivf_recall_vs_exact(built):
    """Cluster-contiguous slab IVF (mode=ivf_block): high overlap at
    default probes; full coverage of the corpus partition."""
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(3)
    queries = items[rng.choice(2000, 32, replace=False)] * 1.02
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    bi, _ = aspace.search_batch(queries, gl, 0.62, mode="ivf_block",
                                n_probe=16)
    overlap = np.mean([len(set(ei[r].tolist()) & set(bi[r].tolist())) / 10
                       for r in range(32)])
    assert overlap >= 0.85, overlap
    # slab layout is a partition: every id present exactly once
    ids = np.asarray(aspace._ivf_blocked.slab_ids)
    assert sorted(ids[ids >= 0].tolist()) == list(range(2000))


def test_blocked_ivf_full_probe_is_exact(built):
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(4)
    queries = items[rng.choice(2000, 8, replace=False)] * 1.05
    ei, ev = aspace.search_batch(queries, gl, 0.62)
    bi, bv = aspace.search_batch(queries, gl, 0.62, mode="ivf_block",
                                 n_probe=40)
    assert np.array_equal(ei, bi)
    np.testing.assert_allclose(ev, bv, rtol=1e-5)


def test_assign_argmin_blocked_matches_oneshot(monkeypatch):
    """Blockwise nearest-centroid assignment (HBM-bounded path for IVF
    cluster counts) is identical to the one-shot [N, K] computation."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.reduction import pipeline as rp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1003, 24)))   # non-multiple of block
    c = jnp.asarray(rng.normal(size=(37, 24)))
    ref = np.asarray(rp._assign_argmin(x, c))
    monkeypatch.setattr(rp, "_ASSIGN_BLOCK_ELEMS", 37 * 64)  # force blocking
    blocked = np.asarray(rp._assign_argmin(x, c))
    assert np.array_equal(ref, blocked)
    assert blocked.shape == (1003,)


def test_blocked_ivf_skewed_clusters_partition_and_exactness():
    """Heavy cluster skew forces the overflow/spill path of
    build_blocked_ivf: the slab layout must stay a partition (every item
    exactly once) and full probing must still recover the exact top-k."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.ops.distance import unit_normalize

    rng = np.random.default_rng(11)
    n, f, k = 1500, 16, 12
    x = rng.normal(size=(n, f))
    xu = np.asarray(unit_normalize(jnp.asarray(x, dtype=jnp.float32)))
    lams = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    # 85% of items in cluster 0 -> far beyond cap, spills everywhere.
    assign = np.where(rng.uniform(size=n) < 0.85, 0,
                      rng.integers(1, k, size=n)).astype(np.int32)
    cents = rng.normal(size=(k, f)).astype(np.float32)
    ivf = build_blocked_ivf(jnp.asarray(xu), jnp.asarray(lams), cents,
                            assign)
    ids = np.asarray(ivf.slab_ids)
    assert sorted(ids[ids >= 0].tolist()) == list(range(n))

    q = xu[:8] * 1.01
    lam_q = jnp.asarray(lams[:8])
    bi, bv = blocked_ivf_search(ivf, jnp.asarray(q), lam_q, 0.62, 10,
                                n_probe=k)
    # Exact reference: full blended scan in f32.
    cos = q @ xu.T
    prox = 1.0 / (1.0 + np.abs(lams[None, :] - lams[:8, None]))
    score = 0.62 * cos + 0.38 * prox
    for r in range(8):
        exact_top = set(np.argsort(-score[r])[:10].tolist())
        assert set(np.asarray(bi)[r].tolist()) == exact_top, r


def test_blocked_ivf_partial_block_queries(built):
    """A padded last block must not let padding rows vote: with a single
    query (7 padded rows in its 8-block) and n_probe=2, padded votes for
    clusters {0, 1} would displace the query's own demand and lose its
    group entirely."""
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(21)
    for qi in (123, 777, 1501):
        query = (items[qi] * 1.02)[None, :]
        ei, _ = aspace.search_batch(query, gl, 0.62)
        bi, _ = aspace.search_batch(query, gl, 0.62, mode="ivf_block",
                                    n_probe=2)
        overlap = len(set(ei[0].tolist()) & set(bi[0].tolist())) / 10
        assert overlap >= 0.7, (qi, overlap, ei[0], bi[0])


def test_blocked_ivf_fused_matches_unfused(built):
    """The single-dispatch fused serving path (synthesis + routing + scan
    in one program) must produce exactly what the two-step path does."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import blocked_ivf_search
    from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
    from pyarrowspace_tpu.spectral.taumode import synthesize

    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(31)
    queries = items[rng.choice(2000, 16, replace=False)] * 1.02
    fi, fv = aspace.search_batch(queries, gl, 0.62, mode="ivf_block",
                                 n_probe=12)

    q = jnp.asarray(queries, dtype=aspace._data.dtype)
    e_un = rayleigh_batch(q, aspace._lap_f, normalized=False)
    g = dispersion_batch(q, aspace._w_f, e_un)
    lam_q = synthesize(e_un, g, aspace._tau_star, aspace._tau_mix)
    qn32 = unit_normalize(jnp.asarray(queries, dtype=jnp.float32))
    ui, uv = blocked_ivf_search(aspace._ivf_blocked, qn32,
                                lam_q.astype(jnp.float32), 0.62, 10,
                                n_probe=12)
    assert np.array_equal(fi[:, :10], np.asarray(ui))
    np.testing.assert_allclose(fv[:, :10], np.asarray(uv), rtol=1e-5)


def test_blocked_ivf_bf16_slabs(built):
    """Opt-in bf16 slabs (half the probe DMA bytes): full probing must
    still track the exact top-k closely — bf16 rounding may flip
    near-ties only."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
    from pyarrowspace_tpu.spectral.taumode import synthesize

    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    ivf16 = build_blocked_ivf(aspace._data_unit, aspace._lambdas,
                              aspace._centroids, aspace._assignments,
                              slab_dtype=jnp.bfloat16)
    assert ivf16.slabs.dtype == jnp.bfloat16
    rng = np.random.default_rng(41)
    queries = items[rng.choice(2000, 8, replace=False)] * 1.02
    q = jnp.asarray(queries, dtype=aspace._data.dtype)
    e_un = rayleigh_batch(q, aspace._lap_f, normalized=False)
    g = dispersion_batch(q, aspace._w_f, e_un)
    lam_q = synthesize(e_un, g, aspace._tau_star, aspace._tau_mix)
    qn32 = unit_normalize(jnp.asarray(queries, dtype=jnp.float32))
    bi, _ = blocked_ivf_search(ivf16, qn32, lam_q.astype(jnp.float32),
                               0.62, 10, n_probe=40)
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    overlap = np.mean([len(set(ei[r].tolist()) &
                           set(np.asarray(bi)[r].tolist())) / 10
                       for r in range(8)])
    assert overlap >= 0.9, overlap


def test_blocked_ivf_certification_sound(built):
    """The per-query exactness certificate must be SOUND: every certified
    query's served top-k equals the exact blended-scan top-k.  Full
    probing certifies everything; tiny probing must leave some queries
    uncertified (the bound has teeth) while staying sound."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import blocked_ivf_search
    from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
    from pyarrowspace_tpu.spectral.taumode import synthesize

    from pyarrowspace_tpu.ops.pallas.ivf_scan import build_blocked_ivf

    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    ivf = build_blocked_ivf(aspace._data_unit, aspace._lambdas,
                            aspace._centroids, aspace._assignments)
    assert ivf.radii is not None

    rng = np.random.default_rng(51)
    # Mix of in-distribution and random (harder-to-route) queries.
    queries = np.concatenate([
        items[rng.choice(2000, 16, replace=False)] * 1.02,
        rng.normal(size=(16, 32))])
    q = jnp.asarray(queries, dtype=aspace._data.dtype)
    e_un = rayleigh_batch(q, aspace._lap_f, normalized=False)
    g = dispersion_batch(q, aspace._w_f, e_un)
    lam_q = synthesize(e_un, g, aspace._tau_star, aspace._tau_mix)
    qn32 = unit_normalize(jnp.asarray(queries, dtype=jnp.float32))
    lam32 = lam_q.astype(jnp.float32)

    ei, _ = aspace.search_batch(queries, gl, 0.62)

    # Full probe: everything certified, everything exact.
    _, _, cert_full = blocked_ivf_search(ivf, qn32, lam32, 0.62, 10,
                                         n_probe=40, certify=True)
    assert np.asarray(cert_full).all()

    # Tiny probe: sound on certified queries, with real refusals.
    bi, _, cert = blocked_ivf_search(ivf, qn32, lam32, 0.62, 10,
                                     n_probe=3, certify=True)
    cert = np.asarray(cert)
    bi = np.asarray(bi)
    for r in range(len(queries)):
        if cert[r]:
            assert set(bi[r].tolist()) == set(ei[r].tolist()), r
    assert not cert.all(), "n_probe=3 certified everything — bound inert?"


def test_search_batch_certify_surface(built):
    """certify=True through the public surface: (idx, vals, cert) with a
    sound certificate; rejected for non-ivf_block modes."""
    import pytest as _pytest

    aspace, gl, items = built
    rng = np.random.default_rng(61)
    queries = items[rng.choice(2000, 16, replace=False)] * 1.02
    bi, bv, cert = aspace.search_batch(queries, gl, 0.62, mode="ivf_block",
                                       n_probe=40, certify=True)
    assert cert.shape == (16,) and cert.all()
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    for r in range(16):
        assert set(bi[r].tolist()) == set(ei[r].tolist())
    with _pytest.raises(ValueError, match="certify"):
        aspace.search_batch(queries, gl, 0.62, mode="exact", certify=True)


def test_certified_mode_is_exact(built):
    """mode="certified" must serve the exact top-k for EVERY query (IVF
    where certified, escalated exact scan elsewhere) — including
    adversarial off-distribution queries that refuse certification."""
    aspace, gl, items = built
    rng = np.random.default_rng(71)
    queries = np.concatenate([
        items[rng.choice(2000, 8, replace=False)] * 1.02,
        rng.normal(size=(8, 32)),
        -items[rng.choice(2000, 3, replace=False)]])
    ci, cv = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                 n_probe=8)
    ei, ev = aspace.search_batch(queries, gl, 0.62, mode="exact")
    for r in range(len(queries)):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r
    # scores agree on the common ordering
    np.testing.assert_allclose(np.sort(cv, axis=1), np.sort(ev, axis=1),
                               rtol=2e-5, atol=1e-6)


def test_blocked_ivf_overflow_spills_to_near_clusters():
    """Spilled items (beyond their cluster's capacity) must land in a
    cluster among their nearest with free capacity — not an arbitrary
    slot — so the adopting slab's covering radius stays tight."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import build_blocked_ivf

    rng = np.random.default_rng(81)
    n, f, k = 1200, 16, 8
    x = rng.normal(size=(n, f))
    xu = np.asarray(unit_normalize(jnp.asarray(x, dtype=jnp.float32)))
    lams = rng.uniform(0.1, 0.9, size=n).astype(np.float32)
    assign = np.where(rng.uniform(size=n) < 0.7, 0,
                      rng.integers(1, k, size=n)).astype(np.int32)
    cents = rng.normal(size=(k, f)).astype(np.float32)
    ivf = build_blocked_ivf(jnp.asarray(xu), jnp.asarray(lams), cents,
                            assign)
    ids = np.asarray(ivf.slab_ids).reshape(k, ivf.cap)
    cu = np.asarray(ivf.centroids_unit)
    sims_all = xu @ cu.T                                  # [n, k]
    nearest4 = np.argsort(-sims_all, axis=1)[:, :4]
    spilled_near = spilled_total = 0
    for c in range(k):
        members = ids[c][ids[c] >= 0]
        for item in members:
            if assign[item] != c:                         # spilled here
                spilled_total += 1
                spilled_near += int(c in nearest4[item])
    assert spilled_total > 0                              # skew forces spill
    # The greedy fills nearest-with-capacity; with 30% of items across 7
    # clusters, most spills find a near home.
    assert spilled_near / spilled_total >= 0.5, (
        spilled_near, spilled_total)


def test_certified_mode_narrow_serving_width_escalates(built):
    """When cap * n_probe < topk the certificate cannot cover the request
    width.  With widening disabled (n_widen=0) every query must escalate
    to the exact path (bitwise f64 output); with widening on, the grown
    probe width may serve queries f32-certified — still the exact top-k
    set."""
    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)   # cap=128 -> 128 < topk at n_probe=1
    rng = np.random.default_rng(91)
    queries = items[rng.choice(2000, 4, replace=False)] * 1.02
    ei, ev = aspace.search_batch(queries, gl, 0.62, topk=200, mode="exact")
    # cap is 128 here (lane-dim floor); topk=200 > cap * n_probe=1.
    ci, cv = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                 topk=200, n_probe=1, n_widen=0)
    assert ci.shape == (4, 200)
    assert np.array_equal(ci, ei)
    np.testing.assert_allclose(cv, ev, rtol=1e-12)
    # Widening grows the served width past topk (n_probe 1 -> 2 -> 4);
    # whatever certifies is served f32-exact, the rest escalates.
    wi, wv = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                 topk=200, n_probe=1)
    assert wi.shape == (4, 200)
    for r in range(4):
        assert set(wi[r].tolist()) == set(ei[r].tolist()), r
    np.testing.assert_allclose(np.sort(wv, axis=1), np.sort(ev, axis=1),
                               rtol=2e-5, atol=1e-6)


def test_certification_margin_is_conservative(built):
    """margin > 0 must only REFUSE MORE (never certify a query that
    margin=0 refused) — the conservative direction."""
    import jax.numpy as jnp
    from pyarrowspace_tpu.ops.distance import unit_normalize
    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
    from pyarrowspace_tpu.spectral.taumode import synthesize

    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    ivf = build_blocked_ivf(aspace._data_unit, aspace._lambdas,
                            aspace._centroids, aspace._assignments)
    rng = np.random.default_rng(95)
    queries = items[rng.choice(2000, 24, replace=False)] * 1.02
    q = jnp.asarray(queries, dtype=aspace._data.dtype)
    e_un = rayleigh_batch(q, aspace._lap_f, normalized=False)
    g = dispersion_batch(q, aspace._w_f, e_un)
    lam_q = synthesize(e_un, g, aspace._tau_star, aspace._tau_mix)
    qn32 = unit_normalize(jnp.asarray(queries, dtype=jnp.float32))
    lam32 = lam_q.astype(jnp.float32)
    certs = {}
    for m in (0.0, 0.05, 0.5):
        _, _, c = blocked_ivf_search(ivf, qn32, lam32, 0.62, 10,
                                     n_probe=6, certify=True, margin=m)
        certs[m] = np.asarray(c)
    assert (~certs[0.0] | certs[0.0]).all()  # sanity
    # monotone: certified at larger margin => certified at smaller
    assert not np.any(certs[0.05] & ~certs[0.0])
    assert not np.any(certs[0.5] & ~certs[0.05])
    # a large margin must actually bite on this fixture
    assert certs[0.5].sum() <= certs[0.0].sum()


def test_widen_refusals_mechanics():
    """Bound-ordered widening unit mechanics: refusals re-probe at doubled
    n_probe, only rows whose OWN certificate holds are spliced, batches
    pad to powers of two, and the n_probe ceiling stops the loop."""
    from pyarrowspace_tpu.ops.pallas.ivf_scan import widen_refusals

    topk, n_q = 4, 5
    idx0 = np.full((n_q, topk), -7, dtype=np.int32)
    val0 = np.zeros((n_q, topk), dtype=np.float32)
    cert0 = np.array([True, False, False, False, False])
    calls = []

    def run_certified(sel, np2):
        calls.append((list(sel), np2))
        m = len(sel)
        i = np.full((m, topk), np2, dtype=np.int32)
        v = np.full((m, topk), float(np2), dtype=np.float32)
        c = np.array([(s == 1 and np2 >= 4) or (s == 2 and np2 >= 8)
                      for s in sel])
        return i, v, c

    idx, vals, cert = widen_refusals(idx0, val0, cert0, run_certified,
                                     topk, n_probe=2, n_probe_max=8)
    assert cert.tolist() == [True, True, True, False, False]
    assert (idx[1] == 4).all() and (vals[1] == 4.0).all()   # round 1 splice
    assert (idx[2] == 8).all() and (vals[2] == 8.0).all()   # round 2 splice
    assert (idx[0] == -7).all() and (idx[3] == -7).all()    # untouched
    # two rounds (2->4->8), each padded to a power of two
    assert [c[1] for c in calls] == [4, 8]
    assert [len(c[0]) for c in calls] == [4, 4]   # {1,2,3,4}, {2,3,4}+pad
    # the ceiling stops a third round even though refusals remain
    assert len(calls) == 2


def test_widen_refusals_width_growth():
    """When the initial serving width is clamped below topk, widening must
    treat everything as refused and grow the output width once a round
    serves the full topk."""
    from pyarrowspace_tpu.ops.pallas.ivf_scan import widen_refusals

    topk = 4
    idx0 = np.zeros((3, 2), dtype=np.int32)       # width 2 < topk
    val0 = np.zeros((3, 2), dtype=np.float32)
    cert0 = np.array([True, True, True])           # ignored: width-clamped

    def run_certified(sel, np2):
        m = len(sel)
        w = 2 if np2 == 4 else topk                 # first round still narrow
        i = np.full((m, w), np2, dtype=np.int32)
        v = np.full((m, w), float(np2), dtype=np.float32)
        return i, v, np.ones(m, dtype=bool)

    idx, vals, cert = widen_refusals(idx0, val0, cert0, run_certified,
                                     topk, n_probe=2, n_probe_max=16)
    assert idx.shape == (3, topk) and cert.all()
    assert (idx == 8).all()                         # the np2=8 wide round


def test_certified_mode_widening_integration(built, monkeypatch):
    """mode="certified" with widening: exactness holds for every query and
    the certificate handed to the exact-escalation stage is at least as
    good as the raw n_probe certificate (widening only adds)."""
    import pyarrowspace_tpu.ops.pallas.ivf_scan as ivf_mod

    aspace, gl, items = built
    aspace.enable_ivf(n_clusters=40)
    rng = np.random.default_rng(101)
    queries = np.concatenate([
        items[rng.choice(2000, 12, replace=False)] * 1.02,
        rng.normal(size=(4, 32))])

    # q_block=8: 16 topically-diverse queries sharing ONE 16-wide probe
    # block certify below the widening guardrail (the qb=16 default is
    # calibrated for large coherent serving batches — see search_batch
    # docstring); narrow blocks keep this toy batch in the widening
    # regime the test exercises.
    _, _, cert_raw = aspace.search_batch(queries, gl, 0.62,
                                         mode="ivf_block", n_probe=3,
                                         certify=True, q_block=8)
    seen = {}
    orig_esc = ivf_mod.escalate_uncertified
    orig_widen = ivf_mod.widen_refusals

    def spy_esc(idx, vals, cert, run_exact, topk):
        seen["cert_after_widen"] = np.array(cert, dtype=bool)
        return orig_esc(idx, vals, cert, run_exact, topk)

    def spy_widen(idx, vals, cert, run_certified, topk, n_probe,
                  n_probe_max):
        seen["n_probe_max"] = n_probe_max
        return orig_widen(idx, vals, cert, run_certified, topk, n_probe,
                          n_probe_max)

    monkeypatch.setattr(ivf_mod, "escalate_uncertified", spy_esc)
    monkeypatch.setattr(ivf_mod, "widen_refusals", spy_widen)

    ci, cv = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                 n_probe=3, n_widen=4, q_block=8)
    ei, ev = aspace.search_batch(queries, gl, 0.62, mode="exact")
    for r in range(len(queries)):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r
    assert seen["n_probe_max"] >= 6            # widening was possible
    after = seen["cert_after_widen"]
    assert after.sum() >= cert_raw.sum()       # widening only adds


def _planted_mixture(seed=5, k_mix=24, n=3000, f=64, noise=0.35):
    """Well-separated high-dim gaussian mixture (the corpus regime IVF
    routing and certification are designed for)."""
    import jax.numpy as jnp

    from pyarrowspace_tpu.ops.distance import unit_normalize

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k_mix, f))
    assign = rng.integers(0, k_mix, size=n)
    x = centers[assign] + noise * rng.normal(size=(n, f))
    xu = np.asarray(unit_normalize(jnp.asarray(x, dtype=jnp.float32)))
    return xu, assign, rng


def test_lloyd_reseed_recovers_mixture():
    """Random-init Lloyd merges well-separated components (near-sqrt(2)
    covering radii -> saturated certification bounds); lloyd_reseed's
    empty+twin recycling must recover the planted mixture with tight
    radii.  This pins the clustering quality the 1M x 768 certified
    serving mode depends on (measured: 0% certified with plain Lloyd,
    99%+ at n_probe=8 after the fix)."""
    import jax.numpy as jnp

    from pyarrowspace_tpu.reduction.pipeline import _lloyd, lloyd_reseed

    xu, assign, rng = _planted_mixture()
    k_mix, n = 24, xu.shape[0]
    sel = rng.choice(n, size=k_mix, replace=False)
    cp, ap = _lloyd(jnp.asarray(xu), jnp.asarray(xu[sel]), 12)
    cr, ar = lloyd_reseed(jnp.asarray(xu), jnp.asarray(xu[sel]), 12,
                          seed=0)

    def purity(a):
        a = np.asarray(a)
        return sum(np.bincount(assign[a == c]).max()
                   for c in range(k_mix) if (a == c).any()) / n

    def max_radius(c, a):
        c, a = np.array(c), np.asarray(a)
        cu = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                            1e-30)
        return float(np.linalg.norm(xu - cu[a], axis=1).max())

    assert purity(ar) >= 0.97, purity(ar)
    assert purity(ar) > purity(ap)      # random init provably merged here
    # Tight covering radii: merged components sit ~sqrt(2) out.
    assert max_radius(cr, ar) < 0.9, max_radius(cr, ar)
    assert max_radius(cr, ar) < max_radius(cp, ap)
    # Deterministic for a fixed seed.
    cr2, ar2 = lloyd_reseed(jnp.asarray(xu), jnp.asarray(xu[sel]), 12,
                            seed=0)
    assert np.array_equal(np.asarray(ar), np.asarray(ar2))


def test_certification_rate_on_mixture():
    """With lloyd_reseed clusters on a planted mixture and in-distribution
    queries, most queries certify at a small n_probe — and every
    certified query's top-k equals the exact blended scan's."""
    import jax.numpy as jnp

    from pyarrowspace_tpu.ops.pallas.ivf_scan import (blocked_ivf_search,
                                                      build_blocked_ivf)
    from pyarrowspace_tpu.ops.search import lambda_aware_topk_batch
    from pyarrowspace_tpu.reduction.pipeline import lloyd_reseed

    xu, _, rng = _planted_mixture()
    n, f = xu.shape
    lams = jnp.asarray(rng.uniform(0.3, 0.5, size=n).astype(np.float32))
    sel = rng.choice(n, size=24, replace=False)
    cents, assigns = lloyd_reseed(jnp.asarray(xu), jnp.asarray(xu[sel]),
                                  12, seed=0)
    ivf = build_blocked_ivf(jnp.asarray(xu), lams, np.asarray(cents),
                            np.asarray(assigns))

    rows = rng.choice(n, size=64, replace=False)
    q = xu[rows] + (0.25 / np.sqrt(f)) * rng.standard_normal(
        (64, f)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qn = jnp.asarray(qn)
    lam_q = lams[jnp.asarray(rows)]

    ei, _ = lambda_aware_topk_batch(jnp.asarray(xu), lams, qn, lam_q,
                                    0.62, 15)
    ei = np.asarray(ei)
    idx, _, cert = blocked_ivf_search(ivf, qn, lam_q, 0.62, 15,
                                      n_probe=8, certify=True)
    idx, cert = np.asarray(idx), np.asarray(cert)
    assert cert.mean() >= 0.85, cert.mean()
    for i in np.flatnonzero(cert):
        assert list(idx[i]) == list(ei[i]), i


def test_slab_capacity_factor_threads_to_blocked_layout(tmp_path):
    """enable_ivf's capacity factor must reach the blocked-slab layout —
    the [K*cap, F] slab array is the HBM-expensive one (at 1M x 768 the
    silent 2.0 default was +2 GiB over the requested 1.5 and overflowed
    one chip), and a loaded index must rebuild the SAME layout."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16)).astype(np.float32) * 4.0
    items = (np.repeat(centers, 256, axis=0)
             + 0.2 * rng.normal(size=(2048, 16)).astype(np.float32))
    aspace, gl = ArrowSpaceBuilder.build(GP, items)

    aspace.enable_ivf(n_clusters=8, capacity_factor=1.5)
    lean = aspace._ensure_ivf_blocked()
    k_final = aspace._centroids.shape[0]
    # n/k = 256 puts the two factors in different 128-lane buckets:
    # ceil(1.5*2048/8)=384 vs ceil(2.0*2048/8)=512.
    assert aspace._ivf_cap_factor == 1.5
    assert lean.cap < 512, lean.cap
    assert lean.cap >= int(np.ceil(1.5 * 2048 / k_final))

    # Factor change without reclustering: the blocked layout rebuilds,
    # but min_cap (the tightening's size cap) keeps spill-freedom.
    aspace.enable_ivf(capacity_factor=2.0)
    fat = aspace._ensure_ivf_blocked()
    assert fat.cap >= lean.cap
    assert fat.cap == max(512, aspace._ivf_cap_plan), fat.cap

    # Both layouts partition the corpus: every id exactly once.
    for b in (lean, fat):
        ids = np.asarray(b.slab_ids)
        ids = ids[ids >= 0]
        assert sorted(ids.tolist()) == list(range(2048))

    # Save/load round-trips the layout plan, so the rebuilt slabs match.
    aspace.enable_ivf(n_clusters=8, capacity_factor=1.5)
    from pyarrowspace_tpu.io import load_index, save_index
    p = str(tmp_path / "idx.npz")
    save_index(p, aspace, gl)
    loaded, _ = load_index(p)
    assert getattr(loaded, "_ivf_cap_plan", None) == aspace._ivf_cap_plan
    assert getattr(loaded, "_ivf_cap_factor", None) == 1.5
    lb = loaded._ensure_ivf_blocked()
    assert lb.cap == aspace._ensure_ivf_blocked().cap
