"""Multi-chip sharding parity on the virtual 8-device CPU mesh
(SURVEY.md §4: fake-collectives / multi-device-CPU path)."""

import numpy as np
import pytest

import jax

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.core.params import parse_graph_params
from pyarrowspace_tpu.parallel import build_sharded, make_mesh

GP_DICT = {"eps": 0.8, "k": 6, "topk": 9, "p": 2.0, "sigma": 0.3}


@pytest.fixture(scope="module")
def pair():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(0)
    items = rng.normal(size=(333, 48)) + 0.3
    mesh = make_mesh(8)
    sharded = build_sharded(items, parse_graph_params(GP_DICT), mesh)
    local = ArrowSpaceBuilder.build(GP_DICT, items)
    return sharded, local, items


def test_lambdas_identical(pair):
    (sspace, _), (aspace, _), _ = pair
    np.testing.assert_allclose(sspace.lambdas(), aspace.lambdas(), rtol=1e-8)
    assert sspace.tau_star == pytest.approx(aspace.tau_star, rel=1e-10)


def test_laplacian_identical(pair):
    (_, sgl), (_, gl), _ = pair
    np.testing.assert_allclose(sgl.to_dense(), gl.to_dense(), atol=1e-10)


def test_search_identical(pair):
    (sspace, _), (aspace, gl), items = pair
    queries = items[:5] * 1.03
    si, sv = sspace.search_batch(queries, 0.62)
    ai, av = aspace.search_batch(queries, gl, 0.62)
    assert np.array_equal(si, ai)
    np.testing.assert_allclose(sv, av, rtol=1e-8)


def test_search_subtile_matches_single_chip(pair):
    """Sharded subtile serving must agree with the single-chip subtile
    mode (same bf16 scan arithmetic per shard, exact all_gather merge)
    and with the exact scan on this well-separated corpus."""
    (sspace, _), (aspace, gl), items = pair
    queries = items[:5] * 1.03
    si, sv = sspace.search_batch(queries, 0.62, mode="subtile")
    ui, uv = aspace.search_batch(queries, gl, 0.62, mode="subtile")
    assert np.array_equal(si, ui), (si, ui)
    np.testing.assert_allclose(sv, uv, rtol=1e-5)
    ai, _ = aspace.search_batch(queries, gl, 0.62)
    overlap = np.mean([len(set(ai[r]) & set(si[r])) / ai.shape[1]
                       for r in range(len(queries))])
    assert overlap >= 0.99, overlap
    with pytest.raises(ValueError, match="unknown search mode"):
        sspace.search_batch(queries, 0.62, mode="warp")


@pytest.mark.slow
def test_mesh_sizes():
    """The pipeline must work at several device counts (1, 2, 4, 8)."""
    rng = np.random.default_rng(1)
    items = rng.normal(size=(100, 16)) + 0.3
    gp = parse_graph_params({"eps": 0.9, "k": 4, "topk": 5, "p": 2.0,
                             "sigma": 0.3})
    ref = None
    for nd in (1, 2, 4, 8):
        sspace, _ = build_sharded(items, gp, make_mesh(nd))
        lams = sspace.lambdas()
        if ref is None:
            ref = lams
        else:
            np.testing.assert_allclose(lams, ref, rtol=1e-8)


@pytest.mark.slow
def test_graft_entry_contract():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    fn, args = g.entry()
    idx, vals = jax.jit(fn)(*args)
    assert idx.shape == (16, 10)
    g.dryrun_multichip(8)


def test_dp_tp_lambdas_match_single_chip():
    """2-D (data x model) mesh: column-parallel Rayleigh/dispersion psums
    must reproduce the single-chip lambda stage exactly."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from pyarrowspace_tpu.graph.feature import build_feature_laplacian
    from pyarrowspace_tpu.ops.rayleigh import dispersion_batch, rayleigh_batch
    from pyarrowspace_tpu.parallel.tp import lambdas_dp_tp
    from pyarrowspace_tpu.spectral.taumode import (TAU_MIX, derive_tau_star,
                                                   synthesize)
    from pyarrowspace_tpu.core.params import TauMode

    rng = np.random.default_rng(44)
    n, f = 128, 64
    x = jnp.asarray(rng.normal(size=(n, f)) + 0.3)
    w_f, lap_f, _ = build_feature_laplacian(x, k_f=4)

    e = rayleigh_batch(x, lap_f, normalized=False)
    ts = derive_tau_star(e, TauMode.MEDIAN)
    g = dispersion_batch(x, w_f, e)
    lam_ref = synthesize(e, g, ts, TAU_MIX)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    lam, e2, ts2 = lambdas_dp_tp(x, lap_f, w_f, mesh=mesh, n_real=n)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), rtol=1e-10)
    assert float(ts2) == pytest.approx(float(ts), rel=1e-12)


def test_from_local_to_local_roundtrip(tmp_path):
    """build locally -> save -> load -> shard for serving -> identical
    results; then gather back to local."""
    from pyarrowspace_tpu.io import load_index, save_index
    from pyarrowspace_tpu.parallel import ShardedArrowSpace, make_mesh

    rng = np.random.default_rng(55)
    items = rng.normal(size=(200, 24)) + 0.3
    aspace, gl = ArrowSpaceBuilder.build(GP_DICT, items)
    path = str(tmp_path / "idx.npz")
    save_index(path, aspace, gl)
    loaded, gl2 = load_index(path)

    sspace = ShardedArrowSpace.from_local(loaded, gl2, make_mesh(8))
    queries = items[:4] * 1.02
    si, sv = sspace.search_batch(queries, 0.62)
    ai, av = aspace.search_batch(queries, gl, 0.62)
    assert np.array_equal(si, ai)
    np.testing.assert_allclose(sv, av, rtol=1e-8)

    back = sspace.to_local()
    np.testing.assert_allclose(back.lambdas(), aspace.lambdas(), rtol=1e-12)
    assert back.search(queries[0], gl, 0.62) == aspace.search(queries[0],
                                                              gl, 0.62)


def test_from_local_forwards_slab_layout_plan(tmp_path):
    """The local space's blocked-slab layout plan (enable_ivf size-capped
    clustering: min_cap + capacity factor) must ride save -> load ->
    from_local -> to_local, so every deployment path rebuilds the same
    spill-free slab layout instead of the fat 2.0 default."""
    from pyarrowspace_tpu.io import load_index, save_index
    from pyarrowspace_tpu.parallel import ShardedArrowSpace, make_mesh

    rng = np.random.default_rng(56)
    items = rng.normal(size=(256, 24)) + 0.3
    aspace, gl = ArrowSpaceBuilder.build(GP_DICT, items)
    aspace.enable_ivf(n_clusters=8, capacity_factor=1.5)
    assert aspace._ivf_cap_factor == 1.5
    path = str(tmp_path / "idx.npz")
    save_index(path, aspace, gl)
    loaded, gl2 = load_index(path)

    sspace = ShardedArrowSpace.from_local(loaded, gl2, make_mesh(4))
    assert sspace._ivf_cap_plan == aspace._ivf_cap_plan
    assert sspace._ivf_cap_factor == 1.5
    state = sspace._ensure_ivf_block_state()
    assert state[4] == aspace._ensure_ivf_blocked().cap  # same slab cap
    back = sspace.to_local()
    assert back._ivf_cap_plan == aspace._ivf_cap_plan
    assert back._ivf_cap_factor == 1.5


@pytest.mark.slow
def test_sharded_reduction_parity_large():
    """>=4096 items: the sharded build must take the same reduction path as
    the single-chip build (centroid signals feed the feature Laplacian) and
    reproduce its lambdas/tau* exactly (ADVICE round-1 high finding)."""
    rng = np.random.default_rng(9)
    items = rng.normal(size=(4608, 24)) + 0.3
    gp = parse_graph_params({"eps": 0.8, "k": 4, "topk": 5, "p": 2.0,
                             "sigma": 0.3})
    import dataclasses
    gp = dataclasses.replace(gp, dims_reduction=True, seed=42)
    sspace, sgl = build_sharded(items, gp, make_mesh(8))
    aspace, agl = ArrowSpaceBuilder.build(
        {"eps": 0.8, "k": 4, "topk": 5, "p": 2.0, "sigma": 0.3}, items)
    assert sspace._centroids is not None, \
        "sharded build skipped the reduction stage"
    np.testing.assert_allclose(sspace.lambdas(), aspace.lambdas(), rtol=1e-8)
    assert sspace.tau_star == pytest.approx(aspace.tau_star, rel=1e-10)
    queries = items[:3] * 1.03
    si, sv = sspace.search_batch(queries, 0.62)
    ai, av = aspace.search_batch(queries, agl, 0.62)
    assert np.array_equal(si, ai)


@pytest.mark.slow
def test_sharded_synthesis_modes():
    """tau* must dispatch on gp.synthesis (MEAN/MAX/FIXED), matching the
    single-chip derive_tau_star — not hardcoded median."""
    import dataclasses
    from pyarrowspace_tpu.core.params import TauMode
    from pyarrowspace_tpu.graph.build import build_standard

    rng = np.random.default_rng(11)
    items = rng.normal(size=(96, 16)) + 0.3
    base = parse_graph_params({"eps": 0.9, "k": 4, "topk": 5, "p": 2.0,
                               "sigma": 0.3})
    for mode, tf in ((TauMode.MEAN, None), (TauMode.MAX, None),
                     (TauMode.FIXED, 0.37)):
        gp = dataclasses.replace(base, synthesis=mode, tau_fixed=tf)
        sspace, _ = build_sharded(items, gp, make_mesh(4))
        aspace, _ = build_standard(items, gp)
        np.testing.assert_allclose(sspace.lambdas(), aspace.lambdas(),
                                   rtol=1e-8, err_msg=str(mode))
        assert sspace.tau_star == pytest.approx(aspace.tau_star, rel=1e-8)


def test_sharded_rayleigh_normalized_carried():
    """rayleigh_normalized must survive from_local -> serving -> to_local
    (ADVICE round-1 medium finding)."""
    from pyarrowspace_tpu.graph.build import BuildConfig, build_standard
    from pyarrowspace_tpu.parallel import ShardedArrowSpace

    rng = np.random.default_rng(13)
    items = rng.normal(size=(160, 24)) + 0.3
    gp = parse_graph_params(GP_DICT)
    cfg = BuildConfig(rayleigh_normalized=True)
    aspace, gl = build_standard(items, gp, cfg)
    sspace = ShardedArrowSpace.from_local(aspace, gl, make_mesh(8))
    assert sspace._rayleigh_normalized is True
    queries = items[:4] * 1.02
    si, sv = sspace.search_batch(queries, 0.62)
    ai, av = aspace.search_batch(queries, gl, 0.62)
    assert np.array_equal(si, ai)
    np.testing.assert_allclose(sv, av, rtol=1e-8)
    back = sspace.to_local()
    assert back._rayleigh_normalized is True


class TestShardedSymmetrize:
    """Sharded symmetrize (all_to_all reverse-edge routing) must be
    bit-identical to the replicated ops.symmetrize_to_ell — same sort
    keys, same tie-breaks, same symmetric both-fit rule, same drop count
    (VERDICT weak #6: the replicated path sorts all 2Nk entries on every
    chip)."""

    def _ref_inputs(self, seed, n, k, eps):
        import jax.numpy as jnp
        from pyarrowspace_tpu.ops.distance import (kernel_weights,
                                                   unit_normalize)
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, 24)) + 0.3
        xu = np.asarray(unit_normalize(jnp.asarray(x)))
        d = 1.0 - np.maximum(xu @ xu.T, 0.0)
        np.fill_diagonal(d, np.inf)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        dd = np.take_along_axis(d, idx, 1)
        keep = dd <= eps
        i = np.where(keep, idx, -1).astype(np.int32)
        w = np.asarray(kernel_weights(
            jnp.asarray(np.where(keep, dd, 2.0)), 0.3, 2.0))
        return i, np.where(i >= 0, w, 0.0)

    @pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
    def test_bit_parity_vs_replicated(self, n_dev):
        import jax.numpy as jnp
        from pyarrowspace_tpu.ops.symmetrize import symmetrize_to_ell
        from pyarrowspace_tpu.parallel.mesh import make_mesh
        from pyarrowspace_tpu.parallel.sharded import sharded_symmetrize
        n, k = 333, 6
        i, w = self._ref_inputs(0, n, k, 0.9)
        m = 2 * k
        ref = symmetrize_to_ell(jnp.asarray(i), jnp.asarray(w), m)
        block = n_dev * 128
        n_pad = ((n + block - 1) // block) * block
        ip = np.full((n_pad, k), -1, dtype=np.int32)
        ip[:n] = i
        wp = np.zeros((n_pad, k))
        wp[:n] = w
        got = sharded_symmetrize(jnp.asarray(ip), jnp.asarray(wp), m, n,
                                 n_dev, make_mesh(n_dev))
        np.testing.assert_array_equal(np.asarray(ref[0]),
                                      np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]),
                                      np.asarray(got[1]))
        np.testing.assert_array_equal(np.asarray(ref[2]),
                                      np.asarray(got[2]))
        assert int(ref[3]) == int(got[3])

    def test_overflow_falls_back_to_exact(self):
        """Pathological column concentration (every row's neighbors in
        block 0) overflows the off-diagonal buckets; the fallback keeps
        bit parity instead of silently dropping edges."""
        import jax.numpy as jnp
        from pyarrowspace_tpu.ops.symmetrize import symmetrize_to_ell
        from pyarrowspace_tpu.parallel.mesh import make_mesh
        from pyarrowspace_tpu.parallel.sharded import (
            _sharded_symmetrize_jit, sharded_symmetrize)
        n, k, n_dev = 1024, 6, 8
        rng = np.random.default_rng(1)
        i = np.tile(np.arange(k, dtype=np.int32), (n, 1))
        for r in range(k):           # no self-loops in the toy lists
            i[r] = np.arange(1, k + 1, dtype=np.int32)
        w = rng.uniform(0.2, 1.0, size=(n, k))
        mesh = make_mesh(n_dev)
        _, _, _, _, overflow = _sharded_symmetrize_jit(
            jnp.asarray(i), jnp.asarray(w), ell_width=2 * k, n_real=n,
            n_dev=n_dev, mesh=mesh)
        assert int(overflow[0]) > 0   # the pathology actually overflows
        ref = symmetrize_to_ell(jnp.asarray(i), jnp.asarray(w), 2 * k)
        got = sharded_symmetrize(jnp.asarray(i), jnp.asarray(w), 2 * k, n,
                                 n_dev, mesh)
        np.testing.assert_array_equal(np.asarray(ref[0]),
                                      np.asarray(got[0]))
        assert int(ref[3]) == int(got[3])

    @pytest.mark.parametrize("seed,n,k,eps,n_dev", [
        (3, 777, 9, 1.2, 8),
        (4, 1024, 3, 0.4, 4),
        (5, 400, 12, 1.9, 8),   # eps 1.9: every pair within eps (max d=2)
        (6, 513, 7, 0.05, 2),   # tight eps: most rows nearly edgeless
    ])
    def test_fuzz_parity(self, seed, n, k, eps, n_dev):
        """Randomized corpora across shard counts, edge densities, and
        degenerate regimes (near-complete and near-empty graphs)."""
        import jax.numpy as jnp
        from pyarrowspace_tpu.ops.symmetrize import symmetrize_to_ell
        from pyarrowspace_tpu.parallel.mesh import make_mesh
        from pyarrowspace_tpu.parallel.sharded import sharded_symmetrize
        i, w = self._ref_inputs(seed, n, k, eps)
        m = 2 * k
        ref = symmetrize_to_ell(jnp.asarray(i), jnp.asarray(w), m)
        block = n_dev * 128
        n_pad = ((n + block - 1) // block) * block
        ip = np.full((n_pad, k), -1, dtype=np.int32)
        ip[:n] = i
        wp = np.zeros((n_pad, k))
        wp[:n] = w
        got = sharded_symmetrize(jnp.asarray(ip), jnp.asarray(wp), m, n,
                                 n_dev, make_mesh(n_dev))
        np.testing.assert_array_equal(np.asarray(ref[0]),
                                      np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]),
                                      np.asarray(got[1]))
        assert int(ref[3]) == int(got[3])


def test_sharded_hybrid_and_energy_parity():
    """Sharded hybrid and energy serving match the single-chip batch
    paths exactly (standard-built space: energy uses the exact
    bounded-energy scan on both sides)."""
    import dataclasses
    import jax.numpy as jnp
    from pyarrowspace_tpu import ArrowSpaceBuilder
    from pyarrowspace_tpu.core.params import parse_graph_params
    from pyarrowspace_tpu.parallel.mesh import make_mesh
    from pyarrowspace_tpu.parallel.sharded import build_sharded
    rng = np.random.default_rng(9)
    corpus = (rng.normal(size=(600, 48)) + 0.3) * 10
    gp_dict = {"eps": 0.9, "k": 6, "topk": 9, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp_dict, corpus)
    gp = parse_graph_params(gp_dict)
    gp = dataclasses.replace(gp, dims_reduction=True, reduction_eps=gp.eps,
                             seed=42, sparsity_check=False)
    sspace, _ = build_sharded(corpus, gp, make_mesh(8))
    queries = corpus[rng.choice(600, 7, replace=False)] * 1.01

    hi, hv = aspace.search_hybrid_batch(queries, gl, 0.8)
    shi, shv = sspace.search_hybrid_batch(queries, 0.8)
    np.testing.assert_array_equal(hi, shi)
    np.testing.assert_allclose(hv, shv, rtol=1e-12)

    ei, ev = aspace.search_energy_batch(queries, gl, 8)
    sei, sev = sspace.search_energy_batch(queries, 8)
    np.testing.assert_array_equal(ei, sei)
    np.testing.assert_allclose(ev, sev, rtol=1e-12)


def test_streaming_ingest_never_materializes_full_corpus(monkeypatch):
    """VERDICT r2 item 5: host-sourced sharded builds must reach the mesh
    as per-shard chunks — no single device_put of the full corpus, and
    each device holds exactly n_pad/n_dev rows afterwards."""
    import jax
    from pyarrowspace_tpu.parallel.mesh import make_mesh
    from pyarrowspace_tpu.parallel.sharded import ingest_sharded

    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(1000, 32))

    put_rows = []
    real_put = jax.device_put

    def spy_put(x, *a, **k):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) == 2:
            put_rows.append(int(x.shape[0]))
        return real_put(x, *a, **k)

    monkeypatch.setattr(jax, "device_put", spy_put)
    x_pad = ingest_sharded(arr, mesh, np.dtype(np.float64), col_tile=128)
    n_pad = x_pad.shape[0]
    assert n_pad % (n_dev * 128) == 0
    # every transfer was one shard, never the whole corpus
    assert put_rows and max(put_rows) == n_pad // n_dev, put_rows
    # per-device footprint is exactly one shard
    for s in x_pad.addressable_shards:
        assert s.data.shape[0] == n_pad // n_dev
    # values match the monolithic pad+put path
    ref = np.zeros((n_pad, 32))
    ref[:1000] = arr
    np.testing.assert_array_equal(np.asarray(x_pad), ref)


def test_streaming_ingest_feeds_identical_build():
    """A host-sourced build through the streaming ingest matches the
    single-chip build (full lambdas parity at the default mesh size)."""
    from pyarrowspace_tpu.graph.build import build_standard
    from pyarrowspace_tpu.parallel.sharded import build_sharded

    rng = np.random.default_rng(5)
    corpus = rng.normal(size=(600, 48)) * 3.0
    gp = parse_graph_params({"eps": 0.6, "k": 6, "topk": 4, "p": 2.0,
                             "sigma": None})
    aspace, _ = build_standard(corpus, gp)
    sspace, _ = build_sharded(corpus, gp)
    np.testing.assert_allclose(sspace.lambdas(), aspace.lambdas(),
                               rtol=1e-8)


def test_search_ivf_block_sharded(pair):
    """Sharded blocked IVF: cluster slabs partition across the mesh; the
    per-shard probe union must reach >= single-chip recall, and probing
    every cluster must recover the exact top-k set."""
    from pyarrowspace_tpu.parallel import ShardedArrowSpace

    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    gp = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    aspace.enable_ivf(n_clusters=40)
    sspace = ShardedArrowSpace.from_local(aspace, gl, make_mesh(8))

    queries = items[rng.choice(2000, 16, replace=False)] * 1.02
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    si, _ = sspace.search_batch(queries, 0.62, mode="ivf_block", n_probe=16)
    overlap = np.mean([len(set(ei[r].tolist()) & set(si[r].tolist())) / 10
                       for r in range(16)])
    assert overlap >= 0.85, overlap

    # Full probe (every shard scans all its clusters) == exact top-k set.
    fi, fv = sspace.search_batch(queries, 0.62, mode="ivf_block",
                                 n_probe=40)
    for r in range(16):
        assert set(fi[r].tolist()) == set(ei[r].tolist()), r


def test_search_auto_mode_sharded(pair):
    """mode="auto" routes by per-shard size (exact at this tiny scale) and
    matches the explicit exact mode."""
    (sspace, _), (aspace, gl), items = pair
    queries = items[:4] * 1.03
    ai, av = sspace.search_batch(queries, 0.62, mode="auto")
    ei, ev = sspace.search_batch(queries, 0.62, mode="exact")
    assert np.array_equal(ai, ei)
    np.testing.assert_allclose(av, ev, rtol=1e-12)


def test_padding_rows_never_served(pair):
    """Adversarial low-tau case: an anti-aligned query scores real items
    near (or below) zero, so an unmasked zero-padding row (lambda=0,
    prox ~ 1) would outrank them.  Served indices must stay < nitems in
    every sharded mode."""
    (sspace, _), (aspace, gl), items = pair
    n = sspace.nitems
    queries = -items[:4] * 1.5   # anti-aligned: real cosine scores < 0
    for mode in ("exact", "subtile"):
        si, _ = sspace.search_batch(queries, 0.05, mode=mode)
        assert si.max() < n, (mode, si.max())
        ei, ev = aspace.search_batch(queries, gl, 0.05, mode="exact")
        assert np.array_equal(si, ei), mode
    hi, _ = sspace.search_hybrid_batch(queries, 0.05)
    assert hi.max() < n
    href, _ = aspace.search_hybrid_batch(queries, gl, 0.05)
    assert np.array_equal(hi, href)


def test_search_ivf_block_sharded_certified(pair):
    """Sharded certification: full probe certifies everything; certified
    queries at small n_probe match the exact top-k set (soundness across
    the cluster partition via the psum'd violations)."""
    from pyarrowspace_tpu.parallel import ShardedArrowSpace

    rng = np.random.default_rng(13)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    gp = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    aspace.enable_ivf(n_clusters=40)
    sspace = ShardedArrowSpace.from_local(aspace, gl, make_mesh(8))

    queries = np.concatenate([
        items[rng.choice(2000, 8, replace=False)] * 1.02,
        rng.normal(size=(8, 32))])
    ei, _ = aspace.search_batch(queries, gl, 0.62)

    fi, _, cert_full = sspace.search_batch(queries, 0.62, mode="ivf_block",
                                           n_probe=40, certify=True)
    assert cert_full.all()
    for r in range(len(queries)):
        assert set(fi[r].tolist()) == set(ei[r].tolist()), r

    bi, _, cert = sspace.search_batch(queries, 0.62, mode="ivf_block",
                                      n_probe=2, certify=True)
    for r in range(len(queries)):
        if cert[r]:
            assert set(bi[r].tolist()) == set(ei[r].tolist()), r
    assert not cert.all(), "n_probe=2 certified everything"


def test_certified_mode_sharded_is_exact():
    """Sharded mode="certified" serves the exact top-k for every query."""
    from pyarrowspace_tpu.parallel import ShardedArrowSpace

    rng = np.random.default_rng(17)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    gp = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    aspace.enable_ivf(n_clusters=40)
    sspace = ShardedArrowSpace.from_local(aspace, gl, make_mesh(8))
    queries = np.concatenate([
        items[rng.choice(2000, 6, replace=False)] * 1.02,
        rng.normal(size=(6, 32))])
    ci, _ = sspace.search_batch(queries, 0.62, mode="certified", n_probe=4)
    ei, _ = aspace.search_batch(queries, gl, 0.62)
    for r in range(len(queries)):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r


@pytest.mark.slow
def test_sharded_serving_stream():
    """Sharded pipelined certified serving: per-batch parity with
    search_batch(mode="certified"), and the collapse ladder escalates
    n_probe before degrading to the fallback — results exact on every
    batch either way."""
    from pyarrowspace_tpu.parallel import ShardedArrowSpace

    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(size=(2000, 32))
    gp = {"eps": 0.9, "k": 6, "topk": 10, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    aspace.enable_ivf(n_clusters=40)
    # 2 shards: the escalation ceiling is ~(n_real/d)/(2*cap) local
    # probes, which an 8-way split of a 2000-row corpus pins to 1 (no
    # escalation room at any n_probe -- correct: probing further would
    # scan most of the shard).
    sspace = ShardedArrowSpace.from_local(aspace, gl, make_mesh(2))
    batches = [items[rng.choice(2000, 12, replace=False)] * 1.02
               for _ in range(4)]

    # Healthy stream: parity with the synchronous certified mode.
    stream = sspace.serving_stream(0.62, n_probe=4, depth=2)
    for qb in batches:
        stream.submit(qb)
    outs = stream.finish()
    assert stream.escalated_at == [] and not stream.degraded
    for qb, (idx, vals, rate) in zip(batches, outs):
        ci, cv = sspace.search_batch(qb, 0.62, mode="certified", n_probe=4)
        np.testing.assert_array_equal(idx, ci)
        np.testing.assert_allclose(vals, cv, rtol=0, atol=0)
        assert 0.0 <= rate <= 1.0

    # Forced collapse: one escalation rung (1 -> 2 local probes — the
    # per-shard ceiling at this toy scale is ~(n_real/d)/(2*cap), so
    # escalation only has room at a shallow starting n_probe), then
    # degrade; every batch still serves the exact top-k.
    stream = sspace.serving_stream(0.62, n_probe=1, depth=1,
                                   cert_floor=1.01, floor_patience=1,
                                   fallback_mode="exact",
                                   probe_escalations=1)
    for qb in batches:
        stream.submit(qb)
    outs = stream.finish()
    assert stream.escalated_at == [0]
    assert stream.degraded and stream.degraded_at == 1
    for qb, (idx, _v, _r) in zip(batches, outs):
        ei, _ = sspace.search_batch(qb, 0.62, mode="exact")
        for r in range(len(qb)):
            assert set(idx[r].tolist()) == set(ei[r].tolist()), r
