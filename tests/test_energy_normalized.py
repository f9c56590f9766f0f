"""Energy search under BuildConfig(rayleigh_normalized=True) — ADVICE r4.

The residual-Dirichlet identity D(q,x) = e_q + e_x - 2 q^T L x needs RAW
x^T L x energies; a rayleigh_normalized=True build stores NORMALIZED
Rayleigh quotients in _e_raw.  These pin that every energy-search path
(single, batch, sharded, save/load) feeds the kernels raw energies and
therefore agrees with an explicit raw-energy reference computation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyarrowspace_tpu.core.params import GraphParams
from pyarrowspace_tpu.graph.build import BuildConfig, build_standard
from pyarrowspace_tpu.ops import search as search_ops
from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch

GP = GraphParams(eps=1.31, k=10, topk=8, p=2.0, sigma=0.535)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(4)
    items = rng.normal(size=(600, 48)) * 12.0
    aspace, gl = build_standard(items, GP,
                                BuildConfig(rayleigh_normalized=True))
    return items, aspace, gl


def _expected_energy_topk(aspace, q, k, w_l=1.0, w_d=0.5):
    """Reference computation with explicitly RAW energies everywhere the
    residual identity appears (query lambda via the space's own synthesis,
    which legitimately uses the normalized convention)."""
    e_items_raw = rayleigh_batch(aspace._data, aspace._lap_f,
                                 normalized=False)
    qj = jnp.asarray(q, dtype=aspace._data.dtype).reshape(1, -1)
    e_q_raw = rayleigh_batch(qj, aspace._lap_f, normalized=False)
    lam_q = aspace.prepare_query_item(q, None)
    idx, vals = search_ops.energy_topk(
        aspace._data, aspace._lambdas, e_items_raw, aspace._lap_f, qj[0],
        jnp.asarray(lam_q, aspace._data.dtype), e_q_raw[0],
        aspace._tau_star, jnp.asarray(w_l, aspace._data.dtype),
        jnp.asarray(w_d, aspace._data.dtype), k)
    return np.asarray(idx), np.asarray(vals)


def test_e_un_stored_and_distinct(built):
    _, aspace, _ = built
    assert aspace._rayleigh_normalized
    e_un = np.asarray(aspace._energies_raw())
    e_norm = np.asarray(aspace._e_raw)
    # Raw quadratic forms at x12 scale are orders of magnitude above the
    # normalized quotients — the two must NOT be the same array.
    assert e_un.mean() > 10 * e_norm.mean()
    np.testing.assert_allclose(
        e_un, np.asarray(rayleigh_batch(aspace._data, aspace._lap_f,
                                        normalized=False)), rtol=1e-12)


def test_search_energy_uses_raw_energies(built):
    items, aspace, gl = built
    rng = np.random.default_rng(0)
    q = items[37] + 0.05 * rng.normal(size=items.shape[1])
    got = aspace.search_energy(q, gl, 12)
    exp_idx, exp_vals = _expected_energy_topk(aspace, q, 12)
    assert [i for i, _ in got] == list(exp_idx)
    np.testing.assert_allclose([s for _, s in got], exp_vals, rtol=1e-9)


def test_search_energy_batch_matches_single(built):
    items, aspace, gl = built
    rng = np.random.default_rng(1)
    qs = items[[5, 100, 400]] + 0.05 * rng.normal(size=(3, items.shape[1]))
    idx_b, vals_b = aspace.search_energy_batch(qs, gl, 10)
    for r in range(3):
        single = aspace.search_energy(qs[r], gl, 10)
        assert list(idx_b[r]) == [i for i, _ in single]
        np.testing.assert_allclose(vals_b[r], [s for _, s in single],
                                   rtol=1e-9)


def test_sharded_energy_matches_single(built):
    items, aspace, gl = built
    from pyarrowspace_tpu.parallel.sharded import ShardedArrowSpace
    rng = np.random.default_rng(2)
    qs = items[[9, 250]] + 0.05 * rng.normal(size=(2, items.shape[1]))
    sspace = ShardedArrowSpace.from_local(aspace, gl)
    idx_s, vals_s = sspace.search_energy_batch(qs, 10)
    idx_l, vals_l = aspace.search_energy_batch(qs, gl, 10)
    np.testing.assert_array_equal(idx_s, idx_l)
    np.testing.assert_allclose(vals_s, vals_l, rtol=1e-9)


def test_persist_roundtrip_keeps_raw_energies(built, tmp_path):
    items, aspace, gl = built
    from pyarrowspace_tpu.io.persist import load_index, save_index
    p = str(tmp_path / "idx.npz")
    save_index(p, aspace, gl)
    loaded, gl2 = load_index(p)
    assert loaded._e_un is not None   # stored, not lazily recomputed
    rng = np.random.default_rng(3)
    q = items[77] + 0.05 * rng.normal(size=items.shape[1])
    assert loaded.search_energy(q, gl2, 10) == aspace.search_energy(
        q, gl, 10)


def test_old_index_without_e_un_recomputes(built, tmp_path):
    """Indexes saved before e_un existed lazily recompute the raw
    energies instead of silently feeding normalized quotients."""
    items, aspace, gl = built
    from pyarrowspace_tpu.io.persist import load_index, save_index
    p = str(tmp_path / "old.npz")
    save_index(p, aspace, gl)
    # Strip e_un to simulate a pre-fix artifact.
    z = dict(np.load(p))
    assert "e_un" in z
    del z["e_un"]
    with open(p, "wb") as fh:
        np.savez(fh, **z)
    loaded, gl2 = load_index(p)
    assert loaded._e_un is None
    rng = np.random.default_rng(3)
    q = items[77] + 0.05 * rng.normal(size=items.shape[1])
    got = loaded.search_energy(q, gl2, 10)
    exp_idx, _ = _expected_energy_topk(loaded, q, 10)
    assert [i for i, _ in got] == list(exp_idx)
