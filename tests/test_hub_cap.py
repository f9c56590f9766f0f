"""Quantify the padded-ELL hub cap against an UNCAPPED build.

The reference's sprs CSR keeps every union edge (unbounded degree,
GRAPH_VARIABLES.md:7-10); this framework's ELL layout caps rows at
BuildConfig.ell_width (default 2k) and drops the weakest hub edges from
both endpoint rows.  This test builds a hub-heavy corpus (cluster centers
planted IN the corpus — every member's k-NN list contains its center, so
center rows union to degree ~ per_group >> 2k) and measures the cap's
parity cost.

Architectural fact this pins: the lambda path runs entirely through the
F x F FEATURE Laplacian (signals matrix), not the item graph — so the cap
provably cannot move lambdas, query lambdas, or search results; its entire
cost is confined to the exported GraphLaplacian.  That cost is quantified
as dropped-edge weight mass and degree drift vs the uncapped golden.
"""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.builder import ArrowSpaceBuilder as FluentBuilder
from pyarrowspace_tpu.graph.build import (BuildConfig, build_standard)
from pyarrowspace_tpu.core.params import parse_graph_params

GP = {"eps": 0.9, "k": 6, "topk": 6, "p": 2.0, "sigma": 0.3}
N_CENTERS, PER_GROUP, DIM = 12, 30, 48


@pytest.fixture(scope="module")
def hub_corpus():
    """Cluster centers included as corpus rows: each member's nearest
    neighbor is its center, so center rows have union degree ~PER_GROUP,
    far above the 2k=12 ELL default -> the cap must bind."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(N_CENTERS, DIM))
    members = (np.repeat(centers, PER_GROUP, axis=0)
               + 0.3 * rng.normal(size=(N_CENTERS * PER_GROUP, DIM)))
    return np.concatenate([centers, members], axis=0) * 10.0


def _build(corpus, ell_width, auto_widen=False, **cfg_kw):
    """Cap-study builds default auto_widen=False: these tests measure the
    BOUND cap; the auto-widen default is pinned separately below."""
    gp = parse_graph_params(GP)
    import dataclasses
    gp = dataclasses.replace(gp, dims_reduction=True, reduction_eps=gp.eps,
                             seed=42, sparsity_check=False)
    cfg = BuildConfig(ell_width=ell_width, ell_auto_widen=auto_widen,
                      **cfg_kw)
    return build_standard(corpus, gp, cfg)


def test_hub_cap_binds_and_uncapped_doesnt(hub_corpus):
    _, gl_capped = _build(hub_corpus, None)            # default 2k = 8
    _, gl_full = _build(hub_corpus, hub_corpus.shape[0] - 1)
    assert gl_capped.n_dropped_edges > 0, "hub corpus did not exercise the cap"
    assert gl_full.n_dropped_edges == 0, "uncapped build still dropped edges"


def test_cap_cannot_move_lambdas_or_search(hub_corpus):
    """The lambda pipeline never reads the item graph (feature Laplacian
    only), so capped and uncapped builds must agree EXACTLY on lambdas,
    query lambda, and search results — stronger than a drift bound."""
    a_cap, gl_cap = _build(hub_corpus, None)
    a_full, gl_full = _build(hub_corpus, hub_corpus.shape[0] - 1)
    np.testing.assert_array_equal(np.asarray(a_cap.lambdas()),
                                  np.asarray(a_full.lambdas()))
    q = hub_corpus[N_CENTERS + 5] * 1.03
    assert (a_cap.prepare_query_item(q, gl_cap)
            == a_full.prepare_query_item(q, gl_full))
    for tau in (1.0, 0.62):
        assert a_cap.search(q, gl_cap, tau) == a_full.search(q, gl_full, tau)


def test_cap_laplacian_cost_quantified_and_monotone_in_width(hub_corpus):
    """The cap's whole cost lives in the exported Laplacian: quantify it
    across ell_width settings.  Dropped edges are always the WEAKEST of a
    hub row (weight-ranked), so the lost weight-mass fraction is strictly
    below the lost edge-count fraction, exact L = L^T survives at every
    width, and widening the knob monotonically recovers the uncapped
    graph.  Measured default-2k cost on this (deliberately pathological,
    every-member-is-a-hub) corpus: ~46% of union edges / ~23% of weight
    mass — the documented trade for a fixed-width TPU layout; real
    embedding corpora sit far below (313k CVE build: n_dropped=0)."""
    n = hub_corpus.shape[0]
    stats = {}
    for width in (None, 24, n - 1):
        _, gl = _build(hub_corpus, width)
        L = np.asarray(gl.to_dense())
        np.testing.assert_array_equal(L, L.T)          # exact symmetry
        w_mass = -np.sum(L[~np.eye(n, dtype=bool)])
        stats[width] = (gl.n_dropped_edges, w_mass, gl.nedges)

    full_edges = stats[n - 1][2]
    full_mass = stats[n - 1][1]
    drop_2k, mass_2k, _ = stats[None]
    drop_24, mass_24, _ = stats[24]
    frac_2k = drop_2k / full_edges
    lost_2k = (full_mass - mass_2k) / full_mass
    # Monotone recovery as the knob widens.
    assert drop_2k > drop_24 > 0
    assert stats[n - 1][0] == 0
    assert mass_2k < mass_24 < full_mass + 1e-9
    # Weight-ranked dropping: mass lost strictly below edge fraction lost.
    assert 0 < lost_2k < frac_2k, (lost_2k, frac_2k)
    print(f"hub-cap cost @2k: dropped_frac={frac_2k:.3f}, "
          f"weight_mass_lost={lost_2k:.3f}; @24: "
          f"dropped_frac={drop_24 / full_edges:.3f}")


def test_auto_widen_recovers_uncapped_graph_at_defaults(hub_corpus):
    """DEFAULT build (no explicit ell_width): the hub cap must auto-widen
    until nothing drops, so the exported Laplacian equals the reference's
    unbounded union graph (GRAPH_VARIABLES.md:7-10) — no silent edge
    drops at defaults (VERDICT r3 item 5)."""
    _, gl_auto = _build(hub_corpus, None, auto_widen=None)  # None = auto
    assert gl_auto.n_dropped_edges == 0
    _, gl_full = _build(hub_corpus, hub_corpus.shape[0] - 1)
    # Off-diagonal (edge) structure exact; diagonal degrees may differ in
    # the last ulps (summation order over different ELL widths).
    np.testing.assert_allclose(np.asarray(gl_auto.to_dense()),
                               np.asarray(gl_full.to_dense()),
                               rtol=1e-12, atol=0)


def test_explicit_width_is_respected_no_auto_widen(hub_corpus):
    """An explicit ell_width is a user choice: the build must NOT widen
    past it (auto only kicks in when the knob was left at None)."""
    _, gl = _build(hub_corpus, 24, auto_widen=None)
    assert gl.n_dropped_edges > 0
    assert gl._nbr_idx.shape[1] == 24


def test_auto_widen_respects_hbm_budget(hub_corpus, monkeypatch, caplog):
    """Escalation is bounded by ARROWSPACE_ELL_BUDGET_BYTES; at an
    artificially tiny budget the build keeps the capped graph and warns
    loudly instead of OOMing."""
    import logging
    n = hub_corpus.shape[0]
    # Budget allows only ~16 columns: 16 * (8 + 4) bytes/entry * n rows.
    monkeypatch.setenv("ARROWSPACE_ELL_BUDGET_BYTES", str(16 * 12 * n))
    # The engine logger is non-propagating (own stderr handler); route it
    # through caplog for this assertion.
    monkeypatch.setattr(logging.getLogger("arrowspace"), "propagate", True)
    with caplog.at_level(logging.WARNING):
        _, gl = _build(hub_corpus, None, auto_widen=None)
    assert gl.n_dropped_edges > 0
    assert any("still drops" in r.message for r in caplog.records)


def test_ell_width_knob_via_fluent_builder(hub_corpus):
    """ell_width is a public BuildConfig knob on the fluent builder."""
    b = (FluentBuilder()
         .with_lambda_graph(GP["eps"], GP["k"], GP["topk"], GP["p"],
                            GP["sigma"])
         .with_build_config(BuildConfig(ell_width=64)))
    _, gl = b.build_rows(hub_corpus)
    assert gl.n_dropped_edges == 0   # 64 >= hub degree -> nothing dropped