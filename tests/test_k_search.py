"""Optimal-K clustering SEARCH (reference N10 mechanism, VERDICT r4 #7).

The reference engine derives candidate Ks from the TwoNN intrinsic
dimension and *tests* them ("Testing K in range [178, 179] with step 1",
reference tests/output/1760705545_v0_16/suggested_eps.md:7-10) rather
than trusting a formula.  These pin that reduce_corpus now runs that
search (scored candidates, observable log), that the chosen K is the
objective's argmin, and that the search trace reaches the per-build
suggested_eps.md artifact.
"""

import logging

import numpy as np
import pytest

import jax.numpy as jnp

from pyarrowspace_tpu.reduction.pipeline import (_kmeans_bic,
                                                 k_search_range,
                                                 reduce_corpus, select_k,
                                                 select_k_searched)


@pytest.fixture()
def propagating_logs(monkeypatch):
    """The library logger is propagate=False (own stderr handler); let
    records reach pytest's caplog for these assertions."""
    monkeypatch.setattr(logging.getLogger("arrowspace"), "propagate", True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(25, 32))
    return jnp.asarray(np.repeat(base, 200, axis=0)
                       + 0.1 * rng.normal(size=(5000, 32)))


def test_range_is_reference_shaped():
    """Two candidates wide, anchored at the rate estimate — the observed
    reference window."""
    n_keep = int(round(313841 * 0.6))
    lo, hi = k_search_range(n_keep, 3, 1.31)
    assert (lo, hi) == (177, 178)          # estimate brackets observed 178
    assert hi - lo == 1                     # step-1, two candidates


def test_searched_k_is_objective_argmin(corpus, caplog, propagating_logs):
    n = corpus.shape[0]
    lo, hi = k_search_range(n, 3, 1.31)
    with caplog.at_level(logging.INFO, logger="arrowspace.clustering"):
        k = select_k_searched(corpus, n, 3, 1.31, seed=42)
    assert k in (lo, hi)
    scores = {kk: _kmeans_bic(corpus, kk, seed=42) for kk in (lo, hi)}
    assert k == min(scores, key=scores.get)
    joined = " ".join(r.getMessage() for r in caplog.records)
    assert f"testing K range [{lo}, {hi}] with step 1" in joined
    assert f"optimal K={k}" in joined


def test_search_env_optout(corpus, monkeypatch):
    monkeypatch.setenv("ARROWSPACE_K_SEARCH", "0")
    n = corpus.shape[0]
    assert select_k_searched(corpus, n, 3, 1.31, seed=42) == select_k(
        n, 3, 1.31)


def test_reduce_corpus_runs_the_search(corpus, caplog, propagating_logs):
    with caplog.at_level(logging.INFO, logger="arrowspace.clustering"):
        red = reduce_corpus(np.asarray(corpus), seed=42)
    joined = " ".join(r.getMessage() for r in caplog.records)
    assert "testing K range [" in joined
    lo, hi = k_search_range(red.n_sampled, red.intrinsic_dim, None)
    assert red.k_clusters in (lo, hi) or red.k_clusters == red.n_sampled


def test_search_is_deterministic(corpus):
    n = corpus.shape[0]
    k1 = select_k_searched(corpus, n, 3, 1.31, seed=42)
    k2 = select_k_searched(corpus, n, 3, 1.31, seed=42)
    assert k1 == k2


def test_artifact_contains_search_trace(tmp_path, monkeypatch):
    from pyarrowspace_tpu import ArrowSpaceBuilder
    monkeypatch.setenv("ARROWSPACE_SUGGEST_DIR", str(tmp_path))
    rng = np.random.default_rng(6)
    latent = rng.normal(size=(1500, 3))
    items = latent @ rng.normal(size=(3, 64))
    gp = {"eps": 0.2, "k": 6, "topk": 4, "p": 2.0, "sigma": None}
    ArrowSpaceBuilder.build(gp, items)
    doc = (tmp_path / "suggested_eps.md").read_text()
    assert "Testing K in range [" in doc
    assert "with step 1" in doc
    assert "Computing optimal K for clustering: N=1500, F=64" in doc
