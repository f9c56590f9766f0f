"""Parity with the reference's only assertion-based test
(reference tests/test_0.py): exact result orderings for four tau values."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder

from data_test0 import EXPECTED_ORDERINGS, GRAPH_PARAMS_TEST0, ITEMS_5X24


@pytest.fixture(scope="module")
def built():
    return ArrowSpaceBuilder.build(GRAPH_PARAMS_TEST0, ITEMS_5X24)


@pytest.mark.parametrize("tau", sorted(EXPECTED_ORDERINGS))
def test_orderings(built, tau):
    aspace, gl = built
    query = np.array(ITEMS_5X24[2] * 1.05, dtype=np.float64)
    hits = aspace.search(query, gl, tau)
    assert len(hits) == 3
    got = [h[0] for h in hits]
    assert got == EXPECTED_ORDERINGS[tau], (
        f"tau={tau}: got {got}, expected {EXPECTED_ORDERINGS[tau]}")
    scores = [h[1] for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_scale_equivariance_of_orderings():
    """Uniform corpus scaling must not change any ordering (the design is
    scale-equivariant; the reference harness applies x12/x100 scalings)."""
    for scale in (0.01, 12.0, 100.0):
        aspace, gl = ArrowSpaceBuilder.build(GRAPH_PARAMS_TEST0,
                                             ITEMS_5X24 * scale)
        query = np.array(ITEMS_5X24[2] * scale * 1.05, dtype=np.float64)
        for tau, expected in EXPECTED_ORDERINGS.items():
            got = [h[0] for h in aspace.search(query, gl, tau)]
            assert got == expected, (scale, tau, got)
