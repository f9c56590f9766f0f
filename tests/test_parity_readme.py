"""Parity with the reference README quickstart (reference README.md:33-70),
including its printed expected scores (cosine path, tau=1.0)."""

import numpy as np

from pyarrowspace_tpu import ArrowSpaceBuilder

ITEMS = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]],
                 dtype=np.float64)
GP = {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0, "sigma": 1.0}
QUERY = np.array([0.05, 0.2, 0.25], dtype=np.float64)
# Expected output printed in reference README.md:68-69.
EXPECTED = [(0, 0.989743318610787), (1, 0.7565344158360029),
            (2, 0.22151940739207396)]


def test_readme_example():
    aspace, gl = ArrowSpaceBuilder.build(GP, ITEMS)
    assert aspace.nitems == 3
    assert aspace.nfeatures == 3
    assert gl.nnodes == 3
    assert gl.shape() == (3, 3)
    hits = aspace.search(QUERY, gl, 1.0)
    assert [h[0] for h in hits] == [e[0] for e in EXPECTED]
    for (gi, gs), (ei, es) in zip(hits, EXPECTED):
        assert abs(gs - es) < 1e-9, (gi, gs, es)


def test_lambdas_nonzero_and_bounded():
    aspace, _ = ArrowSpaceBuilder.build(GP, ITEMS)
    lams = aspace.lambdas()
    assert lams.shape == (3,)
    assert np.all(lams > 0)
    assert np.all(lams <= 1.0)
