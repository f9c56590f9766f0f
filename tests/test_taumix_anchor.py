"""Second calibration anchor for TAU_MIX (VERDICT r2 item 7).

TAU_MIX=0.275 (spectral/taumode.py) was calibrated on the reference's
5x24 test_0 fixture, admissible window [0.26, 0.29] on that dataset
alone.  These fixtures cross-validate the constant at a different shape
(50x64, 5 norm-separated clusters): the recorded orderings are stable
for tau_mix in [0.22, 0.29] (seed 0) and [0.26, 0.32] (seed 7) on a
0.01-step grid — jointly [0.26, 0.29], the same window test_0 pins.  A
TAU_MIX drift below 0.26 flips the seed-7 orderings; above 0.29 flips
seed 0's.  Independent of tests/data_test0.py and the README 3x3 pin.
"""

import numpy as np
import pytest

from pyarrowspace_tpu.core.params import parse_graph_params
from pyarrowspace_tpu.graph.build import build_standard

GP = parse_graph_params({"eps": 0.05, "k": 8, "topk": 5, "p": 2.0,
                         "sigma": None})

# (seed, {tau: expected top-5 ordering}) recorded at TAU_MIX=0.275 with
# f64 CPU builds; both fixtures share the generator below.
EXPECTED = {
    0: {0.62: (12, 18, 14, 10, 19), 0.55: (12, 18, 14, 13, 19)},
    7: {0.62: (18, 12, 16, 10, 15), 0.55: (18, 16, 12, 10, 15)},
}


def _fixture(seed):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(5, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    scales = np.array([0.5, 0.8, 1.0, 1.4, 2.0])
    pts = base[:, None, :] + 0.2 * rng.normal(size=(5, 10, 64)) / 8.0
    corpus = (pts * scales[:, None, None]).reshape(50, 64) * 3.0
    query = corpus[12] + 0.35 * corpus[31] + 0.05 * rng.normal(size=64)
    return corpus, query


@pytest.mark.parametrize("seed", sorted(EXPECTED))
def test_taumix_second_anchor(seed):
    corpus, query = _fixture(seed)
    aspace, gl = build_standard(corpus, GP)   # default (calibrated) TAU_MIX
    for tau, want in EXPECTED[seed].items():
        got = tuple(i for i, _ in aspace.search(query, gl, tau))
        assert got == want, (seed, tau, got, want)
