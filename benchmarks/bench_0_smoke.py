"""Smoke protocol (port of tests/test_0.py): the 5x24 toy matrix with the
four pinned orderings — also available as pytest (tests/test_parity_test0.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from benchmarks.protocols import force_cpu_if_requested

force_cpu_if_requested()

import numpy as np

from data_test0 import EXPECTED_ORDERINGS, GRAPH_PARAMS_TEST0, ITEMS_5X24
from pyarrowspace_tpu import ArrowSpaceBuilder


def main():
    aspace, gl = ArrowSpaceBuilder.build(GRAPH_PARAMS_TEST0, ITEMS_5X24)
    query = np.array(ITEMS_5X24[2] * 1.05, dtype=np.float64)
    for tau, expected in EXPECTED_ORDERINGS.items():
        hits = aspace.search(query, gl, tau)
        print(f"tau={tau}: {hits}")
        assert len(hits) == 3
        assert [h[0] for h in hits] == expected, (tau, hits, expected)
    print("all orderings match the reference test_0")


if __name__ == "__main__":
    main()
