"""Drop-in `arrowspace` alias + sweep failure isolation."""

import numpy as np
import pytest


def test_arrowspace_alias_is_drop_in():
    # A reference user's import lines work unchanged (reference README.md).
    from arrowspace import ArrowSpaceBuilder, GraphLaplacian, set_debug
    items = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]])
    gp = {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0, "sigma": 1.0}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    hits = aspace.search(np.array([0.05, 0.2, 0.25]), gl, 1.0)
    assert hits[0][0] == 0
    with pytest.raises(ValueError):
        GraphLaplacian()


def test_sweep_isolation():
    from pyarrowspace_tpu.eval.sweep import grid, run_sweep
    configs = grid(eta=[0.1, 0.2], steps=[1, 2])
    assert len(configs) == 4

    def run_one(cfg):
        if cfg["eta"] == 0.2 and cfg["steps"] == 2:
            raise RuntimeError("boom")
        return {"score": cfg["eta"] * cfg["steps"]}

    rows = run_sweep(configs, run_one)
    assert len(rows) == 4
    statuses = [r["status"] for r in rows]
    assert statuses.count("OK") == 3 and statuses.count("FAILED") == 1
    failed = next(r for r in rows if r["status"] == "FAILED")
    assert "boom" in failed["error"]

    with pytest.raises(RuntimeError):
        run_sweep(configs, run_one, stop_on_error=True)
