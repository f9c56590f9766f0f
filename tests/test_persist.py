"""Index save/load round-trip (checkpoint/resume — SURVEY.md §5 gap fill)."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.io import load_index, save_index

GP = {"eps": 0.9, "k": 6, "topk": 5, "p": 2.0, "sigma": 0.3}


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(17)
    items = rng.normal(size=(60, 12)) + 0.3
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    path = str(tmp_path / "index.npz")
    save_index(path, aspace, gl)

    a2, gl2 = load_index(path)
    assert a2.nitems == aspace.nitems
    assert a2.nfeatures == aspace.nfeatures
    np.testing.assert_allclose(a2.lambdas(), aspace.lambdas())
    np.testing.assert_allclose(gl2.to_dense(), gl.to_dense())
    assert gl2.graph_params == gl.graph_params

    q = items[3] * 1.07
    assert a2.search(q, gl2, 0.62) == aspace.search(q, gl, 0.62)
    assert a2.search_hybrid(q, gl2, 0.8) == aspace.search_hybrid(q, gl, 0.8)
    assert (a2.search_energy(q, gl2, 5)
            == aspace.search_energy(q, gl, 5))


def test_version_check(tmp_path):
    rng = np.random.default_rng(18)
    items = rng.normal(size=(20, 8)) + 0.3
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    path = str(tmp_path / "index.npz")
    save_index(path, aspace, gl)
    # Corrupt the manifest version.
    import json
    z = dict(np.load(path))
    m = json.loads(bytes(z["manifest"]).decode())
    m["format_version"] = 999
    z["manifest"] = np.frombuffer(json.dumps(m).encode(), dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez(fh, **z)
    with pytest.raises(ValueError, match="unsupported index format"):
        load_index(path)


def test_energy_space_roundtrip(tmp_path):
    """Energy-built spaces keep their EnergyMaps routing table across
    save/load (identical search_energy results, including the
    candidate-pool routing path)."""
    from pyarrowspace_tpu.builder import ArrowSpaceBuilder as B
    rng = np.random.default_rng(23)
    base = rng.normal(size=(20, 24))
    items = (np.repeat(base, 30, axis=0)
             + 0.2 * rng.normal(size=(600, 24))) * 12
    aspace, gle = B.build_energy(items, {"optical_tokens": 20}, GP)
    path = str(tmp_path / "energy.npz")
    save_index(path, aspace, gle)
    a2, gle2 = load_index(path)
    assert a2._energy_maps is not None
    assert a2._energy_maps.candidate_m == aspace._energy_maps.candidate_m
    q = items[123] * 1.01
    assert a2.search_energy(q, gle2, 12) == aspace.search_energy(q, gle, 12)


@pytest.mark.slow
def test_loaded_index_serves_certified(tmp_path):
    """Deployment path: save -> load -> mode='certified' serves exact
    results (lazy blocked-IVF rebuild from the persisted clustering)."""
    import numpy as np
    from pyarrowspace_tpu import ArrowSpaceBuilder
    from pyarrowspace_tpu.io import load_index, save_index

    rng = np.random.default_rng(23)
    base = rng.normal(size=(30, 24))
    items = np.repeat(base, 40, axis=0) + 0.1 * rng.normal(size=(1200, 24))
    gp = {"eps": 0.9, "k": 5, "topk": 10, "p": 2.0, "sigma": 0.3}
    aspace, gl = ArrowSpaceBuilder.build(gp, items)
    aspace.enable_ivf(n_clusters=30)
    p = tmp_path / "idx.npz"
    save_index(str(p), aspace, gl)
    loaded, gl2 = load_index(str(p))
    queries = items[rng.choice(1200, 6, replace=False)] * 1.02
    ci, _ = loaded.search_batch(queries, gl2, 0.62, mode="certified",
                                n_probe=6)
    ei, _ = loaded.search_batch(queries, gl2, 0.62, mode="exact")
    for r in range(6):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r
