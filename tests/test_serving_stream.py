"""Pipelined certified serving (serving.CertifiedStream +
ArrowSpace.serving_stream): per-batch parity with
search_batch(mode="certified"), pipeline-depth semantics, and the
certificate-collapse guardrail (degrade to the exact fallback instead of
widening on every batch)."""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.serving import CertifiedStream

GP = {"eps": 0.9, "k": 6, "topk": 8, "p": 2.0, "sigma": 0.45}


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 32))
    items = np.repeat(base, 50, axis=0) + 0.15 * rng.normal(
        size=(2000, 32))
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    aspace.enable_ivf(n_clusters=40)
    return aspace, gl, items


def _batches(items, n_batches=4, q=16, seed=3):
    rng = np.random.default_rng(seed)
    return [items[rng.choice(len(items), q, replace=False)] * 1.02
            for _ in range(n_batches)]


def test_stream_matches_certified_mode(built):
    """Every stream batch must be bit-identical to the synchronous
    search_batch(mode="certified") call (shared finalize)."""
    aspace, gl, items = built
    batches = _batches(items)
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=3)
    for qb in batches:
        stream.submit(qb)
    outs = stream.finish()
    assert len(outs) == len(batches)
    for qb, (idx, vals, rate) in zip(batches, outs):
        ei, ev = aspace.search_batch(qb, gl, 0.62, mode="certified",
                                     n_probe=3)
        np.testing.assert_array_equal(idx, ei)
        np.testing.assert_allclose(vals, ev, rtol=0, atol=0)
        assert 0.0 <= rate <= 1.0


def test_stream_exactness(built):
    """Stream results (certified + widened + escalated) must equal the
    exact scan for every query, as mode='certified' guarantees."""
    aspace, gl, items = built
    rng = np.random.default_rng(11)
    batches = [np.concatenate([
        items[rng.choice(2000, 12, replace=False)] * 1.02,
        rng.normal(size=(4, 32))]) for _ in range(3)]
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=2)
    for qb in batches:
        stream.submit(qb)
    for qb, (idx, _vals, _r) in zip(batches, stream.finish()):
        ei, _ = aspace.search_batch(qb, gl, 0.62, mode="exact")
        for r in range(len(qb)):
            assert set(idx[r].tolist()) == set(ei[r].tolist()), r


def test_stream_depth_one_is_synchronous(built):
    """depth=1 finalizes each batch inside submit() — nothing left in
    flight afterwards."""
    aspace, gl, items = built
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=1)
    for qb in _batches(items, n_batches=2):
        stream.submit(qb)
        assert len(stream._inflight) == 0
    assert len(stream.finish()) == 2


def test_guardrail_degrades_to_fallback(built):
    """With an unreachable cert floor the stream must degrade after
    `floor_patience` batches and serve the remaining batches through the
    exact fallback — results stay exact on every batch either way."""
    aspace, gl, items = built
    batches = _batches(items, n_batches=5)
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=1,
                                   cert_floor=1.01, floor_patience=2,
                                   fallback_mode="exact",
                                   probe_escalations=0)
    for qb in batches:
        stream.submit(qb)
    outs = stream.finish()
    assert stream.degraded and stream.degraded_at == 1
    # Only the pre-degradation batches paid the certificate.
    assert len(stream.base_cert_rates) == 2
    for qb, (idx, _v, rate) in zip(batches, outs):
        ei, _ = aspace.search_batch(qb, gl, 0.62, mode="exact")
        for r in range(len(qb)):
            assert set(idx[r].tolist()) == set(ei[r].tolist()), r
    assert all(r == 1.0 for _, _, r in outs[2:])  # fallback batches


def test_guardrail_disabled_with_none_fallback(built):
    """fallback_mode=None keeps certifying regardless of the rate."""
    aspace, gl, items = built
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=1,
                                   cert_floor=1.01, floor_patience=1,
                                   fallback_mode=None)
    for qb in _batches(items, n_batches=3):
        stream.submit(qb)
    stream.finish()
    assert not stream.degraded
    assert len(stream.base_cert_rates) == 3


def test_stream_param_validation(built):
    aspace, gl, _items = built
    with pytest.raises(ValueError, match="depth"):
        CertifiedStream(lambda q: q, lambda q, o: (q, q, 1.0), depth=0)
    with pytest.raises(ValueError, match="together"):
        CertifiedStream(lambda q: q, lambda q, o: (q, q, 1.0),
                        fallback=lambda q: q)
    with pytest.raises(ValueError, match="fallback_mode"):
        aspace.serving_stream(gl, 0.62, fallback_mode="subtile-ish")


def test_widening_skipped_on_certificate_collapse(built, monkeypatch):
    """search_batch(mode='certified') must NOT pay bound-ordered widening
    when nearly the whole batch refuses (base rate < _WIDEN_MIN_CERT_RATE)
    — it escalates straight to the exact scan (the measured widening-on-
    every-batch cliff is ~15x worse than the scan)."""
    import pyarrowspace_tpu.core.space as space_mod
    import pyarrowspace_tpu.ops.pallas.ivf_scan as ivf_mod

    aspace, gl, items = built
    rng = np.random.default_rng(29)
    queries = rng.normal(size=(16, 32))  # out-of-distribution: low cert

    calls = {"widen": 0}
    orig = ivf_mod.widen_refusals

    def spy(*a, **kw):
        calls["widen"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ivf_mod, "widen_refusals", spy)
    monkeypatch.setattr(space_mod, "_WIDEN_MIN_CERT_RATE", 1.01)
    ci, _ = aspace.search_batch(queries, gl, 0.62, mode="certified",
                                n_probe=3)
    assert calls["widen"] == 0
    ei, _ = aspace.search_batch(queries, gl, 0.62, mode="exact")
    for r in range(len(queries)):
        assert set(ci[r].tolist()) == set(ei[r].tolist()), r


def test_volatile_nprobe_warning(monkeypatch):
    """VERDICT r4 #4: shallow probe lists at large N warn loudly about
    throughput volatility (measured np=4 collapse at 1M x 768); results
    stay exact, so it is a warning, not an error."""
    import logging

    import numpy as np

    from pyarrowspace_tpu.core.space import ArrowSpace

    class _Stub(ArrowSpace):
        def __init__(self):   # bypass builder token for the unit probe
            pass

        @property
        def nitems(self):
            return 1_000_000

    records = []
    monkeypatch.setattr(
        logging.getLogger("arrowspace.serving"), "warning",
        lambda msg, *a, **k: records.append(msg % a if a else msg))
    stub = _Stub()
    stub._warn_volatile_nprobe(4)
    assert records and "n_probe>=8" in records[0]
    records.clear()
    stub._warn_volatile_nprobe(8)          # deep probes: silent
    assert not records


def test_guardrail_escalates_probes_then_degrades(built):
    """The collapse ladder: with an unreachable cert floor the stream
    first doubles n_probe (`probe_escalations` rungs, still certified —
    results stay exact), and only then degrades to the fallback."""
    aspace, gl, items = built
    batches = _batches(items, n_batches=5)
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=1,
                                   cert_floor=1.01, floor_patience=1,
                                   fallback_mode="exact",
                                   probe_escalations=1)
    for qb in batches:
        stream.submit(qb)
    outs = stream.finish()
    # batch 0 trips the floor -> escalate (3 -> 6); batch 1 trips it
    # again with no rungs left -> degrade; batches 2+ ride the fallback.
    assert stream.escalated_at == [0]
    assert stream.degraded and stream.degraded_at == 1
    assert len(stream.base_cert_rates) == 2
    for qb, (idx, _v, _r) in zip(batches, outs):
        ei, _ = aspace.search_batch(qb, gl, 0.62, mode="exact")
        for r in range(len(qb)):
            assert set(idx[r].tolist()) == set(ei[r].tolist()), r


def test_escalation_without_fallback_keeps_certifying(built):
    """fallback_mode=None still escalates the probe list, then keeps
    certifying once the rungs are exhausted (never degrades)."""
    aspace, gl, items = built
    stream = aspace.serving_stream(gl, 0.62, n_probe=3, depth=1,
                                   cert_floor=1.01, floor_patience=1,
                                   fallback_mode=None,
                                   probe_escalations=1)
    for qb in _batches(items, n_batches=4):
        stream.submit(qb)
    stream.finish()
    assert stream.escalated_at == [0]
    assert not stream.degraded
    assert len(stream.base_cert_rates) == 4


def test_on_collapse_hook_unit():
    """CertifiedStream calls on_collapse at the patience boundary and
    resets the streak while the hook keeps returning True."""
    calls = []

    def hook():
        calls.append(len(calls))
        return len(calls) <= 2

    def fake_finalize(_q, out):
        return out, out, 0.0   # always below any floor

    stream = CertifiedStream(lambda q: q, fake_finalize,
                             fallback=lambda q: q,
                             finalize_fallback=lambda q, o: (o, o),
                             depth=1, cert_floor=0.5, floor_patience=2,
                             on_collapse=hook)
    for i in range(8):
        stream.submit(np.asarray([i]))
    stream.finish()
    # patience=2: hooks fire after batches 1 and 3 (True), then after
    # batch 5 the third call returns False -> degrade.
    assert calls == [0, 1, 2]
    assert stream.escalated_at == [1, 3]
    assert stream.degraded_at == 5
