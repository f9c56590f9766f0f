"""Certification-rate robustness across seeds (VERDICT r3 item 3).

The certificate rate is data/seed dependent, and a collapse is expensive:
widening-on-every-batch measured ~15x worse than the exact scan before the
guardrail landed.  Same-config CPU runs were observed flipping cert rate
between 0.0 and 1.0 (benchmarks/output/1787108978 vs 1787109878) — this
test pins a FLOOR on the base certification rate across >=5 corpus seeds
on the serving benchmark's own generator (gaussian-mixture corpus +
in-distribution queries at 0.25 relative noise, benchmarks/
bench_serving.py), so a clustering/bound regression that quietly erodes
certification fails loudly here instead of as a 15x QPS cliff in
production.

Scale is the smallest that keeps the statistic meaningful: the measured
mins at this scale are 0.917 across 5 seeds x 2 batches (and 0.844 at the
2x scale); the floor is pinned at 0.75 to absorb platform noise while
still catching any real collapse (the failure mode is ~0.0-0.5).
"""

import numpy as np
import pytest

from pyarrowspace_tpu import ArrowSpaceBuilder

GP = {"eps": 0.9, "k": 6, "topk": 8, "p": 2.0, "sigma": 0.45}
N, F, K_MIX = 1500, 48, 24
SEEDS = range(5)
CERT_FLOOR = 0.75


def _mixture_corpus(seed):
    """bench_serving's SERV_MIXTURE generator, numpy edition."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K_MIX, F))
    assign = rng.integers(0, K_MIX, size=N)
    return centers[assign] + 0.35 * rng.normal(size=(N, F))


def _indist_queries(xu, seed, q=48, noise_rel=0.25):
    """In-distribution queries: perturbed unit corpus rows at a fixed
    relative perturbation norm (bench_serving SERV_QMODEL=indist)."""
    rng = np.random.default_rng(seed)
    rows = rng.choice(len(xu), q, replace=False)
    return xu[rows] + (noise_rel / np.sqrt(F)) * rng.normal(size=(q, F))


def test_default_q_block_gates_on_n_probe():
    """The certified q_block default must stay narrow at small n_probe:
    probes are block-shared, and qb=16 at n_probe=4 was measured to
    erode the base cert rate 0.92 -> 0.54 on this file's mixture
    (2026-08-19) — exactly the collapse the floor test below pins.  The
    wide block is only cert-neutral at n_probe >= 8 (recorded
    1787159703_cert_profile at 1M x 768)."""
    from pyarrowspace_tpu.ops.pallas.ivf_scan import default_q_block

    assert default_q_block(certify=True, n_probe=4) == 8
    assert default_q_block(certify=True, n_probe=8) == 16
    assert default_q_block(certify=False, n_probe=4) == 16


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS)
def test_cert_rate_floor_across_seeds(seed):
    items = _mixture_corpus(seed)
    aspace, gl = ArrowSpaceBuilder.build(GP, items)
    aspace.enable_ivf(n_clusters=K_MIX)
    xu = items / np.linalg.norm(items, axis=1, keepdims=True)
    stream = aspace.serving_stream(gl, 0.62, n_probe=4, depth=1)
    batches = [_indist_queries(xu, 1000 + 10 * seed + b) for b in range(2)]
    for qb in batches:
        stream.submit(qb)
    rates = [r for _, _, r in stream.finish()]
    assert min(rates) >= CERT_FLOOR, (
        f"seed {seed}: base certification rate {min(rates):.3f} fell below "
        f"the pinned floor {CERT_FLOOR} on the mixture benchmark — "
        "certified serving would widen/escalate on a large fraction of "
        "every batch (the measured collapse is a ~15x QPS cliff)")
