"""The checked-in benchmarks/recorded/ artifacts must carry the
reference's qualitative shapes (VERDICT round-1: recorded sweeps were
flat/contradictory; these assertions make the evidence self-verifying)."""

import csv
import json
from pathlib import Path

import pytest

RECORDED = Path(__file__).resolve().parent.parent / "benchmarks" / "recorded"


def _latest(suffix, filename):
    dirs = sorted(d for d in RECORDED.iterdir()
                  if d.is_dir() and d.name.endswith(suffix))
    assert dirs, f"no recorded {suffix} run"
    return dirs[-1] / filename


def test_tau_sweep_artifact_monotone():
    data = json.loads(_latest("tau_sweep",
                              "beir_tau_sweep_results.json").read_text())
    assert data["dataset_size"] >= 81000, data["dataset_size"]
    by_mode = data["results_by_mode"]
    taus = ["cosine", "taumode", "extra-taumode"]   # 1.0, 0.62, 0.42
    mrr = [by_mode[m]["metrics"]["mrr"] for m in taus]
    ndcg = [by_mode[m]["metrics"]["ndcg@10"] for m in taus]
    rec = [by_mode[m]["metrics"]["recall@10"] for m in taus]
    assert mrr[0] > mrr[1] > mrr[2], mrr
    assert ndcg[0] > ndcg[1] > ndcg[2], ndcg
    assert rec[0] >= rec[1] >= rec[2] and rec[0] > rec[2], rec


def test_eps_sweep_artifact_moves():
    """The latest recorded eps sweep must be at reference scale (>= 81k
    x 768, BASELINE.md: 81,039 passages) and nDCG@10 must move by more
    than 1e-3 at EVERY eps step (reference: 0.5955/0.5986/0.5997)."""
    data = json.loads(_latest("eps_sweep",
                              "beir_eps_sweep_results.json").read_text())
    assert data["dataset_size"] >= 81000, data["dataset_size"]
    ok = {e: v["metrics"] for e, v in data["results_by_eps"].items()
          if v["build_status"] == "SUCCESS"}
    assert len(ok) == 3, data["results_by_eps"]
    ndcgs = [m["ndcg@10"] for m in ok.values()]
    assert abs(ndcgs[1] - ndcgs[0]) > 1e-3, ndcgs
    assert abs(ndcgs[2] - ndcgs[1]) > 1e-3, ndcgs


def test_energy_sweep_artifact_shape():
    rows = list(csv.DictReader(
        _latest("energy_sweep", "diffusion_sweep_results.csv").open()))
    ok = [r for r in rows if r["status"] == "OK"]
    by_cfg = {(float(r["eta"]), int(r["steps"])): float(r["avg_mrr"])
              for r in ok}
    # Best region at low eta (reference: MRR 1.0 at eta=0.05).
    assert max(by_cfg[(0.05, s)] for s in (4, 6, 8)) >= 0.9, by_cfg
    # Degenerate extreme corner (reference: eta x steps max -> collapse).
    assert by_cfg[(0.25, 8)] < 0.75 * max(
        by_cfg[(0.05, s)] for s in (4, 6, 8)), by_cfg
    # Per-eta mean degrades toward eta=0.25.
    mean = {e: sum(by_cfg[(e, s)] for s in (4, 6, 8)) / 3
            for e in (0.05, 0.15, 0.25)}
    assert mean[0.05] > mean[0.25], mean


def test_ir_eval_margin_artifact_lambda_improves():
    """The recorded lambda-HELPS artifact (ARROWSPACE_IR_REGIME=margin)
    must carry the reference's flagship direction: MRR/nDCG improvements
    POSITIVE at tau=0.62 with recall@10 tied (reference recorded
    +2.37% MRR / +1.78% nDCG / recall 0.91==0.91,
    tests/output/1761063134_v0_17_beir-msmarco)."""
    data = json.loads(_latest("ir_eval_margin",
                              "beir_evaluation_results.json").read_text())
    assert data["dataset_size"] >= 81000, data["dataset_size"]
    imp = data["metrics"]["improvements"]
    assert imp["mrr_pct"] > 0, imp
    assert imp["ndcg@10_pct"] > 0, imp
    assert imp["recall@10_pct"] >= 0, imp     # tied or better
    assert data["tau"] == 0.62


def test_ir_eval_artifact_schema():
    data = json.loads(_latest("ir_eval",
                              "beir_evaluation_results.json").read_text())
    # The reference beir_evaluation_results.json schema
    # (tests/output/1761063134_v0_17_beir-msmarco/).
    for key in ("dataset", "dataset_size", "num_queries", "tau", "metrics"):
        assert key in data, key
    for m in ("cosine", "lambda_aware", "improvements"):
        assert m in data["metrics"], m
    for metric in ("recall@10", "mrr", "ndcg@10"):
        assert metric in data["metrics"]["cosine"], metric


def test_energy_fixed_313k_anchor():
    """The 313k-scale EnergyMaps fixed-config anchor (VERDICT r2 item 6):
    reference records graph_nodes=120 and MRR 0.6667 / nDCG 0.6644 at
    313,841 items (tests/output/1761239603_v0_18_energymaps_9_fixed).
    The recorded run must stay in the same structural regime: ~100-node
    compressed energy graph at 313,841 items, pinned config eta=0.05 /
    steps=4, OK status, MRR comfortably above the degenerate regime."""
    import json as _json
    d = _latest("energy_fixed_313k", "summary.json")
    data = _json.loads(d.read_text())
    assert data["dataset_size"] == 313841
    cfg = data["config"]
    assert cfg["status"] == "OK"
    assert cfg["eta"] == 0.05 and cfg["steps"] == 4
    assert 80 <= cfg["graph_nodes"] <= 160, cfg  # reference: 120
    assert cfg["avg_mrr"] >= 0.5, cfg            # reference: 0.6667
    sug = d.parent / "suggested_eps.md"
    assert "N=313,841 items" in sug.read_text()


def test_cert_rates_artifact():
    """Certification rates (hardware-independent f32 math): monotone in
    n_probe, full coverage at n_probe=K/2 across the recorded regimes.
    'hardq' regimes (heavier query perturbation) pin the TRANSITION shape
    — high-but-not-saturated coverage — the widening loop relies on."""
    d = json.loads(_latest("cert_rates", "cert_rates.json").read_text())
    assert d["config"]["routing"] == "bound-ordered"
    for name, rates in d["regimes"].items():
        vals = [rates[k] for k in sorted(rates, key=int)]
        assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), (name,
                                                                    vals)
        if "hardq" in name:
            assert vals[-1] >= 0.9, (name, vals)      # n_probe=64 of 128
            assert 0.2 <= vals[0] <= 0.95, (name, vals)   # transition
        else:
            assert vals[-1] >= 0.99, (name, vals)
            assert vals[2] >= 0.5, (name, vals)       # n_probe=32 useful


def test_serving_1m_artifact():
    """The measured 1M x 768 TPU serving run (README performance table):
    blocked IVF must be near-exact at n_probe=8 on the in-distribution
    mixture (overlap >= 0.99) and certified serving must certify >= 90%
    of queries at the base pass while still clearing the exact-scan QPS
    band.  Absolute QPS is tunnel-weather dependent; only order
    relations and rates are pinned."""
    d = json.loads(_latest("serving_1m", "serving_results.json")
                   .read_text())
    assert d["config"]["n"] == 1_000_000 and d["config"]["f"] == 768
    assert d["config"]["backend"] == "tpu"
    ivf = next(v for k, v in d["modes"].items()
               if k.startswith("ivf_block_f32"))
    cert = next(v for k, v in d["modes"].items()
                if k.startswith("certified"))
    assert ivf["top10_overlap_vs_exact"] >= 0.99, ivf
    assert cert["certified_rate"] >= 0.9, cert
    # certified serves EXACT results; pipelined (serving_stream) it must
    # hold the BASELINE.json north star (>=100k QPS/chip; measured 117.2k
    # 2026-08-19) and cost more than the uncertified approximate scan.
    # Re-record rather than weaken: dropping below 100k means the
    # flagship serving mode lost the north star.
    assert cert["qps"] >= 100_000, cert
    assert cert.get("stream_depth", 1) > 1, cert  # pipelined measurement
    assert cert.get("sync_qps", cert["qps"]) >= 45_000, cert
    assert ivf["qps"] > cert["qps"], (ivf, cert)


def test_bf16_ab_artifact():
    """Same-session f32 vs bf16 slab A/B at 1M x 768 (VERDICT r3 item 2):
    the artifact must keep showing (a) the measured certified-mode bf16
    regression docs/SERVING.md now documents, (b) ivf_block bf16 within
    noise of f32, and (c) the on-TPU bf16 scan error model holding —
    Mosaic lowering the in-kernel dot at f32 fidelity is what makes the
    rescored certificate sound (ADVICE r3).  Re-record on hardware/
    toolchain changes rather than hand-editing."""
    d = json.loads(_latest("bf16_ab", "serving_results.json").read_text())
    assert d["config"]["backend"] == "tpu"
    m = d["modes"]
    cert_f32, cert_bf16 = m["certified_np8"], m["certified_bf16_np8"]
    # Both certify fully; bf16 is the measured slower path.
    assert cert_f32["certified_rate"] >= 0.99
    assert cert_bf16["certified_rate"] >= 0.99
    assert cert_bf16["qps"] < 0.8 * cert_f32["qps"], (cert_bf16, cert_f32)
    # ivf_block: bf16 within run-to-run noise of f32 (same session).
    r = m["ivf_block_bf16_np8"]["qps"] / m["ivf_block_f32_np8"]["qps"]
    assert 0.8 <= r <= 1.25, r
    em = m["scan_error_model_bf16"]
    assert em["holds"] and em["max_dev"] <= em["bound"], em


def test_lambda_regimes_artifact():
    """The lambda-vs-cosine regime study (VERDICT r3 item 4) must keep
    its characterization: the win needs the CONJUNCTION of norm
    heteroscedasticity and hard cosine negatives; either mechanism alone
    is ~neutral, the neutral corpus shows no win, recall stays tied
    (the reference's real-data signature: MRR/nDCG up, recall tied)."""
    d = json.loads(_latest("lambda_regimes", "lambda_regimes.json")
                   .read_text())
    agg = {(a["axis"], a["scale_ratio"], a["hn_frac"]): a
           for a in d["aggregate"]}
    neutral = agg[("neutral", 1.0, 0.0)]
    assert abs(neutral["mean_delta_mrr_pct"]) < 2.0, neutral
    # Single mechanisms: ~neutral.
    assert agg[("scale_axis", 1.0, 0.15)]["mean_delta_mrr_pct"] < 2.0
    assert agg[("hn_axis", 3.0, 0.0)]["mean_delta_mrr_pct"] < 2.0
    # Conjunction: a clear win that grows with either axis.
    assert agg[("scale_axis", 1.8, 0.15)]["mean_delta_mrr_pct"] >= 3.0
    assert agg[("hn_axis", 3.0, 0.25)]["mean_delta_mrr_pct"] >= 5.0
    hn_deltas = [agg[("hn_axis", 3.0, h)]["mean_delta_mrr_pct"]
                 for h in (0.0, 0.08, 0.25)]
    assert hn_deltas == sorted(hn_deltas), hn_deltas
    # Recall tied everywhere (the reference signature).
    for a in d["aggregate"]:
        assert abs(a["mean_recall_gap_pct"]) <= 2.0, a
    # norm_cv is the measurable predictor: the winning points carry
    # visibly dispersed norms, the neutral point does not.
    assert agg[("scale_axis", 1.8, 0.15)]["mean_norm_cv"] >= 0.1
    assert neutral["mean_norm_cv"] <= 0.05


def test_rescore_pallas_ab_artifact():
    """The Pallas-rescore A/B (VERDICT r3 item 6) must keep its measured
    outcome: the scalar-prefetch 8-row-block rescore is SLOWER than the
    XLA gather+einsum it was meant to replace, so the XLA rescore stays
    (docs/SERVING.md quotes the XLA path; this pins why)."""
    d = json.loads(_latest("rescore_pallas_ab", "results.json").read_text())
    rows = d["results"]["timing_same_session_ab"]
    assert len(rows) >= 2
    for r in rows:
        assert r["pallas_ms"] > r["xla_ms"], r
    assert d["results"]["correctness"]["bad_frac_n1007616_q16384_m15"] > 0.5


def test_build_1m_artifact():
    """FULL standard build at the 1M x 768 serving scale on real TPU
    (VERDICT r4 #1): the chunked-symmetrize regime (n*k > 20M, F >= 512)
    with phase split, graph census and the hub auto-widen outcome."""
    data = json.loads(_latest("build_1m",
                              "build_1m_results.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 1_000_000 and cfg["f"] >= 768
    assert cfg["backend"] in ("tpu", "axon")        # real-hardware evidence
    assert cfg["knn_backend"] == "pallas"
    assert 0 < data["value"] < 300                  # seconds, sane
    ph = data["phases_s"]
    for stage in ("knn", "symmetrize", "reduction", "lambdas"):
        assert stage in ph, stage
    assert abs(sum(ph.values()) - data["value"]) < 0.15 * data["value"]
    g = data["graph"]
    assert g["nnodes"] == cfg["n"]
    # k=25 directed edges -> union graph lands in (N*k, 2*N*k).
    k = cfg["graph_params"]["k"]
    assert cfg["n"] * k * 0.5 < g["nedges"] <= cfg["n"] * k * 2
    assert g["n_dropped"] == 0          # auto-widen kept the full union
    assert g["ell_width"] >= 2 * k      # the widen actually fired
    ls = data["lambda_stats"]
    assert 0 < ls["min"] < ls["mean"] < ls["max"] < 1
    assert ls["std"] > 1e-4             # lambdas not collapsed


def test_serving_real_index_artifact():
    """Serving from the REAL 1M x 768 built index (VERDICT r4 #1: the
    flagship serving numbers must rest on an index whose build path ran
    at scale, not synthesized state): certified stays exact (100%
    certified) and ivf_block keeps its overlap on the real lambdas."""
    data = json.loads(_latest("serving_real_index",
                              "serving_results.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 1_000_000 and cfg["f"] >= 768
    assert cfg["index"], "must serve from a saved real index"
    assert cfg["backend"] in ("tpu", "axon")
    ivf = next(v for k, v in data["modes"].items()
               if k.startswith("ivf_block_f32"))
    assert ivf["top10_overlap_vs_exact"] >= 0.99
    cert = next(v for k, v in data["modes"].items()
                if k.startswith("certified"))
    assert cert["certified_rate"] == 1.0
    assert cert["qps"] >= 50_000            # real-index serving floor
    assert cert["sync_qps"] > 0


def test_cert_profile_artifact():
    """Certified-serving phase profile at 1M x 768 (VERDICT r4 #2): the
    recorded decomposition behind the qb=16 certified default and the
    host-sync findings."""
    data = json.loads(_latest("cert_profile",
                              "cert_profile.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 1_000_000 and cfg["f"] >= 768
    assert cfg["backend"] in ("tpu", "axon")
    ph = data["phases"]
    # qb=16 must certify as fully as qb=8 on tightened clusters (the
    # basis of the default change); per-phase ladder timings carry
    # ~15-20% in-session noise, so only the robust signals are pinned.
    assert ph["scan+cert_qb16"]["cert_rate"] == 1.0
    assert ph["scan+cert_qb8"]["cert_rate"] == 1.0
    assert (ph["e2e_qb16"]["pipelined_qps"]
            >= 0.95 * ph["e2e_qb8"]["pipelined_qps"])
    if "e2e_qb16_packed" in ph:
        # The single-pull certificate sync (pack_certified): the sync
        # path sheds ~2 RPCs per batch (measured 45.6k -> 90.8k QPS).
        assert (ph["e2e_qb16_packed"]["sync_qps"]
                >= 1.2 * ph["e2e_qb16"]["sync_qps"])
        assert ph["e2e_qb16_packed"]["cert_rate"] == 1.0
    # The host result pull is a real, measured cost (sync-mode tax).
    assert ph["result_pull"]["ms_per_batch"] > 1.0


def test_knn_bf16_ab_artifact():
    """bf16 k-NN first pass A/B (VERDICT r4 #3): measured 1.44x — the
    kernel is EXTRACTION-bound, not MXU-bound (solving t = t_mxu + t_vpu
    from the f32/bf16 pair puts the exact top-k merge at ~60% of the
    pass), so the certify-then-escalate bf16 pipeline's ceiling is
    ~1.4x before its own rescore/escalation costs — recorded as the
    measured basis for NOT building it (unstructured corpora would
    additionally mass-escalate on tiny kth gaps)."""
    data = json.loads(_latest("knn_dtype_ab",
                              "knn_bf16_ab.json").read_text())
    assert data["config"]["backend"] in ("tpu", "axon")
    assert data["config"]["n"] >= 262_144 and data["config"]["f"] >= 768
    assert 1.0 <= data["speedup_bf16"] <= 2.0     # NOT the 4x MXU ratio
    assert data["modes"]["f32"]["tf_per_s"] > 20  # sane f32 throughput
    assert data["neighbor_overlap_sampled"] >= 0.99


def test_knn_merge_ab_artifact():
    """Transposed-merge k-NN A/B (round-5 follow-up to the bf16 A/B's
    extraction-bound finding): candidates on SUBLANES so every merge
    reduction is relayout-free — measured 0.96x at 313k x 384 on TPU,
    i.e. the lazy extract-insert merge is ELEMENTWISE-bound (each pass
    touches the whole [B, T] tile), not relayout-bound.  Recorded as the
    measured basis for keeping the row-major kernel the default; the
    variant stays an env-gated probe (ARROWSPACE_KNN_VARIANT)."""
    data = json.loads(_latest("knn_merge_ab",
                              "knn_merge_ab.json").read_text())
    assert data["config"]["backend"] in ("tpu", "axon")
    assert data["config"]["n"] >= 262_144
    # A near-tie, not a win — and exactness held bitwise.
    assert 0.8 <= data["speedup_transposed"] <= 1.2
    assert data["rows_identical_idx"] == 1.0
    assert data["dist_bitwise_equal"] is True
    assert data["modes"]["rowmajor"]["tf_per_s"] > 20


def test_cert_seeds_artifact():
    """Multi-seed cert-rate floor at realistic scale (VERDICT r4 #4):
    >= 262k x 768 on real TPU, clustering seed swept, np in {4, 8}."""
    data = json.loads(_latest("cert_seeds", "cert_seeds.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 262_144 and cfg["f"] >= 768
    assert cfg["backend"] in ("tpu", "axon")
    assert len(data["seeds"]) >= 5
    # The floor evidence: np=8 base rate holds across every seed; np=4
    # stays above the widening guardrail and one widen round recovers.
    assert data["np8_floor"]["base_min"] >= 0.99
    assert data["np4_floor"]["base_min"] >= 0.25   # never collapses here
    assert data["np4_floor"]["widened_min"] >= 0.99


def test_cert_profile_32k_artifact():
    """VERDICT r4 #2 target met: >= 150k QPS at 100% certified at
    1M x 768 (measured 191.7k pipelined at batch 32768 with the packed
    single-pull sync — recorded 1787164272)."""
    data = json.loads(_latest("cert_profile_32k",
                              "cert_profile.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 1_000_000 and cfg["f"] >= 768
    assert cfg["q_batch"] >= 32768
    assert cfg["backend"] in ("tpu", "axon")
    best = data["phases"]["e2e_qb16_packed"]
    assert best["cert_rate"] == 1.0
    assert best["pipelined_qps"] >= 150_000
    assert best["sync_qps"] >= 100_000


def test_cold_start_artifact():
    """Deployment cold start (VERDICT r4 weak #4): the persistent XLA
    compilation cache measurably works ACROSS PROCESSES on the real
    TPU.  Three fresh processes shared one empty-at-start cache dir at
    the bench shape (313,841 x 384 build + exact & certified serving):
    total process time 449.3 -> 151.2 -> 49.3 s, first certified-serve
    26.3 -> ~2.2 s.  The steady (warm2) process is the deployment
    cold-start number; docs/SERVING.md quotes these."""
    data = json.loads(_latest("cold_start", "cold_start.json").read_text())
    runs = data["runs"]
    assert data["shape"]["n"] >= 313_000
    # Cache recovers most of the first-build compile and the serving
    # compiles; each warm generation strictly improves the cold start.
    assert runs["warm1"]["total_process_s"] < 0.5 * runs["cold"]["total_process_s"]
    assert runs["warm2"]["total_process_s"] < 0.5 * runs["warm1"]["total_process_s"]
    assert (runs["warm2"]["first_serve_certified_s"]
            < 0.2 * runs["cold"]["first_serve_certified_s"])
    # Steady-state build time itself is cache-independent (sanity).
    builds = [runs[k]["steady_build_s"] for k in ("cold", "warm1", "warm2")]
    assert max(builds) < 1.5 * min(builds)


def test_cert_ladder_artifact():
    """Round-5 certified-overhead decomposition (probe_cert_ladder.py,
    recorded 1787201129, same-session TPU at 1M x 768, batch 32768,
    n_probe=8, qb=8): the SHIPPED certified kernel costs only a few ms
    over the plain bound-routed scan — scan floor 123.1 ms, +routing
    135.0 ms, full certified 142.5 ms (229.9k QPS).  This corrects the
    phase-split reading of 1787164272 (269 ms "cert overhead" across
    separately-timed phases): under a controlled same-session A/B the
    certificate is ~6% of the kernel, and the pipelined e2e gap to
    ivf_block is synthesis/pull overhead, not certification."""
    data = json.loads(_latest("cert_ladder", "cert_ladder.json").read_text())
    cfg = data["config"]
    assert cfg["n"] >= 1_000_000 and cfg["f"] >= 768
    assert cfg["q_batch"] >= 32768 and cfg["backend"] in ("tpu", "axon")
    p = data["phases"]
    scan = p["E_scan_only"]["ms_per_batch"]
    plain = p["A_plain"]["ms_per_batch"]
    cert = p["B_cert"]["ms_per_batch"]
    # The qualitative shape this pins: certification is cheap relative
    # to the scan it certifies (within 25% of the plain path), and the
    # plain path is within 2x of the raw kernel floor.
    assert cert <= 1.25 * plain, (cert, plain)
    assert plain <= 2.0 * scan, (plain, scan)
    assert p["B_cert"]["qps"] >= 150_000
