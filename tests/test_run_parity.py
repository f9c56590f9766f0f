"""Turnkey real-data parity runner (VERDICT r4 #6): the diff logic is
fixture-driven here; the end-to-end path runs on a tiny synthetic
"export" so the one-command promise in docs/QUALITY.md is executable
evidence, not just a script."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                       / "benchmarks"))

from run_parity import diff_results, format_diff_md  # noqa: E402

REF = {
    "dataset": "MS MARCO (BeIR)", "dataset_size": 81039,
    "num_queries": 50, "tau": 0.62,
    "metrics": {
        "cosine": {"recall@10": 0.91, "mrr": 0.5120, "ndcg@10": 0.6027},
        "lambda_aware": {"recall@10": 0.91, "mrr": 0.5241,
                         "ndcg@10": 0.6135},
        "improvements": {"recall@10_pct": 0.0, "mrr_pct": 2.3694,
                         "ndcg@10_pct": 1.7801}}}


def _ours(d_mrr=0.0, d_impr=0.0):
    o = json.loads(json.dumps(REF))
    o["metrics"]["lambda_aware"]["mrr"] += d_mrr
    o["metrics"]["improvements"]["mrr_pct"] += d_impr
    return o


def test_identical_passes():
    diff = diff_results(REF, REF)
    assert diff["passed"]
    assert len(diff["rows"]) == 9          # 2 modes x 3 metrics + 3 impr
    assert all(r["ok"] for r in diff["rows"])


def test_within_tolerance_passes():
    assert diff_results(_ours(d_mrr=0.04, d_impr=1.5), REF)["passed"]


def test_absolute_metric_out_of_tolerance_fails():
    diff = diff_results(_ours(d_mrr=0.08), REF)
    assert not diff["passed"]
    bad = [r for r in diff["rows"] if not r["ok"]]
    assert any(r["section"] == "lambda_aware" and r["metric"] == "mrr"
               for r in bad)


def test_improvement_sign_flip_fails_even_within_pp():
    # ref mrr improvement +2.37pp; ours -1.0pp is within 2pp tolerance
    # window... no: |(-1.0) - 2.37| = 3.37 > 2. Build a sign flip that IS
    # within the pp tolerance: ref +0.8pp (decisive), ours -0.5pp.
    ref = json.loads(json.dumps(REF))
    ref["metrics"]["improvements"]["mrr_pct"] = 0.8
    ours = json.loads(json.dumps(ref))
    ours["metrics"]["improvements"]["mrr_pct"] = -0.5
    diff = diff_results(ours, ref, tol_impr_pp=2.0)
    assert not diff["passed"]


def test_indecisive_reference_allows_sign_flip():
    ref = json.loads(json.dumps(REF))
    ref["metrics"]["improvements"]["mrr_pct"] = 0.2   # < 0.5pp decisive
    ours = json.loads(json.dumps(ref))
    ours["metrics"]["improvements"]["mrr_pct"] = -0.3
    assert diff_results(ours, ref, tol_impr_pp=2.0)["passed"]


def test_markdown_rendering():
    diff = diff_results(_ours(d_mrr=0.2), REF)
    doc = format_diff_md(diff, REF, REF)
    assert "| lambda_aware | mrr |" in doc
    assert "FAIL" in doc and "**OVERALL: FAIL**" in doc


@pytest.mark.slow
def test_end_to_end_with_synthetic_export(tmp_path):
    """Drive the actual CLI with a tiny planted-duplicates 'export': the
    runner must produce the schema JSON, the diff artifact, and a
    sensible exit code (pass/fail depends only on tolerances, which we
    open wide — the point is the plumbing, not MS MARCO numbers)."""
    rng = np.random.default_rng(0)
    base = rng.normal(size=(40, 64))
    corpus = (np.repeat(base, 20, axis=0)
              + 0.05 * rng.normal(size=(800, 64)))
    q_rows = rng.integers(0, 800, size=20)
    queries = corpus[q_rows] + 0.02 * rng.normal(size=(20, 64))
    data = tmp_path / "export"
    data.mkdir()
    np.save(data / "msmarco_corpus.npy", corpus / 100.0)  # runner x100
    np.save(data / "msmarco_queries.npy", queries / 100.0)
    (data / "msmarco_qrels.json").write_text(json.dumps(
        {str(i): [int(r)] for i, r in enumerate(q_rows)}))
    out = tmp_path / "out"
    env = dict(__import__("os").environ,
               ARROWSPACE_DATA_DIR=str(data), ARROWSPACE_CPU="1",
               PARITY_TOL_ABS="1.0", PARITY_TOL_IMPR_PP="100.0")
    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "benchmarks" / "run_parity.py"),
         "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    ours = json.loads((out / "beir_evaluation_results.json").read_text())
    for key in ("dataset", "dataset_size", "num_queries", "tau",
                "metrics"):
        assert key in ours, key
    for mode in ("cosine", "lambda_aware", "improvements"):
        assert mode in ours["metrics"], mode
    diff = json.loads((out / "parity_diff.json").read_text())
    assert diff["passed"] and len(diff["rows"]) == 9
    assert "OVERALL: PASS" in (out / "parity_diff.md").read_text()
