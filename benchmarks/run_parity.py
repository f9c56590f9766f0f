"""Turnkey real-data parity runner (VERDICT r4 #6).

Given exported real embeddings (ARROWSPACE_DATA_DIR, layout in
benchmarks/protocols.load_beir_export — produced by running the reference
harness's embedding stage, reference tests/test_3_beir.py:66-82), this:

  1. runs the full reference BeIR evaluation protocol (bench_3) on them,
  2. loads the reference's recorded results JSON
     (/root/reference/tests/output/1761063134_v0_17_beir-msmarco/
     beir_evaluation_results.json schema),
  3. emits a side-by-side diff with pass/fail tolerances and exits
     non-zero on failure — the one-command parity check docs/QUALITY.md
     promises once data exists.

Tolerances (env-overridable):
  PARITY_TOL_ABS      absolute tolerance on recall@10 / mrr / ndcg@10
                      (default 0.05 — different query subsets and
                      encoder builds move absolute metrics a few points)
  PARITY_TOL_IMPR_PP  tolerance in percentage POINTS on the improvement
                      rows (default 2.0), additionally requiring sign
                      agreement when the reference improvement is > 0.5pp
                      (the flagship claim is "lambda-aware improves
                      MRR/nDCG at tied recall" — direction matters more
                      than magnitude).

Usage:
  ARROWSPACE_DATA_DIR=/path/to/exports python benchmarks/run_parity.py \
      [--reference /path/to/beir_evaluation_results.json] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_RESULTS = ("/root/reference/tests/output/"
                     "1761063134_v0_17_beir-msmarco/"
                     "beir_evaluation_results.json")

_METRICS = ("recall@10", "mrr", "ndcg@10")
_IMPROVEMENTS = ("recall@10_pct", "mrr_pct", "ndcg@10_pct")


def diff_results(ours: dict, ref: dict, tol_abs: float = 0.05,
                 tol_impr_pp: float = 2.0) -> dict:
    """Side-by-side diff of two beir_evaluation_results.json payloads.

    Pure function (fixture-testable).  Returns {"rows": [...], "passed":
    bool}; each row is {section, metric, ours, reference, delta, tol,
    ok}.  Improvement rows additionally fail on sign disagreement when
    the reference improvement is decisive (>0.5pp)."""
    rows = []
    for mode in ("cosine", "lambda_aware"):
        for m in _METRICS:
            o = float(ours["metrics"][mode][m])
            r = float(ref["metrics"][mode][m])
            rows.append({"section": mode, "metric": m, "ours": o,
                         "reference": r, "delta": o - r, "tol": tol_abs,
                         "ok": abs(o - r) <= tol_abs})
    for m in _IMPROVEMENTS:
        o = float(ours["metrics"]["improvements"][m])
        r = float(ref["metrics"]["improvements"][m])
        ok = abs(o - r) <= tol_impr_pp
        if abs(r) > 0.5:            # decisive reference direction
            ok = ok and (o * r >= 0.0)
        rows.append({"section": "improvements", "metric": m, "ours": o,
                     "reference": r, "delta": o - r, "tol": tol_impr_pp,
                     "ok": ok})
    return {"rows": rows, "passed": all(r["ok"] for r in rows)}


def format_diff_md(diff: dict, ours_meta: dict, ref_meta: dict) -> str:
    lines = [
        "# Real-data parity diff (reference BeIR protocol)", "",
        f"ours: dataset={ours_meta.get('dataset')} "
        f"N={ours_meta.get('dataset_size')} "
        f"queries={ours_meta.get('num_queries')} "
        f"tau={ours_meta.get('tau')}",
        f"reference: dataset={ref_meta.get('dataset')} "
        f"N={ref_meta.get('dataset_size')} "
        f"queries={ref_meta.get('num_queries')} "
        f"tau={ref_meta.get('tau')}", "",
        "| section | metric | ours | reference | delta | tol | status |",
        "| :-- | :-- | --: | --: | --: | --: | :-- |",
    ]
    for r in diff["rows"]:
        lines.append(
            f"| {r['section']} | {r['metric']} | {r['ours']:.4f} | "
            f"{r['reference']:.4f} | {r['delta']:+.4f} | {r['tol']:.2g} | "
            f"{'PASS' if r['ok'] else 'FAIL'} |")
    lines += ["", f"**OVERALL: {'PASS' if diff['passed'] else 'FAIL'}**",
              ""]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default=REFERENCE_RESULTS)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not os.environ.get("ARROWSPACE_DATA_DIR"):
        print("run_parity: set ARROWSPACE_DATA_DIR to the exported "
              "embeddings (see benchmarks/protocols.load_beir_export for "
              "the layout; docs/QUALITY.md for the export runbook)",
              file=sys.stderr)
        return 2

    from protocols import load_beir_export, out_dir, save_json
    if load_beir_export("msmarco") is None:
        print("run_parity: ARROWSPACE_DATA_DIR is set but has no "
              "msmarco_{corpus,queries}.npy export", file=sys.stderr)
        return 2

    # The full reference protocol: bench_3's loader scales x100 like the
    # reference (test_3_beir.py:190) and its evaluator computes the same
    # cosine / lambda-aware / improvement table.
    import bench_3_ir_eval as b3
    corpus, queries, relevant, dataset = b3.load_protocol_data()
    runs, t_build, _ = b3.run_eval(corpus, queries, relevant)
    ours = {
        "dataset": dataset,
        "dataset_size": int(corpus.shape[0]),
        "num_queries": int(queries.shape[0]),
        "tau": b3.TAU,
        "build_seconds": t_build,
        "metrics": {
            "cosine": b3._metrics(runs["cosine"]),
            "lambda_aware": b3._metrics(runs["lambda_aware"]),
            "improvements": b3._improvements(runs["cosine"],
                                             runs["lambda_aware"]),
        },
    }

    ref = json.loads(Path(args.reference).read_text())
    diff = diff_results(
        ours, ref,
        tol_abs=float(os.environ.get("PARITY_TOL_ABS", 0.05)),
        tol_impr_pp=float(os.environ.get("PARITY_TOL_IMPR_PP", 2.0)))
    doc = format_diff_md(diff, ours, ref)
    print(doc)

    dest = Path(args.out) if args.out else out_dir("parity")
    dest.mkdir(parents=True, exist_ok=True)
    save_json(dest / "beir_evaluation_results.json", ours)
    save_json(dest / "parity_diff.json", diff)
    (dest / "parity_diff.md").write_text(doc)
    print(f"artifacts -> {dest}", file=sys.stderr)
    return 0 if diff["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
